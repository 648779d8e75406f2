"""Isolated attention fwd/bwd timings at the flagship shape (solo TPU).

Each measurement chains N sequential attention applications inside ONE jit
(the remote tunnel costs ~250 ms per dispatch, so per-call timing of a
single op measures the tunnel, not the kernel)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from midi_emotion_tpu.ops import pallas_attention as pa
from midi_emotion_tpu.ops.attention import relative_attention

B, H, T, dh, N = 8, 16, 1216, 48, 20
e = jax.random.normal(jax.random.PRNGKey(99), (2048, dh), jnp.float32)


def make(attn):
    def chain(q, k, v):
        def body(c, _):
            o = attn(c, k, v)
            return o.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out

    fwd = jax.jit(chain)
    bwd = jax.jit(jax.grad(
        lambda q, k, v: chain(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2)))
    return fwd, bwd


def timed(fn, reps=3):
    args = [tuple(jax.random.normal(jax.random.PRNGKey(r * 3 + i),
                                    (B, H, T, dh), jnp.bfloat16)
                  for i in range(3)) for r in range(reps + 1)]
    jax.device_get(jax.tree.leaves(fn(*args[0]))[0])  # compile+warm
    t0 = time.time()
    outs = [fn(*args[1 + r]) for r in range(reps)]
    jax.device_get(jax.tree.leaves(outs[-1])[0])
    return (time.time() - t0) / reps / N * 1000  # ms per application


for bq, bk in [(256, 256), (512, 512), (512, 128), (1280, 256)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    fwd, bwd = make(lambda q, k, v: pa.flash_relative_attention(q, k, v, e, True, None))
    print(json.dumps({"kernel": "flash", "bq": bq, "bk": bk,
                      "fwd_ms_per_layer": round(timed(fwd), 2),
                      "fwdbwd_ms_per_layer": round(timed(bwd), 2)}), flush=True)

fwd, bwd = make(lambda q, k, v: relative_attention(q, k, v, e.astype(jnp.bfloat16), True, None, "xla"))
print(json.dumps({"kernel": "xla",
                  "fwd_ms_per_layer": round(timed(fwd), 2),
                  "fwdbwd_ms_per_layer": round(timed(bwd), 2)}), flush=True)

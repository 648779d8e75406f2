"""Ablate the Srel cost inside the flash kernel (fwd): full vs noskew vs off."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import midi_emotion_tpu.ops.pallas_attention as pa

B, H, T, dh, N = 8, 16, 1216, 48, 20
e = jax.random.normal(jax.random.PRNGKey(99), (2048, dh), jnp.float32)


def make_fwd():
    def chain(q, k, v):
        def body(c, _):
            o = pa.flash_relative_attention(c, k, v, e, True, None)
            return o.astype(c.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=N)
        return out
    return jax.jit(chain)


def timed(fn, reps=3):
    args = [tuple(jax.random.normal(jax.random.PRNGKey(r * 3 + i),
                                    (B, H, T, dh), jnp.bfloat16)
                  for i in range(3)) for r in range(reps + 1)]
    jax.device_get(jax.tree.leaves(fn(*args[0]))[0])
    t0 = time.time()
    outs = [fn(*args[1 + r]) for r in range(reps)]
    jax.device_get(jax.tree.leaves(outs[-1])[0])
    return (time.time() - t0) / reps / N * 1000


modes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["full", "noskew", "off"]
for mode in modes:
    pa.SREL_MODE = mode
    print(json.dumps({"mode": mode, "fwd_ms": round(timed(make_fwd()), 2)}),
          flush=True)
pa.SREL_MODE = "full"

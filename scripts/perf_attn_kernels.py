"""Isolated attention fwd/bwd timings at the flagship shape (solo TPU)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from midi_emotion_tpu.ops import pallas_attention as pa
from midi_emotion_tpu.ops.attention import relative_attention

B, H, T, dh = 8, 16, 1216, 48
qs = [jax.random.normal(jax.random.PRNGKey(i + r * 3), (B, H, T, dh), jnp.bfloat16)
      for r in range(4) for i in range(3)]
e = jax.random.normal(jax.random.PRNGKey(99), (2048, dh), jnp.float32)

def timed(fn, args_list, n=3):
    fn(*args_list[0])[0] if isinstance(fn(*args_list[0]), tuple) else None
    jax.device_get(jax.tree.leaves(fn(*args_list[0]))[0])  # warm
    t0 = time.time()
    outs = [fn(*args_list[1 + i]) for i in range(n)]
    jax.device_get(jax.tree.leaves(outs[-1])[0])
    return (time.time() - t0) / n * 1000

triples = [tuple(qs[i * 3 : i * 3 + 3]) for i in range(4)]

for bq, bk in [(256, 256), (512, 512)]:
    pa.BLOCK_Q, pa.BLOCK_K = bq, bk
    fwd = jax.jit(lambda q, k, v: pa.flash_relative_attention(q, k, v, e, True, None))
    g = jax.jit(jax.grad(lambda q, k, v: fwd(q, k, v).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    print(json.dumps({"kernel": "flash_fwd", "bq": bq, "bk": bk,
                      "ms": round(timed(fwd, triples), 2)}), flush=True)
    print(json.dumps({"kernel": "flash_fwd+bwd", "bq": bq, "bk": bk,
                      "ms": round(timed(g, triples), 2)}), flush=True)

xla_fwd = jax.jit(lambda q, k, v: relative_attention(q, k, v, e.astype(jnp.bfloat16), True, None, "xla"))
xla_g = jax.jit(jax.grad(lambda q, k, v: xla_fwd(q, k, v).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
print(json.dumps({"kernel": "xla_fwd", "ms": round(timed(xla_fwd, triples), 2)}), flush=True)
print(json.dumps({"kernel": "xla_fwd+bwd", "ms": round(timed(xla_g, triples), 2)}), flush=True)

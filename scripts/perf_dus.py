"""Microbench the decode cache-append dynamic_update_slice patterns.

The serving trace shows the two deferred-append DUSes cost 0.86 ms/step
(dynamic_update_slice.38/.39) -- ~8% of the step -- for writing a
[L, B, 1, 2D] row (3.9 MB) and a [L, B, 2H, 1] scale column (164 KB) into
loop-carried buffers. This times the same patterns in isolation, plus
candidate layouts (time-outer [W, L, B, 2D]: the append is ONE contiguous
block). Run solo on the TPU.
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

L, B, W, D2, H2 = 20, 128, 1408, 1536, 32
STEPS = 64


def timed(name, fn, make_args):
    def fetch():
        out = fn(*make_args())
        return jax.device_get(jax.tree.leaves(out)[0][(0,) * 3])
    fetch()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        fetch()
        best = min(best, time.time() - t0)
    print(f"{name:52s} {best*1000:8.2f} ms total  {best*1000/STEPS:7.3f} ms/step")
    return best


def main():
    rng = np.random.RandomState(0)
    row = jnp.asarray(rng.randint(-100, 100, (L, B, D2)), jnp.int8)
    rsc = jnp.ones((L, B, H2), jnp.bfloat16)

    # 1. the current pattern: row DUS + scale-column DUS per step
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def cur(kv, sc, row, rsc, p0):
        def body(carry, i):
            kv, sc = carry
            pos = p0 + i
            kv = jax.lax.dynamic_update_slice(
                kv, row[:, :, None, :], (0, 0, pos, 0))
            sc = jax.lax.dynamic_update_slice(
                sc, rsc[:, :, :, None], (0, 0, 0, pos))
            return (kv, sc), None

        (kv, sc), _ = jax.lax.scan(body, (kv, sc), jnp.arange(STEPS))
        return kv, sc

    timed("current: [L,B,1,2D] row + [L,B,2H,1] col DUS", cur,
          lambda: (jnp.zeros((L, B, W, D2), jnp.int8),
                   jnp.zeros((L, B, H2, W), jnp.bfloat16), row, rsc,
                   jnp.asarray(1216, jnp.int32)))

    # 1b. row DUS only
    @functools.partial(jax.jit, donate_argnums=(0,))
    def row_only(kv, row, p0):
        def body(kv, i):
            return jax.lax.dynamic_update_slice(
                kv, row[:, :, None, :], (0, 0, p0 + i, 0)), None

        kv, _ = jax.lax.scan(body, kv, jnp.arange(STEPS))
        return kv

    timed("row DUS only [L,B,1,2D] into [L,B,W,2D]", row_only,
          lambda: (jnp.zeros((L, B, W, D2), jnp.int8), row,
                   jnp.asarray(1216, jnp.int32)))

    # 1c. scale-col DUS only
    @functools.partial(jax.jit, donate_argnums=(0,))
    def col_only(sc, rsc, p0):
        def body(sc, i):
            return jax.lax.dynamic_update_slice(
                sc, rsc[:, :, :, None], (0, 0, 0, p0 + i)), None

        sc, _ = jax.lax.scan(body, sc, jnp.arange(STEPS))
        return sc

    timed("col DUS only [L,B,2H,1] into [L,B,2H,W]", col_only,
          lambda: (jnp.zeros((L, B, H2, W), jnp.bfloat16), rsc,
                   jnp.asarray(1216, jnp.int32)))

    # 2. time-outer layout: ONE contiguous [1,L,B,2D] write
    @functools.partial(jax.jit, donate_argnums=(0,))
    def touter(kvT, row, p0):
        def body(kvT, i):
            return jax.lax.dynamic_update_slice(
                kvT, row[None], (p0 + i, 0, 0, 0)), None

        kvT, _ = jax.lax.scan(body, kvT, jnp.arange(STEPS))
        return kvT

    timed("time-outer: [1,L,B,2D] contiguous write", touter,
          lambda: (jnp.zeros((W, L, B, D2), jnp.int8), row,
                   jnp.asarray(1216, jnp.int32)))

    # 2b. time-outer scales [W, L, B*2H] bf16
    rscT = jnp.ones((L, B * H2), jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def touter_sc(scT, rscT, p0):
        def body(scT, i):
            return jax.lax.dynamic_update_slice(
                scT, rscT[None], (p0 + i, 0, 0)), None

        scT, _ = jax.lax.scan(body, scT, jnp.arange(STEPS))
        return scT

    timed("time-outer scales: [1,L,B*2H] write", touter_sc,
          lambda: (jnp.zeros((W, L, B * H2), jnp.bfloat16), rscT,
                   jnp.asarray(1216, jnp.int32)))

    # 3. per-layer UNSTACKED appends (the r2 'slow' path, for reference)
    row1 = jnp.asarray(rng.randint(-100, 100, (B, D2)), jnp.int8)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def per_layer(kvs, row1, p0):
        def body(kvs, i):
            out = tuple(
                jax.lax.dynamic_update_slice(k, row1[:, None, :], (0, p0 + i, 0))
                for k in kvs
            )
            return out, None

        kvs, _ = jax.lax.scan(body, tuple(kvs), jnp.arange(STEPS))
        return kvs

    timed("per-layer x20: [B,1,2D] into [B,W,2D]", per_layer,
          lambda: (tuple(jnp.zeros((B, W, D2), jnp.int8) for _ in range(L)),
                   row1, jnp.asarray(1216, jnp.int32)))


if __name__ == "__main__":
    main()

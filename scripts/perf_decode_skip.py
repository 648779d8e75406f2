"""Sweep dead-block-skip granularity for the decode kernel (round 4).

One (W, bw, B) config per process (DECODE_ATTN_BLOCKS is read at trace
time, so a single process cannot sweep bw): times the 20-layer chained
kernel read at several cached lengths. If the clamped index map's DMA
skip works, time should scale with ceil(length/bw), and bw=W should match
the old full-width numbers. Run SOLO on the TPU:

    for cfg in "1408 16,1408" "1408 16,128" "1536 16,512" \
               "1536 16,256" "1536 16,128"; do
        set -- $cfg
        DECODE_ATTN_BLOCKS=$2 python scripts/perf_decode_skip.py $1 128
    done
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1408
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
QUANT = (sys.argv[3] if len(sys.argv) > 3 else "int8") == "int8"
L, H, dh = 20, 16, 48
D = H * dh
N_STEPS = 64


def main():
    from midi_emotion_tpu.ops.decode_attention import (
        decode_attn_cached, expand_e_rows,
    )

    rng = np.random.RandomState(0)
    # build the cache ON DEVICE: a host upload of the ~5 GB cache through
    # the tunnel dominates the whole script otherwise
    k0 = jax.random.PRNGKey(0)
    if QUANT:
        kv8, sc = jax.jit(lambda k: (
            jax.random.randint(k, (L, B, W, 2 * D), -127, 128, jnp.int8),
            jax.random.uniform(k, (L, B, 2 * H, W), jnp.bfloat16) * 0.01,
        ))(k0)
    else:
        kv8 = jax.jit(lambda k: (
            jax.random.normal(k, (L, B, W, 2 * D), jnp.bfloat16) * 0.1
        ))(k0)
        sc = None
    e_table = jnp.asarray(rng.randn(2048, dh) * 0.1, jnp.float32)
    q0 = jnp.asarray(rng.randn(B, H, dh), jnp.bfloat16)

    @jax.jit
    def kernel_only(q0, kv8, sc, length):
        e_rows = expand_e_rows(e_table, length + 1, W)

        def one_layer(q, i):
            acc, m, l = decode_attn_cached(q, kv8, sc, i, e_rows, length)
            q = (q + acc.reshape(q.shape) * 1e-6).astype(q.dtype)
            return q, None

        def step_body(q, s):
            q, _ = jax.lax.scan(one_layer, q, jnp.arange(L))
            return q, None

        q, _ = jax.lax.scan(step_body, q0, None, length=N_STEPS)
        return q

    blocks = os.environ.get("DECODE_ATTN_BLOCKS", "auto")
    print(f"W={W} B={B} quant={QUANT} blocks={blocks}")
    for length in (128, 512, 1023, min(1368, W - 40)):
        lf = jnp.asarray(length, jnp.int32)
        jax.device_get(kernel_only(q0, kv8, sc, lf))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(kernel_only(q0, kv8, sc, lf))
            best = min(best, time.time() - t0)
        ms = best * 1000 / N_STEPS
        itemsize = 1 if QUANT else 2
        bw = W if blocks == "auto" else int(blocks.split(",")[1])
        cols = min((length + bw - 1) // bw * bw, W)
        bytes_live = L * B * cols * (2 * D * itemsize + (2 if QUANT else 0) * 2 * H)
        print(f"  len={length:5d} live_cols={cols:5d}  {ms:7.3f} ms/step "
              f" -> {bytes_live / 1e9 / (ms / 1000):6.1f} GB/s live")


if __name__ == "__main__":
    main()

"""Probe Mosaic/XLA int4 support on this TPU (VERDICT r3 item 5).

The int8 decode kernel's win came from NATIVE int8 x int8 MXU dots --
never converting the cache (ops/decode_attention.py docstring). An int4
cache halves the bytes again IFF one of these lowers:

  1. a Mosaic kernel taking an int4-dtype block and doing
     dot_general(int4, int4) -> int32 natively;
  2. a Mosaic kernel converting int4 -> int8 in-VMEM then int8 dots
     (conversion is VPU work; the int8->bf16 analogue was convert-BOUND,
     but int4->int8 feeds an MXU dot at half the DMA, so the math
     changes);
  3. an XLA-level int4 dot (no Pallas) at useful speed.

Run solo on the TPU.
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 256, 768, 1408


def report(name, fn):
    try:
        out = fn()
        out = jax.device_get(out)
        print(f"[{name}] OK: {getattr(out, 'shape', out)} {getattr(out, 'dtype', '')}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"[{name}] FAILS: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.RandomState(0)
    a8 = rng.randint(-8, 8, size=(M, K)).astype(np.int8)
    b8 = rng.randint(-8, 8, size=(K, N)).astype(np.int8)

    # 0. can we even build int4 device arrays?
    def mk_int4():
        a4 = jnp.asarray(a8).astype(jnp.int4)
        return a4

    if not report("int4 array creation", mk_int4):
        return

    a4 = jnp.asarray(a8).astype(jnp.int4)
    b4 = jnp.asarray(b8).astype(jnp.int4)

    # 1. XLA-level int4 dot
    def xla_dot():
        return jax.jit(
            lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        )(a4, b4)

    ok_xla = report("XLA int4 dot", xla_dot)
    if ok_xla:
        want = a8.astype(np.int32) @ b8.astype(np.int32)
        got = jax.device_get(xla_dot())
        print("   correct:", np.array_equal(got, want))

    # 2. Pallas kernel: int4 blocks + native int4 dot
    def k_native(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pallas_native():
        return pl.pallas_call(
            k_native,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a4, b4)

    ok_n = report("Pallas int4 block + int4 dot", pallas_native)
    if ok_n:
        want = a8.astype(np.int32) @ b8.astype(np.int32)
        got = jax.device_get(pallas_native())
        print("   correct:", np.array_equal(got, want))

    # 3. Pallas kernel: int4 block -> int8 convert -> int8 dot
    def k_convert(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:].astype(jnp.int8), b_ref[:].astype(jnp.int8),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pallas_convert():
        return pl.pallas_call(
            k_convert,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a4, b4)

    report("Pallas int4 block -> int8 convert -> dot", pallas_convert)

    # 4. mixed: int8 q x int4 cache
    def k_mixed(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def pallas_mixed():
        return pl.pallas_call(
            k_mixed,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(jnp.asarray(a8), b4)

    report("Pallas int8 x int4 mixed dot", pallas_mixed)

    # 5. bandwidth sanity: time big int4 HBM reads through a trivial kernel
    W, D2 = 1408, 1536
    BB = 16
    big8 = rng.randint(-8, 8, size=(BB, W, D2)).astype(np.int8)
    big4 = jnp.asarray(big8).astype(jnp.int4)

    def k_reduce(x_ref, o_ref):
        o_ref[:] = jnp.sum(x_ref[:].astype(jnp.int32), axis=(1,))

    def red4():
        return pl.pallas_call(
            k_reduce,
            grid=(1,),
            in_specs=[pl.BlockSpec((BB, W, D2), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((BB, D2), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BB, D2), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(big4)

    if report("Pallas int4 big-block reduce", red4):
        jax.device_get(red4())
        reps = 20
        t0 = time.time()
        for _ in range(reps):
            jax.device_get(red4())
        dt = (time.time() - t0) / reps
        gb = BB * W * D2 / 2 / 1e9
        print(f"   int4 read: {gb*1000:.1f} MB in {dt*1000:.2f} ms "
              f"(incl dispatch) -> {gb/dt:.0f} GB/s apparent")


if __name__ == "__main__":
    main()

"""Probe Mosaic ops needed for the append-cheap decode-cache layout.

Moving the stacked cache from [L, B, W, 2D] (+scales [L, B, 2H, W]) to
[L, W, B, 2D] (+scales [L, W, B*2H]) turns the per-step append from 2560
scattered DMA chunks (~0.86 ms/step measured in the serving trace) into 20
contiguous ones (~25 us). The kernel then needs:

  1. an int8 dot_general with the BATCH dim in position 1 of the rhs
     (q [bb, H, D] x k [bw, bb, D] -> [bb, H, bw]), or else
  2. an in-kernel relayout of the k block [bw, bb, D] -> [bb, bw, D]
     (sublane<->major transpose) at tolerable cost, and
  3. a scales transpose [bw, bb*2H] -> [bb, 2H, bw] (lanes<->sublanes).

Run solo on the TPU.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BW, BB, D, H = 704, 32, 768, 16


def report(name, fn, check=None):
    try:
        out = jax.device_get(fn())
        ok = "" if check is None else f", correct={bool(check(out))}"
        print(f"[{name}] LOWERS{ok}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[{name}] FAILS: {type(e).__name__}: {msg}")
        return False


def main():
    rng = np.random.RandomState(0)
    q8 = rng.randint(-127, 127, (BB, H, D)).astype(np.int8)
    k8 = rng.randint(-127, 127, (BW, BB, D)).astype(np.int8)
    sc = rng.rand(BW, BB * 2 * H).astype(np.float32)

    want = np.einsum("bhd,wbd->bhw", q8.astype(np.int32), k8.astype(np.int32))

    # 1. batched dot with rhs batch dim in position 1
    def k_dot(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:],
            (((2,), (2,)), ((0,), (1,))),
            preferred_element_type=jnp.int32,
        )

    report(
        "int8 dot batch-rhs-dim1 [bb,H,D]x[bw,bb,D]",
        lambda: pl.pallas_call(
            k_dot,
            out_shape=jax.ShapeDtypeStruct((BB, H, BW), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.asarray(q8), jnp.asarray(k8)),
        check=lambda out: np.array_equal(out, want),
    )

    # 2. in-kernel relayout of the k block to batch-major
    def k_tr_dot(q_ref, k_ref, o_ref):
        kb = jnp.transpose(k_ref[:], (1, 0, 2))  # [bb, bw, D]
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )

    report(
        "int8 k-block transpose (1,0,2) + batched dot",
        lambda: pl.pallas_call(
            k_tr_dot,
            out_shape=jax.ShapeDtypeStruct((BB, H, BW), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.asarray(q8), jnp.asarray(k8)),
        check=lambda out: np.array_equal(out, want),
    )

    # 3. scales transpose [bw, bb*2H] -> [bb, 2H, bw]
    want_sc = sc.reshape(BW, BB, 2 * H).transpose(1, 2, 0)

    def k_sc(s_ref, o_ref):
        s3 = s_ref[:].reshape(BW, BB, 2 * H)
        o_ref[:] = jnp.transpose(s3, (1, 2, 0))

    report(
        "f32 scales transpose [bw,bb*2H]->[bb,2H,bw]",
        lambda: pl.pallas_call(
            k_sc,
            out_shape=jax.ShapeDtypeStruct((BB, 2 * H, BW), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.asarray(sc)),
        check=lambda out: np.allclose(out, want_sc),
    )

    # 3b. bf16 variant (the cache stores bf16 scales)
    scb = sc.astype(jnp.bfloat16)

    def k_scb(s_ref, o_ref):
        s3 = s_ref[:].reshape(BW, BB, 2 * H)
        o_ref[:] = jnp.transpose(s3, (1, 2, 0))

    report(
        "bf16 scales transpose [bw,bb*2H]->[bb,2H,bw]",
        lambda: pl.pallas_call(
            k_scb,
            out_shape=jax.ShapeDtypeStruct((BB, 2 * H, BW), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.asarray(scb)),
    )

    # 4. the PV side: p8 [bb, H, bw] x v [bw, bb, D] -> [bb, H, D]
    p8 = rng.randint(-127, 127, (BB, H, BW)).astype(np.int8)
    want_pv = np.einsum(
        "bhw,wbd->bhd", p8.astype(np.int32), k8.astype(np.int32)
    )

    def k_pv(p_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            p_ref[:], v_ref[:], (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.int32,
        )

    report(
        "int8 PV dot [bb,H,bw]x[bw,bb,D]",
        lambda: pl.pallas_call(
            k_pv,
            out_shape=jax.ShapeDtypeStruct((BB, H, D), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(jnp.asarray(p8), jnp.asarray(k8)),
        check=lambda out: np.array_equal(out, want_pv),
    )


if __name__ == "__main__":
    main()

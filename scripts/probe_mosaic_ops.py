"""Probe which lane-permutation primitives Mosaic lowers on this TPU.

The flash-attention backward's unskew adjoint needs a NEGATIVE per-row
stride (roll right by bq-1-a); round 2 established that stride=L-1 trips
the per-vreg shift-span limit and jnp.flip had no lowering. Before
restructuring the kernel, re-check the cheap outs on the current jaxlib:

  1. jax.lax.rev / jnp.flip on the lane axis (would give unskew =
     rev . strided_roll . rev, 3 passes instead of 16)
  2. jax.lax.rev on the sublane axis
  3. pltpu.roll with stride=-1
  4. jnp.take_along_axis gather along the lane axis (arbitrary per-row
     indices would make the unskew ONE op)
  5. reference: strided roll (+1), known good

Run solo on the TPU (never concurrently with another TPU process).
"""

import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 256, 512


def run_case(name, kernel, dtype=jnp.float32, check=None):
    x = jnp.asarray(np.random.RandomState(0).randn(R, C), dtype)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
        )(x)
        out = jax.device_get(out)
        ok = True
        if check is not None:
            ref = check(np.asarray(x, np.float32))
            ok = np.allclose(out.astype(np.float32), ref, atol=1e-3)
        print(f"[{name}] ({dtype.__name__}) LOWERS, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"[{name}] ({dtype.__name__}) FAILS: {type(e).__name__}: {msg}")


def k_rev_lane(x_ref, o_ref):
    o_ref[:] = jax.lax.rev(x_ref[:], (1,))


def k_rev_sublane(x_ref, o_ref):
    o_ref[:] = jax.lax.rev(x_ref[:], (0,))


def k_roll_neg_stride(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 0, 1, stride=-1, stride_axis=0)


def k_roll_pos_stride(x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], 0, 1, stride=1, stride_axis=0)


def k_take_along(x_ref, o_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    idx = (cols + rows) % C  # per-row rotation via gather
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)


def np_roll_pos(x):
    return np.stack([np.roll(x[a], a) for a in range(R)])


def np_roll_neg(x):
    return np.stack([np.roll(x[a], -a) for a in range(R)])


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for dt in (jnp.float32, jnp.bfloat16):
        run_case("rev_lane", k_rev_lane, dt, check=lambda x: x[:, ::-1])
        run_case("rev_sublane", k_rev_sublane, dt, check=lambda x: x[::-1])
    run_case("roll_stride+1", k_roll_pos_stride, jnp.float32, check=np_roll_pos)
    run_case("roll_stride-1", k_roll_neg_stride, jnp.float32, check=np_roll_neg)
    run_case("take_along_lane", k_take_along, jnp.float32, check=np_roll_neg)
    run_case("take_along_lane", k_take_along, jnp.bfloat16, check=np_roll_neg)

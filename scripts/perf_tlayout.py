"""Probe: can the flash kernels take q/k/v in [B, H, dh, Tp] (time-on-
lanes) layout without paying more in-kernel than the HBM copies cost?

Motivation (round 3 profile): XLA produces the head-split projections in
[B][H][dh][Tp] physical layout anyway, then inserts 8 layout copies per
layer (~7.8 ms/step total) ONLY because the kernels demand [B,H,Tp,dh] --
whose dh=48 minor dim is also HBM-tiled to 128 lanes (2.67x the bytes).

Three candidate kernel-side strategies at the flagship block shape, each
timed as a minimal kernel that loads q/k blocks and produces q @ k^T
(same data in all variants; reps scanned inside ONE jit with the input
perturbed per rep so nothing is memoized):

  a) baseline        -- blocks [n, bq, 48] from the padded layout
  b) transpose-load  -- blocks [n, 48, bq], jnp.transpose to [n, bq, 48]
  c) native-dims     -- blocks [n, 48, bq], dot_general contracting the
                        SUBLANE dim directly (lhs-transposed MXU form)

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

N, BQ, BK, DH = 32, 256, 256, 48
REPS = 100


def k_base(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = s


def k_tload(q_ref, k_ref, o_ref):
    q = jnp.transpose(q_ref[:], (0, 2, 1))  # [n, bq, dh]
    k = jnp.transpose(k_ref[:], (0, 2, 1))
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = s


def k_native(q_ref, k_ref, o_ref):
    s = jax.lax.dot_general(q_ref[:], k_ref[:], (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[:] = s


def make(kern):
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, BQ, BK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    @jax.jit
    def reps(q, k):
        def body(c, i):
            o = f(q + i.astype(q.dtype) * 0, k)  # no-op perturb defeats CSE?
            return c + o[0, 0, 0], None

        # perturb q per rep so the runtime can't memoize
        def body2(c, i):
            o = f(q.at[0, 0, 0].add(i.astype(q.dtype)), k)
            return c + o[0, 0, 0], None

        c, _ = jax.lax.scan(body2, jnp.float32(0), jnp.arange(REPS))
        return c

    return f, reps


if __name__ == "__main__":
    r = np.random.RandomState(0)
    q = jnp.asarray(r.randn(N, BQ, DH), jnp.bfloat16)
    k = jnp.asarray(r.randn(N, BK, DH), jnp.bfloat16)
    qT = jnp.swapaxes(q, 1, 2)
    kT = jnp.swapaxes(k, 1, 2)

    f_a, reps_a = make(k_base)
    o_a = np.asarray(jax.device_get(f_a(q, k)))

    for name, kern, args in (
        ("a) baseline [n,bq,dh]", k_base, (q, k)),
        ("b) transpose-load [n,dh,bq]", k_tload, (qT, kT)),
        ("c) native sublane-contract", k_native, (qT, kT)),
    ):
        try:
            f, reps = make(kern)
            o = np.asarray(jax.device_get(f(*args)))
            ok = np.allclose(o_a, o, atol=1e-2)
            c = reps(*args)
            jax.device_get(c)
            t0 = time.time()
            jax.device_get(reps(*args))
            us = (time.time() - t0) / REPS * 1e6
            print(f"{name:32s} {us:8.1f} us/call  match={ok}")
        except Exception as e:
            print(f"{name:32s} FAILED: {str(e)[:160]}")

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


def probe_forms():
    """Probe the transposed-contraction dot forms the no-transpose kernels
    need (run with --forms). Forms:
      d) A @ B^T      : ds[n,bq,bk] x kT[n,dh,bk] -> [n,bq,dh]
      e) A^T @ B^T    : qT[n,dh,bq] x e[L,dh]     -> [n,bq,L]  (band)
      f) native mixed : doT[n,dh,bq] x p[n,bq,bk] -> [n,dh,bk] (dvT)
    """
    L = BQ + BK
    r = np.random.RandomState(0)
    ds = jnp.asarray(r.randn(N, BQ, BK), jnp.bfloat16)
    kT = jnp.asarray(r.randn(N, DH, BK), jnp.bfloat16)
    qT = jnp.asarray(r.randn(N, DH, BQ), jnp.bfloat16)
    e = jnp.asarray(r.randn(L, DH), jnp.bfloat16)
    doT = jnp.asarray(r.randn(N, DH, BQ), jnp.bfloat16)
    p = jnp.asarray(r.randn(N, BQ, BK), jnp.bfloat16)

    cases = {
        "d) A@B^T  [n,bq,dh]": (
            lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
                slice(None),
                jax.lax.dot_general(a_ref[:], b_ref[:],
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)),
            (ds, kT), (N, BQ, DH),
            lambda a, b: np.einsum("nqk,ndk->nqd", np.float32(a), np.float32(b)),
        ),
        "e) A^T@B^T [n,bq,L]": (
            lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
                slice(None),
                jax.lax.dot_general(a_ref[:], b_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                .transpose(0, 2, 1) if False else
                jax.lax.dot_general(a_ref[:], b_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)),
            (qT, e), (N, BQ, L),
            lambda a, b: np.einsum("ndq,ld->nql", np.float32(a), np.float32(b)),
        ),
        "f) mixed  [n,dh,bk]": (
            lambda a_ref, b_ref, o_ref: o_ref.__setitem__(
                slice(None),
                jax.lax.dot_general(a_ref[:], b_ref[:],
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)),
            (doT, p), (N, DH, BK),
            lambda a, b: np.einsum("ndq,nqk->ndk", np.float32(a), np.float32(b)),
        ),
    }
    for name, (kern, args, oshape, ref) in cases.items():
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )
            o = np.asarray(jax.device_get(f(*args)))
            want = ref(np.asarray(args[0]), np.asarray(args[1]))
            ok = np.allclose(o, want, atol=1.0, rtol=2e-2)

            @jax.jit
            def reps(a, b, f=f):
                def body(c, i):
                    o = f(a.at[(0,) * a.ndim].add(i.astype(a.dtype)), b)
                    return c + o[0, 0, 0], None
                c, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
                return c
            jax.device_get(reps(*args))
            t0 = time.time()
            jax.device_get(reps(*args))
            us = (time.time() - t0) / REPS * 1e6
            print(f"{name:24s} {us:8.1f} us/call  match={ok}")
        except Exception as ex:
            print(f"{name:24s} FAILED: {str(ex)[:140]}")


if len(sys.argv) > 1 and sys.argv[1] == "--forms":
    probe_forms()

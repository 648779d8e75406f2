"""Fused dropout with IN-KERNEL hardware PRNG (Pallas, TPU).

The reference applies torch dropout around each sublayer
(music_multi.py:101,103,131-134). Our previous JAX lowering -- even with
the recompute-in-backward rule (ops/dropout.py) -- still materializes the
raw u32 RNG bits to HBM: XLA cannot fuse `rng-bit-generator` into its
consumers, and it CSEs the forward and backward mask regenerations back
into ONE rng call whose 28.7 MB u32[B,T,D] output is then copied and
re-read by every mask consumer. Profiled at the flagship train shape
(B=8, T=1216, 20 layers): ~3.5 ms/step of u32 copies + ~7.5 ms of
mask-consuming elementwise fusions whose dominant input is the 4-byte-
per-element bit tensor (scripts/profile_step.py, round 3).

Here the mask never exists outside VMEM: `pltpu.prng_seed` +
`pltpu.prng_random_bits` draw the bits inside the kernel, and the keep
decision is a single u32 compare (keep iff bits < round(keep_prob*2^32),
the same 2^-32 granularity as a float32-uniform bernoulli). The backward
reseeds the SAME per-block seed (key words + program index) and
regenerates bit-identical masks, so the only cross-pass residual is the
128-bit key.

Two entry points:

* ``fused_dropout(x, key_data, rate)`` -- dropout alone (the
  post-positional-encoding site, music_multi.py:101).
* ``dropout_add_layernorm(sub, res, scale, bias, key_data, rate)`` --
  LayerNorm(res + dropout(sub)) in ONE kernel (the per-layer pattern,
  music_multi.py:103,131-135 + 120-124): the dropout output and the
  pre-LN sum never round-trip through HBM, and the backward fuses the
  mask replay into the LayerNorm backward (dx, dgamma, dbeta) pass.

Semantics: out = where(keep, x * (1/(1-rate)), 0), math in x.dtype; the
add runs in x.dtype and LayerNorm statistics in f32, exactly like the
unfused RecomputeDropout + FusedLayerNorm composition. Only the RNG
stream differs (hardware PRNG vs threefry/rbg), which changes which
units drop -- statistically equivalent, not bit-identical.

Testing note: the Pallas TPU interpreter stubs `prng_random_bits` to
zeros (= keep everything), so CPU tests cover the scaling/add/LN math
and the fwd/bwd mask-consistency plumbing only; mask statistics are
asserted by a TPU-gated test (tests/test_dropout.py) and were verified
on v5e.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def available() -> bool:
    """The fused path needs the hardware PRNG: real TPU only."""
    return jax.default_backend() not in ("cpu",)


def fusable(x) -> bool:
    """Shapes the kernels handle profitably: lane-aligned feature dim and
    enough rows that per-launch overhead doesn't dominate (same threshold
    as ops/layernorm.py's dispatch)."""
    if not available() or x.ndim < 2:
        return False
    return x.shape[-1] % 128 == 0 and x.size // x.shape[-1] >= 512


def _keep_threshold(rate: float) -> np.int32:
    """keep iff (bits >> 8) < thresh; P(keep) = thresh / 2^24.

    The compare runs on the HIGH 24 bits in int32 space: a full-width
    u32 compare against a threshold past 2^31 lowers as a SIGNED compare
    on this toolchain (verified in the Pallas TPU interpreter) and
    silently inverts. 2^-24 keep-probability granularity is far below
    bf16 resolution."""
    assert 0.0 < rate < 1.0, rate
    return np.int32(round((1.0 - rate) * float(2**24)))


def _seed_and_mask(seed_ref, shape, thresh):
    """Seed from the key words + block index and draw the keep mask.

    The FORWARD AND BACKWARD KERNELS MUST BOTH GO THROUGH THIS HELPER
    with the same block layout: identical (seed words, program_id)
    implies bit-identical masks, which is the entire correctness story
    of regenerating instead of saving. Mosaic's prng_seed takes at most
    TWO words, so the block index rides the second word."""
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + pl.program_id(0))
    bits = pltpu.prng_random_bits(shape)
    # EXPLICITLY logical shift: jnp.right_shift on these u32 lowered as an
    # arithmetic shift on v5e (sign-extended -> everything "kept");
    # shift_right_logical on the bitcast int32 keeps the high 24 bits as
    # a non-negative int32
    hi = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(bits, jnp.int32), 8
    )
    return hi < thresh


def _key_words(key_data) -> jnp.ndarray:
    """Mix threefry (u32[2]) or rbg (u32[4]) key data down to TWO int32
    words for scalar prefetch (Mosaic's prng_seed arity limit). Extra
    words fold in golden-ratio-multiplied so distinct keys stay
    distinct."""
    kd = jnp.asarray(key_data).reshape(-1).astype(jnp.uint32)
    GOLD = np.uint32(0x9E3779B9)
    lo, hi = kd[0], kd[1 % kd.shape[0]]
    for i in range(2, kd.shape[0]):
        mixed = kd[i] * GOLD
        lo, hi = (lo ^ mixed, hi) if i % 2 == 0 else (lo, hi ^ mixed)
    return jax.lax.bitcast_convert_type(jnp.stack([lo, hi]), jnp.int32)


def _pad_rows(x2, bn):
    n = x2.shape[0]
    np_ = (n + bn - 1) // bn * bn
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))
    return x2, np_


# ---------------------------------------------------------------------------
# plain dropout
# ---------------------------------------------------------------------------


def _drop_kernel(seed_ref, x_ref, y_ref, *, thresh, inv_keep):
    keep = _seed_and_mask(seed_ref, x_ref.shape, thresh)
    x = x_ref[:]
    y_ref[:] = jnp.where(keep, x * jnp.asarray(inv_keep, x.dtype),
                         jnp.zeros((), x.dtype))


def _drop_call(x, key_words, rate):
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    n = x2.shape[0]
    bn = min(BLOCK_ROWS, max(8, n))
    x2p, np_ = _pad_rows(x2, bn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // bn,),
        in_specs=[pl.BlockSpec((bn, D), lambda i, s: (i, 0))],
        out_specs=pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
    )
    y = pl.pallas_call(
        functools.partial(
            _drop_kernel,
            thresh=_keep_threshold(rate),
            inv_keep=1.0 / (1.0 - rate),
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, D), x.dtype),
    )(key_words, x2p)
    return y[:n].reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x, key_data, rate: float):
    """``where(keep, x/(1-rate), 0)`` with the mask drawn in-kernel.

    key_data: raw uint32 key words (``jax.random.key_data``); rate is
    static. The backward regenerates the mask from the key alone."""
    return _drop_call(x, _key_words(key_data), rate)


def _fd_fwd(x, key_data, rate):
    kd_shape = jnp.shape(key_data)
    return fused_dropout(x, key_data, rate), (_key_words(key_data), kd_shape)


def _fd_bwd(rate, resids, g):
    key_words, kd_shape = resids
    dx = _drop_call(g, key_words, rate)
    # integer primal -> float0 cotangent (same rule as ops/dropout.py)
    ct_key = np.zeros(kd_shape, jax.dtypes.float0)
    return (dx, ct_key)


fused_dropout.defvjp(_fd_fwd, _fd_bwd)


# ---------------------------------------------------------------------------
# dropout + residual add + LayerNorm
# ---------------------------------------------------------------------------


def _dal_fwd_kernel(seed_ref, s_ref, r_ref, g_ref, b_ref, y_ref,
                    *, thresh, inv_keep, eps):
    keep = _seed_and_mask(seed_ref, s_ref.shape, thresh)
    s = s_ref[:]
    xs = jnp.where(keep, s * jnp.asarray(inv_keep, s.dtype),
                   jnp.zeros((), s.dtype))
    # the add runs in the input dtype, matching the unfused
    # ``ln(res + dropout(sub))`` composition exactly
    x = (r_ref[:] + xs).astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _dal_bwd_kernel(seed_ref, s_ref, r_ref, dy_ref, g_ref,
                    ds_ref, dr_ref, dg_ref, db_ref, dg_scr, db_scr,
                    *, thresh, inv_keep, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_scr[:] = jnp.zeros_like(dg_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    keep = _seed_and_mask(seed_ref, s_ref.shape, thresh)
    s = s_ref[:]
    xs = jnp.where(keep, s * jnp.asarray(inv_keep, s.dtype),
                   jnp.zeros((), s.dtype))
    x = (r_ref[:] + xs).astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = xc * rs

    dg_scr[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_scr[:] += jnp.sum(dy, axis=0, keepdims=True)

    wdy = dy * g
    c1 = jnp.mean(wdy, axis=1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=1, keepdims=True)
    dx = (wdy - c1 - xhat * c2) * rs  # f32
    dr_ref[:] = dx.astype(dr_ref.dtype)
    ds_ref[:] = jnp.where(keep, dx * inv_keep, 0.0).astype(ds_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dg_ref[:] = dg_scr[:]
        db_ref[:] = db_scr[:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dropout_add_layernorm(sub, res, scale, bias, key_data, rate: float,
                          eps: float = 1e-6):
    """``LayerNorm(res + dropout(sub))`` in one kernel.

    sub, res: [..., D] (same shape); scale, bias: [D]; key_data: raw
    uint32 key words (``jax.random.key_data``); rate and eps are
    static, rate in (0, 1)."""
    y, _ = _dal_fwd(sub, res, scale, bias, key_data, rate, eps)
    return y


def _dal_fwd(sub, res, scale, bias, key_data, rate, eps):
    shape = sub.shape
    D = shape[-1]
    s2 = sub.reshape(-1, D)
    r2 = res.reshape(-1, D)
    n = s2.shape[0]
    bn = min(BLOCK_ROWS, max(8, n))
    s2p, np_ = _pad_rows(s2, bn)
    r2p, _ = _pad_rows(r2, bn)
    kw = _key_words(key_data)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((1, D), lambda i, s: (0, 0)),
            pl.BlockSpec((1, D), lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
    )
    y = pl.pallas_call(
        functools.partial(
            _dal_fwd_kernel,
            thresh=_keep_threshold(rate),
            inv_keep=1.0 / (1.0 - rate),
            eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((np_, D), sub.dtype),
    )(kw, s2p, r2p, scale.reshape(1, D), bias.reshape(1, D))
    y = y[:n].reshape(shape)
    return y, (sub, res, scale, kw, jnp.shape(key_data))


def _dal_fwd_vjp(sub, res, scale, bias, key_data, rate, eps):
    return _dal_fwd(sub, res, scale, bias, key_data, rate, eps)


def _dal_bwd(rate, eps, resids, dy):
    sub, res, scale, kw, kd_shape = resids
    shape = sub.shape
    D = shape[-1]
    s2 = sub.reshape(-1, D)
    r2 = res.reshape(-1, D)
    dy2 = dy.reshape(-1, D)
    n = s2.shape[0]
    bn = min(BLOCK_ROWS, max(8, n))
    s2p, np_ = _pad_rows(s2, bn)
    r2p, _ = _pad_rows(r2, bn)
    dy2p, _ = _pad_rows(dy2, bn)  # zero rows contribute nothing to dg/db
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((1, D), lambda i, s: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((bn, D), lambda i, s: (i, 0)),
            pl.BlockSpec((1, D), lambda i, s: (0, 0)),
            pl.BlockSpec((1, D), lambda i, s: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
    )
    ds, dr, dg, db = pl.pallas_call(
        functools.partial(
            _dal_bwd_kernel,
            thresh=_keep_threshold(rate),
            inv_keep=1.0 / (1.0 - rate),
            eps=eps,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((np_, D), sub.dtype),
            jax.ShapeDtypeStruct((np_, D), res.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
    )(kw, s2p, r2p, dy2p, scale.reshape(1, D))
    ds = ds[:n].reshape(shape)
    dr = dr[:n].reshape(shape)
    # bias grad db; integer key primal -> float0 cotangent
    ct_key = np.zeros(kd_shape, jax.dtypes.float0)
    return (ds, dr, dg[0].astype(scale.dtype), db[0].astype(scale.dtype),
            ct_key)


dropout_add_layernorm.defvjp(_dal_fwd_vjp, _dal_bwd)

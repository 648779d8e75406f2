"""Fused flash-style relative-position attention (Pallas, TPU).

The reference materializes the full [B, H, T, T] logits plus a same-sized
skewed relative-bias tensor per layer (music_multi.py:214-231) -- at the
default T=1216 that is ~380 MB of HBM traffic per layer. This kernel
computes ``softmax((QK^T + Srel)/sqrt(dh) + mask) V`` blockwise with the
online-softmax (flash) recurrence, never materializing [T, T], and derives
the relative bias per block pair directly from the learned table E:

    Srel[i, j] = q[i] . E[max_seq - 1 - (i - j)]   for j <= i, else 0
    (see ops/attention.py for the equivalence proof vs the reference's
    qe-masking + skewing)

Per (q-block, k-block) the needed rows of E form one contiguous slice, so
``q_blk @ E_slice^T`` gives a [bq, bq+bk] band whose diagonals are the
bias; the band is realigned to [bq, bk] with a log2(bq)-step
roll-by-row-index decomposition (static slice+concat rolls + selects, run
in the input dtype) -- the blockwise form of the reference's pad-reshape
"skewing" trick, at O(T) transient memory. An alternative that hoists the
skew to XLA as a [B, H, T, T] bf16 pre-skewed bias was measured SLOWER on
v5e at the flagship shape (the materialization + skew copies cost more HBM
time than the in-kernel rolls cost VMEM time), so it was removed.

Backward is fused too: dq/de and dk/dv kernel pairs recompute P blockwise
from the lse saved by the forward.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)  # avoids inf-inf NaNs inside the recurrence

# Default tile sizes. Large tiles amortize Mosaic's per-grid-step overhead,
# which dominates at this model's small d_head (48): at 128x128 the flagship
# shape runs a 12.8k-step grid of microsecond blocks and loses to XLA; at
# 256 the same sweep is 16x fewer steps. Overridable per call.
BLOCK_Q = 256
BLOCK_K = 256
# Heads per grid step. At dh=48 a single (256, 256) block pair is ~0.1 us of
# MXU work against ~4 us of per-grid-step overhead (measured: removing the
# relative bias entirely still cost 13.3 of 18.8 ms/layer fwd) -- the grid,
# not the math, is the bottleneck. Batching HEADS_PER_BLOCK heads into one
# step divides the step count while the per-step math stays VMEM-sized
# (needs VMEM_LIMIT below; sweep: hpb=16 beat 8 and 1 at the flagship
# shape, 411 -> 338 ms/step). Capped to H and rounded down to a divisor.
HEADS_PER_BLOCK = 16

# Mosaic's default scoped-VMEM budget is 16 MB; v5e has 128 MB of physical
# VMEM, and the head-batched blocks (band + roll temps + f32 score tiles)
# legitimately need more. 64 MB leaves plenty for double-buffered DMA.
VMEM_LIMIT = 64 * 1024 * 1024

# Trace-time ablation knob for perf experiments (scripts/perf_attn_kernels):
#   "full"   -- correct Srel (band matmul + skew rolls)
#   "noskew" -- band matmul but no rolls (WRONG numerics; isolates roll cost)
#   "off"    -- no relative bias at all (WRONG numerics; plain flash)
SREL_MODE = "full"

# Skew implementation:
#   "strided" -- ONE tpu.dynamic_rotate with a per-row stride (f32-only
#                lowering, but a single pass over the band vs the static
#                decomposition's 2*log2(bq) passes)
#   "static"  -- log2(bq) slice+concat rolls + selects in the input dtype
import os as _os

SKEW_IMPL = _os.environ.get("MIDI_EMOTION_SKEW", "strided")


def _dot(a, b, dims):
    """dot_general in the INPUT dtype with f32 accumulation: bf16 inputs
    keep the MXU at full rate (a f32 upcast before the dot quarters it)."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _bdot(a, b, dims):
    """Batched-over-axis-0 _dot: a [n, ...], b [n, ...]."""
    return jax.lax.dot_general(a, b, (dims, ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _roll_right(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Static cyclic roll along the LAST axis as slice+concat. Unlike
    ``pltpu.roll`` (tpu.dynamic_rotate, 32-bit-only lowering) this works in
    bf16, which halves the VMEM traffic of the skew -- the dominant cost of
    the band strategy at this model's small d_head."""
    return jnp.concatenate([x[..., -s:], x[..., :-s]], axis=-1)


def _skew_band(band: jnp.ndarray, bq: int, bk: int) -> jnp.ndarray:
    """[..., bq, bq+bk] band -> [..., bq, bk] with
    out[..., a, b] = band[..., a, bq-1-a+b].

    Roll-right of row a by a places the wanted window of every row at
    columns [bq-1, bq-1+bk). "strided": one tpu.dynamic_rotate whose shift
    grows by 1 per row (32-bit-only lowering -> runs on the f32 band).
    "static": the shift bit-decomposed into log2(bq) whole-array
    slice+concat rolls + selects (any dtype).
    """
    if SKEW_IMPL == "strided":
        x = pltpu.roll(
            band.astype(jnp.float32), 0, band.ndim - 1,
            stride=1, stride_axis=band.ndim - 2,
        )
        return x[..., bq - 1 : bq - 1 + bk]
    rows = jax.lax.broadcasted_iota(jnp.int32, band.shape, band.ndim - 2)
    x = band
    shift = 1
    while shift < bq:
        x = jnp.where((rows & shift) != 0, _roll_right(x, shift), x)
        shift *= 2
    return x[..., bq - 1 : bq - 1 + bk]


def _unskew_band(dsrel: jnp.ndarray, bq: int, bk: int) -> jnp.ndarray:
    """Adjoint of _skew_band: [..., bq, bk] -> [..., bq, bq+bk] with
    out[..., a, bq-1-a+b] = dsrel[..., a, b] (zeros elsewhere)."""
    L = bq + bk
    lead = dsrel.shape[:-2]
    # static-shape placement (``.at[].set`` lowers to an unsupported
    # scatter inside Mosaic kernels)
    tmp = jnp.concatenate(
        [
            jnp.zeros(lead + (bq, bq - 1), dsrel.dtype),
            dsrel,
            jnp.zeros(lead + (bq, 1), dsrel.dtype),
        ],
        axis=-1,
    )
    # NOTE: no strided variant here -- the left roll needs a negative
    # per-row stride, and every workaround fails to lower (stride L-1
    # exceeds Mosaic's per-vreg shift span; jnp.flip/rev is unimplemented
    # in Mosaic). Static rolls remain for this adjoint only.
    rows = jax.lax.broadcasted_iota(jnp.int32, tmp.shape, tmp.ndim - 2)
    x = tmp
    shift = 1
    while shift < bq:
        # roll LEFT by `shift` == cyclic roll right by L - shift
        x = jnp.where((rows & shift) != 0, _roll_right(x, L - shift), x)
        shift *= 2
    return x


def _flash_kernel(
    q_ref,  # [1, hpb, bq, dh]
    k_ref,  # [1, hpb, bk, dh]
    v_ref,  # [1, hpb, bk, dh]
    e_ref,  # [max_seq + bk, dh] (zero-padded tail)
    pad_ref,  # [1, 1, Tp] int32 -- 1 where key is pad (full row per batch)
    o_ref,  # [1, hpb, bq, dh]
    lse_ref,  # [1, hpb, 1, Tp] f32 -- per-row logsumexp (for backward;
              # the extra unit dim keeps the block's last-two dims (1, Tp),
              # legal for ANY hpb -- (hpb, Tp) needs hpb % 8 == 0)
    m_scr,  # [hpb, bq, 1] f32
    l_scr,  # [hpb, bq, 1] f32
    acc_scr,  # [hpb, bq, dh] f32
    *,
    bq: int,
    bk: int,
    max_seq: int,
    scale: float,
    causal: bool,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    hpb = q_ref.shape[1]

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # block pair visible iff any key position can be <= some query position
    # (compare POSITIONS, not block indices -- bq and bk may differ)
    visible = (ik * bk <= iq * bq + bq - 1) if causal else (ik >= 0)

    @pl.when(visible)
    def _compute():
        q = q_ref[0]  # [hpb, bq, dh], model dtype (bf16 inputs stay bf16)
        k = k_ref[0]  # [hpb, bk, dh]
        v = v_ref[0]

        s = _bdot(q, k, ((2,), (2,)))  # [hpb, bq, bk] f32

        a = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 1) + iq * bq
        b = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 2) + ik * bk
        if SREL_MODE != "off":
            # relative bias: contiguous E slice for this block-pair's
            # distances; the skew runs in the input dtype (bf16 halves its
            # VMEM traffic)
            start = max_seq - iq * bq + ik * bk - bq
            e_slice = e_ref[pl.ds(start, bq + bk), :].astype(q.dtype)
            band = _dot(q, e_slice, ((2,), (1,)))
            if SKEW_IMPL != "strided":
                band = band.astype(q.dtype)  # halves static-roll traffic
            if SREL_MODE == "full":
                srel = _skew_band(band, bq, bk).astype(jnp.float32)
            else:  # "noskew" ablation: wrong numerics, no rolls
                srel = band[..., :bk].astype(jnp.float32)
            # zero above the diagonal (j > i), matching the reference
            # exactly -- this matters for the unmasked regression model
            srel = jnp.where(b <= a, srel, 0.0)
            s = s + srel

        s = s * scale

        koff = pl.multiple_of(ik * bk, bk)
        masked = pad_ref[0, 0, pl.ds(koff, bk)][None, None, :] != 0
        if causal:
            masked = masked | (b > a)
        s = jnp.where(masked, NEG_INF, s)

        # online softmax
        m_prev = m_scr[:]  # [hpb, bq, 1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [hpb, bq, bk]
        alpha = jnp.exp(m_prev - m_new)  # [hpb, bq, 1]
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=2, keepdims=True)
        # p in the input dtype for the MXU; acc stays f32
        acc_scr[:] = acc_scr[:] * alpha + _bdot(
            p.astype(v.dtype), v, ((2,), (1,))
        )
        m_scr[:] = m_new

    last = (iq * bq + bq - 1) // bk if causal else pl.num_programs(3) - 1

    @pl.when(ik == last)
    def _finalize():
        denom = l_scr[:]
        # fully-masked rows (all keys pad) -> reference softmax yields NaN;
        # we output 0 instead (those rows are pad positions, loss-masked)
        safe = jnp.where(denom > 0.0, denom, 1.0)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)
        # lse = m + log(l); empty rows get +BIG so the backward's
        # exp(s - lse) recomputation yields exactly 0 for them
        lse = jnp.where(
            denom > 0.0, m_scr[:] + jnp.log(safe), jnp.float32(1e30)
        )
        lse_ref[0, :, 0, pl.ds(iq * bq, bq)] = lse[:, :, 0]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_relative_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    causal: bool = True,
    pad_keys: Optional[jnp.ndarray] = None,
):
    return _flash_fwd_impl(q, k, v, e, causal, pad_keys)


def _prepare(q, k, v, e, causal, pad_keys, bq, bk):
    """Shared fwd/bwd padding: T -> Tp multiple of the block size; pad mask
    rows; E padded front (T-padding distance shift) and tail (diagonal /
    non-causal block slices)."""
    B, H, T, dh = q.shape
    max_seq = e.shape[0]
    assert T <= max_seq, (T, max_seq)
    Tp = _round_up(T, math.lcm(bq, bk))
    pad_t = Tp - T

    def pad3(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad_t), (0, 0))) if pad_t else x

    qp, kp, vp = pad3(q), pad3(k), pad3(v)
    if pad_keys is None:
        pk = jnp.zeros((B, Tp), jnp.int32)
    else:
        pk = jnp.pad(pad_keys.astype(jnp.int32), ((0, 0), (0, pad_t)))
    if pad_t:
        pk = pk.at[:, T:].set(1)
    pk = pk[:, None, :]  # [B, 1, Tp] -- keeps the block tiling legal

    e_pad = jnp.pad(e.astype(jnp.float32), ((pad_t, 0), (0, 0)))
    # causal: the diagonal-most visible block pair reads up to
    # max_seq - 1 + bq + bk; rows past max_seq are masked out in-kernel
    tail = Tp if not causal else bq + bk
    e_pad = jnp.pad(e_pad, ((0, tail), (0, 0)))

    return (qp, kp, vp, e_pad, pk, Tp, pad_t, pad3)


def _heads_per_block(H: int) -> int:
    hpb = min(HEADS_PER_BLOCK, H)
    while H % hpb:
        hpb -= 1
    return hpb


def _flash_fwd_impl(
    q, k, v, e, causal, pad_keys, bq: Optional[int] = None,
    bk: Optional[int] = None, return_lse: bool = False,
):
    """q,k,v: [B,H,T,dh]; e: [max_seq, dh]; pad_keys: [B,T] bool or None."""
    bq = bq or BLOCK_Q
    bk = bk or BLOCK_K
    B, H, T, dh = q.shape
    max_seq = e.shape[0]
    qf, kf, vf, e_pad, pk, Tp, pad_t, _ = _prepare(
        q, k, v, e, causal, pad_keys, bq, bk
    )
    hpb = _heads_per_block(H)

    grid = (B, H // hpb, Tp // bq, Tp // bk)
    common_in_specs = [
        pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),
    ]
    pad_spec = pl.BlockSpec((1, 1, Tp), lambda b, ih, iq, ik: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _flash_kernel, bq=bq, bk=bk,
        max_seq=max_seq + pad_t,  # front padding shifts distance origin
        scale=1.0 / math.sqrt(dh), causal=causal,
    )
    operands = (qf, kf, vf, e_pad, pk)
    in_specs = common_in_specs + [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad, full
        pad_spec,
    ]
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Tp), jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, 1, Tp),
                         lambda b, ih, iq, ik: (b, ih, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hpb, bq, 1), jnp.float32),
            pltpu.VMEM((hpb, bq, 1), jnp.float32),
            pltpu.VMEM((hpb, bq, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * Tp * (2 * dh + bq + bk)
            // (2 if causal else 1),
            bytes_accessed=4 * B * H * Tp * dh * 4,
            transcendentals=B * H * Tp * Tp,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(*operands)
    out = out[:, :, :T, :] if pad_t else out
    if return_lse:
        return out, lse
    return out


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _recompute_block(q, k, e_ref, lse_row, pad_row, iq, ik, bq, bk, max_seq,
                     scale, causal):
    """Recompute P and the (a, b) index grids for one block pair.

    q: [hpb, bq, dh]; k: [hpb, bk, dh]; lse_row: [hpb, bq, 1];
    pad_row: [bk]."""
    s = _bdot(q, k, ((2,), (2,)))  # [hpb, bq, bk]
    start = max_seq - iq * bq + ik * bk - bq
    e_slice = e_ref[pl.ds(start, bq + bk), :].astype(q.dtype)
    band = _dot(q, e_slice, ((2,), (1,)))
    if SKEW_IMPL != "strided":
        band = band.astype(q.dtype)
    srel = _skew_band(band, bq, bk).astype(jnp.float32)
    a = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 1) + iq * bq
    b = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 2) + ik * bk
    srel = jnp.where(b <= a, srel, 0.0)
    s = (s + srel) * scale
    masked = pad_row[None, None, :] != 0
    if causal:
        masked = masked | (b > a)
    s = jnp.where(masked, NEG_INF, s)
    p = jnp.exp(s - lse_row)  # [hpb, bq, bk]; exactly 0 on masked rows
    return p, e_slice, a, b, start


def _bwd_dq_de_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, e_ref, pad_ref,
    dq_ref, de_ref, dq_scr, de_scr,
    *, bq, bk, max_seq, scale, causal,
):
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when((ib == 0) & (ih == 0) & (iq == 0) & (ik == 0))
    def _():
        de_scr[:] = jnp.zeros_like(de_scr)

    visible = (ik * bk <= iq * bq + bq - 1) if causal else (ik >= 0)

    @pl.when(visible)
    def _():
        q = q_ref[0]  # [hpb, bq, dh]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        d_row = dsum_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        pad_row = pad_ref[0, 0, pl.ds(ik * bk, bk)]
        p, e_slice, a, b, start = _recompute_block(
            q, k, e_ref, lse_row, pad_row, iq, ik, bq, bk, max_seq, scale,
            causal,
        )
        dp = _bdot(do, v, ((2,), (2,)))
        ds_f32 = p * (dp - d_row) * scale  # [hpb, bq, bk]
        ds = ds_f32.astype(q.dtype)
        dq_scr[:] += _bdot(ds, k, ((2,), (1,)))
        # the unskew runs in the input dtype (static slice+concat rolls)
        dsrel = jnp.where(b <= a, ds, jnp.zeros((), ds.dtype))
        dband = _unskew_band(dsrel, bq, bk)  # [hpb, bq, bq+bk]
        dq_scr[:] += _dot(dband, e_slice, ((2,), (0,)))
        de_blk = jax.lax.dot_general(
            dband, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [hpb, bq+bk, dh]
        de_scr[pl.ds(start, bq + bk), :] += jnp.sum(de_blk, axis=0)

    last = (iq * bq + bq - 1) // bk if causal else pl.num_programs(3) - 1

    @pl.when(ik == last)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when(
        (ib == pl.num_programs(0) - 1)
        & (ih == pl.num_programs(1) - 1)
        & (iq == pl.num_programs(2) - 1)
        & (ik == pl.num_programs(3) - 1)
    )
    def _():
        de_ref[:] = de_scr[:]


def _bwd_dkdv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, e_ref, pad_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, bq, bk, max_seq, scale, causal,
):
    ik = pl.program_id(2)
    iq = pl.program_id(3)

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    visible = (iq * bq + bq - 1 >= ik * bk) if causal else (iq >= 0)

    @pl.when(visible)
    def _():
        q = q_ref[0]  # [hpb, bq, dh]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        d_row = dsum_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        pad_row = pad_ref[0, 0, pl.ds(ik * bk, bk)]
        p, _, a, b, _ = _recompute_block(
            q, k, e_ref, lse_row, pad_row, iq, ik, bq, bk, max_seq, scale,
            causal,
        )
        dv_scr[:] += _bdot(p.astype(do.dtype), do, ((1,), (1,)))
        dp = _bdot(do, v, ((2,), (2,)))
        ds = ((p * (dp - d_row)) * scale).astype(q.dtype)
        dk_scr[:] += _bdot(ds, q, ((1,), (1,)))

    @pl.when(iq == pl.num_programs(3) - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_de_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk,
                    hpb, Tp):
    """Launch the dq/dE kernel. Split out so perf scripts can time it."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    n_e_rows = e_pad.shape[0]
    in_specs = [
        pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((1, hpb, 1, Tp), lambda b, ih, iq, ik: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, hpb, 1, Tp), lambda b, ih, iq, ik: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),  # dsum
        pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad
        pl.BlockSpec((1, 1, Tp), lambda b, ih, iq, ik: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # pad rows
    ]

    dq, de_pad = pl.pallas_call(
        functools.partial(_bwd_dq_de_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), qf.dtype),
            jax.ShapeDtypeStruct((n_e_rows, dh), jnp.float32),
        ),
        grid=(B, H // hpb, Tp // bq, Tp // bk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hpb, bq, dh),
                         lambda b, ih, iq, ik: (b, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hpb, bq, dh), jnp.float32),
            pltpu.VMEM((n_e_rows, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(qf, kf, vf, dof, lse, dsum, e_pad, pk)
    return dq, de_pad


def _bwd_dkdv_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk,
                   hpb, Tp):
    """Launch the dK/dV kernel: iq innermost so per-k-block accumulation
    is legal."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    in_specs_kv = [
        pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, ik, iq: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, ik, iq: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, hpb, bk, dh), lambda b, ih, ik, iq: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, ik, iq: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((1, hpb, 1, Tp), lambda b, ih, ik, iq: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hpb, 1, Tp), lambda b, ih, ik, iq: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tp), lambda b, ih, ik, iq: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), kf.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, dh), vf.dtype),
        ),
        grid=(B, H // hpb, Tp // bk, Tp // bq),
        in_specs=in_specs_kv,
        out_specs=(
            pl.BlockSpec((1, hpb, bk, dh),
                         lambda b, ih, ik, iq: (b, ih, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hpb, bk, dh),
                         lambda b, ih, ik, iq: (b, ih, ik, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hpb, bk, dh), jnp.float32),
            pltpu.VMEM((hpb, bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(qf, kf, vf, dof, lse, dsum, e_pad, pk)
    return dk, dv


def _flash_bwd_impl(q, k, v, e, causal, pad_keys, out, lse, g,
                    bq: Optional[int] = None, bk: Optional[int] = None):
    bq = bq or BLOCK_Q
    bk = bk or BLOCK_K
    B, H, T, dh = q.shape
    max_seq = e.shape[0]
    qf, kf, vf, e_pad, pk, Tp, pad_t, pad3 = _prepare(
        q, k, v, e, causal, pad_keys, bq, bk
    )
    hpb = _heads_per_block(H)
    dof = pad3(g)
    outf = pad3(out)
    dsum = jnp.sum(
        dof.astype(jnp.float32) * outf.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # [B, H, 1, Tp]

    common = dict(
        bq=bq, bk=bk, max_seq=max_seq + pad_t,
        scale=1.0 / math.sqrt(dh), causal=causal,
    )
    dq, de_pad = _bwd_dq_de_call(
        qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp
    )
    dk, dv = _bwd_dkdv_call(
        qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp
    )

    cut = lambda x, dt: x[:, :, :T, :].astype(dt)
    dq = cut(dq, q.dtype)
    dk = cut(dk, k.dtype)
    dv = cut(dv, v.dtype)
    # de: drop the front (pad_t) and tail padding rows
    de = de_pad[pad_t : pad_t + max_seq].astype(e.dtype)
    return dq, dk, dv, de


def _xla_reference(q, k, v, e, causal, pad_keys):
    """Exact-math fallback used for the backward pass."""
    from .attention import rel_position_bias

    dh = q.shape[-1]
    T = q.shape[2]
    srel = rel_position_bias(q.astype(jnp.float32), e.astype(jnp.float32))
    logits = (
        jnp.einsum(
            "bhid,bhjd->bhij",
            q.astype(jnp.float32),
            k.astype(jnp.float32),
        )
        + srel
    ) / math.sqrt(dh)
    mask = None
    if causal:
        i = jnp.arange(T)[:, None]
        j = jnp.arange(T)[None, :]
        mask = (j > i)[None, None]
    if pad_keys is not None:
        pmask = pad_keys[:, None, None, :]
        mask = pmask if mask is None else (mask | pmask)
    if mask is not None:
        logits = jnp.where(mask, NEG_INF, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", w, v.astype(jnp.float32)).astype(q.dtype)


def _fwd(q, k, v, e, causal, pad_keys):
    out, lse = _flash_fwd_impl(q, k, v, e, causal, pad_keys, return_lse=True)
    return out, (q, k, v, e, pad_keys, out, lse)


def _bwd(causal, residuals, g):
    q, k, v, e, pad_keys, out, lse = residuals
    import os

    if os.environ.get("MIDI_EMOTION_FLASH_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(
            lambda q_, k_, v_, e_: _xla_reference(q_, k_, v_, e_, causal, pad_keys),
            q, k, v, e,
        )
        dq, dk, dv, de = vjp(g)
    else:
        dq, dk, dv, de = _flash_bwd_impl(
            q, k, v, e, causal, pad_keys, out, lse, g
        )
    return dq, dk, dv, de, None


flash_relative_attention.defvjp(_fwd, _bwd)

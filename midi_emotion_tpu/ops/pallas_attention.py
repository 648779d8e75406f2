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
# Per-kernel overrides (0 = inherit BLOCK_Q/BLOCK_K). The fwd and bwd
# grids have different VMEM/FLOP tradeoffs: wider k-blocks cut the grid's
# fixed per-step cost but recompute more masked diagonal cells and blow
# up the bwd's band/dsp temporaries, so they are swept independently.
# All block sizes in play must divide the padded length (padded_len uses
# their lcm; 640-based choices keep Tp=1280 at the flagship T=1216).
import os as _os_blk

BLOCK_Q_FWD = int(_os_blk.environ.get("MIDI_EMOTION_BQ_FWD", "0"))
BLOCK_K_FWD = int(_os_blk.environ.get("MIDI_EMOTION_BK_FWD", "0"))
BLOCK_Q_BWD = int(_os_blk.environ.get("MIDI_EMOTION_BQ_BWD", "0"))
BLOCK_K_BWD = int(_os_blk.environ.get("MIDI_EMOTION_BK_BWD", "0"))
# Heads per grid step. At dh=48 a single (256, 256) block pair is ~0.1 us of
# MXU work against ~4 us of per-grid-step overhead (measured: removing the
# relative bias entirely still cost 13.3 of 18.8 ms/layer fwd) -- the grid,
# not the math, is the bottleneck. Batching HEADS_PER_BLOCK heads into one
# step divides the step count while the per-step math stays VMEM-sized
# (needs VMEM_LIMIT below; sweep: hpb=16 beat 8 and 1 at the flagship
# shape, 411 -> 338 ms/step). Capped to H and rounded down to a divisor.
HEADS_PER_BLOCK = 16
# Batch rows per grid step, same rationale one level up: with all H heads
# in one step the grid is still B * (T/bq) * (T/bk) microsecond-scale
# steps; batching bpb batch rows divides the step count (and its fixed
# per-step overhead) again. Swept PER KERNEL at the flagship shape: a
# uniform bpb=2 is a net LOSS (266 vs 249 ms/step) -- the doubled f32
# band + unskew temporaries push the dq/dE kernel past the 64 MB scoped
# budget and degrade DMA/compute overlap more than the halved step count
# saves. Per-kernel sweep (scripts/perf_bpb_sweep.py, ms/layer incl. the
# timed chain's fwd): fwd 3.29 -> 3.16 at bpb=2, dkdv 6.29 -> 6.08, dqde
# 7.64 -> 8.46 (worse; its band + unskew temps double), bpb=4 exceeds
# VMEM everywhere. Defaults = the winners; env knobs for re-sweeps
# (MIDI_EMOTION_BPB_FWD / _DQDE / _DKDV).
import os as _os_bpb

BATCH_PER_BLOCK = {
    "fwd": int(_os_bpb.environ.get("MIDI_EMOTION_BPB_FWD", "2")),
    "dqde": int(_os_bpb.environ.get("MIDI_EMOTION_BPB_DQDE", "1")),
    "dkdv": int(_os_bpb.environ.get("MIDI_EMOTION_BPB_DKDV", "2")),
    # the combined dK/dV+dq kernel adds a [n, Tp, dh] f32 scratch and a
    # [bpb, hpb, Tp, dh] out block; bpb=2 overflows the 80 MB scoped
    # budget there, so it gets its own knob
    "dkdvdq": int(_os_bpb.environ.get("MIDI_EMOTION_BPB_DKDVDQ", "1")),
}

# Mosaic's default scoped-VMEM budget is 16 MB; v5e has 128 MB of physical
# VMEM, and the head-batched blocks (band + roll temps + f32 score tiles)
# legitimately need more. 64 MB leaves plenty for double-buffered DMA.
VMEM_LIMIT = int(
    _os_blk.environ.get("MIDI_EMOTION_VMEM_MB", "64")
) * 1024 * 1024
# The dq/dE backward at bpb=2 x hpb=16 holds the band AND its unskew
# temporary (2 x [32, 256, 512] f32 = 33.6 MB) plus the score/ds tiles --
# measured 64.96 MB of scoped stack, just past the shared budget. Its
# block inputs are ~5 MB total, so an 80 MB scoped budget still leaves
# >40 MB for double-buffered DMA on the 128 MB part.
VMEM_LIMIT_BWD = int(
    _os_blk.environ.get("MIDI_EMOTION_VMEM_BWD_MB", "80")
) * 1024 * 1024

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

# dq/dE backward kernel:
#   "column" -- key-column formulation with the 2*log2(bq)-pass static
#               unskew adjoint (default)
#   "dist"   -- distance-domain formulation: no unskew at all (three
#               +1-strided rolls; see _bwd_dq_de_dist_kernel). MEASURED AT
#               PARITY with "column" on v5e (7.48 vs 7.52 ms incl. fwd,
#               scripts/perf_bwd_breakdown.py): the extra L-wide exp, two
#               rolls, and three extra MXU dots cost exactly what the
#               unskew passes saved. Kept as the documented negative
#               result + the only path that avoids the adjoint shear.
DQDE_IMPL = _os.environ.get("MIDI_EMOTION_DQDE", "column")

# Backward decomposition:
#   "merged" -- ONE kernel for everything: the dK/dV sweep's ds is
#               column-reversed on the MXU (ds @ anti-identity, exact in
#               bf16) and +1-stride-rolled into the distance domain, so
#               dE + dq_rel ride the same sweep as dK/dV/dq_qk. No second
#               softmax recompute, no unskew adjoint, and -- unlike
#               "split" -- no XLA K/V reversals and no separate dq add
#               (see _bwd_merged_kernel)
#   "split"  -- dq_qk rides the dK/dV sweep and dE + dq_rel come from the
#               distance-domain kernel over XLA-reversed K/V
#   "fused"  -- the r2 two-kernel layout: dq/dE fused (with the
#               2*log2(bq)-pass static unskew), dK/dV separate
BWD_IMPL = _os.environ.get("MIDI_EMOTION_BWD", "merged")

# Softmax exponent implementation (fwd p/alpha + every bwd recompute):
#   "f32"  -- jnp.exp on the f32 scores (default)
#   "bf16" -- exp on bf16-rounded (s - m): p is consumed bf16 by the PV
#             dot anyway; halves the transcendental width if Mosaic has
#             a native bf16 exp path
#   "skip" -- p := s - m (WRONG numerics; perf ablation only)
EXP_IMPL = _os.environ.get("MIDI_EMOTION_EXP", "f32")


def _pexp(x):
    """exp with the EXP_IMPL policy; returns f32."""
    if EXP_IMPL == "bf16":
        return jnp.exp(x.astype(jnp.bfloat16)).astype(jnp.float32)
    if EXP_IMPL == "skip":  # ablation: no transcendental at all
        return x
    return jnp.exp(x)


# MXU/VPU interleaving: split the kernel's batched-n axis into this many
# INDEPENDENT chains and emit their ops interleaved (all chains' score
# dots first, then per chain softmax + PV). In-train SREL ablations showed
# the kernels' MXU and VPU tiers are fully ADDITIVE (removing the band dot
# saved exactly its MXU-bound time; removing the skew saved exactly its
# VPU time), i.e. the single dependence chain serializes the units; with
# independent chains the hardware's async MXU queues can run one chain's
# dots under another chain's softmax. 1 = the unsplit baseline.
# SWEPT r5 at the flagship train shape (B=8, T=1216, chunked best-of-3):
# chains 1/2/4 = 160.9/161.8/161.5 ms/step -- a WASH. Either Mosaic's
# scheduler already overlaps the issue queues across the written program
# order, or the fwd kernel's VPU tier (skew + online softmax) is not
# actually shadowable under these block shapes. Keep 1.
FWD_CHAINS = int(_os.environ.get("MIDI_EMOTION_FWD_CHAINS", "1"))

# ---------------------------------------------------------------------------
# Env-knob validation. A typo'd string knob must NOT silently select a
# fallback branch (MIDI_EMOTION_BWD=mergd would otherwise run the legacy
# "fused" path), and malformed numeric knobs must fail HERE with the knob
# name instead of deep inside Mosaic -- mis-sized blocks reach the TPU as
# out-of-bounds DMAs, the same crash-the-worker class the decode kernel's
# block guard closes (ops/decode_attention.py).
_STRING_KNOBS = {
    "MIDI_EMOTION_SKEW": (SKEW_IMPL, ("strided", "static")),
    "MIDI_EMOTION_DQDE": (DQDE_IMPL, ("column", "dist")),
    "MIDI_EMOTION_BWD": (BWD_IMPL, ("merged", "split", "fused")),
    "MIDI_EMOTION_EXP": (EXP_IMPL, ("f32", "bf16", "skip")),
}


def _validate_knobs() -> None:
    for name, (value, allowed) in _STRING_KNOBS.items():
        if value not in allowed:
            raise ValueError(
                f"{name}={value!r}: must be one of {allowed}"
            )
    for name, value in (
        ("MIDI_EMOTION_BQ_FWD", BLOCK_Q_FWD),
        ("MIDI_EMOTION_BK_FWD", BLOCK_K_FWD),
        ("MIDI_EMOTION_BQ_BWD", BLOCK_Q_BWD),
        ("MIDI_EMOTION_BK_BWD", BLOCK_K_BWD),
    ):
        # 0 = inherit the defaults; otherwise the block lands on the lane
        # axis of the kernel operands, so it must be a positive multiple
        # of the 128-lane tile
        if value and (value < 0 or value % 128):
            raise ValueError(
                f"{name}={value}: block sizes must be positive multiples "
                f"of 128 (or 0 to inherit)"
            )
    for kind, value in BATCH_PER_BLOCK.items():
        if not 1 <= value <= 64:
            raise ValueError(
                f"MIDI_EMOTION_BPB_{kind.upper()}={value}: batch rows per "
                f"grid step must be in [1, 64]"
            )
    for name, value in (
        ("MIDI_EMOTION_VMEM_MB", VMEM_LIMIT // (1024 * 1024)),
        ("MIDI_EMOTION_VMEM_BWD_MB", VMEM_LIMIT_BWD // (1024 * 1024)),
    ):
        # v5e has 128 MB of physical VMEM; a scoped budget beyond it (or
        # non-positive) is a guaranteed Mosaic failure
        if not 1 <= value <= 128:
            raise ValueError(f"{name}={value}: must be in [1, 128] (MB)")
    if FWD_CHAINS < 1:
        raise ValueError(
            f"MIDI_EMOTION_FWD_CHAINS={FWD_CHAINS}: must be >= 1"
        )
    flash_bwd = _os.environ.get("MIDI_EMOTION_FLASH_BWD", "pallas")
    if flash_bwd not in ("pallas", "xla"):
        raise ValueError(
            f"MIDI_EMOTION_FLASH_BWD={flash_bwd!r}: must be 'pallas' or 'xla'"
        )


_validate_knobs()


def _dot(a, b, dims):
    """dot_general in the INPUT dtype with f32 accumulation: bf16 inputs
    keep the MXU at full rate (a f32 upcast before the dot quarters it)."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _scaled(x, scale):
    """x * scale, elided statically when the launcher pre-scaled q.

    The impl wrappers multiply q by 1/sqrt(dh) OUTSIDE the kernel (it
    fuses into the pad/transpose fusion XLA emits anyway) and pass
    scale=1.0, turning every band-wide `* scale` VPU pass in here into a
    no-op. The backward stays exact without fixups except dq: with
    q' = q*c the logits are u = q'k + skew(q'E), so dk = q' @ dL/du and
    dE = dsd^T @ q' already carry the c factor, while dq needs one
    post-multiply by c (done in _flash_bwd_from_saved, fused by XLA into
    the output slice/transpose)."""
    return x if scale == 1.0 else x * scale


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


def _pad_mask_rows(pad_ref, koff, bk, bpb, hpb):
    """[bpb, 1, Tp] pad block -> [bpb*hpb, 1, bk] bool (per-batch pad rows
    repeated per head to line up with the merged (bpb*hpb) batch axis)."""
    pads = pad_ref[:, 0, pl.ds(koff, bk)] != 0  # [bpb, bk]
    return jnp.repeat(pads, hpb, axis=0)[:, None, :]


def _load_T(ref):
    """[bpb, hpb, dh, bl] block (time-on-lanes layout) -> [n, bl, dh].

    The fwd and merged-bwd kernels take q/k/v/do with TIME on the lane
    axis: that is the physical layout XLA's projection GEMMs already
    produce ([B][H][dh][Tp]), so requesting it removes one layout copy
    per operand per layer (~8 copies = ~8 ms/step at the flagship shape)
    AND the HBM tile padding of the dh=48 minor dim to 128 lanes (2.67x
    block DMA bytes).

    ONLY q goes through this relayout (the band and dE dots need rows on
    sublanes); transposing every operand at load was measured a WASH --
    the per-block relayouts cost the ~8 ms the copies saved. All other
    contractions run on the raw [n, dh, bl] blocks with transposed
    dimension numbers (dh as lanes x sublanes is the MXU-native pair,
    A@B^T lowers natively; probed in scripts/perf_tlayout.py --forms),
    which measured FASTER than the old both-operands-lanes contraction:
    175.6 -> 159.9 ms/step at the flagship shape."""
    bpb, hpb, dh, bl = ref.shape
    return jnp.transpose(ref[:].reshape(bpb * hpb, dh, bl), (0, 2, 1))


def _store_T(ref, arr):
    """[n, bl, dh] -> transposed into a [bpb, hpb, dh, bl] block ref."""
    bpb, hpb, dh, bl = ref.shape
    ref[:] = jnp.transpose(arr, (0, 2, 1)).astype(ref.dtype).reshape(
        bpb, hpb, dh, bl
    )


def _flash_kernel(
    smap_ref,  # scalar-prefetch [4, V] int32: iq, ik, row-start, row-end
    q_ref,  # [bpb, hpb, dh, bq] (time-on-lanes; see _load_T)
    k_ref,  # [bpb, hpb, dh, bk]
    v_ref,  # [bpb, hpb, dh, bk]
    e_ref,  # [max_seq + bk, dh] (zero-padded tail)
    pad_ref,  # [bpb, 1, Tp] int32 -- 1 where key is pad (full row per batch)
    o_ref,  # [bpb, hpb, dh, bq]
    lse_ref,  # [bpb, hpb, 1, Tp] f32 -- per-row logsumexp (for backward;
              # the extra unit dim keeps the block's last-two dims (1, Tp),
              # legal for ANY hpb -- (hpb, Tp) needs hpb % 8 == 0)
    m_scr,  # [bpb*hpb, bq, 1] f32
    l_scr,  # [bpb*hpb, bq, 1] f32
    acc_scr,  # [bpb*hpb, bq, dh] f32
    q_scr,  # [bpb*hpb, bq, dh] model dtype -- cached q relayout (see below)
    *,
    bq: int,
    bk: int,
    max_seq: int,
    scale: float,
    causal: bool,
):
    t = pl.program_id(2)
    iq = smap_ref[0, t]
    ik = smap_ref[1, t]
    bpb, hpb, dh, _ = q_ref.shape
    n = bpb * hpb

    @pl.when(smap_ref[2, t] == 1)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)
        # ONLY q needs the rows-on-sublanes relayout (the band dot wants
        # it); the q block is constant across this row's whole inner-ik
        # sweep ("qk" grid order), so transpose it ONCE at row start
        # instead of paying the VPU shuffle every grid step.
        q_scr[:] = _load_T(q_ref)

    # every enumerated block pair is visible (_grid_maps skips the fully
    # masked ones), so the body runs unconditionally.
    # k and v stay in the loaded [n, dh, bl] layout and the dots contract
    # their lane axis directly (A @ B^T lowers natively on the MXU;
    # scripts/perf_tlayout.py --forms)
    q = q_scr[:]  # [n, bq, dh], model dtype (bf16 stays bf16)
    kT = k_ref[:].reshape(n, dh, bk)
    vT = v_ref[:].reshape(n, dh, bk)

    a = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 1) + iq * bq
    b = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 2) + ik * bk
    koff = pl.multiple_of(ik * bk, bk)
    pad_rows = _pad_mask_rows(pad_ref, koff, bk, bpb, hpb)
    e_slice = None
    if SREL_MODE != "off":
        # relative bias: contiguous E slice for this block-pair's
        # distances; the skew runs in the input dtype (bf16 halves its
        # VMEM traffic)
        start = max_seq - iq * bq + ik * bk - bq
        e_slice = e_ref[pl.ds(start, bq + bk), :].astype(q.dtype)

    nc = FWD_CHAINS if (FWD_CHAINS > 0 and n % FWD_CHAINS == 0) else 1
    nh = n // nc
    csl = [slice(c * nh, (c + 1) * nh) for c in range(nc)]

    # stage 1: ALL chains' score/band dots (MXU) issue back to back, so
    # they can run under stage 2's softmax chains (see FWD_CHAINS)
    ss, bands = [], []
    for sl in csl:
        # contraction dh: q on lanes, kT on sublanes -- MXU-native pair
        ss.append(_bdot(q[sl], kT[sl], ((2,), (1,))))  # [nh, bq, bk] f32
        if SREL_MODE != "off":
            bands.append(_dot(q[sl], e_slice, ((2,), (1,))))

    # stage 2: per chain skew + mask + online softmax (VPU) + PV (MXU)
    for c, sl in enumerate(csl):
        s = ss[c]
        if SREL_MODE != "off":
            band = bands[c]
            if SKEW_IMPL != "strided":
                band = band.astype(q.dtype)  # halves static-roll traffic
            if SREL_MODE == "full":
                srel = _skew_band(band, bq, bk).astype(jnp.float32)
            else:  # "noskew" ablation: wrong numerics, no rolls
                srel = band[..., :bk].astype(jnp.float32)
            if not causal:
                # zero above the diagonal (j > i), matching the reference
                # exactly -- this matters for the unmasked regression
                # model. Causal runs skip the select: those positions get
                # NEG_INF from the mask below, so the srel garbage there
                # is dead.
                srel = jnp.where(b <= a, srel, 0.0)
            s = s + srel

        s = _scaled(s, scale)

        masked = pad_rows[sl]  # [nh, 1, bk]
        if causal:
            masked = masked | (b > a)
        s = jnp.where(masked, NEG_INF, s)

        # online softmax
        m_prev = m_scr[sl]  # [nh, bq, 1]
        m_cur = jnp.max(s, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = _pexp(s - m_new)  # [nh, bq, bk]
        alpha = _pexp(m_prev - m_new)  # [nh, bq, 1]
        l_scr[sl] = l_scr[sl] * alpha + jnp.sum(p, axis=2, keepdims=True)
        # p in the input dtype for the MXU; acc stays f32
        acc_scr[sl] = acc_scr[sl] * alpha + _bdot(
            p.astype(vT.dtype), vT[sl], ((2,), (2,))
        )
        m_scr[sl] = m_new

    @pl.when(smap_ref[3, t] == 1)
    def _finalize():
        denom = l_scr[:]
        # fully-masked rows (all keys pad) -> reference softmax yields NaN;
        # we output 0 instead (those rows are pad positions, loss-masked)
        safe = jnp.where(denom > 0.0, denom, 1.0)
        _store_T(o_ref, acc_scr[:] / safe)
        # lse = m + log(l); empty rows get +BIG so the backward's
        # exp(s - lse) recomputation yields exactly 0 for them
        lse = jnp.where(
            denom > 0.0, m_scr[:] + jnp.log(safe), jnp.float32(1e30)
        )
        lse_ref[:, :, 0, pl.ds(iq * bq, bq)] = lse[:, :, 0].reshape(
            bpb, hpb, bq
        )


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def padded_len(T: int) -> int:
    """Sequence length the flash kernels run at for an input of length T.

    Callers that pre-pad their q/k/v to this length (and extend pad_keys
    with True over the tail) skip _prepare's per-tensor pads -- which run
    on the [B, H, T, dh] layout where dh=48 is HBM-padded to 128 lanes
    (2.7x the bytes of a pre-transpose [B, T, d_model] pad). The model's
    attention module does this when the pallas impl is selected."""
    return _round_up(
        T,
        math.lcm(BLOCK_Q, BLOCK_K, BLOCK_Q_FWD or BLOCK_Q,
                 BLOCK_K_FWD or BLOCK_K, BLOCK_Q_BWD or BLOCK_Q,
                 BLOCK_K_BWD or BLOCK_K),
    )


@functools.lru_cache(maxsize=128)
def _grid_maps(nq: int, nk: int, bq: int, bk: int, causal: bool, order: str):
    """Enumerate the VISIBLE (q-block, k-block) pairs as a flat list.

    The dense causal grid wastes ~40% of its steps on fully-masked block
    pairs -- and at this model's dh=48 the fixed per-grid-step cost (block
    DMA + Mosaic step overhead, ~2-4 us) dwarfs the block math, so those
    steps are pure loss. Instead the launchers below run a 1-D grid over
    only the visible pairs and recover (iq, ik) per step from a
    scalar-prefetch map (the splash-attention trick; index maps receive
    the scalar ref after the grid indices).

    Returns an int32 [4, V] array: rows are
      0: iq   1: ik (or ikr for order "q_rev")   2: row-start flag
      3: row-end flag
    where a "row" is the axis the kernel's VMEM scratch accumulates over
    (inner axis), so flags 2/3 drive init/finalize in-kernel.

      order "qk":    outer iq, inner ik ascending 0..last(iq)  (fwd)
      order "kq":    outer ik, inner iq ascending start(ik)..nq-1 (dK/dV)
      order "q_rev": outer iq, inner ikr ascending; ik = nk-1-ikr
                     descends last(iq)..0 (distance-domain dE kernel)

    Non-causal callers get the dense enumeration in the same layout, so
    kernels have a single code path.
    """
    import numpy as _np

    rows = []
    if order in ("qk", "q_rev"):
        for iq in range(nq):
            last = (
                min(nk - 1, (iq * bq + bq - 1) // bk) if causal else nk - 1
            )
            inner = range(last + 1)
            if order == "q_rev":
                inner = range(nk - 1 - last, nk)  # ikr ascending
            inner = list(inner)
            for j, ikx in enumerate(inner):
                rows.append((iq, ikx, j == 0, j == len(inner) - 1))
    elif order == "kq":
        for ik in range(nk):
            start = (ik * bk) // bq if causal else 0
            inner = list(range(start, nq))
            for j, iq in enumerate(inner):
                rows.append((ik, iq, j == 0, j == len(inner) - 1))
    else:
        raise ValueError(order)
    return _np.asarray(rows, _np.int32).T.copy()


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


def _prepare_T(q, k, v, e, causal, pad_keys, bq, bk):
    """_prepare for the TIME-ON-LANES kernel layout: q/k/v arrive in the
    public [B, H, T, dh] shape and leave as [B, H, dh, Tp]. The swapaxes
    here is a LOGICAL transpose into the physical layout the projection
    GEMMs already emit ([B][H][dh][Tp]), so XLA lowers it as a bitcast
    instead of the ~0.05 ms/tensor copy the old layout forced; the pad
    lands on the lane axis whose tiles carry no 48->128 padding."""
    B, H, T, dh = q.shape
    max_seq = e.shape[0]
    assert T <= max_seq, (T, max_seq)
    Tp = _round_up(T, math.lcm(bq, bk))
    pad_t = Tp - T

    def t_pad(x):
        xt = jnp.swapaxes(x, 2, 3)
        if pad_t:
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
        return xt

    qt, kt, vt = t_pad(q), t_pad(k), t_pad(v)
    if pad_keys is None:
        pk = jnp.zeros((B, Tp), jnp.int32)
    else:
        pk = jnp.pad(pad_keys.astype(jnp.int32), ((0, 0), (0, pad_t)))
    if pad_t:
        pk = pk.at[:, T:].set(1)
    pk = pk[:, None, :]  # [B, 1, Tp] -- keeps the block tiling legal

    e_pad = jnp.pad(e.astype(jnp.float32), ((pad_t, 0), (0, 0)))
    tail = Tp if not causal else bq + bk
    e_pad = jnp.pad(e_pad, ((0, tail), (0, 0)))

    return (qt, kt, vt, e_pad, pk, Tp, pad_t, t_pad)


def _auto_fwd_bk(T: int, bq: int) -> int:
    """Forward k-block width: 640 when it costs no extra padding, else
    BLOCK_K. Swept at the flagship shape (B=8, T=1216 -> Tp=1280): the
    fwd grid's fixed per-step cost dominates its block math at dh=48, and
    (bq=256, bk=640) at batch-per-block 1 cut the train step 159.0 ->
    156.6 ms; (640, 256) fails to compile at the 64 MB scoped budget,
    (640, 640) and (256, 1280) measured 161 ms, and bk=640 at bpb=2 needs
    a 100 MB budget and still regresses (161.7). The backward keeps
    (256, 256): its dsp/band temporaries and the bk x bk reversal dot
    scale with bk and 640 there measured 183.6 ms (vs 156.6)."""
    cand = 640
    if (
        T >= cand
        and _round_up(T, math.lcm(bq, cand)) == _round_up(T, math.lcm(bq, BLOCK_K))
    ):
        return cand
    return BLOCK_K


def _heads_per_block(H: int) -> int:
    hpb = min(HEADS_PER_BLOCK, H)
    while H % hpb:
        hpb -= 1
    return hpb


def _batch_per_block(B: int, kind: str = "fwd") -> int:
    bpb = min(BATCH_PER_BLOCK[kind], B)
    while B % bpb:
        bpb -= 1
    return bpb


def _flash_fwd_impl(
    q, k, v, e, causal, pad_keys, bq: Optional[int] = None,
    bk: Optional[int] = None, return_lse: bool = False,
    return_saved: bool = False,
):
    """q,k,v: [B,H,T,dh]; e: [max_seq, dh]; pad_keys: [B,T] bool or None."""
    bq = bq or BLOCK_Q_FWD or BLOCK_Q
    bk = bk or BLOCK_K_FWD or _auto_fwd_bk(q.shape[2], bq)
    B, H, T, dh = q.shape
    max_seq = e.shape[0]
    # pre-scale q so the kernel runs scale-free (see _scaled); the
    # multiply fuses into the transpose/pad fusion _prepare_T costs anyway
    q = q * jnp.asarray(1.0 / math.sqrt(dh), q.dtype)
    qf, kf, vf, e_pad, pk, Tp, pad_t, _ = _prepare_T(
        q, k, v, e, causal, pad_keys, bq, bk
    )
    hpb = _heads_per_block(H)
    bpb = _batch_per_block(B, "fwd")
    if bk > BLOCK_K:
        # wide k-blocks already fill the step; doubling the batch per
        # block on top blows the scoped-VMEM budget (see _auto_fwd_bk)
        bpb = 1

    smap = jnp.asarray(_grid_maps(Tp // bq, Tp // bk, bq, bk, causal, "qk"))
    V = smap.shape[1]
    in_specs = [
        pl.BlockSpec((bpb, hpb, dh, bq),
                     lambda b, ih, t, s: (b, ih, 0, s[0, t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, hpb, dh, bk),
                     lambda b, ih, t, s: (b, ih, 0, s[1, t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, hpb, dh, bk),
                     lambda b, ih, t, s: (b, ih, 0, s[1, t]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad, full
        pl.BlockSpec((bpb, 1, Tp), lambda b, ih, t, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(
        _flash_kernel, bq=bq, bk=bk,
        max_seq=max_seq + pad_t,  # front padding shifts distance origin
        scale=1.0, causal=causal,  # q arrives pre-scaled (see above)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bpb, H // hpb, V),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bpb, hpb, dh, bq),
                         lambda b, ih, t, s: (b, ih, 0, s[0, t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpb, hpb, 1, Tp),
                         lambda b, ih, t, s: (b, ih, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bpb * hpb, bq, 1), jnp.float32),
            pltpu.VMEM((bpb * hpb, bq, 1), jnp.float32),
            pltpu.VMEM((bpb * hpb, bq, dh), jnp.float32),
            pltpu.VMEM((bpb * hpb, bq, dh), qf.dtype),
        ],
    )
    outf, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, H, dh, Tp), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Tp), jnp.float32),
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * Tp * (2 * dh + bq + bk)
            // (2 if causal else 1),
            bytes_accessed=4 * B * H * Tp * dh * 4,
            transcendentals=B * H * Tp * Tp,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(smap, qf, kf, vf, e_pad, pk)
    # back to the public [B, H, T, dh] shape -- a logical swap XLA folds
    # into the consumer's layout choice, not a forced copy
    out = jnp.swapaxes(outf, 2, 3)
    out = out[:, :, :T, :] if pad_t else out
    if return_saved:
        # padded operands + padded output become the custom-vjp residuals
        # (in kernel layout), so the backward never re-pads or re-copies
        # q/k/v/out; the ~5% padded tails cost only activation memory
        return out, lse, (qf, kf, vf, pk, outf)
    if return_lse:
        return out, lse
    return out


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _recompute_block(q, k, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq,
                     scale, causal, k_transposed=False):
    """Recompute P and the (a, b) index grids for one block pair.

    q: [n, bq, dh]; k: [n, bk, dh] (or [n, dh, bk] with k_transposed --
    the time-on-lanes kernels pass the raw block and the dot contracts
    dh as q-lanes vs k-sublanes, the MXU-native pair); lse_row:
    [n, bq, 1]; pad_mask: bool, broadcastable to [n, bq, bk]."""
    s = _bdot(q, k, ((2,), (1,) if k_transposed else (2,)))  # [n, bq, bk]
    start = max_seq - iq * bq + ik * bk - bq
    e_slice = e_ref[pl.ds(start, bq + bk), :].astype(q.dtype)
    band = _dot(q, e_slice, ((2,), (1,)))
    if SKEW_IMPL != "strided":
        band = band.astype(q.dtype)
    srel = _skew_band(band, bq, bk).astype(jnp.float32)
    a = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 1) + iq * bq
    b = jax.lax.broadcasted_iota(jnp.int32, (1, bq, bk), 2) + ik * bk
    if not causal:
        # see _flash_kernel: causal runs let the NEG_INF mask below kill
        # the above-diagonal srel values instead of a band-wide select
        srel = jnp.where(b <= a, srel, 0.0)
    s = _scaled(s + srel, scale)
    masked = pad_mask
    if causal:
        masked = masked | (b > a)
    s = jnp.where(masked, NEG_INF, s)
    p = _pexp(s - lse_row)  # [n, bq, bk]; exactly 0 on masked rows
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
        bpb, hpb, _, dh = q_ref.shape
        n = bpb * hpb
        q = q_ref[:].reshape(n, bq, dh)
        k = k_ref[:].reshape(n, bk, dh)
        v = v_ref[:].reshape(n, bk, dh)
        do = do_ref[:].reshape(n, bq, dh)
        lse_row = lse_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
        d_row = dsum_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
        pad_mask = _pad_mask_rows(pad_ref, ik * bk, bk, bpb, hpb)
        p, e_slice, a, b, start = _recompute_block(
            q, k, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq, scale,
            causal,
        )
        dp = _bdot(do, v, ((2,), (2,)))
        ds_f32 = _scaled(p * (dp - d_row), scale)  # [n, bq, bk]
        ds = ds_f32.astype(q.dtype)
        dq_scr[:] += _bdot(ds, k, ((2,), (1,)))
        # the unskew runs in the input dtype (static slice+concat rolls)
        dsrel = jnp.where(b <= a, ds, jnp.zeros((), ds.dtype))
        dband = _unskew_band(dsrel, bq, bk)  # [n, bq, bq+bk]
        dq_scr[:] += _dot(dband, e_slice, ((2,), (0,)))
        de_blk = jax.lax.dot_general(
            dband, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n, bq+bk, dh]
        de_scr[pl.ds(start, bq + bk), :] += jnp.sum(de_blk, axis=0)

    last = (iq * bq + bq - 1) // bk if causal else pl.num_programs(3) - 1

    @pl.when(ik == last)
    def _():
        bpb, hpb, _, dh = q_ref.shape
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype).reshape(bpb, hpb, bq, dh)

    @pl.when(
        (ib == pl.num_programs(0) - 1)
        & (ih == pl.num_programs(1) - 1)
        & (iq == pl.num_programs(2) - 1)
        & (ik == pl.num_programs(3) - 1)
    )
    def _():
        de_ref[:] = de_scr[:]


def _bwd_dq_de_dist_kernel(
    q_ref, k_ref, kr_ref, v_ref, vr_ref, do_ref, lse_ref, dsum_ref,
    e_ref, er_ref, pad_ref, padr_ref,
    dq_ref, der_ref, dq_scr, der_scr,
    *, bq, bk, max_seq, scale, causal, nk, F,
):
    """dq + dE with NO unskew: the distance-domain formulation.

    The adjoint of the skew is a negative-per-row-stride shear that Mosaic
    cannot lower (scripts/probe_mosaic_ops.py: rev, negative-stride roll,
    and lane gather all fail), and the static decomposition costs
    2*log2(bq) VPU passes over the [bq, bq+bk] band -- measured at
    ~1.6 ms/layer of the 4.2 ms dq/dE tier (scripts/perf_bwd_breakdown).

    Key identity: index score entries by DISTANCE d = i - j instead of by
    key column. With the key block COLUMN-REVERSED (kr/vr, flipped along
    time in XLA), the within-block coordinate c = a + b' satisfies
    d = c + doff, so in the [bq, bq+bk] distance layout

      * the relative bias is COLUMN-PURE: srel_d[a, c] = q[a] . E[ms-1-d(c)]
        = (q @ E_rev_slice)[a, c] -- a plain matmul, NO skew;
      * scores and dP enter via ONE +1-strided roll each
        (qkd[a, c] = qk'[a, c-a], the lowerable direction);
      * dq_rel = dsd @ E_rev_slice and dE_rev[c] += sum_a dsd[a, c] q[a]
        are plain contractions over the distance axis.

    dq_qk = ds @ k still needs ds in the key-column layout, which the
    normal branch recomputes exactly as the forward does (one +1-strided
    skew). Net: three +1 rolls total, zero adjoint shears.
    """
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    iq = pl.program_id(2)
    ikr = pl.program_id(3)
    ik = nk - 1 - ikr
    hpb = q_ref.shape[1]
    L = bq + bk

    @pl.when(ikr == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when((ib == 0) & (ih == 0) & (iq == 0) & (ikr == 0))
    def _():
        der_scr[:] = jnp.zeros_like(der_scr)

    visible = (ik * bk <= iq * bq + bq - 1) if causal else (ikr >= 0)

    @pl.when(visible)
    def _():
        q = q_ref[0]  # [hpb, bq, dh]
        k = k_ref[0]
        v = v_ref[0]
        kr = kr_ref[0]
        vr = vr_ref[0]
        do = do_ref[0]
        lse_row = lse_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        d_row = dsum_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
        pad_mask = (pad_ref[0, 0, pl.ds(ik * bk, bk)] != 0)[None, None, :]
        padr_row = padr_ref[0, 0, pl.ds(ikr * bk, bk)]

        # ---- normal branch: ds in key-column layout -> dq_qk ----------
        p, _, _, _, _ = _recompute_block(
            q, k, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq, scale,
            causal,
        )
        dp = _bdot(do, v, ((2,), (2,)))
        ds = _scaled(p * (dp - d_row), scale).astype(q.dtype)
        dq_scr[:] += _bdot(ds, k, ((2,), (1,)))

        # ---- distance branch: dsd -> dq_rel + dE ----------------------
        doff = iq * bq - (nk - ikr) * bk + 1  # d(c) = c + doff
        qkp = _bdot(q, kr, ((2,), (2,)))  # [hpb, bq, bk] f32
        qkp = jnp.where(padr_row[None, None, :] != 0, NEG_INF, qkp)
        qkp = jnp.concatenate(
            [qkp, jnp.full((hpb, bq, bq), NEG_INF, jnp.float32)], axis=-1
        )
        # roll row a right by a: qkd[a, c] = qk'[a, c - a]; the wrapped
        # region lands on the NEG_INF padding, so p_d vanishes there
        qkd = pltpu.roll(qkp, 0, 2, stride=1, stride_axis=1)
        er_slice = er_ref[pl.ds(F + doff, L), :].astype(q.dtype)
        band_rev = _dot(q, er_slice, ((2,), (1,)))  # [hpb, bq, L] f32
        dist = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) + doff
        srel_d = jnp.where(dist >= 0, band_rev, 0.0)  # qe-mask: d<0 -> 0
        s_d = _scaled(qkd + srel_d, scale)
        if causal:
            s_d = jnp.where(dist < 0, NEG_INF, s_d)
        p_d = _pexp(s_d - lse_row)  # [hpb, bq, L]
        dpp = _bdot(do, vr, ((2,), (2,)))  # [hpb, bq, bk]
        dpp = jnp.concatenate(
            [dpp, jnp.zeros((hpb, bq, bq), jnp.float32)], axis=-1
        )
        dpd = pltpu.roll(dpp, 0, 2, stride=1, stride_axis=1)
        dsd = _scaled(p_d * (dpd - d_row), scale).astype(q.dtype)
        dq_scr[:] += _dot(dsd, er_slice, ((2,), (0,)))
        de_blk = jax.lax.dot_general(
            dsd, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [hpb, L, dh]
        der_scr[pl.ds(F + doff, L), :] += jnp.sum(de_blk, axis=0)

    @pl.when(ikr == nk - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when(
        (ib == pl.num_programs(0) - 1)
        & (ih == pl.num_programs(1) - 1)
        & (iq == pl.num_programs(2) - 1)
        & (ikr == pl.num_programs(3) - 1)
    )
    def _():
        der_ref[:] = der_scr[:]


def _bwd_dq_de_dist_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common,
                         bq, bk, hpb, Tp):
    """Launch the distance-domain dq/dE kernel (see its docstring)."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    nk = Tp // bk
    m_eff = common["max_seq"]  # front-padded table height
    F = Tp  # front zeros of the reversed table: covers doff >= 1 - Tp
    e_eff = e_pad[:m_eff]
    er_pad = jnp.concatenate(
        [
            jnp.zeros((F, dh), jnp.float32),
            e_eff[::-1],
            jnp.zeros((bq + bk, dh), jnp.float32),
        ],
        axis=0,
    )  # row F + d holds E_eff[m_eff - 1 - d]
    n_rev = er_pad.shape[0]
    kr = jnp.flip(kf, axis=2)
    vr = jnp.flip(vf, axis=2)
    padr = jnp.flip(pk, axis=-1)

    qspec = pl.BlockSpec((1, hpb, bq, dh), lambda b, ih, iq, ikr: (b, ih, iq, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec(
        (1, hpb, bk, dh),
        lambda b, ih, iq, ikr: (b, ih, nk - 1 - ikr, 0),
        memory_space=pltpu.VMEM,
    )
    krspec = pl.BlockSpec((1, hpb, bk, dh),
                          lambda b, ih, iq, ikr: (b, ih, ikr, 0),
                          memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, hpb, 1, Tp), lambda b, ih, iq, ikr: (b, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    padspec = pl.BlockSpec((1, 1, Tp), lambda b, ih, iq, ikr: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        qspec,  # q
        kspec,  # k (normal order via reversed index map)
        krspec,  # k reversed
        kspec,  # v
        krspec,  # v reversed
        qspec,  # do
        rowspec,  # lse
        rowspec,  # dsum
        pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad
        pl.BlockSpec(memory_space=pltpu.VMEM),  # er_pad
        padspec,  # pad rows
        padspec,  # pad rows reversed
    ]
    dq, der = pl.pallas_call(
        functools.partial(_bwd_dq_de_dist_kernel, **common, nk=nk, F=F),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), qf.dtype),
            jax.ShapeDtypeStruct((n_rev, dh), jnp.float32),
        ),
        grid=(B, H // hpb, Tp // bq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hpb, bq, dh),
                         lambda b, ih, iq, ikr: (b, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hpb, bq, dh), jnp.float32),
            pltpu.VMEM((n_rev, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(qf, kf, kr, vf, vr, dof, lse, dsum, e_pad, er_pad, pk, padr)
    # distance rows back to table rows: row r of the (front-padded) table
    # is distance d = m_eff - 1 - r at er row F + d
    de_pad = jnp.flip(der[F : F + m_eff], axis=0)
    return dq, de_pad


def _bwd_dkdv_dq_kernel(
    smap_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, e_ref, pad_ref,
    dk_ref, dv_ref, dqk_ref, dk_scr, dv_scr, dq_scr,
    *, bq, bk, max_seq, scale, causal,
):
    """dK/dV **plus the dq_qk term** in one sweep (the "split" backward).

    The key observation behind the split: this kernel already recomputes
    P and ds for every visible block pair, so ``dq_qk[a] += ds @ k`` is
    one extra MXU dot (~0.4 us/block) against a persistent [n, Tp, dh]
    f32 scratch -- vs the fused dq/dE kernel paying a FULL second
    softmax recompute (2 dots + skew + exp) just to have ds in q-row
    layout. The relative-position terms (dq_rel, dE) then come from the
    distance-domain kernel (_bwd_de_dqrel_kernel), which needs no unskew
    adjoint at all. Net: the 2*log2(bq)-pass static unskew AND one of the
    two softmax recomputes vanish from the backward."""
    t = pl.program_id(2)
    ik = smap_ref[0, t]
    iq = smap_ref[1, t]

    @pl.when(smap_ref[2, t] == 1)  # first visible iq of this k-block row
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(t == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    # all enumerated pairs are visible (_grid_maps) -- body unconditional
    bpb, hpb, _, dh = q_ref.shape
    n = bpb * hpb
    q = q_ref[:].reshape(n, bq, dh)
    k = k_ref[:].reshape(n, bk, dh)
    v = v_ref[:].reshape(n, bk, dh)
    do = do_ref[:].reshape(n, bq, dh)
    lse_row = lse_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
    d_row = dsum_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
    pad_mask = _pad_mask_rows(pad_ref, ik * bk, bk, bpb, hpb)
    p, _, a, b, _ = _recompute_block(
        q, k, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq, scale,
        causal,
    )
    dv_scr[:] += _bdot(p.astype(do.dtype), do, ((1,), (1,)))
    dp = _bdot(do, v, ((2,), (2,)))
    ds = _scaled(p * (dp - d_row), scale).astype(q.dtype)
    dk_scr[:] += _bdot(ds, q, ((1,), (1,)))
    dq_scr[:, pl.ds(iq * bq, bq), :] += _bdot(ds, k, ((2,), (1,)))

    @pl.when(smap_ref[3, t] == 1)  # last iq of this k-block row
    def _():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype).reshape(bpb, hpb, bk, dh)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype).reshape(bpb, hpb, bk, dh)

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        Tp = dq_scr.shape[1]
        dqk_ref[:] = dq_scr[:].astype(dqk_ref.dtype).reshape(
            bpb, hpb, Tp, dh
        )


def _bwd_de_dqrel_kernel(
    smap_ref, q_ref, kr_ref, vr_ref, do_ref, lse_ref, dsum_ref, er_ref,
    padr_ref, dqr_ref, der_ref, dq_scr, der_scr,
    *, bq, bk, max_seq, scale, causal, nk, F,
):
    """dE + dq_rel with NO unskew and NO second softmax recompute: the
    distance-domain half of the split backward (see _bwd_dkdv_dq_kernel).

    Identical math to _bwd_dq_de_dist_kernel's distance branch (see its
    docstring for the column-reversed / +1-stride derivation), minus that
    kernel's normal branch -- dq_qk now lives in the dK/dV sweep. The
    explicit dist>=0 mask on dsd is required here for the NON-causal
    (regression) model: P is nonzero above the diagonal there, but the
    reference's qe-masking still zeroes the relative bias, so its adjoint
    must zero those entries too (the fused kernel got this from masking
    dsrel; causal grids get it for free from the NEG_INF)."""
    ib = pl.program_id(0)
    ih = pl.program_id(1)
    t = pl.program_id(2)
    iq = smap_ref[0, t]
    ikr = smap_ref[1, t]
    ik = nk - 1 - ikr
    hpb = q_ref.shape[1]
    L = bq + bk

    @pl.when(smap_ref[2, t] == 1)  # first visible ikr of this q-block row
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when((ib == 0) & (ih == 0) & (t == 0))
    def _():
        der_scr[:] = jnp.zeros_like(der_scr)

    # all enumerated pairs are visible (_grid_maps) -- body unconditional
    q = q_ref[0]  # [hpb, bq, dh]
    kr = kr_ref[0]
    vr = vr_ref[0]
    do = do_ref[0]
    lse_row = lse_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
    d_row = dsum_ref[0, :, 0, pl.ds(iq * bq, bq)][:, :, None]
    padr_row = padr_ref[0, 0, pl.ds(ikr * bk, bk)]

    doff = iq * bq - (nk - ikr) * bk + 1  # d(c) = c + doff
    qkp = _bdot(q, kr, ((2,), (2,)))  # [hpb, bq, bk] f32
    qkp = jnp.where(padr_row[None, None, :] != 0, NEG_INF, qkp)
    qkp = jnp.concatenate(
        [qkp, jnp.full((hpb, bq, bq), NEG_INF, jnp.float32)], axis=-1
    )
    # roll row a right by a: qkd[a, c] = qk'[a, c - a]; the wrapped
    # region lands on the NEG_INF padding, so p_d vanishes there
    qkd = pltpu.roll(qkp, 0, 2, stride=1, stride_axis=1)
    er_slice = er_ref[pl.ds(F + doff, L), :].astype(q.dtype)
    band_rev = _dot(q, er_slice, ((2,), (1,)))  # [hpb, bq, L] f32
    dist = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) + doff
    srel_d = jnp.where(dist >= 0, band_rev, 0.0)  # qe-mask: d<0 -> 0
    s_d = _scaled(qkd + srel_d, scale)
    if causal:
        s_d = jnp.where(dist < 0, NEG_INF, s_d)
    p_d = _pexp(s_d - lse_row)  # [hpb, bq, L]
    dpp = _bdot(do, vr, ((2,), (2,)))  # [hpb, bq, bk]
    dpp = jnp.concatenate(
        [dpp, jnp.zeros((hpb, bq, bq), jnp.float32)], axis=-1
    )
    dpd = pltpu.roll(dpp, 0, 2, stride=1, stride_axis=1)
    dsd = _scaled(p_d * (dpd - d_row), scale)
    dsd = jnp.where(dist >= 0, dsd, 0.0).astype(q.dtype)  # qe adjoint
    dq_scr[:] += _dot(dsd, er_slice, ((2,), (0,)))
    de_blk = jax.lax.dot_general(
        dsd, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [hpb, L, dh]
    der_scr[pl.ds(F + doff, L), :] += jnp.sum(de_blk, axis=0)

    @pl.when(smap_ref[3, t] == 1)  # last ikr of this q-block row
    def _():
        dqr_ref[0] = dq_scr[:].astype(dqr_ref.dtype)

    @pl.when(
        (ib == pl.num_programs(0) - 1)
        & (ih == pl.num_programs(1) - 1)
        & (t == pl.num_programs(2) - 1)
    )
    def _():
        der_ref[:] = der_scr[:]


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
        bpb, hpb, _, dh = q_ref.shape
        n = bpb * hpb
        q = q_ref[:].reshape(n, bq, dh)
        k = k_ref[:].reshape(n, bk, dh)
        v = v_ref[:].reshape(n, bk, dh)
        do = do_ref[:].reshape(n, bq, dh)
        lse_row = lse_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
        d_row = dsum_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
        pad_mask = _pad_mask_rows(pad_ref, ik * bk, bk, bpb, hpb)
        p, _, a, b, _ = _recompute_block(
            q, k, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq, scale,
            causal,
        )
        dv_scr[:] += _bdot(p.astype(do.dtype), do, ((1,), (1,)))
        dp = _bdot(do, v, ((2,), (2,)))
        ds = _scaled(p * (dp - d_row), scale).astype(q.dtype)
        dk_scr[:] += _bdot(ds, q, ((1,), (1,)))

    @pl.when(iq == pl.num_programs(3) - 1)
    def _():
        bpb, hpb, _, dh = q_ref.shape
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype).reshape(bpb, hpb, bk, dh)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype).reshape(bpb, hpb, bk, dh)


def _bwd_dq_de_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk,
                    hpb, Tp):
    """Launch the dq/dE kernel. Split out so perf scripts can time it."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    n_e_rows = e_pad.shape[0]
    bpb = _batch_per_block(B, "dqde")
    in_specs = [
        pl.BlockSpec((bpb, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((bpb, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((bpb, hpb, bk, dh), lambda b, ih, iq, ik: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((bpb, hpb, bq, dh), lambda b, ih, iq, ik: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, iq, ik: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, iq, ik: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),  # dsum
        pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad
        pl.BlockSpec((bpb, 1, Tp), lambda b, ih, iq, ik: (b, 0, 0),
                     memory_space=pltpu.VMEM),  # pad rows
    ]

    dq, de_pad = pl.pallas_call(
        functools.partial(_bwd_dq_de_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), qf.dtype),
            jax.ShapeDtypeStruct((n_e_rows, dh), jnp.float32),
        ),
        grid=(B // bpb, H // hpb, Tp // bq, Tp // bk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bpb, hpb, bq, dh),
                         lambda b, ih, iq, ik: (b, ih, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bpb * hpb, bq, dh), jnp.float32),
            pltpu.VMEM((n_e_rows, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BWD),
    )(qf, kf, vf, dof, lse, dsum, e_pad, pk)
    return dq, de_pad


def _bwd_dkdv_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk,
                   hpb, Tp):
    """Launch the dK/dV kernel: iq innermost so per-k-block accumulation
    is legal."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    bpb = _batch_per_block(B, "dkdv")
    in_specs_kv = [
        pl.BlockSpec((bpb, hpb, bq, dh), lambda b, ih, ik, iq: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((bpb, hpb, bk, dh), lambda b, ih, ik, iq: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((bpb, hpb, bk, dh), lambda b, ih, ik, iq: (b, ih, ik, 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((bpb, hpb, bq, dh), lambda b, ih, ik, iq: (b, ih, iq, 0),
                     memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, ik, iq: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, ik, iq: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, 1, Tp), lambda b, ih, ik, iq: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), kf.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, dh), vf.dtype),
        ),
        grid=(B // bpb, H // hpb, Tp // bk, Tp // bq),
        in_specs=in_specs_kv,
        out_specs=(
            pl.BlockSpec((bpb, hpb, bk, dh),
                         lambda b, ih, ik, iq: (b, ih, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpb, hpb, bk, dh),
                         lambda b, ih, ik, iq: (b, ih, ik, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bpb * hpb, bk, dh), jnp.float32),
            pltpu.VMEM((bpb * hpb, bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BWD),
    )(qf, kf, vf, dof, lse, dsum, e_pad, pk)
    return dk, dv


def _bwd_dkdv_dq_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk,
                      hpb, Tp):
    """Launch the combined dK/dV + dq_qk kernel (split backward)."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    bpb = _batch_per_block(B, "dkdvdq")
    smap = jnp.asarray(
        _grid_maps(Tp // bq, Tp // bk, bq, bk, common["causal"], "kq")
    )
    V = smap.shape[1]
    in_specs_kv = [
        pl.BlockSpec((bpb, hpb, bq, dh),
                     lambda b, ih, t, s: (b, ih, s[1, t], 0),
                     memory_space=pltpu.VMEM),  # q
        pl.BlockSpec((bpb, hpb, bk, dh),
                     lambda b, ih, t, s: (b, ih, s[0, t], 0),
                     memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((bpb, hpb, bk, dh),
                     lambda b, ih, t, s: (b, ih, s[0, t], 0),
                     memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((bpb, hpb, bq, dh),
                     lambda b, ih, t, s: (b, ih, s[1, t], 0),
                     memory_space=pltpu.VMEM),  # do
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, t, s: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, hpb, 1, Tp), lambda b, ih, t, s: (b, ih, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((bpb, 1, Tp), lambda b, ih, t, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bpb, H // hpb, V),
        in_specs=in_specs_kv,
        out_specs=(
            pl.BlockSpec((bpb, hpb, bk, dh),
                         lambda b, ih, t, s: (b, ih, s[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpb, hpb, bk, dh),
                         lambda b, ih, t, s: (b, ih, s[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bpb, hpb, Tp, dh),
                         lambda b, ih, t, s: (b, ih, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((bpb * hpb, bk, dh), jnp.float32),
            pltpu.VMEM((bpb * hpb, bk, dh), jnp.float32),
            pltpu.VMEM((bpb * hpb, Tp, dh), jnp.float32),
        ],
    )
    dk, dv, dqk = pl.pallas_call(
        functools.partial(_bwd_dkdv_dq_kernel, **common),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), kf.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, dh), vf.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, dh), qf.dtype),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BWD),
    )(smap, qf, kf, vf, dof, lse, dsum, e_pad, pk)
    return dk, dv, dqk


def _bwd_merged_kernel(
    smap_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, e_ref, er_ref,
    pad_ref, dk_ref, dv_ref, dq_ref, der_ref,
    dk_scr, dv_scr, dq_scr, der_scr,
    *, bq, bk, max_seq, scale, causal, nk, F,
):
    """The ENTIRE backward in one sweep: dK, dV, dq (both terms), dE.

    Extends _bwd_dkdv_dq_kernel with the distance-domain dE/dq_rel work,
    exploiting one identity: the distance-domain ds the dE kernel
    laboriously recomputed (reversed K/V, its own qk/dp dots, an L-wide
    exp) is just the column-REVERSAL of the ds this sweep already has,
    rolled by the lowerable +1 stride:

        dsd[a, c] = (ds @ Fr)[a, c - a],   Fr = anti-identity [bk, bk]

    Column reversal as an MXU dot with a 0/1 matrix is EXACT in bf16, so
    the adjoint qe-mask (d >= 0) is the only extra elementwise work.
    Compared to the "split" layout this removes per layer: the second
    grid sweep (its q/do/lse/dsum DMA + per-step overhead), the XLA K/V
    time-reversals feeding it (~0.4 ms/layer at the flagship shape), the
    qk'/dp'/band_rev dots and L-wide exp, and the XLA add of the two dq
    halves (dq accumulates in ONE f32 scratch here).

    Operands and outputs use the time-on-lanes [.., dh, time] layout
    (see _load_T)."""
    t = pl.program_id(2)
    ik = smap_ref[0, t]
    iq = smap_ref[1, t]

    @pl.when(smap_ref[2, t] == 1)  # first visible iq of this k-block row
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(t == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(
        (pl.program_id(0) == 0) & (pl.program_id(1) == 0) & (t == 0)
    )
    def _():
        der_scr[:] = jnp.zeros_like(der_scr)

    bpb, hpb, dh, _ = q_ref.shape
    n = bpb * hpb
    L = bq + bk
    # ONLY q gets the rows-on-sublanes relayout (the band and dE dots
    # need row layout); every other dot contracts the raw time-on-lanes
    # blocks with MXU-native / A@B^T dimension numbers
    # (scripts/perf_tlayout.py --forms), and dK/dV accumulate DIRECTLY in
    # the [n, dh, bk] output layout
    q = _load_T(q_ref)  # [n, bq, dh]
    qT = q_ref[:].reshape(n, dh, bq)
    kT = k_ref[:].reshape(n, dh, bk)
    vT = v_ref[:].reshape(n, dh, bk)
    doT = do_ref[:].reshape(n, dh, bq)
    lse_row = lse_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
    d_row = dsum_ref[:, :, 0, pl.ds(iq * bq, bq)].reshape(n, bq, 1)
    pad_mask = _pad_mask_rows(pad_ref, ik * bk, bk, bpb, hpb)
    p, _, a, b, _ = _recompute_block(
        q, kT, e_ref, lse_row, pad_mask, iq, ik, bq, bk, max_seq, scale,
        causal, k_transposed=True,
    )
    # ---- column-domain terms ------------------------------------------
    # dvT[d, j] += sum_a doT[d, a] p[a, j]   (native: lanes x sublanes)
    dv_scr[:] += _bdot(doT, p.astype(doT.dtype), ((2,), (1,)))
    # dp[a, j] = sum_d doT[d, a] vT[d, j]    (both contract sublanes)
    dp = _bdot(doT, vT, ((1,), (1,)))
    ds = _scaled(p * (dp - d_row), scale).astype(q.dtype)
    # dkT[d, j] += sum_a qT[d, a] ds[a, j]   (native)
    dk_scr[:] += _bdot(qT, ds, ((2,), (1,)))
    # dq[a, d] = sum_j ds[a, j] kT[d, j]     (A @ B^T)
    dq_upd = _bdot(ds, kT, ((2,), (2,)))  # [n, bq, dh] f32
    # ---- distance-domain terms: dsd = roll(ds @ Fr) -------------------
    rc = jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 0) + \
        jax.lax.broadcasted_iota(jnp.int32, (bk, bk), 1)
    fr = (rc == bk - 1).astype(ds.dtype)  # anti-identity
    dsr = _dot(ds, fr, ((2,), (0,)))  # [n, bq, bk] f32, exact reversal
    dsp = jnp.concatenate(
        [dsr, jnp.zeros((n, bq, bq), jnp.float32)], axis=-1
    )
    # roll row a right by a: dsd[a, c] = dsr[a, c - a]; wrapped entries
    # land on the zero padding
    dsd_f = pltpu.roll(dsp, 0, 2, stride=1, stride_axis=1)
    doff = iq * bq - (ik + 1) * bk + 1  # d(c) = c + doff
    dist = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) + doff
    # qe-adjoint: the reference zeroes the relative bias for j > i even
    # when P is nonzero there (non-causal regression model)
    dsd = jnp.where(dist >= 0, dsd_f, 0.0).astype(q.dtype)
    er_slice = er_ref[pl.ds(F + doff, L), :].astype(q.dtype)
    dq_upd += _dot(dsd, er_slice, ((2,), (0,)))
    dq_scr[:, pl.ds(iq * bq, bq), :] += dq_upd
    de_blk = jax.lax.dot_general(
        dsd, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [n, L, dh]
    der_scr[pl.ds(F + doff, L), :] += jnp.sum(de_blk, axis=0)

    @pl.when(smap_ref[3, t] == 1)  # last iq of this k-block row
    def _():
        # dk/dv scratches already live in the output [n, dh, bk] layout
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype).reshape(bpb, hpb, dh, bk)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype).reshape(bpb, hpb, dh, bk)

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        # one [n, Tp, dh] -> [n, dh, Tp] relayout per (batch, head) group
        # per layer -- amortized over the whole k-sweep
        _store_T(dq_ref, dq_scr[:])

    @pl.when(
        (pl.program_id(0) == pl.num_programs(0) - 1)
        & (pl.program_id(1) == pl.num_programs(1) - 1)
        & (t == pl.num_programs(2) - 1)
    )
    def _():
        der_ref[:] = der_scr[:]


def _bwd_merged_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common,
                     bq, bk, hpb, Tp):
    """Launch the all-in-one backward kernel (see _bwd_merged_kernel).
    qf/kf/vf/dof in the time-on-lanes [B, H, dh, Tp] layout; dk/dv/dq
    come back in the same layout."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[2]
    nk = Tp // bk
    m_eff = common["max_seq"]
    F = Tp
    e_eff = e_pad[:m_eff]
    er_pad = jnp.concatenate(
        [
            jnp.zeros((F, dh), jnp.float32),
            e_eff[::-1],
            jnp.zeros((bq + bk, dh), jnp.float32),
        ],
        axis=0,
    )  # row F + d holds E_eff[m_eff - 1 - d]
    n_rev = er_pad.shape[0]
    bpb = _batch_per_block(B, "dkdvdq")
    smap = jnp.asarray(
        _grid_maps(Tp // bq, nk, bq, bk, common["causal"], "kq")
    )
    V = smap.shape[1]
    qspec = pl.BlockSpec((bpb, hpb, dh, bq),
                         lambda b, ih, t, s: (b, ih, 0, s[1, t]),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((bpb, hpb, dh, bk),
                         lambda b, ih, t, s: (b, ih, 0, s[0, t]),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((bpb, hpb, 1, Tp),
                           lambda b, ih, t, s: (b, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bpb, H // hpb, V),
        in_specs=[
            qspec,    # q
            kspec,    # k
            kspec,    # v
            qspec,    # do
            rowspec,  # lse
            rowspec,  # dsum
            pl.BlockSpec(memory_space=pltpu.VMEM),  # e_pad
            pl.BlockSpec(memory_space=pltpu.VMEM),  # er_pad
            pl.BlockSpec((bpb, 1, Tp), lambda b, ih, t, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # pad rows
        ],
        out_specs=(
            kspec,  # dk
            kspec,  # dv
            pl.BlockSpec((bpb, hpb, dh, Tp),
                         lambda b, ih, t, s: (b, ih, 0, 0),
                         memory_space=pltpu.VMEM),  # dq
            pl.BlockSpec(memory_space=pltpu.VMEM),  # der
        ),
        scratch_shapes=[
            pltpu.VMEM((bpb * hpb, dh, bk), jnp.float32),
            pltpu.VMEM((bpb * hpb, dh, bk), jnp.float32),
            pltpu.VMEM((bpb * hpb, Tp, dh), jnp.float32),
            pltpu.VMEM((n_rev, dh), jnp.float32),
        ],
    )
    dk, dv, dq, der = pl.pallas_call(
        functools.partial(_bwd_merged_kernel, **common, nk=nk, F=F),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, dh, Tp), kf.dtype),
            jax.ShapeDtypeStruct((B, H, dh, Tp), vf.dtype),
            jax.ShapeDtypeStruct((B, H, dh, Tp), qf.dtype),
            jax.ShapeDtypeStruct((n_rev, dh), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BWD),
    )(smap, qf, kf, vf, dof, lse, dsum, e_pad, er_pad, pk)
    de_pad = jnp.flip(der[F : F + m_eff], axis=0)
    return dk, dv, dq, de_pad


def _bwd_de_dqrel_call(qf, kf, vf, dof, lse, dsum, e_pad, pk, common,
                       bq, bk, hpb, Tp):
    """Launch the distance-domain dE + dq_rel kernel (split backward).
    Shares the reversed-table/-K/-V prep with _bwd_dq_de_dist_call."""
    B, H = qf.shape[0], qf.shape[1]
    dh = qf.shape[-1]
    nk = Tp // bk
    m_eff = common["max_seq"]
    F = Tp
    e_eff = e_pad[:m_eff]
    er_pad = jnp.concatenate(
        [
            jnp.zeros((F, dh), jnp.float32),
            e_eff[::-1],
            jnp.zeros((bq + bk, dh), jnp.float32),
        ],
        axis=0,
    )  # row F + d holds E_eff[m_eff - 1 - d]
    n_rev = er_pad.shape[0]
    kr = jnp.flip(kf, axis=2)
    vr = jnp.flip(vf, axis=2)
    padr = jnp.flip(pk, axis=-1)

    smap = jnp.asarray(
        _grid_maps(Tp // bq, nk, bq, bk, common["causal"], "q_rev")
    )
    V = smap.shape[1]
    qspec = pl.BlockSpec((1, hpb, bq, dh),
                         lambda b, ih, t, s: (b, ih, s[0, t], 0),
                         memory_space=pltpu.VMEM)
    krspec = pl.BlockSpec((1, hpb, bk, dh),
                          lambda b, ih, t, s: (b, ih, s[1, t], 0),
                          memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, hpb, 1, Tp),
                           lambda b, ih, t, s: (b, ih, 0, 0),
                           memory_space=pltpu.VMEM)
    padspec = pl.BlockSpec((1, 1, Tp), lambda b, ih, t, s: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // hpb, V),
        in_specs=[
            qspec,    # q
            krspec,   # k reversed
            krspec,   # v reversed
            qspec,    # do
            rowspec,  # lse
            rowspec,  # dsum
            pl.BlockSpec(memory_space=pltpu.VMEM),  # er_pad
            padspec,  # pad rows reversed
        ],
        out_specs=(
            pl.BlockSpec((1, hpb, bq, dh),
                         lambda b, ih, t, s: (b, ih, s[0, t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((hpb, bq, dh), jnp.float32),
            pltpu.VMEM((n_rev, dh), jnp.float32),
        ],
    )
    dqr, der = pl.pallas_call(
        functools.partial(_bwd_de_dqrel_kernel, **common, nk=nk, F=F),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, dh), qf.dtype),
            jax.ShapeDtypeStruct((n_rev, dh), jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BWD),
    )(smap, qf, kr, vr, dof, lse, dsum, er_pad, padr)
    # distance rows back to table rows (see _bwd_dq_de_dist_call)
    de_pad = jnp.flip(der[F : F + m_eff], axis=0)
    return dqr, de_pad


def _flash_bwd_impl(q, k, v, e, causal, pad_keys, out, lse, g,
                    bq: Optional[int] = None, bk: Optional[int] = None):
    """Backward from UNPADDED operands (perf scripts / ad-hoc callers).
    The custom-vjp path uses _flash_bwd_from_saved with the forward's
    already-padded residuals instead."""
    bq = bq or BLOCK_Q
    bk = bk or BLOCK_K
    # mirror _flash_fwd_impl: the saved-residual contract is a PRE-SCALED
    # qf (kernels run scale-free, see _scaled)
    q = q * jnp.asarray(1.0 / math.sqrt(q.shape[-1]), q.dtype)
    qf, kf, vf, e_pad, pk, Tp, pad_t, t_pad = _prepare_T(
        q, k, v, e, causal, pad_keys, bq, bk
    )
    return _flash_bwd_from_saved(
        qf, kf, vf, pk, t_pad(out), e, causal, lse, g, q.shape[2], bq, bk
    )


def _flash_bwd_from_saved(qf, kf, vf, pk, outf, e, causal, lse, g, T,
                          bq: Optional[int] = None,
                          bk: Optional[int] = None):
    """Backward from the forward's PADDED residuals (time-on-lanes
    [B, H, dh, Tp] layout): only the incoming cotangent still needs the
    T -> Tp pad. The default ("merged") kernel consumes and produces the
    kernel layout natively; the legacy decompositions get XLA-transposed
    views (they are env-knob experiment paths)."""
    bq = bq or BLOCK_Q_BWD or BLOCK_Q
    bk = bk or BLOCK_K_BWD or BLOCK_K
    B, H, dh, Tp = qf.shape
    assert Tp % bq == 0 and Tp % bk == 0, (
        "bwd blocks must divide the fwd-padded length", Tp, bq, bk)
    pad_t = Tp - T
    max_seq = e.shape[0]
    e_pad = jnp.pad(e.astype(jnp.float32), ((pad_t, 0), (0, 0)))
    tail = Tp if not causal else bq + bk
    e_pad = jnp.pad(e_pad, ((0, tail), (0, 0)))
    hpb = _heads_per_block(H)
    dof = jnp.swapaxes(g, 2, 3)  # cotangent into kernel layout
    if pad_t:
        dof = jnp.pad(dof, ((0, 0), (0, 0), (0, 0), (0, pad_t)))
    dsum = jnp.sum(
        dof.astype(jnp.float32) * outf.astype(jnp.float32), axis=2
    )[:, :, None, :]  # [B, H, 1, Tp]

    # qf was pre-scaled by c = 1/sqrt(dh) in the forward, so the kernels
    # run scale-free (see _scaled): dk = qf @ dL/du and dE = dsd^T @ qf
    # carry the c factor exactly; only dq needs the c post-multiply below.
    common = dict(
        bq=bq, bk=bk, max_seq=max_seq + pad_t,
        scale=1.0, causal=causal,
    )
    dq_scale = jnp.float32(1.0 / math.sqrt(dh))
    if BWD_IMPL == "merged":
        dk, dv, dq, de_pad = _bwd_merged_call(
            qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp
        )
        cut = lambda x, dt: jnp.swapaxes(x, 2, 3)[:, :, :T, :].astype(dt)
    else:
        sw = lambda x: jnp.swapaxes(x, 2, 3)
        qfo, kfo, vfo, dofo = sw(qf), sw(kf), sw(vf), sw(dof)
        if BWD_IMPL == "split":
            dk, dv, dqk = _bwd_dkdv_dq_call(
                qfo, kfo, vfo, dofo, lse, dsum, e_pad, pk, common, bq, bk,
                hpb, Tp
            )
            dqr, de_pad = _bwd_de_dqrel_call(
                qfo, kfo, vfo, dofo, lse, dsum, e_pad, pk, common, bq, bk,
                hpb, Tp
            )
            # the two dq halves sum in f32 before the output cast
            dq = (dqk.astype(jnp.float32) + dqr.astype(jnp.float32)).astype(
                qf.dtype
            )
        else:
            dq_de = (_bwd_dq_de_dist_call if DQDE_IMPL == "dist"
                     else _bwd_dq_de_call)
            dq, de_pad = dq_de(
                qfo, kfo, vfo, dofo, lse, dsum, e_pad, pk, common, bq, bk,
                hpb, Tp
            )
            dk, dv = _bwd_dkdv_call(
                qfo, kfo, vfo, dofo, lse, dsum, e_pad, pk, common, bq, bk,
                hpb, Tp
            )
        cut = lambda x, dt: x[:, :, :T, :].astype(dt)
    # the one backward fixup the pre-scaled-q scheme needs (fuses into
    # cut's slice/transpose fusion)
    dq = cut(dq.astype(jnp.float32) * dq_scale, qf.dtype)
    dk = cut(dk, kf.dtype)
    dv = cut(dv, vf.dtype)
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
    out, lse, saved = _flash_fwd_impl(
        q, k, v, e, causal, pad_keys, return_lse=True, return_saved=True
    )
    qf, kf, vf, pk, outf = saved
    return out, (qf, kf, vf, pk, outf, e, lse, q.shape[2])


def _bwd(causal, residuals, g):
    qf, kf, vf, pk, outf, e, lse, T = residuals
    import os

    flash_bwd = os.environ.get("MIDI_EMOTION_FLASH_BWD", "pallas")
    if flash_bwd not in ("pallas", "xla"):  # read per-call: re-validate
        raise ValueError(
            f"MIDI_EMOTION_FLASH_BWD={flash_bwd!r}: must be 'pallas' or 'xla'"
        )
    if flash_bwd == "xla":
        # debug path: recover the unpadded operands from the (time-on-
        # lanes) residuals; qf is PRE-SCALED by 1/sqrt(dh) (see _scaled),
        # and _xla_reference applies its own scale, so undo it here
        q, k, v = (
            jnp.swapaxes(x, 2, 3)[:, :, :T, :] for x in (qf, kf, vf)
        )
        q = q * jnp.asarray(math.sqrt(q.shape[-1]), q.dtype)
        pad_keys = pk[:, 0, :T].astype(bool)
        _, vjp = jax.vjp(
            lambda q_, k_, v_, e_: _xla_reference(q_, k_, v_, e_, causal, pad_keys),
            q, k, v, e,
        )
        dq, dk, dv, de = vjp(g)
    else:
        dq, dk, dv, de = _flash_bwd_from_saved(
            qf, kf, vf, pk, outf, e, causal, lse, g, T
        )
    return dq, dk, dv, de, None


flash_relative_attention.defvjp(_fwd, _bwd)

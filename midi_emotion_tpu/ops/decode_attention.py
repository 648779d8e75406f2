"""Fused Pallas decode-attention over a stacked int8 KV cache.

Single-token decode is HBM-bandwidth-bound: the cost of a step IS reading
the cache once (see ops/attention.py:decode_rel_attention for the layout
rationale -- time-major, merged-channel buffers, no lane padding). An int8
cache halves the streamed bytes, but two naive lowerings measured on the
v5e fail to collect the win (scripts/perf_decode_int8.py, B=64, W=1408,
L=20, vs a ~3.1 ms read roofline):

  * XLA int8 dot-form: 5.7 ms/step -- the [B, H, W] logits/probs and the
    [B, W, D] expanded probs round-trip HBM between fusions;
  * a convert-to-bf16-then-dot Pallas kernel: 5.2 ms -- **convert-bound**:
    int8 -> bf16 of ~19M cache elements/step runs at ~1 elem/lane/cycle on
    the VPU, as long as the DMA it was supposed to hide.

This kernel therefore never converts the cache: both contractions run as
**native int8 x int8 -> int32 MXU dots**,

  * scores: block-diagonal int8 q (its per-head scales applied to the
    int32 result, together with the cache's per-(row, head) scales);
  * PV: probabilities * V-scales are re-quantized to int8 in-kernel with a
    per-(batch, head) dynamic scale, contracted against the raw int8 V
    block, and the head-diagonal slices of the [H, D] result selected.

Cache layout (decided by two more measurements):

  * **Stacked over layers, K|V merged**: kv [L, B, W, 2D] int8 plus scales
    [L, B, 2H, W]. Appending a decoded token's K/V rows as 80 separate
    `dynamic_update_slice`s (4 per layer) costs ~0.9 ms/step in fixed
    per-op overhead; the stacked layout defers each step's rows (carried
    in tiny [L, B, 2D] pending buffers) and lands ALL of them in 2 ops at
    the next step. The kernel indexes its layer through a scalar-prefetch
    argument, so one compiled kernel serves every layer.
  * Scales put W on the lane axis: a [.., W, H] layout would pad
    H=16 -> 128 lanes in HBM (8x the bytes).

Because the current token's K/V row is pending, the kernel returns the
UNNORMALIZED flash triple (acc, m, l) over the cached rows only; the
caller folds the current token in exactly (unquantized) with
``merge_self`` -- a [B, H]-sized XLA epilogue.

Quantization error: symmetric per-(row, head) int8 for K/V (<=0.4% of each
row's max) plus one 1/254-of-max rounding on the probabilities
(tests/test_decode_attention.py bounds the end-to-end error). Bit-exact
decode remains on the bf16 path (attention.py:decode_rel_attention).

Semantics otherwise match decode_rel_attention (ops/attention.py:111-185):
for a query at window position `length` attending to cached keys
0..length-1 and itself,

    logits[b,h,w] = (q[b,h] . k[b,w,head h] + q[b,h] . E[ms-1-length+w])
                    / sqrt(dh)

with the reference's E indexing quirk (music_multi.py:240-243: short
sequences read the *last* rows of the table; the self term uses E[ms-1]).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_LIMIT = 100 * 1024 * 1024

_NEG = -1e30


def _kernel(
    s_ref,       # scalar-prefetch [3] int32: (layer, n_cached, n_pend)
    q8bd_ref,    # [bb, H, D] block-diagonal query (int8 quantized, or
                 # bf16 when the cache is unquantized)
    sq_ref,      # [bb, H] f32 query scales (None when unquantized)
    qh_ref,      # [bb, H, dh] bf16 raw per-head query (for the bias dot)
    kv_ref,      # [1, bb, bw, 2D] int8|bf16 (this layer's K|V block)
    e_ref,       # [bw, dh] bf16 relative rows for this window block
    sc_ref,      # [1, bb, 2H, bw] bf16 K|V scales (None when unquantized)
    pend_ref,    # [S, 1, bb, 2D] bf16 staged rows (None when unstaged)
    ep_ref,      # [S+1, dh] bf16 relative rows for the staged tail; row
                 # n_pend is E[ms-1], the SELF term's bias row
    qbd16_ref,   # [bb, H, D] bf16 block-diag q for the pend dots (only
                 # when quant -- the bf16 cache reuses q8bd_ref)
    row_ref,     # [bb, 2D] bf16: current token's K|V row to append
    acc_ref,     # out [bb, D] f32 (unnormalized PV)
    m_ref,       # out [bb, H] f32 (running max)
    l_ref,       # out [bb, H] f32 (running denominator)
    out_ref,     # out [bb, D] bf16 (staged only): the NORMALIZED
                 # attention output with the current token's self term
                 # merged in-kernel (the XLA merge_self epilogue fused
                 # away -- ~10 small ops/layer/step of dispatch gaps)
    pend_out_ref,  # out [1, 1, bb, 2D] ALIASED to pend_ref's buffer: the
                   # kernel appends row_ref at stage slot (n_pend, layer),
                   # replacing an XLA dynamic_update_slice that forced
                   # 63 MB/step of scan-carry copies (profiled)
    *,
    n_head: int,
    d_head: int,
    bw: int,
    quant: bool,
    n_w: int,
):
    j = pl.program_id(1)
    bb, H, D = q8bd_ref.shape
    dh = d_head
    length = s_ref[1]

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full((bb, H), _NEG, jnp.float32)
        l_ref[:] = jnp.zeros((bb, H), jnp.float32)
        acc_ref[:] = jnp.zeros((bb, D), jnp.float32)

    # head-selector mask: sel[h, r] = 1 iff r // dh == h
    r_head = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // dh
    h_row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    sel_f = (r_head == h_row).astype(jnp.float32)

    # Dead-block skip: blocks wholly past `length` clamp their kv/e/sc
    # index maps to the last LIVE block (_clamped_j), so Pallas never
    # re-issues their DMA (the block index repeats between consecutive
    # grid steps); this @pl.when skips their compute too. A fully masked
    # block would leave m/l/acc unchanged anyway (p == 0, alpha == 1) --
    # skipping just avoids paying MXU+VPU time for it.
    @pl.when(j * bw < length)
    def _live_block():
        k_blk = kv_ref[0, :, :, :D]  # [bb, bw, D]
        v_blk = kv_ref[0, :, :, D:]

        if quant:
            # scores: int8 block-diagonal q against the raw int8 K block
            # (MXU int8 x int8 -> int32; the cache is never converted)
            ks = sc_ref[0, :, :H, :]  # [bb, H, bw]
            vs = sc_ref[0, :, H:, :]
            scores = jax.lax.dot_general(
                q8bd_ref[:], k_blk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [bb, H, bw]
            scores_f = (
                scores.astype(jnp.float32)
                * sq_ref[:][:, :, None]
                * ks.astype(jnp.float32)
            )
        else:
            # bf16 cache: native bf16 MXU dot, no scales
            scores_f = jax.lax.dot_general(
                q8bd_ref[:], k_blk, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bb, H, bw]

        # relative bias: unquantized per-head q against the E rows -- a
        # [bb*H, dh] x [dh, bw] dot
        bias = jax.lax.dot_general(
            qh_ref[:].reshape(bb * H, dh), e_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bb, H, bw)

        logits = (scores_f + bias) * (1.0 / math.sqrt(dh))
        w_idx = j * bw + jax.lax.broadcasted_iota(jnp.int32, (bb, H, bw), 2)
        live = w_idx < length
        logits = jnp.where(live, logits, _NEG)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))  # [bb, H]
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[..., None])  # [bb, H, bw] f32
        p = jnp.where(live, p, 0.0)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1)
        m_ref[:] = m_new

        if quant:
            # fold V scales into the probabilities, re-quantize to int8
            # with a per-(batch, head) dynamic scale, contract against
            # raw int8 V
            pv = p * vs.astype(jnp.float32)  # [bb, H, bw]
            s_p = jnp.max(pv, axis=-1) / 127.0 + 1e-20  # [bb, H]
            p8 = jnp.round(pv / s_p[..., None]).astype(jnp.int8)
            res = jax.lax.dot_general(
                p8, v_blk, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )  # [bb, H, D]
            res_f = res.astype(jnp.float32) * s_p[..., None]
        else:
            res_f = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_blk, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bb, H, D]
        # head-diagonal selection back to the merged channel axis
        contrib = jnp.sum(res_f * sel_f[None], axis=1)  # [bb, D]
        alpha_exp = jnp.sum(alpha[..., None] * sel_f[None], axis=1)
        acc_ref[:] = acc_ref[:] * alpha_exp + contrib

    if pend_ref is None:
        return

    # ---- staged pending-row tail (see staging notes below) ----
    # The last <=S decoded rows live unquantized in the step-major stage;
    # fold them into the running flash state after the final cache block.
    # All forms here are probed-lowerable: the [S, bb, D] -> [bb, S, D]
    # sublane-major transpose (the ONLY batched-dot relayout Mosaic
    # accepts, scripts/probe_decode_layout.py) is tiny -- ~200 KB vs the
    # 0.5 ms/34 MB relayout that killed the W-major cache layout.
    @pl.when(j == n_w - 1)
    def _pend():
        n_pend = s_ref[2]
        # append the current token's row into its stage slot (the block
        # index map targets (n_pend, layer, i); the tail read above never
        # sees it -- rows >= n_pend are masked)
        pend_out_ref[0, 0] = row_ref[:]
        S = pend_ref.shape[0]
        kp = jnp.transpose(pend_ref[:, 0, :, :D], (1, 0, 2))  # [bb, S, D]
        vp = jnp.transpose(pend_ref[:, 0, :, D:], (1, 0, 2))
        q16 = qbd16_ref[:] if quant else q8bd_ref[:]  # [bb, H, D] bf16
        sc_p = jax.lax.dot_general(
            q16, kp, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb, H, S]
        bias_p = jax.lax.dot_general(
            qh_ref[:].reshape(bb * H, dh), ep_ref[:S, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bb, H, S)
        lg = (sc_p + bias_p) * (1.0 / math.sqrt(dh))
        s_live = (
            jax.lax.broadcasted_iota(jnp.int32, (bb, H, S), 2) < n_pend
        )
        lg = jnp.where(s_live, lg, _NEG)
        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(lg, axis=-1))
        alpha_p = jnp.exp(m_prev - m_new)
        pp = jnp.where(s_live, jnp.exp(lg - m_new[..., None]), 0.0)
        l_ref[:] = l_ref[:] * alpha_p + jnp.sum(pp, axis=-1)
        m_ref[:] = m_new
        res_p = jax.lax.dot_general(
            pp.astype(jnp.bfloat16), vp, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb, H, D]
        contrib_p = jnp.sum(res_p * sel_f[None], axis=1)
        alpha_pe = jnp.sum(alpha_p[..., None] * sel_f[None], axis=1)
        acc_ref[:] = acc_ref[:] * alpha_pe + contrib_p

        # ---- fused self term + normalization (merge_self in-kernel) ----
        # The current token attends to itself exactly: its K|V row is
        # row_ref, its bias row is E[ms-1] = ep_ref[n_pend] (expand_e_rows
        # with n = p_cnt + 1 over S + 1 rows puts E[ms-1] at index
        # p_cnt). Same math as merge_self below. All of it runs as f32
        # VPU multiply-reduces: a dynamic sublane-axis slice of ep_ref
        # and the degenerate (N=1 / matrix-vector) MXU dots both FAIL
        # Mosaic verification ('vector.broadcast' bf16->f32 on the
        # [bb*H, dh] operand) -- the round-4 bench crash.
        k_row = row_ref[:, :D].astype(jnp.float32)  # [bb, D]
        v_row = row_ref[:, D:].astype(jnp.float32)
        # per-head self score via the block-diagonal q: q16 is zero off
        # the head diagonal, so the D-axis reduce IS the per-head dot
        logit_s = jnp.sum(
            q16.astype(jnp.float32) * k_row[:, None, :], axis=-1
        )  # [bb, H]
        # E[ms-1] = ep_ref[n_pend], mask-selected (iota == n_pend) in f32
        r_idx = jax.lax.broadcasted_iota(
            jnp.int32, (ep_ref.shape[0], dh), 0
        )
        e_self = jnp.sum(
            jnp.where(r_idx == n_pend, ep_ref[:].astype(jnp.float32), 0.0),
            axis=0,
        )  # [dh]
        bias_s = jnp.sum(
            qh_ref[:].astype(jnp.float32) * e_self[None, None, :], axis=-1
        )  # [bb, H]
        logit_s = (logit_s + bias_s) * (1.0 / math.sqrt(dh))
        m_fin = jnp.maximum(m_ref[:], logit_s)
        a_old = jnp.exp(m_ref[:] - m_fin)
        a_new = jnp.exp(logit_s - m_fin)
        denom = l_ref[:] * a_old + a_new  # [bb, H]
        expand = lambda x: jnp.sum(x[..., None] * sel_f[None], axis=1)
        out = acc_ref[:] * expand(a_old) + v_row * expand(a_new)
        out_ref[:] = (out / expand(denom)).astype(out_ref.dtype)


def _pick_blocks(B: int, W: int, D2: int, itemsize: int):
    import os

    override = os.environ.get("DECODE_ATTN_BLOCKS")
    if override:
        bb, bw = (int(x) for x in override.split(","))
        bb = min(bb, B)
        # A partial tail W-block reads out of bounds and CRASHES the TPU
        # worker outright (not just garbage data) -- refuse the config
        # instead of letting the kernel take the device down. Full blocks
        # tiling W exactly are safe; bw must also stay a multiple of 128
        # for the [.., 2H, bw] scales block (lane axis).
        if W % bw or bw % 128:
            raise ValueError(
                f"DECODE_ATTN_BLOCKS window block bw={bw} must tile the "
                f"cache window W={W} exactly in multiples of 128: a "
                "partial tail block reads out of bounds and hard-crashes "
                "the TPU worker"
            )
        if B % bb:
            raise ValueError(
                f"DECODE_ATTN_BLOCKS batch block bb={bb} must divide B={B}"
            )
        return bb, bw
    # bw must TILE W (a partial tail block reads out of bounds, which
    # crashed the TPU worker outright -- bf16 cache, W=1408, bw=768) and
    # stay a multiple of 128 for the [.., 2H, bw] scales block. Sub-W
    # blocks enable the dead-block skip (blocks past `length` never DMA,
    # so a full-width cache reads only ceil(length/bw) blocks/step).
    # Swept on-chip at B=128/W=1408 int8 (scripts/perf_decode_skip.py):
    # bw=128 beats bw=W at EVERY length -- 1.99 ms/step at length 128 vs
    # 8.60 full-width, and 8.31 vs 8.63 even at full length (smaller
    # blocks pipeline better). Coarser tiles (256/512 at W=1536) lose at
    # short lengths and read padding at full length.
    bw = 128 if W % 128 == 0 else W
    # batch block: wider blocks amortize the fixed per-grid-step cost of
    # the (skipped) dead blocks; bounded by the VMEM working set. bb=32
    # swept best at every length for both B=128 int8 and B=64 bf16 with
    # bw=128 (scripts/perf_decode_skip.py); larger bb only shrinks the
    # grid further but loses pipeline overlap (bb=64/128 measured worse).
    bb = 32
    while bb > 1 and B % bb:
        bb //= 2
    bb = min(bb, B)
    # keep double-buffered K|V blocks within ~3/4 of the VMEM budget
    while bb > 1 and 2 * bb * bw * D2 * itemsize > 75e6:
        bb //= 2
    return bb, bw


@functools.partial(jax.jit, static_argnames=("n_head",))
def _run(scalars, q8bd, sq, qh, kv8, e_rows, sc, pend, e_pend, qbd16,
         row, *, n_head: int):
    L, B, W, D2 = kv8.shape
    D = D2 // 2
    H = n_head
    dh = D // H
    quant = sc is not None
    staged = pend is not None
    bb, bw = _pick_blocks(B, W, D2, 1 if quant else 2)
    nb, nw = pl.cdiv(B, bb), pl.cdiv(W, bw)

    # Dead-block skip (see _kernel): blocks wholly past `length` repeat
    # the last live block's index, so the pipeline never issues their
    # DMA. s[1] is the flushed length; at length == 0 every block clamps
    # to 0 (fetched once, fully masked).
    def _clamped_j(j, s):
        n_live_m1 = jnp.maximum((s[1] + bw - 1) // bw - 1, 0)
        return jnp.minimum(j, n_live_m1)

    # (name, value, spec, present) -- the kernel body receives None for
    # absent optionals, so ONE kernel serves all quant x staged modes
    maybe = [
        ("q8bd", q8bd, pl.BlockSpec((bb, H, D), lambda i, j, s: (i, 0, 0)),
         True),
        ("sq", sq, pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)), quant),
        ("qh", qh, pl.BlockSpec((bb, H, dh), lambda i, j, s: (i, 0, 0)),
         True),
        ("kv", kv8,
         pl.BlockSpec(
             (1, bb, bw, D2),
             lambda i, j, s: (s[0], i, _clamped_j(j, s), 0),
         ),
         True),
        ("e", e_rows,
         pl.BlockSpec((bw, dh), lambda i, j, s: (_clamped_j(j, s), 0)),
         True),
        ("sc", sc,
         pl.BlockSpec(
             (1, bb, 2 * H, bw),
             lambda i, j, s: (s[0], i, 0, _clamped_j(j, s)),
         ),
         quant),
        ("pend", pend,
         None if pend is None else pl.BlockSpec(
             (pend.shape[0], 1, bb, D2), lambda i, j, s: (0, s[0], i, 0)
         ),
         staged),
        ("ep", e_pend,
         None if pend is None else pl.BlockSpec(
             (e_pend.shape[0], dh), lambda i, j, s: (0, 0)
         ),
         staged),
        ("qbd16", qbd16,
         pl.BlockSpec((bb, H, D), lambda i, j, s: (i, 0, 0)),
         staged and quant),
        ("row", row, pl.BlockSpec((bb, D2), lambda i, j, s: (i, 0)),
         staged),
    ]
    in_specs = [spec for _, _, spec, present in maybe if present]
    args = [scalars] + [v for _, v, _, present in maybe if present]
    present_flags = [present for _, _, _, present in maybe]
    body = functools.partial(_kernel, n_head=H, d_head=dh, bw=bw,
                             quant=quant, n_w=nw)

    def kernel(s_ref, *refs):
        it = iter(refs[: sum(present_flags)])
        ins = [next(it) if present else None for present in present_flags]
        outs = refs[sum(present_flags):]
        if not staged:
            outs = (*outs, None, None)
        body(s_ref, *ins, *outs)

    out_specs = [
        pl.BlockSpec((bb, D), lambda i, j, s: (i, 0)),
        pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)),
        pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, D), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
        jax.ShapeDtypeStruct((B, H), jnp.float32),
    ]
    aliases = {}
    if staged:
        # output 3: the normalized attention output (self term merged
        # in-kernel); output 4 appends row into the stage IN PLACE by
        # aliasing the pend input buffer (index = 1 scalar arg + tensor
        # position; an XLA-level DUS instead forces the scan carry to
        # copy the whole 63 MB stage every step -- profiled at
        # 0.37 ms/step)
        out_specs.append(pl.BlockSpec((bb, D), lambda i, j, s: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, D), jnp.bfloat16))
        # slot index clamped: p_cnt == S is out of contract (the sampler
        # flushes before that), but an OOB output block index hard-crashes
        # the TPU worker -- degrade to overwriting the last slot instead
        S_slots = pend.shape[0]
        out_specs.append(
            pl.BlockSpec(
                (1, 1, bb, D2),
                lambda i, j, s: (jnp.minimum(s[2], S_slots - 1), s[0], i, 0),
            )
        )
        out_shape.append(jax.ShapeDtypeStruct(pend.shape, pend.dtype))
        pend_pos = 1 + sum(
            1 for name, _, _, present in maybe if present and name in (
                "q8bd", "sq", "qh", "kv", "e", "sc"
            )
        )
        aliases = {pend_pos: 4}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nw),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        # Mosaic only targets TPU; fall back to the interpreter on CPU so
        # the quantized/stacked modes still run (slowly) there. (The axon
        # tunnel platform compiles Mosaic fine, so only plain cpu
        # interprets.)
        interpret=jax.default_backend() == "cpu",
    )(*args)


def expand_e_rows(e: jnp.ndarray, n: jnp.ndarray, W: int,
                  dtype=jnp.bfloat16) -> jnp.ndarray:
    """Relative rows for a query at position n-1: [W, dh] with
    out[w] = E[max_seq - n + w] (rows past the table are zero; they are
    masked in the kernel anyway).

    PRECONDITION: n <= max_seq. dynamic_slice clamps its start index
    silently, so n > max_seq would read from start 0 -- WRONG relative
    rows -- rather than erroring. The sampler's window sizing guarantees
    the invariant (window <= max_seq, generation/sampler.py); the explicit
    clamp below pins the behavior for any future caller to "distances
    saturate at the table edge" (the mildest failure mode) instead of a
    silent whole-table shift."""
    max_seq = e.shape[0]
    n = jnp.minimum(n, max_seq)  # see precondition note above
    e_pad = jnp.pad(e, ((0, W), (0, 0)))
    rows = jax.lax.dynamic_slice_in_dim(e_pad, max_seq - n, W, 0)
    return rows.astype(dtype)


def decode_attn_cached(
    q_t: jnp.ndarray,     # [B, H, dh]
    kv8: jnp.ndarray,     # [L, B, W, 2D] int8 (or bf16) stacked cache
    sc,                   # [L, B, 2H, W] bf16 scales, or None (bf16 cache)
    layer,                # int32 scalar (traced ok)
    e_rows: jnp.ndarray,  # [W, dh] bf16 (expand_e_rows(e, length + 1, W))
    length,               # int32 scalar: number of valid FLUSHED rows
    pend=None,            # [S, L, B, 2D] bf16 staged rows (optional)
    e_pend=None,          # [S+1, dh] bf16: expand_e_rows(e, p_cnt+1, S+1)
                          # -- row p_cnt is E[ms-1], the self bias row
    p_cnt=None,           # int32 scalar: live staged rows
    row_t=None,           # [B, 2D] bf16: this token's K|V row; the kernel
                          # appends it at stage slot (p_cnt, layer)
):
    """Unnormalized flash decode over the cached rows of one layer, plus
    (when staged) the <=S unquantized pending rows folded in-kernel.

    Unstaged: returns (acc [B, D] f32, m [B, H] f32, l [B, H] f32); fold
    in the current token with merge_self.
    Staged: returns (out [B, D] bf16, pend) -- `out` is the NORMALIZED
    attention output with the current token's self term already merged
    in-kernel, and `pend` is the input stage buffer with row_t appended
    in place at slot (p_cnt, layer)."""
    B, H, dh = q_t.shape
    D = H * dh
    r_head = jnp.arange(D) // dh
    diag = r_head[None, None, :] == jnp.arange(H)[None, :, None]
    qbd16 = None
    if sc is not None:
        qf = q_t.astype(jnp.float32)
        sq = jnp.max(jnp.abs(qf), axis=-1) / 127.0 + 1e-20  # [B, H]
        q8 = jnp.round(qf / sq[..., None]).astype(jnp.int8).reshape(B, D)
        # block-diagonal layout built host-side: Mosaic has no int8
        # multiply, and bool-mask relayout to int8 tiling fails in-kernel
        qbd = jnp.where(diag, q8[:, None, :], jnp.int8(0))  # [B, H, D]
        sq = sq.astype(jnp.float32)
        if pend is not None:
            # the staged tail is unquantized: its dot needs a bf16 q
            q2 = q_t.reshape(B, D).astype(jnp.bfloat16)
            qbd16 = jnp.where(diag, q2[:, None, :], jnp.bfloat16(0))
    else:
        q2 = q_t.reshape(B, D).astype(jnp.bfloat16)
        qbd = jnp.where(diag, q2[:, None, :], jnp.bfloat16(0))
        sq = None
    qh = q_t.astype(jnp.bfloat16)
    scalars = jnp.stack([
        jnp.asarray(layer, jnp.int32),
        jnp.asarray(length, jnp.int32),
        jnp.asarray(0 if p_cnt is None else p_cnt, jnp.int32),
    ])
    if pend is not None:
        if e_pend.shape[0] != pend.shape[0] + 1:
            raise ValueError(
                f"e_pend must carry pend.shape[0] + 1 = {pend.shape[0] + 1} "
                f"rows (the extra row at index p_cnt is the self bias "
                f"E[ms-1]); got {e_pend.shape[0]}"
            )
        if row_t is None:
            raise ValueError(
                "staged decode requires row_t: the kernel appends it at "
                "slot (p_cnt, layer) AND merges it as the self term"
            )
    res = _run(scalars, qbd, sq, qh, kv8, e_rows, sc, pend, e_pend,
               qbd16, row_t, n_head=H)
    if pend is None:
        return res
    acc, m, l, out, pend_new = res
    return out, pend_new


def merge_self(
    acc: jnp.ndarray,     # [B, D] f32
    m: jnp.ndarray,       # [B, H] f32
    l: jnp.ndarray,       # [B, H] f32
    q_t: jnp.ndarray,     # [B, H, dh]
    k_t: jnp.ndarray,     # [B, D] current token's (unquantized) key row
    v_t: jnp.ndarray,     # [B, D] current value row
    e_last: jnp.ndarray,  # [dh] = E[max_seq - 1]
) -> jnp.ndarray:
    """Fold the current token into the flash triple exactly. Returns the
    normalized attention output [B, D] (v_t's dtype)."""
    B, H, dh = q_t.shape
    D = H * dh
    qf = q_t.astype(jnp.float32)
    k4 = k_t.reshape(B, H, dh).astype(jnp.float32)
    logit_s = (
        jnp.sum(qf * k4, axis=-1) + qf @ e_last.astype(jnp.float32)
    ) / math.sqrt(dh)  # [B, H]
    m_f = jnp.maximum(m, logit_s)
    a_old = jnp.exp(m - m_f)
    a_new = jnp.exp(logit_s - m_f)
    denom = l * a_old + a_new  # [B, H]
    expand = lambda x: jnp.broadcast_to(
        x[:, :, None], (B, H, dh)
    ).reshape(B, D)
    out = acc * expand(a_old) + v_t.astype(jnp.float32) * expand(a_new)
    return (out / expand(denom)).astype(v_t.dtype)


# ---- staged pending-row buffer ---------------------------------------------
#
# The serving trace (scripts/perf_decode_profile.py, round 4) showed the
# per-step deferred append -- a [L, B, 1, 2D] row DUS + a [L, B, 2H, 1]
# scale-column DUS into the stacked cache -- costs 0.86 ms/step at B=128:
# the writes scatter into L*B = 2560 DMA descriptors and descriptor COUNT,
# not bytes, is what the step pays. Staging kills it: decoded rows append
# into a small [S, L, B, 2D] bf16 buffer (step-major, so each append is ONE
# contiguous 3.9 MB chunk), the kernel folds the staged tail into its
# flash state IN-VMEM (the _pend block in _kernel -- an XLA tail was tried
# first and measured SLOWER than the append it replaced, both as
# per-(b,h) einsums (M=1 micro-dots) and as merged-channel batched GEMMs:
# the pend slices + [B,H,D] intermediates round-trip HBM per layer), and
# every S steps the whole stage quantizes + lands in the main cache with a
# single slab DUS pair (flush_pend) -- the same 2560 descriptors, paid
# once per S steps instead of every step.


def flush_pend(kv, sc, pend, f_len, n_head: int):
    """Land S staged rows into the stacked cache at window position f_len.

    pend: [S, L, B, 2D] bf16 (step-major). Quantizes (when the cache is
    int8) and writes ONE [L, B, S, 2D] slab DUS (+ one [L, B, 2H, S]
    scale slab). PRECONDITION: f_len + S <= W -- guaranteed by the
    sampler's chunk sizing (it only flushes full super-steps, whose last
    staged row sits at window position f_len + S - 1 < W); a clamped DUS
    start would silently corrupt earlier rows."""
    S, L, B, D2 = pend.shape
    rows = jnp.transpose(pend, (1, 2, 0, 3))  # [L, B, S, 2D]
    if sc is not None:
        row8, rsc = quantize_rows(rows, 2 * n_head)  # [L,B,S,2D], [L,B,2H,S]
        kv = jax.lax.dynamic_update_slice(kv, row8, (0, 0, f_len, 0))
        sc = jax.lax.dynamic_update_slice(sc, rsc, (0, 0, 0, f_len))
    else:
        kv = jax.lax.dynamic_update_slice(
            kv, rows.astype(kv.dtype), (0, 0, f_len, 0)
        )
    return kv, sc


# ---- quantization helpers --------------------------------------------------
def quantize_rows(t: jnp.ndarray, n_groups: int):
    """[..., T, C] -> (int8 values [..., T, C], scales [..., G, T] bf16).

    Symmetric per-(row, group) quantization with C split into n_groups
    equal channel groups (pass 2*H for a merged K|V row). The scale layout
    puts T on the lane axis so it stores unpadded (a [..., T, G] layout
    would pad G -> 128 lanes in HBM)."""
    *lead, T, C = t.shape
    g = C // n_groups
    t4 = t.reshape(*lead, T, n_groups, g).astype(jnp.float32)
    s = jnp.max(jnp.abs(t4), axis=-1) / 127.0 + 1e-12  # [..., T, G]
    q = jnp.round(t4 / s[..., None]).astype(jnp.int8).reshape(*lead, T, C)
    ndim = q.ndim
    perm = list(range(ndim - 2)) + [ndim - 1, ndim - 2]
    s = jnp.transpose(s, perm)  # [..., G, T]
    return q, s.astype(jnp.bfloat16)

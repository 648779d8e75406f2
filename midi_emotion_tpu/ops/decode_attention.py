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
    s_ref,       # scalar-prefetch [2] int32: (layer, n_cached)
    q8bd_ref,    # [bb, H, D] block-diagonal query (int8 quantized, or
                 # bf16 when the cache is unquantized)
    sq_ref,      # [bb, H] f32 query scales (None when unquantized)
    qh_ref,      # [bb, H, dh] bf16 raw per-head query (for the bias dot)
    kv_ref,      # [1, bb, bw, 2D] int8|bf16 (this layer's K|V block)
    e_ref,       # [bw, dh] bf16 relative rows for this window block
    sc_ref,      # [1, bb, 2H, bw] bf16 K|V scales (None when unquantized)
    acc_ref,     # out [bb, D] f32 (unnormalized PV)
    m_ref,       # out [bb, H] f32 (running max)
    l_ref,       # out [bb, H] f32 (running denominator)
    *,
    n_head: int,
    d_head: int,
    bw: int,
    quant: bool,
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

    k_blk = kv_ref[0, :, :, :D]  # [bb, bw, D]
    v_blk = kv_ref[0, :, :, D:]

    if quant:
        # scores: int8 block-diagonal q against the raw int8 K block (MXU
        # int8 x int8 -> int32; the cache is never converted)
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
        qh_ref[:].reshape(bb * H, dh), e_ref[:], (((1,), (1,)), ((), ())),
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
        # fold V scales into the probabilities, re-quantize to int8 with
        # a per-(batch, head) dynamic scale, contract against raw int8 V
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
    alpha_exp = jnp.sum(alpha[..., None] * sel_f[None], axis=1)  # [bb, D]
    acc_ref[:] = acc_ref[:] * alpha_exp + contrib


def _pick_blocks(B: int, W: int, D2: int, itemsize: int):
    import os

    override = os.environ.get("DECODE_ATTN_BLOCKS")
    if override:
        bb, bw = (int(x) for x in override.split(","))
        bb = min(bb, B)
        # A partial tail W-block reads out of bounds and CRASHES the TPU
        # worker outright (not just garbage data) -- refuse the config
        # instead of letting the kernel take the device down.
        if bw != W:
            raise ValueError(
                f"DECODE_ATTN_BLOCKS window block bw={bw} must equal the "
                f"cache window W={W}: a partial tail block reads out of "
                "bounds and hard-crashes the TPU worker"
            )
        if B % bb:
            raise ValueError(
                f"DECODE_ATTN_BLOCKS batch block bb={bb} must divide B={B}"
            )
        return bb, bw
    # bw MUST equal W: a partial tail block reads out of bounds, which
    # crashed the TPU worker outright (bf16 cache, W=1408, bw=768); bw
    # also has to stay a multiple of 128 for the [.., 2H, bw] scales
    # block -- W always is.
    # bb=8 with full-width blocks measured best up to B=64 (20.65k vs
    # 17.7k at bb=16); at B=128 the wider bb=16 block halves the step
    # count and wins (24.1k vs 23.4k tok/s end-to-end). Both swept with
    # bw=W int8 at W=1408.
    bb = 8 if B < 128 else 16
    bb = min(bb, B)
    # keep double-buffered K|V blocks within ~3/4 of the VMEM budget
    while bb > 1 and 2 * bb * W * D2 * itemsize > 75e6:
        bb //= 2
    return bb, W


@functools.partial(jax.jit, static_argnames=("n_head",))
def _run(scalars, q8bd, sq, qh, kv8, e_rows, sc, *, n_head: int):
    L, B, W, D2 = kv8.shape
    D = D2 // 2
    H = n_head
    dh = D // H
    quant = sc is not None
    bb, bw = _pick_blocks(B, W, D2, 1 if quant else 2)
    nb, nw = pl.cdiv(B, bb), pl.cdiv(W, bw)

    in_specs = [
        pl.BlockSpec((bb, H, D), lambda i, j, s: (i, 0, 0)),
        pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)),
        pl.BlockSpec((bb, H, dh), lambda i, j, s: (i, 0, 0)),
        pl.BlockSpec((1, bb, bw, D2), lambda i, j, s: (s[0], i, j, 0)),
        pl.BlockSpec((bw, dh), lambda i, j, s: (j, 0)),
    ]
    args = [scalars, q8bd, sq, qh, kv8, e_rows]
    body = functools.partial(_kernel, n_head=H, d_head=dh, bw=bw,
                             quant=quant)
    if quant:
        in_specs.append(
            pl.BlockSpec((1, bb, 2 * H, bw), lambda i, j, s: (s[0], i, 0, j))
        )
        args.append(sc)
        kernel = body
    else:
        in_specs.pop(1)  # no sq
        args.pop(2)
        def kernel(sr, qbdr, qhr, kvr, er, accr, mr, lr):
            body(sr, qbdr, None, qhr, kvr, er, None, accr, mr, lr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, nw),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bb, D), lambda i, j, s: (i, 0)),
            pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)),
            pl.BlockSpec((bb, H), lambda i, j, s: (i, 0)),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
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
    length,               # int32 scalar: number of valid cached rows
):
    """Unnormalized flash decode over the cached rows of one layer.

    Returns (acc [B, D] f32, m [B, H] f32, l [B, H] f32); fold in the
    current token with merge_self."""
    B, H, dh = q_t.shape
    D = H * dh
    r_head = jnp.arange(D) // dh
    diag = r_head[None, None, :] == jnp.arange(H)[None, :, None]
    if sc is not None:
        qf = q_t.astype(jnp.float32)
        sq = jnp.max(jnp.abs(qf), axis=-1) / 127.0 + 1e-20  # [B, H]
        q8 = jnp.round(qf / sq[..., None]).astype(jnp.int8).reshape(B, D)
        # block-diagonal layout built host-side: Mosaic has no int8
        # multiply, and bool-mask relayout to int8 tiling fails in-kernel
        qbd = jnp.where(diag, q8[:, None, :], jnp.int8(0))  # [B, H, D]
        sq = sq.astype(jnp.float32)
    else:
        q2 = q_t.reshape(B, D).astype(jnp.bfloat16)
        qbd = jnp.where(diag, q2[:, None, :], jnp.bfloat16(0))
        sq = None
    qh = q_t.astype(jnp.bfloat16)
    scalars = jnp.stack(
        [jnp.asarray(layer, jnp.int32), jnp.asarray(length, jnp.int32)]
    )
    return _run(scalars, qbd, sq, qh, kv8, e_rows, sc, n_head=H)


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
# contiguous 3.9 MB chunk), the query attends to the staged tail in XLA
# (tail_attention below, merged into the kernel's unnormalized flash
# triple), and every S steps the whole stage quantizes + lands in the main
# cache with a single slab DUS pair -- the same 2560 descriptors, paid once
# per S steps instead of every step.


def tail_attention(
    q_t: jnp.ndarray,      # [B, H, dh]
    k_pend: jnp.ndarray,   # [S, B, D] staged keys (bf16, unquantized)
    v_pend: jnp.ndarray,   # [S, B, D] staged values
    e_tail: jnp.ndarray,   # [S, dh] relative rows: expand_e_rows(e, p+1, S)
    p_cnt,                 # int32 scalar: live staged rows (0..S)
):
    """Unnormalized flash triple over the staged (not-yet-flushed) rows.

    Same logit convention as the kernel: staged row s sits at absolute
    window position F+s, so its relative row is E[ms-1-p+s] -- which is
    exactly ``expand_e_rows(e, p_cnt+1, S)`` independent of F. Rows past
    p_cnt are masked. Returns (acc [B, D] f32, m [B, H], l [B, H]);
    combine with the kernel's triple via merge_states."""
    B, H, dh = q_t.shape
    S = k_pend.shape[0]
    D = H * dh
    # round operands to bf16 like the kernel's (bf16-cache) dots do, so the
    # staged tail's numerics track the kernel path's: bf16 products, f32
    # accumulation (the MXU convention)
    qf = q_t.astype(jnp.bfloat16).astype(jnp.float32)
    k4 = (
        k_pend.reshape(S, B, H, dh).astype(jnp.bfloat16).astype(jnp.float32)
    )
    logits = (
        jnp.einsum("bhd,sbhd->bhs", qf, k4)
        + jnp.einsum(
            "bhd,sd->bhs", qf,
            e_tail.astype(jnp.bfloat16).astype(jnp.float32),
        )
    ) / math.sqrt(dh)  # [B, H, S]
    live = (jnp.arange(S) < p_cnt)[None, None, :]
    logits = jnp.where(live, logits, _NEG)
    m = jnp.max(logits, axis=-1)  # [B, H] (== _NEG when p_cnt == 0)
    p = jnp.where(live, jnp.exp(logits - m[..., None]), 0.0)
    l = jnp.sum(p, axis=-1)
    p16 = p.astype(jnp.bfloat16).astype(jnp.float32)
    v4 = (
        v_pend.reshape(S, B, H, dh).astype(jnp.bfloat16).astype(jnp.float32)
    )
    acc = jnp.einsum("bhs,sbhd->bhd", p16, v4)  # [B, H, dh]
    return acc.reshape(B, D), m, l


def merge_states(acc1, m1, l1, acc2, m2, l2, n_head: int):
    """Combine two unnormalized flash triples (order-independent).

    accs are [B, D] f32 with D = H*dh; m/l are [B, H]. An empty side
    (m == _NEG, l == 0, acc == 0) merges as the identity: exp(_NEG - m)
    underflows to 0 when the other side is live, and when BOTH are empty
    the exp(0) = 1 factors multiply zero accs/ls harmlessly."""
    B, D = acc1.shape
    dh = D // n_head
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    expand = lambda x: jnp.broadcast_to(
        x[:, :, None], (B, n_head, dh)
    ).reshape(B, D)
    acc = acc1 * expand(a1) + acc2 * expand(a2)
    l = l1 * a1 + l2 * a2
    return acc, m, l


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

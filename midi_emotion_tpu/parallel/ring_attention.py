"""Ring attention: sequence-sharded relative attention over an ICI ring.

SURVEY long-context stretch goal. The single-chip paths (ops/attention.py
XLA closed form, ops/pallas_attention.py flash kernel) hold all T keys on
one chip; past ~2048 context the O(T) KV residency and O(T^2) score work
are worth spreading over a mesh axis. Here Q/K/V are sharded along the
SEQUENCE dim: each device keeps its own query chunk and streams every
key/value chunk past it around the ring (`jax.lax.ppermute` over ICI,
one hop per step, n_devices steps), merging per-chunk results with the
online-softmax (flash) recurrence. Peak memory per chip is O(T/n); the
rotation overlaps with compute under XLA's async collectives.

Relative bias across chunks: with the query chunk at global offset qo and
the visiting key chunk at ko, Srel[a, b] = q[a] . E[max_seq-1-((qo+a)-(ko+b))]
(the reference's qe-masking + skewing closed form, ops/attention.py). The
needed E rows form one contiguous band of 2C-1 rows; the diagonal
extraction S[a, b] = band[a, C-1-a+b] is done with a pad-flatten-reshape
shift (each row advances one column -- the reference's own "skewing"
trick, music_multi.py:245-254, generalized to offset chunk pairs), so the
whole bias is two reshapes and a matmul: no gathers, clean VJP.

Numerically identical to the single-chip path (tests/test_ring_attention.py
checks fwd and grads on the 8-device CPU mesh), and differentiable end to
end -- ppermute has a transpose rule, so the same ring runs in the
backward pass.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = float(-1e30)


def _chunk_rel_bias(q, e_ext, delta, C: int, max_seq: int):
    """Relative-position bias for one (q-chunk, k-chunk) pair.

    q: [B, H, C, dh]; e_ext: [max_seq + 2T, dh] (E zero-padded by T rows on
    both sides); delta: TRACED q_offset - k_offset (multiple of C).
    Returns [B, H, C, C] with bias[a, b] = q[a] . E[max_seq-1-(delta+a-b)],
    zero where the distance is negative (j > i globally).
    """
    B, H, _, dh = q.shape
    T_pad = (e_ext.shape[0] - max_seq) // 2
    W = 2 * C - 1
    # band rows m = 0..2C-2 hold E[max_seq - delta - C + m] so that
    # m = C-1 - a + b  <=>  distance d = delta + a - b
    start = max_seq + T_pad - delta - C
    e_band = jax.lax.dynamic_slice_in_dim(e_ext, start, W, axis=0)  # [W, dh]
    qe = jnp.einsum("bhad,md->bham", q, e_band)  # [B, H, C, W]
    # want S[a, b] = qe[a, C-1-a+b]; with columns reversed
    # (qeC[a, m'] = qe[a, W-1-m']) and OUTPUT columns reversed this is
    # Srev[a, b'] = qeC[a, a+b'] -- a shift-left-by-row-index, which the
    # flat view with row stride W+1 yields for free:
    qeC = qe[..., ::-1]
    flat = qeC.reshape(B, H, C * W)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, C)))
    srev = flat.reshape(B, H, C, W + 1)[..., :C]
    srel = srev[..., ::-1]  # undo the output-column reversal
    a = jnp.arange(C)[:, None]
    b = jnp.arange(C)[None, :]
    dist = delta + a - b  # [C, C], traced
    return jnp.where(dist >= 0, srel, 0.0)


def ring_relative_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    axis_name: str,
    causal: bool = True,
    pad_keys: Optional[jnp.ndarray] = None,
):
    """Shard-local body: call INSIDE shard_map with the sequence dim sharded.

    q, k, v: [B, H, C, dh] local chunks (C = T / axis size); e: [max_seq, dh]
    replicated; pad_keys: [B, C] local bool chunk or None. Returns the local
    [B, H, C, dh] output chunk. Bit-compatible with
    ops.attention.relative_attention on the gathered arrays.
    """
    B, H, C, dh = q.shape
    max_seq = e.shape[0]
    n = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    scale = 1.0 / math.sqrt(dh)

    T_pad = n * C
    e_ext = jnp.pad(e.astype(jnp.float32), ((T_pad, T_pad), (0, 0)))

    if pad_keys is None:
        pad_local = jnp.zeros((B, C), bool)
    else:
        pad_local = pad_keys

    m_acc = jnp.full((B, H, C, 1), NEG_INF, jnp.float32)
    l_acc = jnp.zeros((B, H, C, 1), jnp.float32)
    o_acc = jnp.zeros((B, H, C, dh), jnp.float32)

    kv = (k, v, pad_local)
    perm = [(i, (i + 1) % n) for i in range(n)]  # ring: shard i -> i+1

    for step in range(n):
        k_cur, v_cur, pad_cur = kv
        src = (my - step) % n  # owner of the chunk we currently hold
        qo = my * C
        ko = src * C
        delta = qo - ko

        s = jnp.einsum("bhad,bhcd->bhac", q.astype(jnp.float32),
                       k_cur.astype(jnp.float32))
        s = s + _chunk_rel_bias(q.astype(jnp.float32), e_ext, delta, C,
                                max_seq)
        s = s * scale

        a = jnp.arange(C)[:, None]
        b = jnp.arange(C)[None, :]
        masked = jnp.broadcast_to(pad_cur[:, None, None, :], (B, 1, C, C))
        if causal:
            future = (delta + a - b) < 0  # global j > i
            masked = masked | future[None, None]
        s = jnp.where(masked, NEG_INF, s)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_acc, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_acc - m_new)
        l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_acc = o_acc * alpha + jnp.einsum(
            "bhac,bhcd->bhad", p, v_cur.astype(jnp.float32)
        )
        m_acc = m_new

        if step != n - 1:
            kv = jax.lax.ppermute(kv, axis_name, perm)

    safe = jnp.where(l_acc > 0.0, l_acc, 1.0)
    return (o_acc / safe).astype(q.dtype)


def ring_global_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    e: jnp.ndarray,
    causal: bool = True,
    pad_keys: Optional[jnp.ndarray] = None,
    mesh=None,
    seq_axis: str = "seq",
    batch_axis: str = "data",
):
    """Ring attention on GLOBAL [B, H, T, dh] arrays, callable from inside
    a jitted model (models/model.py dispatches here for attn_impl="ring").

    The sequence dim is sharded over ``mesh[seq_axis]`` and the batch dim
    over ``mesh[batch_axis]`` (other mesh axes replicated); each
    (data, seq) shard runs the shard-local ring body, with K/V chunks
    ppermuted around the seq axis. With ``mesh=None`` the ambient mesh is
    used -- enter ``jax.sharding.set_mesh(mesh)`` (or pass the concrete
    mesh) before tracing. T must divide by the seq-axis size; B by the
    batch-axis size. This is what breaks the reference's max_seq=2048
    context cap (build_model.py:22): the E/positional tables are sized by
    the config, and per-chip score work and KV residency are O(T/n).
    """
    if pad_keys is None:
        pad_keys = jnp.zeros((q.shape[0], q.shape[2]), bool)
    qkv_spec = P(batch_axis, None, seq_axis, None)

    def _local(q_, k_, v_, e_, pad_):
        return ring_relative_attention(
            q_, k_, v_, e_, seq_axis, causal=causal, pad_keys=pad_
        )

    f = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(), P(batch_axis, seq_axis)),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return f(q, k, v, e, pad_keys)


def make_ring_attention(mesh, axis: str = "data", causal: bool = True):
    """Wrap ring_relative_attention in shard_map over `mesh[axis]`.

    Returns fn(q, k, v, e, pad_keys=None) on GLOBAL [B, H, T, dh] arrays
    with T divisible by the axis size. Residual dims are replicated; bring
    your own jit."""
    spec = P(None, None, axis, None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(), P(None, axis)),
        out_specs=spec,
        check_vma=False,
    )
    def _sharded(q, k, v, e, pad_keys):
        return ring_relative_attention(
            q, k, v, e, axis, causal=causal, pad_keys=pad_keys
        )

    def apply(q, k, v, e, pad_keys=None):
        if pad_keys is None:
            pad_keys = jnp.zeros((q.shape[0], q.shape[2]), bool)
        return _sharded(q, k, v, e, pad_keys)

    return apply

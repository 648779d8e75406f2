"""Unified Music Transformer.

One parameterized Flax module replacing the reference's three near-identical
model files (music_multi.py, music_continuous_token.py, music_regression.py):

 * mode "none" / "discrete_token": vanilla decoder (conditioning, if any,
   lives in the vocabulary) -- music_multi.py with d_condition <= 0;
 * mode "continuous_concat": a Linear(2 -> d_condition) embeds
   (valence, arousal), tiled over the sequence and concatenated on the
   channel dim (music_multi.py:94-99);
 * mode "continuous_token": two Linear(1 -> d_model) condition embeddings
   prepended on the sequence dim (music_continuous_token.py:91-97), with
   the pad mask built from the token stream left-padded by -1
   (music_continuous_token.py:86-87);
 * mode "regression": unmasked encoder + Linear(d -> 2) + tanh over the
   first position (music_regression.py:64-67, 87).

Besides the full-sequence ``__call__`` (training/eval), the module exposes a
``prefill`` / ``decode_step`` pair for the static-shape KV-cached sampler:
``prefill`` runs the full path over the prompt and returns per-layer K/V
written into fixed-size window buffers; ``decode_step`` advances one token
entirely on device. With causal masking these are numerically identical to
re-running the full forward and taking the last position -- which is what
the reference does every step (generate.py:101-119), at O(T^2) cost.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import decode_rel_attention, relative_attention
from ..ops.dropout import RecomputeDropout
from ..ops.layernorm import FusedLayerNorm
from .config import ModelConfig
from .positional import sinusoid_table

# Cache pytree: {"k": L-tuple of [B, W, d_model] time-major buffers (the
# merged channel axis is a multiple of 128 lanes, so the cache never pads;
# see ops.attention.decode_rel_attention), "v": same, "length": int32 []}
Cache = Dict[str, Any]

def _uniform_pm(scale: float):
    """torch-style uniform(-scale, scale) initializer (init_weights,
    music_multi.py:75-82)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class RelativeGlobalAttention(nn.Module):
    """music_multi.py:167-238 -- multi-head attention with the learned
    relative-position table E [max_seq, d_head]."""

    d_model: int
    n_head: int
    max_seq: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        dh = self.d_model // self.n_head
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        self.wq = dense("Wq")
        self.wk = dense("Wk")
        self.wv = dense("Wv")
        self.fc = dense("fc")
        # torch.randn init (music_multi.py:185)
        self.e_table = self.param(
            "E", nn.initializers.normal(stddev=1.0), (self.max_seq, dh), jnp.float32
        )

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        return x.reshape(B, T, self.n_head, -1).transpose(0, 2, 1, 3)

    @staticmethod
    def _pad_t(x: jnp.ndarray, n: int) -> jnp.ndarray:
        return jnp.pad(x, ((0, 0), (0, n), (0, 0))) if n > 0 else x

    def __call__(
        self,
        x: jnp.ndarray,
        causal: bool,
        pad_keys: Optional[jnp.ndarray],
        return_kv: bool = False,
    ):
        from ..ops.attention import resolve_attn_impl

        B, T, _ = x.shape
        Tp = T
        if resolve_attn_impl(self.attn_impl) == "pallas":
            # pre-pad to the kernel's block multiple HERE, where the
            # tensors are [B, T, d_model]: the kernel's own pads run after
            # the head transpose on [B, H, T, 48], whose 48-lane minor dim
            # is HBM-padded to 128 (2.7x the pad bytes; ~2 ms/step at the
            # flagship shape). The tail is masked via pad_keys and sliced
            # off after the merge below.
            from ..ops.pallas_attention import padded_len

            # only when the padded length stays within the E table: the
            # kernel's own padding path front-pads E to keep distance
            # indexing valid past max_seq; pre-padded inputs skip that
            # (pad_t=0), so Tp > max_seq would trip _prepare's assert.
            if padded_len(T) <= self.max_seq:
                Tp = padded_len(T)
        # pad x ONCE and run the projections on the padded rows: one
        # [B, Tp, d] pad (+ one slice in its adjoint) replaces three, at
        # the price of Tp/T (~5%) extra rows through the QKV GEMMs --
        # measured net win at the flagship shape. Tail rows become the
        # projection BIAS (not zeros); that is safe because tail keys are
        # masked via pad_keys below and tail q rows are sliced off after
        # the merge, so no live row ever reads a tail value.
        xp = self._pad_t(x, Tp - T)
        proj = lambda w: self._split(w(xp))
        q = proj(self.wq)
        k = proj(self.wk)
        v = proj(self.wv)
        if Tp > T:
            base = (
                pad_keys
                if pad_keys is not None
                else jnp.zeros((B, T), bool)
            )
            pad_keys = jnp.pad(base, ((0, 0), (0, Tp - T)),
                               constant_values=True)
        e = self.e_table.astype(self.dtype)
        out = relative_attention(
            q, k, v, e, causal=causal, pad_keys=pad_keys, impl=self.attn_impl
        )
        B, H, _, dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, Tp, H * dh)
        if Tp > T:
            out = out[:, :T, :]
        out = self.fc(out)
        if return_kv:
            # cache consumers want exactly the T live rows
            if Tp > T:
                k, v = k[:, :, :T, :], v[:, :, :T, :]
            return out, k, v
        return out

    def decode(
        self,
        x_t: jnp.ndarray,
        k_cache: jnp.ndarray,
        v_cache: jnp.ndarray,
        length: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One-token step. x_t: [B, d]; caches [B, W, d] time-major (see
        decode_rel_attention's layout rationale); length counts valid
        entries including the current token."""
        B = x_t.shape[0]
        dh = self.d_model // self.n_head
        q = self.wq(x_t).reshape(B, self.n_head, dh)
        k_t = self.wk(x_t)  # [B, d] -- cache rows stay channel-merged
        v_t = self.wv(x_t)
        pos = length - 1
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k_t[:, None, :], pos, axis=1
        )
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v_t[:, None, :], pos, axis=1
        )
        e = self.e_table.astype(self.dtype)
        out = decode_rel_attention(q, k_cache, v_cache, e, length)
        return self.fc(out.reshape(B, -1)), k_cache, v_cache

    def decode_q(
        self,
        x_t: jnp.ndarray,
        kv8: jnp.ndarray,
        sc,  # scales, or None for the unquantized bf16 stacked cache
        layer_idx: int,
        length: jnp.ndarray,
    ):
        """One-token step against the stacked (int8 or bf16) cache (see
        ops/decode_attention.py). ``length`` counts CACHED rows (the
        current token is folded in exactly via merge_self and returned as
        the next pending row). Returns (attn_out [B, d], pending row
        [B, 2d], pending scales [B, 2H] or None)."""
        from ..ops.decode_attention import (
            decode_attn_cached, expand_e_rows, merge_self, quantize_rows,
        )

        B = x_t.shape[0]
        dh = self.d_model // self.n_head
        q = self.wq(x_t).reshape(B, self.n_head, dh)
        k_t = self.wk(x_t)
        v_t = self.wv(x_t)
        e = self.e_table.astype(self.dtype)
        e_rows = expand_e_rows(e, length + 1, kv8.shape[2])
        acc, m, l = decode_attn_cached(q, kv8, sc, layer_idx, e_rows, length)
        out = merge_self(acc, m, l, q, k_t, v_t, e[-1])  # [B, d]
        row = jnp.concatenate([k_t, v_t], axis=-1)  # [B, 2d]
        if sc is None:
            return self.fc(out), row.astype(jnp.bfloat16), None
        row8, rsc = quantize_rows(row[:, None, :], 2 * self.n_head)
        return self.fc(out), row8[:, 0], rsc[:, :, 0]

    def decode_q_staged(
        self,
        x_t: jnp.ndarray,
        kv8: jnp.ndarray,
        sc,
        pend: jnp.ndarray,  # [S, L, B, 2d] bf16 staged rows
        layer_idx: int,
        f_len,              # int32: rows FLUSHED into the stacked cache
        p_cnt,              # int32: live staged rows (current pos = f+p)
    ):
        """decode_q against a cache whose last p_cnt rows are still in the
        step-major staged buffer (ops/decode_attention.py staging notes):
        ONE kernel call covers the flushed rows, folds the staged tail
        in-VMEM, merges the self term, normalizes, and appends this
        token's row at stage slot (p_cnt, layer_idx) in place. Returns
        (attn_out [B, d], updated pend); quantization happens at flush
        time, not per step."""
        from ..ops.decode_attention import decode_attn_cached, expand_e_rows

        B = x_t.shape[0]
        d = self.d_model
        dh = d // self.n_head
        S = pend.shape[0]
        q = self.wq(x_t).reshape(B, self.n_head, dh)
        k_t = self.wk(x_t)
        v_t = self.wv(x_t)
        e = self.e_table.astype(self.dtype)
        length = f_len + p_cnt  # total attendable rows (excl. current)
        e_rows = expand_e_rows(e, length + 1, kv8.shape[2])
        # S + 1 rows: index p_cnt lands on E[ms-1], the self bias row
        e_pend = expand_e_rows(e, p_cnt + 1, S + 1)
        row = jnp.concatenate([k_t, v_t], axis=-1).astype(jnp.bfloat16)
        out, pend = decode_attn_cached(
            q, kv8, sc, layer_idx, e_rows, f_len, pend, e_pend, p_cnt, row
        )
        return self.fc(out.astype(x_t.dtype)), pend


class EncoderLayer(nn.Module):
    """Post-LN block (music_multi.py:110-135): RGA -> dropout ->
    LN(x + attn) -> ReLU MLP -> dropout -> LN(residual)."""

    d_model: int
    d_inner: int
    n_head: int
    max_seq: int
    dropout: float
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        self.rga = RelativeGlobalAttention(
            self.d_model, self.n_head, self.max_seq, self.dtype, self.attn_impl
        )
        self.ffn_pre = nn.Dense(self.d_inner, dtype=self.dtype, name="FFN_pre")
        self.ffn_suf = nn.Dense(self.d_model, dtype=self.dtype, name="FFN_suf")
        # fused Pallas kernel on TPU (XLA's LayerNorm backward splits into
        # ~40 slow [B*T, D] -> [D] reduction fusions at the flagship shape);
        # same "scale"/"bias" param tree as nn.LayerNorm
        self.ln1 = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype, name="layernorm1")
        self.ln2 = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype, name="layernorm2")

    def __call__(
        self,
        x,
        pad_keys,
        causal: bool = True,
        deterministic: bool = True,
        return_kv: bool = False,
    ):
        if return_kv:
            attn, k, v = self.rga(x, causal, pad_keys, return_kv=True)
        else:
            attn = self.rga(x, causal, pad_keys)
        # training: dropout + residual add + LayerNorm run as ONE Pallas
        # kernel with in-kernel PRNG (ops/fused_dropout.py) -- the mask,
        # the dropout output, and the pre-LN sum never touch HBM. The
        # dispatch inside FusedLayerNorm falls back to the composed path
        # (RecomputeDropout + layernorm) off-TPU / at unfusable shapes.
        if not deterministic and self.dropout > 0.0:
            out1 = self.ln1(x, drop_sub=attn, drop_rate=self.dropout,
                            drop_key=self.make_rng("dropout"))
        else:
            out1 = self.ln1(attn + x)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        if not deterministic and self.dropout > 0.0:
            out2 = self.ln2(out1, drop_sub=ffn, drop_rate=self.dropout,
                            drop_key=self.make_rng("dropout"))
        else:
            out2 = self.ln2(out1 + ffn)
        if return_kv:
            return out2, k, v
        return out2

    def decode(self, x_t, k_cache, v_cache, length):
        attn, k_cache, v_cache = self.rga.decode(x_t, k_cache, v_cache, length)
        out1 = self.ln1(attn + x_t)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        out2 = self.ln2(out1 + ffn)
        return out2, k_cache, v_cache

    def decode_q(self, x_t, kv8, sc, layer_idx, length):
        attn, row8, rsc = self.rga.decode_q(x_t, kv8, sc, layer_idx, length)
        out1 = self.ln1(attn + x_t)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        out2 = self.ln2(out1 + ffn)
        return out2, row8, rsc

    def decode_q_staged(self, x_t, kv8, sc, pend, layer_idx, f_len, p_cnt):
        attn, pend = self.rga.decode_q_staged(
            x_t, kv8, sc, pend, layer_idx, f_len, p_cnt
        )
        out1 = self.ln1(attn + x_t)
        ffn = self.ffn_suf(nn.relu(self.ffn_pre(out1)))
        out2 = self.ln2(out1 + ffn)
        return out2, pend


class MusicTransformer(nn.Module):
    config: ModelConfig
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        cfg = self.config
        self.embedding = nn.Embed(
            cfg.vocab_size,
            cfg.embed_dim,
            embedding_init=_uniform_pm(0.1),  # init_weights, music_multi.py:77
            dtype=self.dtype,
            name="embedding",
        )
        if cfg.mode == "continuous_concat":
            self.fc_condition = nn.Dense(
                cfg.effective_d_condition,
                kernel_init=_uniform_pm(0.1),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="fc_condition",
            )
        if cfg.mode == "continuous_token":
            self.fc_conditions = [
                nn.Dense(
                    cfg.d_model,
                    kernel_init=_uniform_pm(0.1),
                    bias_init=nn.initializers.zeros,
                    dtype=self.dtype,
                    name=f"fc_condition_{i}",
                )
                for i in range(cfg.n_conditions)
            ]

        layer_cls = EncoderLayer
        if cfg.remat:
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if getattr(cfg, "remat_policy", "full") == "dots"
                else None  # None = save nothing, recompute everything
            )
            layer_cls = nn.remat(
                EncoderLayer, static_argnums=(3, 4, 5), policy=policy
            )
        self.enc_layers = [
            layer_cls(
                cfg.d_model,
                cfg.d_inner,
                cfg.n_head,
                cfg.max_seq,
                cfg.dropout,
                self.dtype,
                self.attn_impl,
                name=f"enc_layers_{i}",
            )
            for i in range(cfg.n_layer)
        ]
        self.drop = RecomputeDropout(cfg.dropout)
        out_dim = cfg.output_size if cfg.is_regression else cfg.vocab_size
        self.fc = nn.Dense(
            out_dim,
            kernel_init=_uniform_pm(0.1),  # init_weights, music_multi.py:78-79
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc",
        )
        self.pos_table = jnp.asarray(sinusoid_table(cfg.max_seq, cfg.d_model))

    # ------------------------------------------------------------------
    def _embed(self, tokens: jnp.ndarray, condition: Optional[jnp.ndarray]):
        """Token/condition embedding + mask for the full-sequence path.

        Returns (x [B, T', d_model], mask or None) where T' includes the
        continuous_token prefix.
        """
        cfg = self.config
        x = self.embedding(tokens)
        causal = True
        if cfg.mode == "continuous_token":
            x = x * math.sqrt(cfg.d_model)
            # left-pad with -1 so condition slots never match pad
            # (music_continuous_token.py:86-87)
            padded = jnp.pad(tokens, ((0, 0), (cfg.n_conditions, 0)), constant_values=-1)
            pad_keys = padded == cfg.pad_id
            c = self.condition_prefix(condition)
            x = jnp.concatenate([c, x], axis=1)
        elif cfg.is_regression:
            x = x * math.sqrt(cfg.d_model)
            causal, pad_keys = False, None  # no_mask (music_regression.py:37,77)
        else:
            x = x * math.sqrt(cfg.embed_dim)
            pad_keys = tokens == cfg.pad_id
            if cfg.effective_d_condition > 0:
                ce = self.condition_embedding(condition)  # [B, d_cond]
                tiled = jnp.broadcast_to(
                    ce[:, None, :], (x.shape[0], x.shape[1], ce.shape[-1])
                )
                x = jnp.concatenate([x, tiled], axis=-1)
        x = x + self.pos_table[None, : x.shape[1], :].astype(x.dtype)
        return x, causal, pad_keys

    def condition_embedding(self, condition: jnp.ndarray) -> jnp.ndarray:
        """continuous_concat channel block [B, d_condition]."""
        return self.fc_condition(condition)

    def condition_prefix(self, condition: jnp.ndarray) -> jnp.ndarray:
        """continuous_token prefix [B, n_conditions, d_model]."""
        cols = [
            self.fc_conditions[i](condition[:, i, None])
            for i in range(self.config.n_conditions)
        ]
        return jnp.stack(cols, axis=1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        tokens: jnp.ndarray,
        condition: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Full-sequence forward.

        tokens: [B, T] int32. condition: [B, 2] float (ignored for
        none/discrete/regression). Returns [B, T + seq_prefix, vocab]
        logits, or [B, output_size] for regression.
        """
        cfg = self.config
        x, causal, pad_keys = self._embed(tokens, condition)
        x = self.drop(x, deterministic=deterministic)
        for layer in self.enc_layers:
            x = layer(x, pad_keys, causal, deterministic, False)
        if cfg.is_regression:
            return jnp.tanh(self.fc(x[:, 0, :]))
        return self.fc(x)

    # ------------------------------------------------------------------
    def prefill(
        self,
        tokens: jnp.ndarray,
        condition: Optional[jnp.ndarray],
        window: int,
    ) -> Tuple[jnp.ndarray, Cache]:
        """Run the prompt through the full path, capturing K/V into
        fixed-size time-major [B, window, d_model] buffers (minor dim is
        the merged channel axis -- a multiple of 128 lanes, so the cache
        never pays the dh=48 -> 128 lane padding; see
        decode_rel_attention). Returns (last-position logits [B, vocab],
        cache)."""
        cfg = self.config
        x, causal, pad_keys = self._embed(tokens, condition)
        B = x.shape[0]
        T = x.shape[1]
        ks: List[jnp.ndarray] = []
        vs: List[jnp.ndarray] = []
        for layer in self.enc_layers:
            x, k, v = layer(x, pad_keys, causal, True, True)
            # [B, H, T, dh] -> time-major channel-merged [B, window, d]
            merge = lambda y: y.transpose(0, 2, 1, 3).reshape(B, T, -1)
            pad_width = ((0, 0), (0, window - T), (0, 0))
            ks.append(jnp.pad(merge(k), pad_width))
            vs.append(jnp.pad(merge(v), pad_width))
        logits = self.fc(x[:, -1, :])
        # per-layer tuples (NOT a stacked [L, ...] array): each layer's
        # buffer is its own pytree leaf, so the scan carry aliases it and
        # dynamic_update_slice stays in-place -- a stacked cache forces a
        # full-cache copy per layer per decoded token
        cache: Cache = {
            "k": tuple(ks),
            "v": tuple(vs),
            "length": jnp.asarray(T, jnp.int32),
        }
        return logits, cache

    def prefill_q(
        self,
        tokens: jnp.ndarray,
        condition: Optional[jnp.ndarray],
        window: int,
        quantize: bool = True,
    ) -> Tuple[jnp.ndarray, Cache]:
        """Prefill into the STACKED cache (ops/decode_attention.py):
        kv [L, B, W, 2d] K|V-merged rows -- int8 with [L, B, 2H, W] bf16
        per-(row, head) scales when ``quantize``, plain bf16 otherwise --
        plus the pending-row buffers the deferred append uses. Returns
        (last-position logits, cache)."""
        from ..ops.decode_attention import quantize_rows

        cfg = self.config
        x, causal, pad_keys = self._embed(tokens, condition)
        B, T = x.shape[0], x.shape[1]
        kv8s, scs = [], []
        for layer in self.enc_layers:
            x, k, v = layer(x, pad_keys, causal, True, True)
            merge = lambda y: y.transpose(0, 2, 1, 3).reshape(B, T, -1)
            rows = jnp.concatenate([merge(k), merge(v)], axis=-1)
            if quantize:
                row8, rsc = quantize_rows(rows, 2 * cfg.n_head)
                scs.append(jnp.pad(rsc, ((0, 0), (0, 0), (0, window - T))))
            else:
                row8 = rows.astype(jnp.bfloat16)
            kv8s.append(jnp.pad(row8, ((0, 0), (0, window - T), (0, 0))))
        logits = self.fc(x[:, -1, :])
        kv8 = jnp.stack(kv8s)  # [L, B, W, 2d]
        # pending = a copy of the last prompt row; the first decode step
        # re-appends it in place (identical bytes, a no-op semantically),
        # keeping the scan body uniform
        cache: Cache = {
            "kv": kv8,
            "row": kv8[:, :, T - 1, :],
            "length": jnp.asarray(T, jnp.int32),
        }
        if quantize:
            sc = jnp.stack(scs)  # [L, B, 2H, W]
            cache["sc"] = sc
            cache["rsc"] = sc[:, :, :, T - 1]
        return logits, cache

    def decode_step_q(
        self,
        token_t: jnp.ndarray,
        cond_emb: Optional[jnp.ndarray],
        cache: Cache,
    ) -> Tuple[jnp.ndarray, Cache]:
        """Advance one token against the stacked int8 cache: land the
        previous step's pending rows (2 ops for all layers -- the whole
        point of the deferred-append layout), then run each layer's fused
        kernel + exact self-term merge."""
        cfg = self.config
        quant = "sc" in cache
        length = cache["length"]  # rows including pending
        pos = length - 1
        kv8 = jax.lax.dynamic_update_slice(
            cache["kv"], cache["row"][:, :, None, :],
            (0, 0, pos, 0),
        )
        sc = None
        if quant:
            sc = jax.lax.dynamic_update_slice(
                cache["sc"], cache["rsc"][:, :, :, None],
                (0, 0, 0, pos),
            )
        x = self.embedding(token_t)
        if cfg.mode == "continuous_token":
            x = x * math.sqrt(cfg.d_model)
        else:
            x = x * math.sqrt(cfg.embed_dim)
            if cfg.effective_d_condition > 0:
                x = jnp.concatenate([x, cond_emb], axis=-1)
        pos_vec = self.pos_table[length].astype(x.dtype)
        x = x + pos_vec[None, :]
        rows, rscs = [], []
        for i, layer in enumerate(self.enc_layers):
            x, row_i, rsc_i = layer.decode_q(x, kv8, sc, i, length)
            rows.append(row_i)
            rscs.append(rsc_i)
        logits = self.fc(x)
        new_cache: Cache = {
            "kv": kv8,
            "row": jnp.stack(rows),
            "length": length + 1,
        }
        if quant:
            new_cache["sc"] = sc
            new_cache["rsc"] = jnp.stack(rscs)
        return logits, new_cache

    def decode_step_staged(
        self,
        token_t: jnp.ndarray,
        cond_emb: Optional[jnp.ndarray],
        kv8: jnp.ndarray,
        sc,                  # scales or None (bf16 stacked cache)
        pend: jnp.ndarray,   # [S, L, B, 2d] bf16 staged rows
        f_len,               # int32: rows flushed into kv8
        p_cnt,               # int32: live staged rows
    ):
        """One token against the stacked cache WITHOUT touching it: each
        layer's kernel call covers the f_len flushed rows, folds the
        staged tail in-VMEM, and appends its own K|V row into stage slot
        (p_cnt, layer) through an ALIASED kernel output (an XLA-level
        stage append forced the scan carry to copy the whole stage every
        step -- ops/decode_attention.py staging notes). The sampler
        flushes the stage every S steps (flush_pend). Returns (logits,
        updated pend)."""
        cfg = self.config
        length = f_len + p_cnt
        x = self.embedding(token_t)
        if cfg.mode == "continuous_token":
            x = x * math.sqrt(cfg.d_model)
        else:
            x = x * math.sqrt(cfg.embed_dim)
            if cfg.effective_d_condition > 0:
                x = jnp.concatenate([x, cond_emb], axis=-1)
        pos_vec = self.pos_table[length].astype(x.dtype)
        x = x + pos_vec[None, :]
        for i, layer in enumerate(self.enc_layers):
            x, pend = layer.decode_q_staged(x, kv8, sc, pend, i, f_len, p_cnt)
        logits = self.fc(x)
        return logits, pend

    def decode_step(
        self,
        token_t: jnp.ndarray,
        cond_emb: Optional[jnp.ndarray],
        cache: Cache,
    ) -> Tuple[jnp.ndarray, Cache]:
        """Advance one token. token_t: [B] int32; cond_emb: precomputed
        continuous_concat block [B, d_cond] or None. Returns (logits
        [B, vocab], updated cache)."""
        cfg = self.config
        length = cache["length"] + 1
        x = self.embedding(token_t)
        if cfg.mode == "continuous_token":
            x = x * math.sqrt(cfg.d_model)
        else:
            x = x * math.sqrt(cfg.embed_dim)
            if cfg.effective_d_condition > 0:
                x = jnp.concatenate([x, cond_emb], axis=-1)
        pos = self.pos_table[length - 1].astype(x.dtype)
        x = x + pos[None, :]
        ck, cv = list(cache["k"]), list(cache["v"])
        for i, layer in enumerate(self.enc_layers):
            x, ck[i], cv[i] = layer.decode(x, ck[i], cv[i], length)
        logits = self.fc(x)
        return logits, {"k": tuple(ck), "v": tuple(cv), "length": length}


def init_params(model: MusicTransformer, rng: jax.Array, batch: int = 1, seq: int = 8):
    tokens = jnp.zeros((batch, seq), jnp.int32)
    condition = jnp.zeros((batch, 2), jnp.float32)
    init = jax.jit(lambda r: model.init({"params": r}, tokens, condition, True))
    return init(rng)["params"]

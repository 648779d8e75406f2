"""Static-shape, KV-cached, batched autoregressive sampler.

Replaces the reference's per-token host loop (generate.py:93-189), which
re-forwards the full window through the model for every generated token and
syncs device->host per token for temperature selection and repeat counting.
Here prefill, per-step decode, dual-temperature selection, repeat penalty,
top-k/top-p, and the categorical draw all run on device inside ``lax.scan``
chunks with fixed shapes; the host sees only token matrices.

Two chunking mechanisms, both invisible to the sampled distribution:

 * **Staged cache growth.** Decode reads the whole (static) KV buffer every
   step, so early steps over a generation-length buffer waste bandwidth.
   The buffer starts small and is zero-padded (on device) to the next
   power-of-two-ish stage between scan chunks, halving average cache
   traffic. Token-for-token identical to a fixed-size buffer (attention
   masks entries beyond the live length).

 * **Window sliding in hops.** Past ``max_input_len`` the reference slides
   its window by one token per step (generate.py:101-103). Each refresh
   here re-prefills the FULL reference window (the last max_input_len
   tokens) and then takes ``slide_hop`` samples: the first sample of every
   chunk sees exactly the reference's context, and the following hop-1
   decode steps see a *growing* window (more context than the reference,
   never less). ``slide_hop=1`` is token-identical with the reference
   through the sliding region (tests/test_sliding_window.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.model import MusicTransformer
from ..ops.sampling import SamplingParams, sample_step
from ..vocab import Vocab


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class Sampler:
    def __init__(
        self,
        model: MusicTransformer,
        params,
        vocab: Vocab,
        sampling: SamplingParams,
        slide_hop: Optional[int] = None,
        cache_stage: int = 256,
        kv_dtype: str = "native",
        stage_steps: Optional[int] = None,
    ):
        cfg = model.config
        assert not cfg.is_regression, "regression models cannot generate"
        assert kv_dtype in ("native", "int8", "bf16"), kv_dtype
        # staged pending-row buffer depth for the stacked-cache paths
        # (ops/decode_attention.py staging notes); 0 = legacy per-step
        # append. Env knob so bench sweeps don't need code changes.
        if stage_steps is None:
            import os

            raw = os.environ.get("MIDI_EMOTION_DECODE_STAGE", "8")
            try:
                stage_steps = int(raw)
            except ValueError:
                raise ValueError(
                    f"MIDI_EMOTION_DECODE_STAGE={raw!r}: must be an integer "
                    "(staged rows per flush; 0 disables staging)"
                ) from None
        if not 0 <= stage_steps <= 128:
            raise ValueError(
                f"stage_steps={stage_steps}: must be in [0, 128] (the "
                "sampler's window slack only guarantees in-bounds flushes "
                "for modest stage depths)"
            )
        self.stage_steps = stage_steps if kv_dtype != "native" else 0
        self.model = model
        self.params = params
        self.vocab = vocab
        self.sampling = sampling
        self.cfg = cfg
        self.cache_stage = cache_stage
        # "int8": stacked quantized KV cache + fused Pallas decode kernel
        # (ops/decode_attention.py) -- ~half the HBM traffic per decoded
        # token; sampled tokens can differ from the bit-exact "native"
        # path within int8 quantization error. "bf16": the same stacked
        # layout + fused kernel WITHOUT quantization -- unquantized cache
        # numerics, still collects the deferred-append and fused-softmax
        # wins (tokens can differ from "native" only by the online-softmax
        # summation order).
        self.kv_dtype = kv_dtype
        self._prefill_method = (
            MusicTransformer.prefill if kv_dtype == "native"
            else MusicTransformer.prefill_q
        )
        self._decode_method = (
            MusicTransformer.decode_step if kv_dtype == "native"
            else MusicTransformer.decode_step_q
        )

        self.exclude_mask = jnp.asarray(vocab.special_mask())
        self.ts_range = (int(vocab.timeshift_base), int(vocab.base_size))
        self.slide_hop = slide_hop
        self._jit_cache = {}

    # ------------------------------------------------------------------
    def _prefill_core(self, prompt_len: int, window: int):
        """Jitted prompt prefill -> (logits, cache, ce)."""
        key = ("prefill", prompt_len, window, self.kv_dtype)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg = self.model, self.cfg

        prefill_method = self._prefill_method
        extra = () if self.kv_dtype == "native" else (self.kv_dtype == "int8",)

        @jax.jit
        def run(params, prompt, cond):
            variables = {"params": params}
            logits, cache = model.apply(
                variables, prompt, cond, window, *extra,
                method=prefill_method,
            )
            ce = jnp.zeros((prompt.shape[0], 1), jnp.float32)
            if cfg.mode == "continuous_concat":
                ce = model.apply(
                    variables, cond, method=MusicTransformer.condition_embedding
                )
            return logits, cache, ce

        self._jit_cache[key] = run
        return run

    def _grow_cache(self, cache, w_out: int):
        """Pad KV buffers to w_out so old buffers free as soon as their
        pad completes (an in-jit whole-cache pad holds both generations
        live -> OOM at large batch)."""
        quant = "kv" in cache
        w_in = cache["kv"].shape[2] if quant else cache["k"][0].shape[1]
        if w_in == w_out:
            return cache
        grow = w_out - w_in
        key = ("pad", quant, w_in, w_out,
               cache["kv"].shape if quant else cache["k"][0].shape,
               tuple(sorted(cache.keys())))
        if key not in self._jit_cache:
            # ONE dispatch for the whole pytree (per-leaf calls cost a
            # tunnel round-trip each). Transitions hold old+new
            # generations live (~2x); safe because generate() disables
            # staging when the full cache exceeds the threshold.
            if quant:
                # pad kv (axis 2) / sc (axis 3); every other entry (length,
                # legacy row/rsc, staged pend) is window-independent
                def pad_all(c):
                    out = dict(c)
                    out["kv"] = jnp.pad(
                        c["kv"], ((0, 0), (0, 0), (0, grow), (0, 0))
                    )
                    if "sc" in c:
                        out["sc"] = jnp.pad(
                            c["sc"], ((0, 0), (0, 0), (0, 0), (0, grow))
                        )
                    return out
            else:
                def pad_all(c):
                    pad = lambda x: jnp.pad(x, ((0, 0), (0, grow), (0, 0)))
                    return {
                        "k": tuple(pad(k) for k in c["k"]),
                        "v": tuple(pad(v) for v in c["v"]),
                        "length": c["length"],
                    }

            self._jit_cache[key] = jax.jit(pad_all)
        return self._jit_cache[key](cache)

    def _scan_core(self, n_steps: int, window: int, varying: bool):
        """Jitted sample+decode scan over a fixed-size cache.

        Carries logits across chunk boundaries, so every chunk's first
        sample comes from the previous chunk's final decode (no wasted
        steps). Returns (tokens [n,B], logits, cache, counts)."""
        key = ("scan", n_steps, window, varying, self.kv_dtype)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, sampling = self.model, self.cfg, self.sampling
        exclude_mask, ts_range = self.exclude_mask, self.ts_range
        decode_method = self._decode_method

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, cache, logits0, temp_key0, counts0, uniforms, cond_seq, ce):
            variables = {"params": params}
            step_ce = None if cfg.mode != "continuous_concat" else ce

            def body(carry, xs):
                u, cond_t = xs
                logits, cache, temp_key, counts = carry
                token, counts = sample_step(
                    logits, temp_key, counts, u, exclude_mask, ts_range, sampling
                )
                ce_t = step_ce
                if varying:
                    ce_t = model.apply(
                        variables, cond_t, method=MusicTransformer.condition_embedding
                    )
                new_logits, cache = model.apply(
                    variables, token, ce_t, cache,
                    method=decode_method,
                )
                return (new_logits, cache, token, counts), token

            init = (logits0, cache, temp_key0, counts0)
            (logits, cache, last, counts), tokens = jax.lax.scan(
                body, init, (uniforms, cond_seq), length=n_steps
            )
            return tokens, logits, cache, counts

        self._jit_cache[key] = run
        return run

    def _to_staged(self, cache, batch: int):
        """Convert a prefill_q cache to the staged form: drop the legacy
        pending-row buffers (the last prompt row is already IN kv at
        position length-1) and allocate the step-major stage."""
        if "pend" in cache:
            return cache
        S = self.stage_steps
        L, B, W, D2 = cache["kv"].shape
        out = {
            "kv": cache["kv"],
            "length": cache["length"],
            "pend": jnp.zeros((S, L, B, D2), jnp.bfloat16),
        }
        if "sc" in cache:
            out["sc"] = cache["sc"]
        return out

    def _scan_core_staged(self, n_steps: int, window: int, varying: bool):
        """Staged-append variant of _scan_core (kv_dtype int8/bf16 only):
        an outer scan over n_steps // S super-steps -- each an inner
        S-step scan that never touches the main cache, followed by ONE
        slab flush -- plus a flush-less remainder scan. Kills the
        0.86 ms/step scattered-DUS append cost (ops/decode_attention.py
        staging notes). Chunks whose cache is carried forward are sized
        to a multiple of S by generate(), so carried caches are always
        fully flushed (length == flushed rows)."""
        S = self.stage_steps
        key = ("scan_staged", n_steps, window, varying, self.kv_dtype, S)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, sampling = self.model, self.cfg, self.sampling
        exclude_mask, ts_range = self.exclude_mask, self.ts_range
        n_super, rem = divmod(n_steps, S)

        from ..ops.decode_attention import flush_pend

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(params, cache, logits0, temp_key0, counts0, uniforms, cond_seq, ce):
            variables = {"params": params}
            step_ce = None if cfg.mode != "continuous_concat" else ce
            quant = "sc" in cache

            def run_inner(kv, sc, f_len, sm, u, cs, count):
                """count decode steps against a FIXED flushed cache."""
                def body(carry, xs):
                    u_t, cond_t, p_idx = xs
                    logits, pend, temp_key, counts = carry
                    token, counts = sample_step(
                        logits, temp_key, counts, u_t, exclude_mask,
                        ts_range, sampling,
                    )
                    ce_t = step_ce
                    if varying:
                        ce_t = model.apply(
                            variables, cond_t,
                            method=MusicTransformer.condition_embedding,
                        )
                    new_logits, pend = model.apply(
                        variables, token, ce_t, kv, sc, pend, f_len, p_idx,
                        method=MusicTransformer.decode_step_staged,
                    )
                    return (new_logits, pend, token, counts), token

                return jax.lax.scan(body, sm, (u, cs, jnp.arange(count)))

            kv, sc = cache["kv"], cache.get("sc")
            f_len = cache["length"]
            pend = cache["pend"]
            sm = (logits0, pend, temp_key0, counts0)
            token_blocks = []

            if n_super:
                u_main = uniforms[: n_super * S].reshape(n_super, S, -1)
                c_main = cond_seq[: n_super * S].reshape(
                    n_super, S, *cond_seq.shape[1:]
                )

                def outer(carry, xs):
                    kv, sc_c, f_len, sm = carry
                    sc_in = sc_c if quant else None
                    sm, tokens = run_inner(kv, sc_in, f_len, sm, *xs, S)
                    kv, sc_out = flush_pend(
                        kv, sc_in, sm[1], f_len, cfg.n_head
                    )
                    sc_c = sc_out if quant else jnp.zeros((), jnp.int8)
                    return (kv, sc_c, f_len + S, sm), tokens

                sc_c = sc if quant else jnp.zeros((), jnp.int8)
                (kv, sc_c, f_len, sm), tokens = jax.lax.scan(
                    outer, (kv, sc_c, f_len, sm), (u_main, c_main)
                )
                sc = sc_c if quant else None
                token_blocks.append(tokens.reshape(n_super * S, -1))

            if rem:
                sm, tokens_r = run_inner(
                    kv, sc, f_len, sm, uniforms[n_super * S :],
                    cond_seq[n_super * S :], rem,
                )
                token_blocks.append(tokens_r)

            logits, pend, _, counts = sm
            new_cache = {
                "kv": kv,
                "length": f_len + rem,  # == f_len when rem == 0 (carried)
                "pend": pend,
            }
            if quant:
                new_cache["sc"] = sc
            tokens = (
                token_blocks[0] if len(token_blocks) == 1
                else jnp.concatenate(token_blocks, axis=0)
            )
            return tokens, logits, new_cache, counts

        self._jit_cache[key] = run
        return run

    # ------------------------------------------------------------------
    def _exact_scan_core(self, n_steps: int, window: int, n_prefix: int):
        """Jitted full-window-forward sampling scan (reference-exact).

        The reference re-embeds the whole visible window under the CURRENT
        step's condition every iteration (generate.py:101-119), so when the
        condition varies per step (generate.py:35-36, 110-113) every cached
        K/V would be stale: the only exact semantics is a full forward per
        token. This scan keeps that loop entirely on device with a static
        [B, window] ring buffer -- right-padded with pad_id (the model's own
        key-pad masking makes the padded forward equal the reference's
        variable-length one) and rolled once the reference window fills.
        """
        key = ("exact", n_steps, window, n_prefix)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, sampling = self.model, self.cfg, self.sampling
        exclude_mask, ts_range = self.exclude_mask, self.ts_range

        @jax.jit
        def run(params, buf, length0, temp_key0, counts0, uniforms, cond_seq,
                prefix_ids):
            variables = {"params": params}

            def fwd(buf, cond_t):
                inp = buf
                if n_prefix:
                    inp = jnp.concatenate([prefix_ids, buf], axis=1)
                return model.apply(variables, inp, cond_t, True)

            def body(carry, xs):
                u, cond_t = xs
                buf, length, temp_key, counts = carry
                logits_full = fwd(buf, cond_t)
                pos = cfg.seq_prefix + n_prefix + length - 1
                logits = jax.lax.dynamic_slice_in_dim(
                    logits_full, pos, 1, axis=1
                )[:, 0]
                token, counts = sample_step(
                    logits, temp_key, counts, u, exclude_mask, ts_range,
                    sampling,
                )
                appended = jax.lax.dynamic_update_slice(
                    buf, token[:, None], (0, length)
                )
                rolled = jnp.concatenate([buf[:, 1:], token[:, None]], axis=1)
                buf = jnp.where(length >= window, rolled, appended)
                length = jnp.minimum(length + 1, window)
                return (buf, length, token, counts), token

            init = (buf, length0, temp_key0, counts0)
            (buf, length, last, counts), tokens = jax.lax.scan(
                body, init, (uniforms, cond_seq), length=n_steps
            )
            return tokens, counts

        self._jit_cache[key] = run
        return run

    def generate_exact(
        self,
        primer_ids: np.ndarray,
        continuous_conditions: Optional[np.ndarray] = None,
        discrete_prefix_ids: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        uniforms: Optional[np.ndarray] = None,
        varying_conditions: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Reference-exact generation: a full-window forward per token.

        Same contract as :meth:`generate`; exists for per-step
        ``varying_conditions`` (where KV caching is necessarily approximate
        -- see generate()'s docstring) and as the bit-exact oracle. Roughly
        window/2 x the FLOPs of the cached path, still batched/on-device.
        """
        cfg, sampling = self.cfg, self.sampling
        primer_ids = np.asarray(primer_ids, np.int32)
        B, P = primer_ids.shape

        max_input_len = sampling.max_input_len
        n_prefix = 0
        prefix_arr = jnp.zeros((B, 0), jnp.int32)
        if cfg.mode == "continuous_token":
            max_input_len -= cfg.n_conditions  # generate.py:75-77
        if discrete_prefix_ids is not None:
            discrete_prefix_ids = np.asarray(discrete_prefix_ids, np.int32)
            n_prefix = discrete_prefix_ids.shape[1]
            max_input_len -= n_prefix  # generate.py:80-82
            prefix_arr = jnp.asarray(discrete_prefix_ids)

        n_total_steps = sampling.gen_len - 1
        if uniforms is None:
            if rng is None:
                rng = jax.random.PRNGKey(max(0, sampling.seed))
            uniforms = jax.random.uniform(rng, (n_total_steps, B), jnp.float32)
        else:
            uniforms = jnp.asarray(uniforms, jnp.float32)
            assert uniforms.shape == (n_total_steps, B)

        # per-step conditions: sampled token t (1-indexed) is drawn from a
        # forward under condition index t-1 (generate.py:110-113)
        if varying_conditions is not None:
            assert cfg.mode in ("continuous_concat", "continuous_token"), (
                "per-step conditions apply to the continuous modes only"
            )
            vc = np.asarray(varying_conditions, np.float32)
            assert vc.shape == (B, sampling.gen_len, 2), vc.shape
            cond_seq = jnp.asarray(vc[:, :n_total_steps].transpose(1, 0, 2))
        else:
            if continuous_conditions is None:
                cond = np.zeros((B, 2), np.float32)
            else:
                cond = np.asarray(continuous_conditions, np.float32)
            cond_seq = jnp.broadcast_to(
                jnp.asarray(cond)[None], (n_total_steps, B, 2)
            )

        W = max_input_len
        assert P <= W, (P, W)
        buf = np.full((B, W), self.vocab.pad_id, np.int32)
        buf[:, :P] = primer_ids
        run = self._exact_scan_core(n_total_steps, W, n_prefix)
        tokens, _counts = run(
            self.params,
            jnp.asarray(buf),
            jnp.asarray(P, jnp.int32),
            jnp.asarray(primer_ids[:, 0]),
            jnp.zeros((B,), jnp.int32),
            uniforms,
            cond_seq,
            prefix_arr,
        )
        return np.concatenate([primer_ids, np.asarray(tokens).T], axis=1)

    # ------------------------------------------------------------------
    def generate(
        self,
        primer_ids: np.ndarray,
        continuous_conditions: Optional[np.ndarray] = None,
        discrete_prefix_ids: Optional[np.ndarray] = None,
        rng: Optional[jax.Array] = None,
        uniforms: Optional[np.ndarray] = None,
        varying_conditions: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Generate a batch of token sequences.

        Args:
          primer_ids: [B, P] int32 -- e.g. a column of <START> ids. These
            appear in the output, like the reference's gen_song seeding
            (generate.py:62-73,99).
          continuous_conditions: [B, 2] (valence, arousal) for
            continuous_concat / continuous_token.
          discrete_prefix_ids: [B, C] emotion-token ids prepended to every
            model input but never emitted (generate.py:105-107).
          rng: JAX PRNGKey (defaults to seed from SamplingParams).
          uniforms: optional [gen_len-1, B] pre-drawn uniforms -- the RNG
            injection hook used for cross-framework parity tests.
          varying_conditions: optional [B, gen_len, 2] per-step
            (valence, arousal) interpolation (reference generate.py:35-36,
            110-113). continuous_concat only; cached positions keep the
            condition they were generated under (the reference re-embeds
            the whole window each step) -- documented approximation.

        Returns: [B, P + gen_len - 1] int32 -- primer plus sampled tokens
          (the reference's final sampled token is likewise never appended,
          generate.py:99,183).
        """
        cfg, sampling = self.cfg, self.sampling
        primer_ids = np.asarray(primer_ids, np.int32)
        B, P = primer_ids.shape

        max_input_len = sampling.max_input_len
        n_prefix = 0
        if cfg.mode == "continuous_token":
            max_input_len -= cfg.n_conditions  # generate.py:75-77
        if discrete_prefix_ids is not None:
            discrete_prefix_ids = np.asarray(discrete_prefix_ids, np.int32)
            n_prefix = discrete_prefix_ids.shape[1]
            max_input_len -= n_prefix  # generate.py:80-82

        varying = varying_conditions is not None
        if varying:
            assert cfg.mode == "continuous_concat", (
                "per-step conditions require the channel-concat mode; the "
                "sequence-prefix modes bake conditions into the KV cache"
            )
            vc = np.asarray(varying_conditions, np.float32)
            assert vc.shape == (B, sampling.gen_len, 2), vc.shape
            cond = jnp.asarray(vc[:, 0])
        elif continuous_conditions is None:
            cond = jnp.zeros((B, 2), jnp.float32)
        else:
            cond = jnp.asarray(continuous_conditions, jnp.float32)

        n_total_steps = sampling.gen_len - 1
        if uniforms is None:
            if rng is None:
                rng = jax.random.PRNGKey(max(0, sampling.seed))
            uniforms = jax.random.uniform(rng, (n_total_steps, B), jnp.float32)
        else:
            uniforms = jnp.asarray(uniforms, jnp.float32)
            assert uniforms.shape == (n_total_steps, B)

        counts = jnp.zeros((B,), jnp.int32)
        # first-step temperature key: first primer row (generate.py:140:
        # gen_inds[0] is the first row of the just-appended block)
        temp_key = jnp.asarray(primer_ids[:, 0])

        def model_input(tok_block: np.ndarray) -> np.ndarray:
            if discrete_prefix_ids is not None:
                return np.concatenate([discrete_prefix_ids, tok_block], axis=1)
            return tok_block

        # tokens stay ON DEVICE between chunks (each host fetch costs a
        # full tunnel round-trip; profiling showed fetches were 1/3 of
        # wall time); the host only sees token ids at refresh boundaries
        # (sliding prompts) and at the very end
        device_chunks = []  # [n_i, B] device arrays
        song_len = P
        fetched = primer_ids  # host copy up to `fetched_len`
        steps_done = 0
        hop = self.slide_hop or max(1, max_input_len // 8)
        stage = self.cache_stage
        # staged growth trades transition copies for lower average read
        # bandwidth; at large batch the transitions themselves exceed HBM
        # (old + new cache live together), so fall back to one full-size
        # allocation
        w_max = min(
            _round_up(max_input_len + n_prefix + cfg.seq_prefix + hop, 128),
            cfg.max_seq,
        )
        if self.kv_dtype != "native":
            # Stacked-cache kernel paths: allocate FULL width up front.
            # The kernel's dead-block skip (ops/decode_attention.py
            # _clamped_j) means blocks past `length` never DMA, so a
            # full-size cache reads only ceil(length/bw) blocks/step --
            # growth would save nothing, and its transitions (old + new
            # cache live together) were what OOM'd B>=144 int8 serving.
            # w_max is already a multiple of the swept-best 128-wide skip
            # block (scripts/perf_decode_skip.py: bw=128 beats coarser
            # tiles at every length, including full width).
            stage = w_max
        else:
            itemsize = 2 if self.model.dtype == jnp.bfloat16 else 4
            full_cache_bytes = (
                2 * cfg.n_layer * B * cfg.n_head * w_max * cfg.d_head
                * itemsize
            )
            # worst transition holds old + new stage live (< 2x full); the
            # time-major cache layout is unpadded, so up to ~13 GB of the
            # 16 GB HBM can be cache before staging must be disabled
            if full_cache_bytes > 6.5e9:
                stage = w_max

        def fetch_song() -> np.ndarray:
            """Materialize all sampled tokens on the host (one transfer)."""
            nonlocal fetched, device_chunks
            if device_chunks:
                host = [np.asarray(t) for t in device_chunks]
                fetched = np.concatenate([fetched] + [h.T for h in host], axis=1)
                device_chunks = []
            return fetched

        state = None  # (logits, cache, w_cur) between chunks
        while steps_done < n_total_steps:
            cur_len = song_len  # tokens so far (excl. prefixes)
            overhead = n_prefix + cfg.seq_prefix

            if state is None or cur_len > max_input_len:
                # (re)prefill over the full reference window
                visible = min(cur_len, max_input_len)
                song = fetch_song()
                prompt = model_input(song[:, cur_len - visible :])
                # chunk length: fill to the next cache stage (or hop when
                # sliding)
                if cur_len > max_input_len:
                    n_steps = hop
                else:
                    live = visible + overhead
                    w_cur = min(
                        max(_round_up(live + 1, stage), stage),
                        w_max,
                    )
                    n_steps = w_cur - live
                if cur_len > max_input_len:
                    w_cur = (
                        w_max if self.kv_dtype != "native"
                        else min(
                            _round_up(visible + overhead + n_steps + 1, 128),
                            cfg.max_seq,
                        )
                    )
                else:
                    # sample k's context is cur_len + k tokens; past the
                    # reference window a refresh is required for parity
                    n_steps = min(n_steps, max_input_len - cur_len + 1)
                n_steps = max(1, min(n_total_steps - steps_done, n_steps))
                assert visible + overhead + n_steps <= w_cur <= cfg.max_seq, (
                    visible, overhead, n_steps, w_cur,
                )
                prefill = self._prefill_core(prompt.shape[1], w_cur)
                logits, cache, ce = prefill(
                    self.params, jnp.asarray(prompt), cond
                )
                w_in = w_cur
            else:
                logits, cache, ce, w_in = state
                live = cur_len + overhead
                w_cur = min(
                    max(_round_up(live + 1, stage), w_in),
                    w_max,
                )
                n_steps = min(
                    n_total_steps - steps_done,
                    w_cur - live,
                    max_input_len - cur_len + 1,
                )
                assert n_steps >= 1, (live, w_cur, cur_len, max_input_len)

            # staged-append chunks that will carry their cache forward must
            # be a multiple of the stage depth S, so the carried cache is
            # always fully flushed (see _scan_core_staged). Chunks that end
            # discarded (final chunk, window-slide refreshes) may keep a
            # remainder in the stage.
            discard_state = False
            staged = self.stage_steps > 0 and self.kv_dtype != "native"
            if staged:
                S = self.stage_steps
                will_carry = (
                    song_len + n_steps <= max_input_len
                    and steps_done + n_steps < n_total_steps
                )
                if will_carry and n_steps % S:
                    trimmed = (n_steps // S) * S
                    if trimmed == 0:
                        # too few steps to complete a flush: run them and
                        # re-prefill next chunk instead of carrying an
                        # unflushed cache
                        discard_state = True
                    else:
                        n_steps = trimmed

            u_chunk = jax.lax.dynamic_slice_in_dim(uniforms, steps_done, n_steps, 0)
            if varying:
                # scan step j decodes the logits for reference iteration
                # j+2, which uses condition index j+1 (generate.py:110-113)
                cond_seq = jnp.asarray(
                    vc[:, steps_done + 1 : steps_done + 1 + n_steps].transpose(1, 0, 2)
                )
            else:
                cond_seq = jnp.zeros((n_steps, B, 2), jnp.float32)

            if staged:
                cache = self._to_staged(cache, B)
            cache = self._grow_cache(cache, w_cur)
            scan = (
                self._scan_core_staged(n_steps, w_cur, varying)
                if staged
                else self._scan_core(n_steps, w_cur, varying)
            )
            tokens, logits, cache, counts = scan(
                self.params, cache, logits, temp_key, counts, u_chunk,
                cond_seq, ce,
            )
            device_chunks.append(tokens)  # [n_steps, B], stays on device
            song_len += n_steps
            temp_key = tokens[-1]  # device slice, no host sync
            steps_done += n_steps
            if song_len > max_input_len or discard_state:
                state = None  # next chunk re-prefills (sliding)
            else:
                state = (logits, cache, ce, w_cur)

        return fetch_song()

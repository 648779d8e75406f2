"""Static-shape, KV-cached, batched autoregressive sampler.

Replaces the reference's per-token host loop (generate.py:93-189), which
re-forwards the full window through the model for every generated token and
syncs device->host per token for temperature selection and repeat counting.
Here the whole generation -- prefill, per-step decode, dual-temperature
selection, repeat penalty, top-k/top-p, categorical draw -- runs on device
inside one ``lax.scan`` with fixed shapes; the host sees only the final
token matrix.

Long generations past the context window are handled in hop-sized chunks:
the reference slides its window by one token every step (generate.py:101-103,
at O(window) recompute per token); we refresh the KV cache only every
``slide_hop`` tokens (one prefill per hop, O(window/hop) amortized). With
``slide_hop=1`` this reproduces the reference's exact per-token window; the
default trades a slightly-older window start (never older than ``hop``
tokens) for an asymptotic speedup.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
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
    ):
        cfg = model.config
        assert not cfg.is_regression, "regression models cannot generate"
        self.model = model
        self.params = params
        self.vocab = vocab
        self.sampling = sampling
        self.cfg = cfg

        self.exclude_mask = jnp.asarray(vocab.special_mask())
        self.ts_range = (int(vocab.timeshift_base), int(vocab.base_size))

        # effective window: the reference shrinks max_input_len so the
        # condition prefix always fits (generate.py:75-82)
        self.n_discrete_prefix = 0  # set per-call
        self._jit_cache = {}
        self.slide_hop = slide_hop

    # ------------------------------------------------------------------
    def _core(self, n_steps: int, window: int, varying: bool = False):
        """Build (and cache) the jitted prefill+scan core for a given
        static (n_steps, window, varying)."""
        key = (n_steps, window, varying)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model, cfg, sampling = self.model, self.cfg, self.sampling
        exclude_mask, ts_range = self.exclude_mask, self.ts_range

        @jax.jit
        def run(params, prompt, cond, uniforms, counts0, temp_key0, cond_seq):
            variables = {"params": params}
            logits0, cache = model.apply(
                variables, prompt, cond, window, method=MusicTransformer.prefill
            )
            ce = None
            if cfg.mode == "continuous_concat":
                ce = model.apply(
                    variables, cond, method=MusicTransformer.condition_embedding
                )

            def body(carry, xs):
                u, cond_t = xs
                logits, cache, temp_key, counts = carry
                token, counts = sample_step(
                    logits, temp_key, counts, u, exclude_mask, ts_range, sampling
                )
                step_ce = ce
                if varying:
                    step_ce = model.apply(
                        variables, cond_t, method=MusicTransformer.condition_embedding
                    )
                new_logits, cache = model.apply(
                    variables, token, step_ce, cache,
                    method=MusicTransformer.decode_step,
                )
                return (new_logits, cache, token, counts), token

            init = (logits0, cache, temp_key0, counts0)
            (_, _, last_token, counts), tokens = jax.lax.scan(
                body, init, (uniforms, cond_seq), length=n_steps
            )
            return tokens, counts

        self._jit_cache[key] = run
        return run

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
            110-113). continuous_concat only. NOTE: the reference re-embeds
            the WHOLE window under the current condition every step; with a
            KV cache, cached positions keep the condition they were
            generated under -- a documented approximation.

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

        song = primer_ids
        steps_done = 0
        hop = self.slide_hop or max(1, max_input_len // 8)

        while steps_done < n_total_steps:
            # each refresh prefills the FULL reference window (the last
            # max_input_len tokens, generate.py:101-103); the first sample
            # of a chunk therefore sees exactly the reference's context,
            # and the following hop-1 decode steps see MORE context (the
            # window grows instead of sliding). slide_hop=1 is
            # token-identical with the reference through the sliding
            # region.
            visible = min(song.shape[1], max_input_len)
            prompt = model_input(song[:, song.shape[1] - visible :])
            if steps_done == 0 and visible < max_input_len:
                n_steps = max(max_input_len - visible, hop)
            else:
                n_steps = hop
            n_steps = min(n_total_steps - steps_done, n_steps)
            assert n_steps > 0
            # static window: model input length + steps + final (discarded)
            # decode write, rounded for layout friendliness
            window = _round_up(
                prompt.shape[1] + cfg.seq_prefix + n_steps + 1, 128
            )
            window = min(window, cfg.max_seq)
            assert window >= prompt.shape[1] + cfg.seq_prefix + n_steps + 1, (
                "window exceeds the relative-position table; lower "
                "max_input_len or gen chunk size"
            )
            run = self._core(n_steps, window, varying)
            u_chunk = jax.lax.dynamic_slice_in_dim(uniforms, steps_done, n_steps, 0)
            if varying:
                # scan step j decodes the logits for reference iteration
                # j+2, which uses condition index j+1 (generate.py:110-113)
                cond_seq = jnp.asarray(
                    vc[:, steps_done + 1 : steps_done + 1 + n_steps].transpose(
                        1, 0, 2
                    )
                )
                cond = jnp.asarray(vc[:, min(steps_done, vc.shape[1] - 1)])
            else:
                cond_seq = jnp.zeros((n_steps, B, 2), jnp.float32)
            tokens, counts = run(
                self.params, jnp.asarray(prompt), cond, u_chunk, counts,
                temp_key, cond_seq,
            )
            tokens = np.asarray(tokens)  # [n_steps, B]
            song = np.concatenate([song, tokens.T], axis=1)
            temp_key = jnp.asarray(song[:, -1])
            steps_done += n_steps

        return song

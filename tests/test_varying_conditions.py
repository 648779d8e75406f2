"""Per-step (interpolated) condition generation."""

import numpy as np
import pytest

import conftest

import jax

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.ops.sampling import SamplingParams
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

TINY = dict(
    vocab_size=1007, n_layer=2, n_head=4, d_model=64, d_inner=128,
    d_condition=16, max_seq=256, dropout=0.0,
)


def _sampler(mode="continuous_concat", gen_len=16):
    cfg = ModelConfig(mode=mode, **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    sp = SamplingParams(gen_len=gen_len, max_input_len=64, seed=5)
    return Sampler(model, params, DEFAULT_VOCAB, sp)


def test_varying_conditions_run_and_differ():
    s = _sampler()
    B, G = 2, 16
    primers = np.ones((B, 1), np.int32)
    # constant-at-extremes interpolation vs fixed condition
    ramp = np.linspace(-1, 1, G, dtype=np.float32)
    vc = np.stack([np.stack([ramp, -ramp], axis=-1)] * B)  # [B, G, 2]
    song_v = s.generate(primers, varying_conditions=vc)
    assert song_v.shape == (B, G)
    assert (song_v[:, 1:] >= 2).all()

    # a CONSTANT varying_conditions must equal plain conditions
    const = np.tile(np.array([[0.3, -0.4]], np.float32), (B, G, 1))
    a = s.generate(primers, varying_conditions=const)
    b = s.generate(primers, continuous_conditions=const[:, 0])
    np.testing.assert_array_equal(a, b)


def test_varying_rejected_for_prefix_modes():
    s = _sampler(mode="continuous_token")
    vc = np.zeros((1, 16, 2), np.float32)
    with pytest.raises(AssertionError):
        s.generate(np.ones((1, 1), np.int32), varying_conditions=vc)


@pytest.mark.parametrize("mode", ["none", "continuous_concat"])
def test_exact_path_matches_cached_path(mode):
    """With CONSTANT conditions the KV-cached decode is numerically the
    full forward, so the exact (full-forward-per-token) path must produce
    identical tokens -- including through the sliding region (gen_len >
    max_input_len, slide_hop=1 = reference-exact slide)."""
    cfg = ModelConfig(mode=mode, **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(1))
    sp = SamplingParams(gen_len=40, max_input_len=24, seed=9)
    s = Sampler(model, params, DEFAULT_VOCAB, sp, slide_hop=1)
    B = 2
    primers = np.ones((B, 1), np.int32)
    cond = (
        np.array([[0.5, -0.5], [-0.2, 0.8]], np.float32)
        if mode == "continuous_concat"
        else None
    )
    a = s.generate(primers, continuous_conditions=cond)
    b = s.generate_exact(primers, continuous_conditions=cond)
    np.testing.assert_array_equal(a, b)

"""Sliding-window generation: slide_hop=1 must be token-identical with the
reference's per-token window slide (generate.py:101-103) THROUGH the
sliding region, not just before it."""

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


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_exact_slide_matches_reference_past_window():
    import sys
    import types
    import torch

    for stub in ("pypianoroll", "pretty_midi"):
        sys.modules.setdefault(stub, types.ModuleType(stub))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import generate as ref_generate
    import models.music_multi as ref_multi

    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    gen_len, window, B = 40, 24, 2
    torch.manual_seed(21)
    cfg = ModelConfig(mode="none", **TINY, remat=False)
    ref_model = ref_multi.MusicTransformerMulti(
        embedding_dim=cfg.d_model, d_inner=cfg.d_inner, d_condition=-1,
        vocab_size=cfg.vocab_size, num_layer=cfg.n_layer, num_head=cfg.n_head,
        max_seq=cfg.max_seq, dropout=0.0, pad_token=0,
    ).eval()
    params = torch_state_dict_to_params(ref_model.state_dict(), cfg)
    maps = DEFAULT_VOCAB.get_maps()

    rng = np.random.RandomState(9)
    uniforms = rng.uniform(size=(gen_len, B)).astype(np.float32)

    draw = {"i": 0}

    def fake_multinomial(probs, n, replacement=True):
        u = torch.from_numpy(uniforms[draw["i"]]).to(probs.dtype)
        draw["i"] += 1
        cum = torch.cumsum(probs, dim=-1)
        return torch.argmax((cum >= u[:, None]).int(), dim=-1, keepdim=True)

    captured = []
    orig_str = ref_generate.ind_tensor_to_str

    def capture(x, *a, **k):
        captured.append(x.cpu().numpy().copy())
        return orig_str(x, *a, **k)

    orig_multinomial = torch.multinomial
    torch.multinomial = fake_multinomial
    ref_generate.ind_tensor_to_str = capture
    try:
        ref_generate.generate(
            ref_model, maps, torch.device("cpu"), out_dir="/tmp/x",
            conditioning="none", debug=True, verbose=False, amp=False,
            gen_len=gen_len, max_input_len=window, temperatures=[1.2, 1.3],
            top_k=-1, top_p=0.7, penalty_coeff=0.5,
            min_n_instruments=99,
            primers=[["<START>"], ["<START>"]],
        )
    finally:
        torch.multinomial = orig_multinomial
        ref_generate.ind_tensor_to_str = orig_str
    ref_song = np.stack(captured, axis=1)  # [T, B]
    assert ref_song.shape[0] == gen_len  # sliding definitely engaged

    model = MusicTransformer(cfg)
    sp = SamplingParams(
        gen_len=gen_len, max_input_len=window, temperatures=(1.2, 1.3),
        top_k=-1, top_p=0.7, penalty_coeff=0.5,
    )
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp, slide_hop=1)
    song = sampler.generate(np.ones((B, 1), np.int32), uniforms=uniforms[:-1])
    np.testing.assert_array_equal(song.T, ref_song)


def test_hop_gives_more_context_not_less():
    """With hop>1 the first sample after each refresh must equal the
    hop=1 (reference-exact) sample at that step, because both see the
    identical full window."""
    cfg = ModelConfig(mode="none", **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(3))
    window, gen_len = 16, 40
    uniforms = np.random.RandomState(0).uniform(size=(gen_len - 1, 1)).astype(
        np.float32
    )
    songs = {}
    for hop in (1, 4):
        sp = SamplingParams(gen_len=gen_len, max_input_len=window, seed=2,
                            top_p=0.7)
        s = Sampler(model, params, DEFAULT_VOCAB, sp, slide_hop=hop)
        songs[hop] = s.generate(np.ones((1, 1), np.int32), uniforms=uniforms)
    # before the window fills they are identical
    np.testing.assert_array_equal(songs[1][:, :window], songs[4][:, :window])

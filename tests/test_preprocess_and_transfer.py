"""Offline preprocessing driver + weight-transfer tool tests."""

import json
import os

import numpy as np
import pytest

import conftest

import jax

from midi_emotion_tpu.data import midi_io
from midi_emotion_tpu.data.loader import load_song_shard
from midi_emotion_tpu.data.preprocess import main as preprocess_main, process_song
from midi_emotion_tpu.convert.transfer import transfer_params
from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params

TINY = dict(
    n_layer=2, n_head=4, d_model=64, d_inner=128, d_condition=16,
    max_seq=128, dropout=0.0,
)


def _write_roll(path, seed=0, steps=96 * 6):
    rng = np.random.RandomState(seed)
    rolls = {}
    for name in ("PIANO", "BASS", "DRUMS"):
        roll = np.zeros((steps, 128), np.uint8)
        for _ in range(25):
            t = rng.randint(0, steps - 12)
            p = rng.randint(30, 100)
            roll[t : t + rng.randint(2, 12), p] = 100
        rolls[name] = roll
    midi_io.save_pianoroll_npz(path, rolls)


def test_preprocess_cli(tmp_path):
    src = tmp_path / "rolls"
    os.makedirs(src)
    for i in range(4):
        _write_roll(str(src / f"s{i}.npz"), seed=i)
    out = str(tmp_path / "shards")
    preprocess_main(
        ["--input_dir", str(src), "--out_dir", out, "--n_workers", "1"]
    )
    shards = [f for f in os.listdir(out) if f.endswith(".npz")]
    assert len(shards) == 4
    bars = load_song_shard(os.path.join(out, shards[0]))
    assert len(bars) > 0 and bars[0].shape[1] == 2
    # vocab.json written next to the shard dir
    assert os.path.exists(str(tmp_path / "vocab.json"))


def test_process_song_failure_returns_none(tmp_path):
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, garbage=np.zeros(3))
    assert process_song((bad, "bad", str(tmp_path))) is None


def test_transfer_same_config():
    cfg = ModelConfig(vocab_size=1007, mode="none", **TINY)
    m = MusicTransformer(cfg)
    a = init_params(m, jax.random.PRNGKey(0))
    b = init_params(m, jax.random.PRNGKey(1))
    out = transfer_params(a, b)
    np.testing.assert_array_equal(
        np.asarray(out["fc"]["kernel"]), np.asarray(a["fc"]["kernel"])
    )


def test_transfer_embedding_width_slice():
    """none (embed width d) -> continuous_concat (embed width d - d_cond):
    the overlapping slice transfers (transfer_model.py:36-41)."""
    cfg_a = ModelConfig(vocab_size=1007, mode="none", **TINY)
    cfg_b = ModelConfig(vocab_size=1007, mode="continuous_concat", **TINY)
    a = init_params(MusicTransformer(cfg_a), jax.random.PRNGKey(0))
    b = init_params(MusicTransformer(cfg_b), jax.random.PRNGKey(1))
    out = transfer_params(a, b)
    w = np.asarray(out["embedding"]["embedding"])
    assert w.shape == (1007, 64 - 16)
    np.testing.assert_array_equal(
        w, np.asarray(a["embedding"]["embedding"])[:, : 64 - 16]
    )
    # layer params transferred too
    np.testing.assert_array_equal(
        np.asarray(out["enc_layers_0"]["rga"]["E"]),
        np.asarray(a["enc_layers_0"]["rga"]["E"]),
    )
    # fc_condition has no source -> keeps target init
    np.testing.assert_array_equal(
        np.asarray(out["fc_condition"]["kernel"]),
        np.asarray(b["fc_condition"]["kernel"]),
    )


def test_transfer_vocab_growth():
    """Growing the vocab (e.g. +emotion tokens) keeps the old rows."""
    cfg_a = ModelConfig(vocab_size=1007, mode="none", **TINY)
    cfg_b = ModelConfig(vocab_size=1017, mode="none", **TINY)
    a = init_params(MusicTransformer(cfg_a), jax.random.PRNGKey(0))
    b = init_params(MusicTransformer(cfg_b), jax.random.PRNGKey(1))
    out = transfer_params(a, b)
    np.testing.assert_array_equal(
        np.asarray(out["embedding"]["embedding"])[:1007],
        np.asarray(a["embedding"]["embedding"]),
    )
    # fc head has mismatched vocab -> keeps fresh init (reference would
    # crash here; we keep the target)
    assert out["fc"]["kernel"].shape[1] == 1017


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_torch_export_roundtrip(tmp_path):
    """native checkpoint -> torch export -> the REFERENCE model loads it
    and produces identical logits."""
    import sys
    import types

    sys.modules.setdefault("pypianoroll", types.ModuleType("pypianoroll"))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import torch
    from models.build_model import build_model as ref_build

    from midi_emotion_tpu.models.model import MusicTransformer
    from midi_emotion_tpu.training.checkpoint import save_checkpoint
    from midi_emotion_tpu.convert.torch_export import main as export_main
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    # the reference's build_model hardcodes max_seq=2048 (build_model.py:22)
    cfg = ModelConfig(
        vocab_size=1007, mode="continuous_concat", **{**TINY, "max_seq": 2048}
    )
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(5))
    native = str(tmp_path / "native")
    save_checkpoint(native, params, cfg, DEFAULT_VOCAB)

    out = str(tmp_path / "torch")
    export_main(["--model_dir", native, "--out_dir", out])

    config = torch.load(out + "/model_config.pt", weights_only=False)
    ref_model, _ = ref_build(None, load_config_dict=config)
    ref_model.load_state_dict(torch.load(out + "/model.pt", weights_only=False))
    ref_model.eval()

    tokens = np.array([[1, 50, 900, 30]], np.int32)
    cond = np.array([[0.3, -0.7]], np.float32)
    ours = np.asarray(model.apply({"params": params}, tokens, cond, True))
    with torch.no_grad():
        theirs = ref_model(
            torch.from_numpy(tokens).long(), torch.from_numpy(cond)
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)

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

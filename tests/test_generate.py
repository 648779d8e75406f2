"""End-to-end generation API + CLI tests on a tiny random model."""

import os

import numpy as np
import pytest

import conftest

import jax

from midi_emotion_tpu.generation.generate import (
    continuous_to_discrete_symbols,
    generate,
)
from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.training.checkpoint import load_model_dir, save_checkpoint
from midi_emotion_tpu.vocab import DEFAULT_VOCAB, Vocab, emotion_bin_tokens

TINY = dict(
    vocab_size=1007,
    n_layer=2,
    n_head=4,
    d_model=64,
    d_inner=128,
    d_condition=16,
    max_seq=256,
    dropout=0.0,
)


def test_continuous_to_discrete_symbols():
    syms = continuous_to_discrete_symbols([[-0.99, 0.99], [0.0, -0.01]], 5)
    assert syms[0] == ["<V-2>", "<A2>"]
    assert syms[1] == ["<V0>", "<A0>"]


def test_generate_writes_midi(tmp_path):
    cfg = ModelConfig(mode="continuous_concat", **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    out = str(tmp_path / "gen")
    redo_p, redo_d, redo_c = generate(
        model,
        params,
        DEFAULT_VOCAB,
        out,
        "continuous_concat",
        continuous_conditions=[[0.8, 0.8], [-0.8, -0.8]],
        gen_len=32,
        max_input_len=64,
        min_n_instruments=1,
        step="7",
        seed=3,
    )
    mids = [f for f in os.listdir(out) if f.endswith(".mid")]
    redone = len(redo_c) if redo_c else 0
    assert len(mids) + redone == 2
    for f in mids:
        assert "_V" in f and "_A" in f and f.startswith("7_")
        from midi_emotion_tpu.data import midi_io

        tracks = midi_io.read_midi(os.path.join(out, f))
        assert sum(len(t.notes) for t in tracks) >= 0  # parses
    txts = [f for f in os.listdir(out) if f.startswith("txt_")]
    inds = [f for f in os.listdir(out) if f.startswith("inds_")]
    assert len(txts) == len(mids) and len(inds) == len(mids)


def test_generate_redo_lists(tmp_path):
    """Impossible instrument threshold -> every condition lands in redo."""
    cfg = ModelConfig(mode="continuous_concat", **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    redo_p, redo_d, redo_c = generate(
        model,
        params,
        DEFAULT_VOCAB,
        str(tmp_path / "gen"),
        "continuous_concat",
        continuous_conditions=[[0.5, 0.5]],
        gen_len=8,
        max_input_len=64,
        min_n_instruments=99,
    )
    assert redo_c == [[0.5, 0.5]]
    assert redo_d is None


def test_checkpoint_roundtrip_and_cli(tmp_path):
    vocab = DEFAULT_VOCAB
    cfg = ModelConfig(mode="continuous_concat", **TINY)
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(1))
    work = str(tmp_path / "work")
    save_checkpoint(work, params, cfg, vocab, stats={"step": 5})

    cfg2, params2, vocab2 = load_model_dir(work)
    assert cfg2 == cfg and vocab2 == vocab
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(params2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from midi_emotion_tpu.cli.generate_cli import main

    main(
        [
            "--model_dir",
            work,
            "--conditioning",
            "continuous_concat",
            "--valence",
            "0.5",
            "--arousal",
            "-0.5",
            "--batch_size",
            "2",
            "--gen_len",
            "24",
            "--max_input_len",
            "64",
            "--min_n_instruments",
            "0",
            "--quiet",
            "--short_filename",
        ]
    )
    gen_dir = os.path.join(work, "generations", "inference")
    mids = [f for f in os.listdir(gen_dir) if f.endswith(".mid")]
    assert len(mids) == 2


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_cli_loads_reference_checkpoint(tmp_path):
    """The CLI must run directly off a PyTorch reference work dir."""
    import sys
    import types

    sys.modules.setdefault("pypianoroll", types.ModuleType("pypianoroll"))
    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import torch
    from models.build_model import build_model as ref_build
    from data.data_processing import get_maps

    args = dict(
        vocab_size=1007,
        n_layer=2,
        n_head=4,
        d_model=64,
        d_inner=128,
        dropout=0.0,
        d_condition=16,
        conditioning="continuous_concat",
        regression=False,
        overwrite_dropout=False,
    )
    torch.manual_seed(0)
    ref_model, config = ref_build(args)
    work = str(tmp_path / "ref_work")
    os.makedirs(work)
    torch.save(ref_model.state_dict(), os.path.join(work, "model.pt"))
    torch.save(config, os.path.join(work, "model_config.pt"))
    torch.save(get_maps(), os.path.join(work, "mappings.pt"))

    from midi_emotion_tpu.cli.generate_cli import main

    main(
        [
            "--model_dir",
            work,
            "--conditioning",
            "continuous_concat",
            "--valence",
            "0.2",
            "--arousal",
            "0.9",
            "--batch_size",
            "1",
            "--gen_len",
            "16",
            "--max_input_len",
            "64",
            "--min_n_instruments",
            "0",
            "--quiet",
            "--short_filename",
        ]
    )
    gen_dir = os.path.join(work, "generations", "inference")
    assert any(f.endswith(".mid") for f in os.listdir(gen_dir))

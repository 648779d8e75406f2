"""Training runtime tests on a virtual 8-device CPU mesh: loss decreases on
overfit, checkpoint/resume, schedulers, eval aggregation, regression mode,
data-parallel + tensor-parallel sharding."""

import os

import numpy as np
import pytest

import conftest
from synth_data import make_dataset

import jax

from midi_emotion_tpu.cli.train_cli import parse_args
from midi_emotion_tpu.training.schedulers import LRController
from midi_emotion_tpu.training.train import Runner


def _args(tmp_path, folder, csv_records, extra=()):
    """Build a namespace for a tiny training run over the synth dataset."""
    # write a features csv that matches the synth records
    csv = str(tmp_path / "features.csv")
    rows = ["file,valence,note_density_per_instrument,n_instruments,is_matched"]
    for i, r in enumerate(csv_records):
        rows.append(f"{r['file']},{r['valence']},{3.0 + i * 0.1},4,True")
    with open(csv, "w") as f:
        f.write("\n".join(rows) + "\n")

    base = [
        "--data_folder", folder,
        "--feature_file", csv,
        "--work_dir", str(tmp_path / "out"),
        "--n_layer", "2", "--n_head", "4", "--d_model", "64",
        "--d_inner", "128", "--d_condition", "16",
        "--tgt_len", "48", "--batch_size", "8",
        "--lr", "1e-3", "--max_step", "4",
        "--log_step", "2", "--eval_step", "100", "--gen_step", "1000",
        "--max_eval_step", "2", "--seed", "1", "--dtype", "f32",
    ]
    return parse_args(base + list(extra))


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    folder, records = make_dataset(str(root), n_songs=16, bars_per_song=10)
    return folder, records


def test_train_steps_and_checkpoint(tmp_path, dataset):
    folder, records = dataset
    args = _args(tmp_path, folder, records)
    runner = Runner(args)
    runner.run()
    assert runner.train_step_num == 4
    # checkpoint artifacts exist
    wd = args.work_dir
    for f in ("model.msgpack", "model_config.json", "vocab.json",
              "optimizer.msgpack", "stats.json", "performance.csv"):
        assert os.path.exists(os.path.join(wd, f)), f
    # resume
    args2 = _args(tmp_path, folder, records)
    args2.restart_dir = wd
    args2.max_step = 6
    runner2 = Runner(args2)
    assert runner2.train_step_num >= 2  # stats restored
    runner2.run()
    assert runner2.train_step_num == 6


def test_overfit_loss_decreases(tmp_path, dataset):
    folder, records = dataset
    args = _args(tmp_path, folder, records, extra=["--overfit", "--debug"])
    args.max_step = 30
    args.lr = 3e-3
    runner = Runner(args)
    losses = []
    orig = runner._train_fn

    def wrapped(params, opt_state, batch, rng, lr):
        p, o, m = orig(params, opt_state, batch, rng, lr)
        losses.append(float(m["loss"]))
        return p, o, m

    runner._train_fn = wrapped
    runner.train()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_gradient_accumulation(tmp_path, dataset):
    folder, records = dataset
    args = _args(tmp_path, folder, records, extra=["--accumulate_step", "2", "--debug"])
    args.max_step = 2
    runner = Runner(args)
    runner.train()
    assert runner.train_step_num == 2


def test_tensor_parallel_mesh(tmp_path, dataset):
    """TP over the model axis must run and produce finite loss (GSPMD
    inserts the collectives)."""
    folder, records = dataset
    args = _args(
        tmp_path, folder, records,
        extra=["--mesh_data", "2", "--mesh_model", "4", "--debug"],
    )
    args.max_step = 2
    runner = Runner(args)
    runner.train()
    assert runner.train_step_num == 2


def test_regression_training(tmp_path, dataset):
    folder, records = dataset
    args = _args(tmp_path, folder, records, extra=["--regression", "--debug"])
    args.max_step = 2
    runner = Runner(args)
    assert runner.cfg.is_regression and runner.cfg.n_layer == 8 or runner.cfg.n_layer == 8
    runner.train()
    loss, accs = runner.evaluate()
    assert np.isfinite(loss)
    assert "l1_v" in accs and accs["l1_v"] <= 2.0


def test_exhaustive_eval(tmp_path, dataset):
    folder, records = dataset
    args = _args(
        tmp_path, folder, records,
        extra=["--exhaustive_eval", "--max_eval_step", "-1", "--debug"],
    )
    runner = Runner(args)
    loss, accs = runner.run()
    assert np.isfinite(loss)
    assert 0.0 <= accs["top1"] <= accs["top5"] <= 1.0


def test_lr_controller():
    c = LRController("constant", 1e-3)
    assert c.lr_at(0) == 1e-3 and c.lr_at(10**6) == 1e-3
    # warmup
    w = LRController("cosine", 1e-3, warmup_step=10, max_step=100)
    assert w.lr_at(5) == pytest.approx(5e-4)
    assert w.lr_at(100) == pytest.approx(0.0, abs=1e-9)
    assert w.lr_at(55) < 1e-3
    cyc = LRController("cyclic", 1e-3, lr_min=1e-5, lr_max=1e-3, cyclic_step_size=10)
    assert cyc.lr_at(0) == pytest.approx(1e-5)
    assert cyc.lr_at(10) == pytest.approx(1e-3)
    assert cyc.lr_at(20) == pytest.approx(1e-5)
    dp = LRController("dev_perf", 1e-3, decay_rate=0.5, patience=1)
    dp.on_eval(1.0)
    assert dp.lr_at(0) == 1e-3
    dp.on_eval(1.1)
    dp.on_eval(1.2)  # patience exceeded -> decay
    assert dp.lr_at(0) == pytest.approx(5e-4)


def test_lr_finder(tmp_path, dataset):
    folder, records = dataset
    args = _args(tmp_path, folder, records, extra=["--find_lr"])
    assert args.debug  # find_lr forces debug (config.py:137-138)
    runner = Runner(args)
    lrs, losses, suggestion = runner.run()
    assert len(lrs) == len(losses) >= 3
    assert lrs[1] > lrs[0]
    assert 0 < suggestion < 1

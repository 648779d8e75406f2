"""Loss-trajectory parity vs the ACTUAL reference trainer.

Runs the reference ``Runner.train`` (/root/reference/src/train.py:294-333,
torch CPU, f32, amp off) and our ``training.train.Runner.train`` on the SAME
tiny model (identical init via the torch->jax converter) and the SAME
pre-generated batch stream, then asserts the per-update training losses track
within tight tolerance. This pins the optimizer/schedule math end-to-end:
Adam bias correction + eps placement (train.py:182), clip-then-step order
(train.py:319-325), the gradient-accumulation mean (train.py:309), and an LR
that changes across updates including a warmup-style boundary.

Alignment note: the reference's ``train_step`` starts at 0 and the optimizer
steps when ``train_step % accumulate_step == 0`` (train.py:319), so a fresh
run's FIRST update uses a single microbatch scaled by 1/accumulate_step (and,
under warmup, the Adam-constructor LR, since train.py:327-331 assigns the
warmup LR only after stepping). We treat both as latent reference bugs (like
the scheduler ones documented in training/schedulers.py) and do not reproduce
them: the harness starts the reference at ``train_step = 1`` -- the steady
state every resumed reference run is in -- and injects the LR schedule
explicitly on both sides, which makes update k consume microbatches
[k*acc, (k+1)*acc) on both frameworks.
"""

import sys
import time
import types

import numpy as np
import pytest

import conftest
from synth_data import make_dataset

import jax
import jax.numpy as jnp

from midi_emotion_tpu.cli.train_cli import parse_args
from midi_emotion_tpu.parallel import mesh as mesh_lib
from midi_emotion_tpu.training.train import Runner

V, D, DI, DC, L, H, T, B = 1007, 64, 128, 16, 2, 4, 48, 8
BASE_LR = 1e-3
WARMUP_UPDATES = 3  # schedule boundary inside the run


def _sched(update_idx: int) -> float:
    """Linear warmup to BASE_LR over WARMUP_UPDATES, then constant --
    injected identically into both trainers."""
    return BASE_LR * min(update_idx + 1, WARMUP_UPDATES + 1) / (WARMUP_UPDATES + 1)


def _make_batches(n: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        inp = rng.randint(2, 1000, size=(B, T)).astype(np.int32)
        tgt = rng.randint(2, 1000, size=(B, T)).astype(np.int32)
        tgt[:, -5:] = 0  # pad tail exercises CE ignore_index masking
        cond = rng.uniform(-1, 1, size=(B, 2)).astype(np.float32)
        out.append((inp, cond, tgt))
    return out


def _setup_reference_train():
    import torch

    for stub in ("pypianoroll", "pretty_midi"):
        sys.modules.setdefault(stub, types.ModuleType(stub))
    # collate.py imports torch._six (removed in torch>=2)
    if "torch._six" not in sys.modules:
        six = types.ModuleType("torch._six")
        six.string_classes = str
        sys.modules["torch._six"] = six
    conftest.purge_reference_modules()
    old_argv = sys.argv
    sys.argv = ["train.py", "--debug"]  # config.py argparses at import time
    sys.path.insert(0, "/root/reference/src")
    try:
        import train as ref_train
        import models.music_multi as ref_multi
    finally:
        sys.argv = old_argv
    return ref_train, ref_multi


def _reference_model(torch):
    torch.manual_seed(0)
    import models.music_multi as ref_multi  # already imported/cached

    return ref_multi.MusicTransformerMulti(
        embedding_dim=D, d_inner=DI, d_condition=DC, vocab_size=V,
        num_layer=L, num_head=H, max_seq=2048, dropout=0.0, pad_token=0,
    )


def _run_reference(ref_train, model, batches, accum):
    """Drive the ACTUAL reference Runner.train loop on a monkeypatched
    instance; returns per-iteration losses (undivided, like loss_val at
    train.py:310)."""
    import torch
    import torch.nn as nn
    import torch.optim as optim

    runner = ref_train.Runner.__new__(ref_train.Runner)
    runner.logging = lambda *a, **k: None
    runner.device = torch.device("cpu")
    runner.amp = False
    runner.scaler = torch.amp.GradScaler("cpu", enabled=False)
    runner.model = model
    runner.optimizer = optim.Adam(model.parameters(), lr=_sched(0))
    runner.ce_loss = nn.CrossEntropyLoss(ignore_index=0)
    runner.l1_loss = nn.L1Loss()
    runner.train_step = 1  # steady-state alignment (see module docstring)
    runner.n_sequences_total = 0
    runner.epoch = 0
    runner.init_time = time.time()
    runner.init_hours = 0
    runner.csv_writer = types.SimpleNamespace(update=lambda *a, **k: None)

    args = ref_train.args
    args.accumulate_step = accum
    args.clip = 1.0
    args.scheduler = "constant"  # LR injected by the loader below
    args.regression = False
    args.gen_step = args.log_step = args.eval_step = 10**9
    args.max_step = len(batches)  # started at 1: consume exactly the stream

    losses = []
    orig_fp = ref_train.Runner.forward_pass

    def forward_pass(self, i, c, t):
        loss, out = orig_fp(self, i, c, t)
        losses.append(float(loss.item()))
        return loss, out

    runner.forward_pass = types.MethodType(forward_pass, runner)

    def _iter():
        for m, (inp, cond, tgt) in enumerate(batches):
            if m % accum == 0:
                # set the LR the *next* optimizer step will consume (nothing
                # else touches param_groups while scheduler == constant)
                runner.optimizer.param_groups[0]["lr"] = _sched(m // accum)
            yield (torch.from_numpy(inp).long(), torch.from_numpy(cond),
                   torch.from_numpy(tgt).long())

    runner.train_loader = types.SimpleNamespace(__iter__=lambda self: _iter())
    runner.train_loader = type("L", (), {"__iter__": lambda self: _iter()})()
    runner.train()
    assert len(losses) == len(batches)
    return losses


class _StubDataset:
    """Feeds the pre-generated batch stream through Runner.train's real
    _microbatches/shard_batch path."""

    def __init__(self, batches):
        self._batches = batches

    def __len__(self):
        return len(self._batches) * B

    def epochs(self, batch_size, shuffle=False):
        assert batch_size == B
        for inp, cond, tgt in self._batches:
            yield {"input": inp, "condition": cond, "target": tgt}


def _run_ours(tmp_path, dataset_dir, csv_records, ref_model, batches, accum):
    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    csv = str(tmp_path / "features.csv")
    rows = ["file,valence,note_density_per_instrument,n_instruments,is_matched"]
    for i, r in enumerate(csv_records):
        rows.append(f"{r['file']},{r['valence']},{3.0 + i * 0.1},4,True")
    with open(csv, "w") as f:
        f.write("\n".join(rows) + "\n")

    n_updates = len(batches) // accum
    args = parse_args([
        "--data_folder", dataset_dir,
        "--feature_file", csv,
        "--work_dir", str(tmp_path / "out"),
        "--conditioning", "continuous_concat",
        "--n_layer", str(L), "--n_head", str(H), "--d_model", str(D),
        "--d_inner", str(DI), "--d_condition", str(DC),
        "--tgt_len", str(T), "--batch_size", str(B),
        "--accumulate_step", str(accum), "--dropout", "0.0",
        "--lr", str(BASE_LR), "--max_step", str(n_updates),
        "--log_step", "1000000", "--eval_step", "1000000",
        "--gen_step", "1000000", "--num_workers", "0",
        "--seed", "1", "--dtype", "f32", "--debug", "--overfit",
    ])
    runner = Runner(args)
    assert runner.cfg.vocab_size == V and runner.cfg.max_seq == 2048

    # identical init: convert the torch model's weights
    params = torch_state_dict_to_params(ref_model.state_dict(), runner.cfg)
    runner.params = mesh_lib.shard_params(params, runner.mesh)
    runner.opt_state = jax.jit(runner.optimizer.init)(runner.params)
    runner.train_dataset = _StubDataset(batches)
    runner.lr_ctrl = types.SimpleNamespace(
        lr_at=lambda step: _sched(step), on_eval=lambda v: None
    )

    losses = []
    orig = runner._train_fn

    def wrapped(params, opt_state, batch, rng, lr):
        p, o, m = orig(params, opt_state, batch, rng, lr)
        losses.append(float(m["loss"]))
        return p, o, m

    runner._train_fn = wrapped
    runner.train()
    assert len(losses) == n_updates
    return losses, runner


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
# accum=1 stays in the fast suite as the smoke config; accum=2 exercises the
# scanned-microbatch path and is slow-marked (VERDICT r4 item 8)
@pytest.mark.parametrize(
    "accum", [1, pytest.param(2, marks=pytest.mark.slow)]
)
def test_loss_trajectory_parity(tmp_path, accum):
    import torch

    ref_train, _ = _setup_reference_train()

    n_batches = 20  # accum=1: 20 updates; accum=2: 10 updates
    batches = _make_batches(n_batches)

    ref_model = _reference_model(torch)
    # snapshot init BEFORE the reference trains (state_dict would alias the
    # trained tensors otherwise)
    init_sd = {k: v.clone() for k, v in ref_model.state_dict().items()}
    ref_losses = _run_reference(ref_train, ref_model, batches, accum)
    ref_per_update = [
        float(np.mean(ref_losses[j * accum:(j + 1) * accum]))
        for j in range(n_batches // accum)
    ]

    root = tmp_path / "data"
    root.mkdir()
    folder, records = make_dataset(str(root), n_songs=4, bars_per_song=6)
    frozen = types.SimpleNamespace(state_dict=lambda: init_sd)
    ours, runner = _run_ours(tmp_path, folder, records, frozen, batches, accum)

    # per-update training losses track the reference trainer
    np.testing.assert_allclose(ours, ref_per_update, rtol=0, atol=5e-4)
    # drift stays tiny early (catches gross divergence hidden by tolerance)
    assert abs(ours[0] - ref_per_update[0]) < 5e-5

    # final parameters also agree (update math, not just the loss scalar)
    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    final_ref = torch_state_dict_to_params(ref_model.state_dict(), runner.cfg)
    final_ours = jax.device_get(runner.params)
    diffs = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        final_ours, final_ref,
    )
    worst = max(jax.tree.leaves(diffs))
    assert worst < 5e-4, diffs

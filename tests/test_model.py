"""Model tests: shapes, mode handling, KV-cache decode parity with the full
forward, and numerical parity with the PyTorch reference implementation."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params

TINY = dict(
    vocab_size=1017,
    n_layer=2,
    n_head=4,
    d_model=64,
    d_inner=128,
    d_condition=16,
    max_seq=128,
    dropout=0.1,
)


def make(mode, **kw):
    cfg = ModelConfig(mode=mode, **{**TINY, **kw})
    model = MusicTransformer(cfg)
    params = init_params(model, jax.random.PRNGKey(0))
    return cfg, model, params


TOKENS = np.array([[1, 5, 9, 100, 882, 7], [1, 900, 30, 0, 0, 0]], np.int32)
COND = np.array([[0.5, -0.5], [-0.25, 1.0]], np.float32)


@pytest.mark.parametrize("mode", ["none", "discrete_token", "continuous_concat"])
def test_multi_shapes(mode):
    cfg, model, params = make(mode)
    out = model.apply({"params": params}, TOKENS, COND, True)
    assert out.shape == (2, 6, cfg.vocab_size)


def test_continuous_token_shapes():
    cfg, model, params = make("continuous_token")
    out = model.apply({"params": params}, TOKENS, COND, True)
    # output includes the 2 condition prefix positions
    assert out.shape == (2, 8, cfg.vocab_size)


def test_regression_shapes():
    cfg, model, params = make("regression")
    out = model.apply({"params": params}, TOKENS, COND, True)
    assert out.shape == (2, 2)
    assert (np.abs(np.asarray(out)) <= 1.0).all()  # tanh head


def test_dropout_path_runs():
    _, model, params = make("continuous_concat")
    out = model.apply(
        {"params": params},
        TOKENS,
        COND,
        False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("mode", ["continuous_concat", "regression"])
def test_model_pallas_prepad_matches_xla(mode):
    """attn_impl="pallas" through the MODEL (not just the raw kernel): the
    attention module pre-pads q/k/v to the flash block multiple at the
    [B, T, d_model] layout (RelativeGlobalAttention.__call__), extends
    pad_keys over the tail, and slices the live rows back out. Outputs
    must match the XLA closed form for causal and non-causal modes at a
    T that is not a block multiple."""
    from jax.experimental.pallas import tpu as pltpu
    from midi_emotion_tpu.ops import pallas_attention as pa

    # max_seq must cover padded_len(T) or the module skips the pre-pad
    cfg = ModelConfig(mode=mode, **{**TINY, "max_seq": max(
        256, pa.padded_len(TOKENS.shape[1]))})
    xla_model = MusicTransformer(cfg, attn_impl="xla")
    params = init_params(xla_model, jax.random.PRNGKey(0))
    ref = xla_model.apply({"params": params}, TOKENS, COND, True)
    pallas_model = MusicTransformer(cfg, attn_impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        out = pallas_model.apply({"params": params}, TOKENS, COND, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_model_pallas_prepad_grads_match_xla():
    """Gradient parity through the MODEL's pre-pad structure: the
    attention module pads x ONCE before the QKV projections, so the pad
    tail rows carry the projection BIAS (not zeros). dW is unaffected
    (tail x rows are zero) and db is unaffected (tail cotangents are
    exactly zero: tail q rows are sliced off and tail keys are masked),
    so parameter grads must match the XLA impl exactly up to kernel
    numerics. Guards the fused-pad rewrite (RelativeGlobalAttention)."""
    from jax.experimental.pallas import tpu as pltpu
    from midi_emotion_tpu.ops import pallas_attention as pa

    cfg = ModelConfig(mode="continuous_concat", **{**TINY, "max_seq": max(
        256, pa.padded_len(TOKENS.shape[1]))}, remat=False)
    xla_model = MusicTransformer(cfg, attn_impl="xla")
    params = init_params(xla_model, jax.random.PRNGKey(0))
    pallas_model = MusicTransformer(cfg, attn_impl="pallas")

    def loss(m):
        def f(p):
            out = m.apply({"params": p}, TOKENS, COND, True)
            return jnp.mean(out.astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(loss(xla_model))(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss(pallas_model))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pal = jax.tree_util.tree_leaves(g_pal)
    for (path, r), p in zip(flat_ref, flat_pal):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(r), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pad_is_masked():
    """Logits at position i must not depend on tokens at j > i, nor on
    pad keys."""
    cfg, model, params = make("none")
    t1 = TOKENS.copy()
    t2 = TOKENS.copy()
    t2[:, 5] = 881  # change last token
    o1 = model.apply({"params": params}, t1, COND, True)
    o2 = model.apply({"params": params}, t2, COND, True)
    np.testing.assert_allclose(o1[:, :5], o2[:, :5], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["none", "continuous_concat", "continuous_token"])
def test_decode_matches_full_forward(mode):
    """KV-cached decode must reproduce the reference's recompute-everything
    loop (generate.py:101-119) exactly: step t logits == full-forward last
    position on the first t+1 tokens."""
    cfg, model, params = make(mode)
    window = 16
    # pad-free stream: generation never feeds <PAD> (special ids are
    # excluded from sampling, generate.py:131-136)
    tokens = np.array([[1, 5, 9, 100, 882, 7], [1, 900, 30, 41, 882, 900]], np.int32)
    prompt = tokens[:, :3]
    logits, cache = model.apply(
        {"params": params}, prompt, COND, window, method=MusicTransformer.prefill
    )
    full = model.apply({"params": params}, prompt, COND, True)
    np.testing.assert_allclose(logits, full[:, -1], rtol=2e-5, atol=2e-5)

    ce = None
    if mode == "continuous_concat":
        ce = model.apply(
            {"params": params}, COND, method=MusicTransformer.condition_embedding
        )
    for t in range(3, 6):
        logits, cache = model.apply(
            {"params": params},
            tokens[:, t],
            ce,
            cache,
            method=MusicTransformer.decode_step,
        )
        full = model.apply({"params": params}, tokens[:, : t + 1], COND, True)
        np.testing.assert_allclose(
            logits, full[:, -1], rtol=2e-5, atol=2e-5, err_msg=f"step {t}"
        )


# ---------------------------------------------------------------------------
# Parity with the PyTorch reference
# ---------------------------------------------------------------------------


def _load_reference_models():
    import sys

    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import models.music_multi as ref_multi
    import models.music_continuous_token as ref_ct
    import models.music_regression as ref_reg

    return ref_multi, ref_ct, ref_reg


def _torch_params_to_jax(model_torch, cfg):
    """Minimal inline converter for parity tests (the full converter lives
    in midi_emotion_tpu.convert)."""
    from midi_emotion_tpu.convert.torch_import import torch_state_dict_to_params

    return torch_state_dict_to_params(model_torch.state_dict(), cfg)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
@pytest.mark.parametrize("mode", ["none", "continuous_concat"])
def test_parity_multi(mode):
    import torch

    ref_multi, _, _ = _load_reference_models()
    cfg = ModelConfig(mode=mode, **TINY, remat=False)
    d_cond = cfg.effective_d_condition if mode == "continuous_concat" else -1
    torch.manual_seed(0)
    ref = ref_multi.MusicTransformerMulti(
        embedding_dim=cfg.d_model,
        d_inner=cfg.d_inner,
        d_condition=d_cond,
        vocab_size=cfg.vocab_size,
        num_layer=cfg.n_layer,
        num_head=cfg.n_head,
        max_seq=cfg.max_seq,
        dropout=0.0,
        pad_token=0,
    ).eval()

    params = _torch_params_to_jax(ref, cfg)
    model = MusicTransformer(cfg)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(TOKENS).long(), torch.from_numpy(COND)
        ).numpy()
    ours = np.asarray(model.apply({"params": params}, TOKENS, COND, True))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_parity_continuous_token():
    import torch

    _, ref_ct, _ = _load_reference_models()
    cfg = ModelConfig(mode="continuous_token", **TINY, remat=False)
    torch.manual_seed(0)
    ref = ref_ct.MusicTransformerContinuousToken(
        embedding_dim=cfg.d_model,
        d_inner=cfg.d_inner,
        vocab_size=cfg.vocab_size,
        num_layer=cfg.n_layer,
        num_head=cfg.n_head,
        max_seq=cfg.max_seq,
        dropout=0.0,
        pad_token=0,
    ).eval()
    params = _torch_params_to_jax(ref, cfg)
    model = MusicTransformer(cfg)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(TOKENS).long(), torch.from_numpy(COND)).numpy()
    ours = np.asarray(model.apply({"params": params}, TOKENS, COND, True))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_parity_regression():
    import torch

    _, _, ref_reg = _load_reference_models()
    cfg = ModelConfig(mode="regression", **TINY, remat=False)
    torch.manual_seed(0)
    ref = ref_reg.MusicRegression(
        embedding_dim=cfg.d_model,
        d_inner=cfg.d_inner,
        vocab_size=cfg.vocab_size,
        num_layer=cfg.n_layer,
        num_head=cfg.n_head,
        max_seq=cfg.max_seq,
        dropout=0.0,
        pad_token=0,
        output_size=2,
    ).eval()
    params = _torch_params_to_jax(ref, cfg)
    model = MusicTransformer(cfg)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(TOKENS).long()).numpy()
    ours = np.asarray(model.apply({"params": params}, TOKENS, COND, True))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_attention_skewing_parity():
    """Closed-form Srel == reference qe-masking + skewing, including the
    zero upper triangle used (unmasked) by the regression model."""
    import torch

    ref_multi, _, _ = _load_reference_models()
    torch.manual_seed(3)
    rga = ref_multi.RelativeGlobalAttention(h=4, d=64, max_seq=128)
    L = 7
    q = torch.randn(2, 4, L, 16)
    rga.len_k = L
    rga.len_q = L
    E = rga._get_left_embedding(L, L)
    QE = torch.einsum("bhld,md->bhlm", [q, E])
    QE = rga._qe_masking(QE)
    srel_ref = rga._skewing(QE).detach().numpy()

    from midi_emotion_tpu.ops.attention import rel_position_bias

    srel = np.asarray(
        rel_position_bias(jnp.asarray(q.numpy()), jnp.asarray(rga.E.detach().numpy()))
    )
    np.testing.assert_allclose(srel, srel_ref, rtol=1e-5, atol=1e-6)


def test_sinusoid_matches_reference_formula():
    """Our vectorized table vs the reference's per-element math formula
    (music_multi.py:137-147) evaluated directly."""
    import math as m

    from midi_emotion_tpu.models.positional import sinusoid_table

    d, T = 12, 9
    want = np.array(
        [
            [
                m.sin(
                    pos * m.exp(-m.log(10000) * i / d) * m.exp(m.log(10000) / d * (i % 2))
                    + 0.5 * m.pi * (i % 2)
                )
                for i in range(d)
            ]
            for pos in range(T)
        ],
        dtype=np.float32,
    )
    got = sinusoid_table(T, d)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

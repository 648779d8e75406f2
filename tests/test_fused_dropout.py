"""Fused in-kernel-PRNG dropout + dropout_add_layernorm (ops/fused_dropout).

The Pallas TPU interpreter stubs `prng_random_bits` to ZEROS, which the
kernels read as keep-everything, so on CPU these tests pin down the
scaling / residual-add / LayerNorm math and the custom-vjp plumbing with
a known all-keep mask. Mask statistics and forward/backward mask
consistency under REAL hardware PRNG are asserted by the TPU-gated tests
at the bottom (run `pytest tests/test_fused_dropout.py -k tpu` on a TPU
host; they skip on CPU).

Reference dropout sites: music_multi.py:101,103,131-134; LayerNorm
epsilon/placement: music_multi.py:120-124.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from midi_emotion_tpu.ops import fused_dropout as fd
from midi_emotion_tpu.ops.layernorm import layernorm_ref

RATE = 0.25
INV_KEEP = 1.0 / (1.0 - RATE)


def _arrs(rows=520, d=256, dtype=jnp.float32, seed=0):
    r = np.random.RandomState(seed)
    sub = jnp.asarray(r.randn(4, rows // 4, d), dtype)
    res = jnp.asarray(r.randn(4, rows // 4, d), dtype)
    scale = jnp.asarray(r.rand(d) + 0.5, jnp.float32)
    bias = jnp.asarray(r.randn(d), jnp.float32)
    return sub, res, scale, bias


def _key_data():
    return jax.random.key_data(jax.random.PRNGKey(7))


def test_fused_dropout_allkeep_math():
    sub, *_ = _arrs()
    with pltpu.force_tpu_interpret_mode():
        y = fd.fused_dropout(sub, _key_data(), RATE)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(sub) * INV_KEEP, rtol=1e-6
    )


def test_fused_dropout_allkeep_grad():
    sub, *_ = _arrs()
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda s: fd.fused_dropout(s, _key_data(), RATE).sum())(
            sub
        )
    np.testing.assert_allclose(np.asarray(g), INV_KEEP, rtol=1e-6)


def test_dropout_add_layernorm_allkeep_matches_composed():
    sub, res, scale, bias = _arrs()
    with pltpu.force_tpu_interpret_mode():
        y = fd.dropout_add_layernorm(sub, res, scale, bias, _key_data(), RATE)
    want = layernorm_ref(res + sub * INV_KEEP, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=2e-5)


def test_dropout_add_layernorm_allkeep_grads():
    sub, res, scale, bias = _arrs()
    kd = _key_data()

    def fused_loss(sub, res, scale, bias):
        y = fd.dropout_add_layernorm(sub, res, scale, bias, kd, RATE)
        return (y * jnp.cos(y)).sum()

    def ref_loss(sub, res, scale, bias):
        y = layernorm_ref(res + sub * INV_KEEP, scale, bias)
        return (y * jnp.cos(y)).sum()

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(sub, res, scale, bias)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(sub, res, scale, bias)
    for a, b, tol in zip(gf, gr, (2e-4, 2e-4, 2e-3, 1e-3)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=tol,
            err_msg="fused dropout+add+LN grad mismatch",
        )


def test_dropout_add_layernorm_bf16_row_padding():
    """Rows not a block multiple exercise the pad/slice path."""
    sub, res, scale, bias = _arrs(rows=600, dtype=jnp.bfloat16, seed=3)
    with pltpu.force_tpu_interpret_mode():
        y = fd.dropout_add_layernorm(sub, res, scale, bias, _key_data(), RATE)
    want = layernorm_ref(
        res + (sub * jnp.asarray(INV_KEEP, jnp.bfloat16)), scale, bias
    )
    # interpreter evaluates the scale-multiply at f32 before the bf16
    # cast; real composition rounds the product to bf16 first -- allow
    # one bf16 ulp at |y| <= 4
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), atol=4e-2
    )
    assert y.dtype == jnp.bfloat16


def test_fusable_gate():
    assert not fd.fusable(jnp.zeros((4, 130, 100)))  # lane-unaligned
    assert not fd.fusable(jnp.zeros((2, 4, 256)))  # too few rows
    # backend-dependent: on CPU nothing is fusable
    if jax.default_backend() == "cpu":
        assert not fd.fusable(jnp.zeros((8, 1216, 768)))


# ---------------------------------------------------------------------------
# TPU-only: real hardware PRNG
# ---------------------------------------------------------------------------

tpu_only = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs hardware PRNG"
)


@tpu_only
def test_tpu_mask_statistics():
    x = jnp.ones((8, 1024, 768), jnp.bfloat16)
    y = np.asarray(
        jax.jit(lambda x: fd.fused_dropout(x, _key_data(), RATE))(x),
        np.float32,
    )
    kept = (y != 0).mean()
    assert abs(kept - (1 - RATE)) < 0.01, kept
    np.testing.assert_allclose(y[y != 0], INV_KEEP, rtol=1e-2)
    # different key words -> different mask
    kd2 = jax.random.key_data(jax.random.PRNGKey(8))
    y2 = np.asarray(
        jax.jit(lambda x: fd.fused_dropout(x, kd2, RATE))(x), np.float32
    )
    assert (y != y2).any()


@tpu_only
def test_tpu_backward_mask_matches_forward():
    x = jnp.asarray(
        np.random.RandomState(0).randn(8, 512, 768), jnp.float32
    )
    kd = _key_data()
    y = np.asarray(jax.jit(lambda x: fd.fused_dropout(x, kd, RATE))(x))
    g = np.asarray(
        jax.jit(jax.grad(lambda x: fd.fused_dropout(x, kd, RATE).sum()))(x)
    )
    keep = y != 0
    np.testing.assert_allclose(g, keep * INV_KEEP, atol=1e-5)


@tpu_only
def test_tpu_dal_matches_mask_oracle():
    """dropout_add_layernorm against the composed form, using the mask
    extracted from fused_dropout with the same key/blocks (both kernels
    share _seed_and_mask and the row-block layout, so bits coincide)."""
    sub, res, scale, bias = _arrs(rows=2048, d=768, dtype=jnp.float32)
    kd = _key_data()
    dropped = jax.jit(lambda s: fd.fused_dropout(s, kd, RATE))(sub)
    y = jax.jit(
        lambda s, r: fd.dropout_add_layernorm(s, r, scale, bias, kd, RATE)
    )(sub, res)
    want = layernorm_ref(res + dropped, scale, bias)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), atol=3e-5
    )

"""Fused LayerNorm kernel vs the jnp closed form (fwd + grads).

Runs the Pallas kernel in interpret mode on the CPU mesh (conftest forces
cpu); the same code path compiles with Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_emotion_tpu.ops import layernorm as lnk


def _data(n=520, d=256, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (n, d), dtype) * 2.0 + 0.5
    g = jax.random.normal(ks[1], (d,), jnp.float32) * 0.2 + 1.0
    b = jax.random.normal(ks[2], (d,), jnp.float32) * 0.1
    w = jax.random.normal(ks[3], (n, d), jnp.float32)
    return x, g, b, w


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_forward_matches_ref(dtype):
    x, g, b, _ = _data(dtype=dtype)
    got = lnk.fused_layernorm(x, g, b, 1e-6)
    want = lnk.layernorm_ref(x, g, b, 1e-6)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol,
    )


def test_fused_forward_unaligned_rows():
    # n not a multiple of the row block: padded rows must not leak
    x, g, b, _ = _data(n=777)
    got = lnk.fused_layernorm(x, g, b, 1e-6)
    want = lnk.layernorm_ref(x, g, b, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_gradients_match_ref():
    x, g, b, w = _data(n=520, d=256)

    def loss(fn, x, g, b):
        return jnp.sum(fn(x, g, b, 1e-6).astype(jnp.float32) * w)

    gx, gg, gb = jax.grad(lambda *a: loss(lnk.fused_layernorm, *a),
                          argnums=(0, 1, 2))(x, g, b)
    rx, rg, rb = jax.grad(lambda *a: loss(lnk.layernorm_ref, *a),
                          argnums=(0, 1, 2))(x, g, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=2e-4)


def test_fused_gradients_3d_and_unaligned():
    x, g, b, _ = _data(n=3 * 130, d=128)
    x = x.reshape(3, 130, 128)
    w = jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)

    def loss(fn, x, g, b):
        return jnp.sum(fn(x, g, b, 1e-6).astype(jnp.float32) * w)

    gx, gg, gb = jax.grad(lambda *a: loss(lnk.fused_layernorm, *a),
                          argnums=(0, 1, 2))(x, g, b)
    rx, rg, rb = jax.grad(lambda *a: loss(lnk.layernorm_ref, *a),
                          argnums=(0, 1, 2))(x, g, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(rg), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=2e-4)


def test_module_param_tree_matches_nn_layernorm():
    """FusedLayerNorm must be checkpoint-compatible with nn.LayerNorm."""
    import flax.linen as nn

    x = jnp.ones((4, 128), jnp.float32)
    p1 = lnk.FusedLayerNorm(epsilon=1e-6).init(jax.random.PRNGKey(0), x)
    p2 = nn.LayerNorm(epsilon=1e-6).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    y1 = lnk.FusedLayerNorm(epsilon=1e-6).apply(p1, x)
    y2 = nn.LayerNorm(epsilon=1e-6).apply(p2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

"""RecomputeDropout: nn.Dropout-equivalent fwd, mask-identical backward
regenerated from the key (ops/dropout.py). Reference dropout sites:
music_multi.py:101,103,131-134."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_emotion_tpu.ops.dropout import RecomputeDropout

RATE = 0.3


def _x():
    return jnp.asarray(
        np.random.RandomState(0).randn(4, 33, 16).astype(np.float32)
    )


def test_forward_matches_nn_dropout():
    x = _x()
    key = jax.random.PRNGKey(3)
    ours = RecomputeDropout(RATE).apply({}, x, False, rngs={"dropout": key})
    flax = nn.Dropout(RATE).apply(
        {}, x, deterministic=False, rngs={"dropout": key}
    )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax))


@pytest.mark.parametrize("impl", ["threefry", "rbg"])
def test_backward_mask_matches_forward(impl):
    """grad == mask/keep with the SAME mask the forward applied -- the
    regenerated backward bits must be bit-identical."""
    x = _x()
    if impl == "rbg":
        kd = jax.random.key_data(jax.random.PRNGKey(1))
        key = jax.random.wrap_key_data(jnp.concatenate([kd, kd]), impl="rbg")
    else:
        key = jax.random.PRNGKey(1)
    mod = RecomputeDropout(RATE)
    y = mod.apply({}, x, False, rngs={"dropout": key})
    g = jax.grad(lambda x: mod.apply({}, x, False, rngs={"dropout": key}).sum())(x)
    keep = np.asarray(y) != 0
    np.testing.assert_allclose(
        np.asarray(g), keep / (1.0 - RATE), atol=1e-6
    )


def test_deterministic_and_zero_rate_passthrough():
    x = _x()
    assert RecomputeDropout(RATE).apply({}, x, True) is x
    assert RecomputeDropout(0.0).apply(
        {}, x, False, rngs={"dropout": jax.random.PRNGKey(0)}
    ) is x


def test_no_u32_residual_in_grad_hlo():
    """The point of the rule: the fwd->bwd residual set must not contain
    the [B, T, D]-sized u32 bit tensor (only the tiny key)."""
    x = _x()
    key = jax.random.PRNGKey(2)
    mod = RecomputeDropout(RATE)

    def loss(x):
        return (mod.apply({}, x, False, rngs={"dropout": key}) ** 2).sum()

    txt = jax.jit(jax.grad(loss)).lower(x).as_text()
    big_u32 = f"u32[{x.shape[0]},{x.shape[1]},{x.shape[2]}]"
    assert big_u32 not in txt

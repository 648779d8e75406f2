"""Ring attention (parallel/ring_attention.py) equivalence vs the
single-chip closed form on the 8-device CPU mesh: forward and gradients,
causal and padded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from midi_emotion_tpu.ops.attention import relative_attention
from midi_emotion_tpu.parallel.ring_attention import make_ring_attention

B, H, T, dh = 2, 4, 64, 16
MAX_SEQ = 128


def _mesh(n=8):
    devs = jax.devices()
    assert len(devs) >= n, devs
    return Mesh(np.array(devs[:n]), ("data",))


def _inputs(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q, k, v = (jax.random.normal(ks[i], (B, H, T, dh), jnp.float32)
               for i in range(3))
    e = jax.random.normal(ks[3], (MAX_SEQ, dh), jnp.float32)
    return q, k, v, e


@pytest.mark.parametrize("causal", [True, False])
def test_fwd_matches_single_chip(causal):
    mesh = _mesh()
    q, k, v, e = _inputs()
    ring = make_ring_attention(mesh, "data", causal=causal)
    got = jax.jit(ring)(q, k, v, e)
    want = relative_attention(q, k, v, e, causal=causal, pad_keys=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fwd_with_pad_keys():
    mesh = _mesh()
    q, k, v, e = _inputs(1)
    pad = np.zeros((B, T), bool)
    pad[:, -9:] = True  # crosses the last shard boundary
    pad[0, 3] = True  # and one interior key
    ring = make_ring_attention(mesh, "data", causal=True)
    got = jax.jit(ring)(q, k, v, e, jnp.asarray(pad))
    want = relative_attention(q, k, v, e, causal=True,
                              pad_keys=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_single_chip():
    mesh = _mesh()
    q, k, v, e = _inputs(2)
    ring = make_ring_attention(mesh, "data", causal=True)

    def loss_ring(q, k, v, e):
        return (ring(q, k, v, e) ** 2).sum()

    def loss_ref(q, k, v, e):
        return (relative_attention(q, k, v, e, causal=True) ** 2).sum()

    ga = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3)))(q, k, v, e)
    gb = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, k, v, e)
    for x, y, name in zip(ga, gb, "qkve"):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name}",
        )

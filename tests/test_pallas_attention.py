"""Pallas flash relative-attention: numerical equivalence vs the exact-math
XLA implementation (which is itself parity-tested against the reference's
skewing in test_model.py). Runs in interpreter mode on CPU."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from midi_emotion_tpu.ops.attention import relative_attention
from midi_emotion_tpu.ops import pallas_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "B,H,T,dh,causal,with_pads",
    [
        (2, 2, 128, 16, True, False),
        (1, 2, 256, 16, True, True),
        (2, 1, 128, 16, False, False),  # regression: unmasked
        (1, 2, 200, 16, True, True),  # non-multiple of block size
        (1, 1, 320, 48, True, False),  # reference head dim
    ],
)
def test_flash_matches_xla(B, H, T, dh, causal, with_pads):
    max_seq = 512
    q = _rand((B, H, T, dh), 0)
    k = _rand((B, H, T, dh), 1)
    v = _rand((B, H, T, dh), 2)
    e = _rand((max_seq, dh), 3)
    pad_keys = None
    if with_pads:
        pk = np.zeros((B, T), bool)
        pk[:, -T // 4 :] = True
        pad_keys = jnp.asarray(pk)

    want = relative_attention(
        q, k, v, e, causal=causal, pad_keys=pad_keys, impl="xla"
    )
    with pltpu.force_tpu_interpret_mode():
        got = pallas_attention.flash_relative_attention(
            q, k, v, e, causal, pad_keys
        )
    got, want = np.asarray(got), np.asarray(want)
    if with_pads:
        # pad QUERY rows: reference softmax over all -inf is NaN; the
        # kernel outputs 0 there. Compare only live query rows.
        live = ~np.asarray(pad_keys)
        got = got[np.broadcast_to(live[:, None, :, None], got.shape)]
        want = want[np.broadcast_to(live[:, None, :, None], want.shape)]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_xla():
    """custom-vjp backward (XLA recompute) must equal grads of the XLA
    path."""
    B, H, T, dh, max_seq = 1, 2, 128, 16, 256
    q = _rand((B, H, T, dh), 0)
    k = _rand((B, H, T, dh), 1)
    v = _rand((B, H, T, dh), 2)
    e = _rand((max_seq, dh), 3)

    def loss_flash(q, k, v, e):
        out = pallas_attention.flash_relative_attention(q, k, v, e, True, None)
        return jnp.sum(out * out)

    def loss_xla(q, k, v, e):
        out = relative_attention(q, k, v, e, causal=True, impl="xla")
        return jnp.sum(out * out)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, e)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "causal,with_pads,T,impl",
    [
        # default ("merged") across shapes/modes
        (True, False, 128, None),
        (True, True, 256, None),
        (False, False, 128, None),
        (True, False, 200, None),
        # the alternative backward decompositions stay covered
        (True, True, 256, "split"),
        (False, False, 128, "split"),
        (True, True, 256, "fused"),
        (False, False, 128, "fused"),
    ],
)
def test_flash_backward_kernels_match_xla(causal, with_pads, T, impl,
                                          monkeypatch):
    """The hand-written Pallas backward (dQ/dK/dV/dE kernels) vs autodiff
    through the exact-math XLA path, incl. pads and non-causal, for every
    backward decomposition (BWD_IMPL merged/split/fused)."""
    if impl is not None:
        monkeypatch.setattr(pallas_attention, "BWD_IMPL", impl)
    B, H, dh, max_seq = 2, 2, 16, 512
    q = _rand((B, H, T, dh), 10)
    k = _rand((B, H, T, dh), 11)
    v = _rand((B, H, T, dh), 12)
    e = _rand((max_seq, dh), 13)
    pad_keys = None
    live = np.ones((B, T), bool)
    if with_pads:
        pk = np.zeros((B, T), bool)
        pk[:, -T // 4 :] = True
        pad_keys = jnp.asarray(pk)
        live = ~pk
    g = _rand((B, H, T, dh), 14)
    # zero cotangent on pad query rows (their fwd output is NaN in the
    # reference / 0 in the kernel; training losses mask them)
    g = g * jnp.asarray(live)[:, None, :, None]

    def loss_xla(q, k, v, e):
        out = relative_attention(q, k, v, e, causal=causal, pad_keys=pad_keys,
                                 impl="xla")
        out = jnp.where(jnp.asarray(live)[:, None, :, None], out, 0.0)
        return jnp.sum(out * g)

    want = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, e)

    with pltpu.force_tpu_interpret_mode():
        out, lse = pallas_attention._flash_fwd_impl(
            q, k, v, e, causal, pad_keys, return_lse=True
        )
        got = pallas_attention._flash_bwd_impl(
            q, k, v, e, causal, pad_keys, out, lse, g
        )
    names = ["dq", "dk", "dv", "de"]
    for name, a, b in zip(names, got, want):
        a, b = np.asarray(a), np.asarray(b)
        if name in ("dq",):
            a = a * live[:, None, :, None]
            b = b * live[:, None, :, None]
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4, err_msg=name)


def test_skew_band_semantics():
    """_skew_band: out[a, b] == band[a, bq-1-a+b]."""
    bq, bk = 8, 8
    band = jnp.arange(bq * (bq + bk), dtype=jnp.float32).reshape(bq, bq + bk)
    with pltpu.force_tpu_interpret_mode():
        # run inside a trivial kernel context via interpret-mode pallas_call
        import jax.experimental.pallas as pl

        def kern(b_ref, o_ref):
            o_ref[:] = pallas_attention._skew_band(b_ref[:], bq, bk)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((bq, bk), jnp.float32),
        )(band)
    want = np.zeros((bq, bk), np.float32)
    for a in range(bq):
        for b in range(bk):
            want[a, b] = np.asarray(band)[a, bq - 1 - a + b]
    np.testing.assert_array_equal(np.asarray(out), want)


@pytest.mark.parametrize("bq,bk", [(64, 128), (128, 64)])
def test_flash_rectangular_blocks(bq, bk):
    """bq != bk: the causal block-visibility/finalize arithmetic must
    compare positions, not block indices (found as loss=NaN on hardware)."""
    B, H, T, dh, max_seq = 1, 2, 320, 16, 512
    q, k, v = _rand((B, H, T, dh), 0), _rand((B, H, T, dh), 1), _rand((B, H, T, dh), 2)
    e = _rand((max_seq, dh), 3)
    want = relative_attention(q, k, v, e, causal=True, pad_keys=None, impl="xla")

    def loss_ref(q, k, v, e):
        return (relative_attention(q, k, v, e, True, None, "xla") ** 2).sum()

    gw = jax.grad(loss_ref, argnums=(0, 3))(q, k, v, e)

    old = pallas_attention.BLOCK_Q, pallas_attention.BLOCK_K
    pallas_attention.BLOCK_Q, pallas_attention.BLOCK_K = bq, bk
    try:
        with pltpu.force_tpu_interpret_mode():
            got = pallas_attention.flash_relative_attention(q, k, v, e, True, None)

            def loss_flash(q, k, v, e):
                return (
                    pallas_attention.flash_relative_attention(q, k, v, e, True, None)
                    ** 2
                ).sum()

            gg = jax.grad(loss_flash, argnums=(0, 3))(q, k, v, e)
    finally:
        pallas_attention.BLOCK_Q, pallas_attention.BLOCK_K = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gw[0]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]), rtol=2e-4, atol=2e-4)


def test_flash_fwd_bwd_different_blocks(monkeypatch):
    """The fwd grid may run wider k-blocks than the bwd (the shipped
    default at the flagship shape is fwd (256, 640) / bwd (256, 256), see
    pallas_attention._auto_fwd_bk): the bwd consumes the fwd's padded
    residuals, so its blocks must divide the fwd's Tp and the grads must
    still match the XLA closed form."""
    B, H, T, dh, max_seq = 1, 2, 320, 16, 512
    q, k, v = _rand((B, H, T, dh), 0), _rand((B, H, T, dh), 1), _rand((B, H, T, dh), 2)
    e = _rand((max_seq, dh), 3)

    def loss_ref(q, k, v, e):
        return (relative_attention(q, k, v, e, True, None, "xla") ** 2).sum()

    gw = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, e)

    monkeypatch.setattr(pallas_attention, "BLOCK_Q", 64)
    monkeypatch.setattr(pallas_attention, "BLOCK_K", 64)
    monkeypatch.setattr(pallas_attention, "BLOCK_K_FWD", 160)  # fwd Tp=320
    with pltpu.force_tpu_interpret_mode():
        def loss_flash(q, k, v, e):
            return (
                pallas_attention.flash_relative_attention(q, k, v, e, True, None)
                ** 2
            ).sum()

        gg = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, e)
    for got, want in zip(gg, gw):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

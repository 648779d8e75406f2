"""Env-knob validation + tiny-shape edge cases for the flash kernels.

Round-3 landed ~2.3k lines of kernel code whose tuning knobs are parsed
from the environment (MIDI_EMOTION_BWD/SKEW/DQDE/EXP, block/bpb sizes,
scoped-VMEM budgets). A typo'd value must fail loudly at import with the
knob name -- not silently select a fallback branch, and never reach Mosaic
as an out-of-bounds DMA (the crash-the-TPU-worker class the decode kernel's
block guard closes, ops/decode_attention.py::_pick_blocks)."""

import importlib

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU before jax import)

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from midi_emotion_tpu.ops import pallas_attention
from midi_emotion_tpu.ops.attention import relative_attention


def _reload_with(monkeypatch, **env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    try:
        importlib.reload(pallas_attention)
    finally:
        # restore module-level defaults for the rest of the suite even if
        # reload raised halfway through
        for k in env:
            monkeypatch.delenv(k, raising=False)
        importlib.reload(pallas_attention)


@pytest.mark.parametrize(
    "env",
    [
        {"MIDI_EMOTION_BWD": "mergd"},  # the motivating typo
        {"MIDI_EMOTION_SKEW": "fast"},
        {"MIDI_EMOTION_DQDE": "col"},
        {"MIDI_EMOTION_EXP": "fp32"},
        {"MIDI_EMOTION_FLASH_BWD": "torch"},
        {"MIDI_EMOTION_BQ_FWD": "-256"},  # negative block
        {"MIDI_EMOTION_BK_FWD": "100"},  # not a lane-tile multiple
        {"MIDI_EMOTION_BQ_BWD": "192"},
        {"MIDI_EMOTION_BPB_FWD": "0"},  # zero batch rows per step
        {"MIDI_EMOTION_BPB_DKDVDQ": "-2"},
        {"MIDI_EMOTION_VMEM_MB": "0"},
        {"MIDI_EMOTION_VMEM_MB": "512"},  # past physical VMEM
        {"MIDI_EMOTION_VMEM_BWD_MB": "-8"},
        {"MIDI_EMOTION_FWD_CHAINS": "0"},
    ],
)
def test_invalid_knob_raises_at_import(monkeypatch, env):
    with pytest.raises(ValueError) as exc:
        _reload_with(monkeypatch, **env)
    # the error names the offending knob
    assert list(env)[0] in str(exc.value)


def test_valid_knobs_reload_clean(monkeypatch):
    """Every legal alternative value still imports (guards are not
    over-tight), and defaults are restored afterwards."""
    _reload_with(
        monkeypatch,
        MIDI_EMOTION_BWD="split",
        MIDI_EMOTION_SKEW="static",
        MIDI_EMOTION_DQDE="dist",
        MIDI_EMOTION_EXP="bf16",
        MIDI_EMOTION_BQ_FWD="128",
        MIDI_EMOTION_BPB_FWD="4",
        MIDI_EMOTION_VMEM_MB="32",
    )
    assert pallas_attention.BWD_IMPL == "merged"  # defaults restored
    assert pallas_attention.VMEM_LIMIT == 64 * 1024 * 1024


def test_flash_bwd_env_validated_per_call(monkeypatch):
    """MIDI_EMOTION_FLASH_BWD is read per backward call, so a post-import
    typo must also raise instead of silently running the pallas path."""
    import jax

    monkeypatch.setenv("MIDI_EMOTION_FLASH_BWD", "xl")
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(1, 1, 64, 16), jnp.float32) for _ in range(3))
    e = jnp.asarray(rng.randn(128, 16), jnp.float32)

    def f(q):
        return pallas_attention.flash_relative_attention(q, k, v, e, True).sum()

    with pltpu.force_tpu_interpret_mode():
        with pytest.raises(ValueError, match="MIDI_EMOTION_FLASH_BWD"):
            jax.grad(f)(q)


# ---------------------------------------------------------------------------
# tiny / awkward T: a single mostly-padded block must still be exact, in
# forward AND backward, for every backward decomposition
# ---------------------------------------------------------------------------


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("T", [3, 130])
@pytest.mark.parametrize("impl", ["merged", "split", "fused"])
def test_flash_tiny_T_fwd_bwd(monkeypatch, T, impl):
    import jax

    monkeypatch.setattr(pallas_attention, "BWD_IMPL", impl)
    B, H, dh, max_seq = 1, 2, 16, 256
    q, k, v = _rand((B, H, T, dh), 0), _rand((B, H, T, dh), 1), _rand((B, H, T, dh), 2)
    e = _rand((max_seq, dh), 3)

    def flash(q, k, v, e):
        return pallas_attention.flash_relative_attention(q, k, v, e, True)

    def ref(q, k, v, e):
        return relative_attention(q, k, v, e, causal=True, impl="xla")

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(flash, q, k, v, e)
        g = _rand(out.shape, 4)
        grads = vjp(g)
    out_r, vjp_r = jax.vjp(ref, q, k, v, e)
    grads_r = vjp_r(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), rtol=2e-5, atol=2e-5)
    for got, want, name in zip(grads, grads_r, "qkve"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} T={T} impl={impl}",
        )

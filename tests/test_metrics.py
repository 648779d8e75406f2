"""Metrics parity: top-k accuracy vs the reference utils.accuracy, CE vs
torch CrossEntropyLoss(ignore_index), and the mask builder."""

import numpy as np
import pytest

import conftest

import jax.numpy as jnp

from midi_emotion_tpu.training.metrics import topk_accuracy
from midi_emotion_tpu.training.train_step import cross_entropy_ignore_pad
from midi_emotion_tpu.ops.attention import causal_pad_mask


def test_causal_pad_mask_semantics():
    tokens = jnp.asarray(np.array([[1, 5, 0]], np.int32))
    m = np.asarray(causal_pad_mask(tokens, pad_id=0))[0]
    # causal: j > i masked
    assert m[0, 1] and m[0, 2] and not m[1, 0]
    # key pad: column 2 masked everywhere
    assert m[2, 2] and m[1, 2]
    assert not m[1, 1]


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_topk_accuracy_matches_reference():
    import sys

    conftest.purge_reference_modules()
    sys.path.insert(0, "/root/reference/src")
    import torch
    from utils import accuracy as ref_accuracy

    rng = np.random.RandomState(0)
    logits = rng.randn(6, 50, 101).astype(np.float32)
    target = rng.randint(0, 101, size=(6, 50))
    target[:, -7:] = 0  # pads

    ref = ref_accuracy(
        torch.from_numpy(logits), torch.from_numpy(target), topk=(1, 5),
        ignore_index=0,
    )
    ours = topk_accuracy(jnp.asarray(logits), jnp.asarray(target), (1, 5), 0)
    assert float(ours["top1"]) == pytest.approx(ref[1], abs=1e-6)
    assert float(ours["top5"]) == pytest.approx(ref[5], abs=1e-6)


@pytest.mark.skipif(not conftest.reference_available(), reason="no reference")
def test_ce_matches_torch_ignore_index():
    import torch

    rng = np.random.RandomState(1)
    logits = rng.randn(4, 30, 57).astype(np.float32)
    target = rng.randint(0, 57, size=(4, 30))
    target[:, -5:] = 0

    want = torch.nn.CrossEntropyLoss(ignore_index=0)(
        torch.from_numpy(logits).reshape(-1, 57), torch.from_numpy(target).reshape(-1)
    ).item()
    got, n = cross_entropy_ignore_pad(jnp.asarray(logits), jnp.asarray(target), 0)
    assert float(got) == pytest.approx(want, rel=1e-5)
    assert int(n) == int((target != 0).sum())

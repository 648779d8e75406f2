"""Dropout whose mask is REGENERATED in the backward instead of saved.

XLA's default lowering of flax ``nn.Dropout`` keeps the raw u32 RNG bits
as a forward->backward residual: at the flagship train shape (B=8,
T=1216, d=768, 20 layers = 41 mask sites) that is 40 copy-start/done
pairs of u32[8,1216,768] (28.7 MB each) -- ~3.5 ms/step of copy time and
~1.1 GB/step of HBM residual traffic (scripts/profile_step.py, round 3).

The mask is a pure function of (key, shape, rate), so the backward can
recompute it from the 128/256-bit key instead of streaming the bits back.
``dropout_recompute`` is a custom_vjp whose only residual is the raw key
data; both directions rebuild the mask with the SAME key impl, so fwd and
bwd masks are bit-identical (the train step pre-wraps keys as "rbg" so
mask generation lowers to the TPU hardware RngBitGenerator rather than
threefry VPU code -- training/train_step.py:_fast_dropout_key).

Semantics match flax ``nn.Dropout`` exactly for the no-broadcast case it
replaces (mask = bernoulli(keep), out = where(mask, x / keep, 0), math in
x.dtype); only the residual strategy differs. The reference's dropout
sites are music_multi.py:103,131-134 (per-layer attn/FFN) and :101
(post-positional-encoding).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _keep_mask(key_data, shape, rate: float, impl: str):
    key = jax.random.wrap_key_data(key_data, impl=impl)
    return jax.random.bernoulli(key, 1.0 - rate, shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dropout_recompute(x, key_data, rate: float, impl: str):
    """``nn.Dropout``-equivalent apply, saving only ``key_data`` for the
    backward. ``rate``/``impl`` are static."""
    keep = _keep_mask(key_data, x.shape, rate, impl)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros((), x.dtype))


def _fwd(x, key_data, rate: float, impl: str):
    return dropout_recompute(x, key_data, rate, impl), key_data


def _bwd(rate: float, impl: str, key_data, g):
    keep = _keep_mask(key_data, g.shape, rate, impl)
    dx = jnp.where(keep, g / (1.0 - rate), jnp.zeros((), g.dtype))
    # integer primal -> float0 cotangent
    ct_key = np.zeros(key_data.shape, jax.dtypes.float0)
    return (dx, ct_key)


dropout_recompute.defvjp(_fwd, _bwd)


class RecomputeDropout(nn.Module):
    """Drop-in for ``nn.Dropout(rate)`` (keyword ``deterministic`` only,
    no broadcast dims) using the recompute-in-backward rule above.

    On TPU, large lane-aligned inputs dispatch to the Pallas kernel with
    IN-KERNEL hardware PRNG instead (ops/fused_dropout.py): XLA CSEs this
    module's fwd/bwd mask regenerations back into one rng call whose u32
    bits round-trip HBM; the kernel never materializes the mask at all."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        from . import fused_dropout as fd

        if fd.fusable(x):
            return fd.fused_dropout(x, jax.random.key_data(key), self.rate)
        impl = str(jax.random.key_impl(key))
        return dropout_recompute(
            x, jax.random.key_data(key), self.rate, impl
        )

"""Fused LayerNorm with a fused backward (Pallas, TPU).

The reference leans on torch's cuDNN LayerNorm (music_multi.py:120-124);
the XLA lowering of ``nn.LayerNorm``'s backward at the flagship shape
splits into ~40 [B*T, 768] -> [768] reduction fusions costing ~0.5 ms each
(~20 ms of a 272 ms train step, profiled in scripts/profile_step.py).
This kernel computes dx, dgamma, dbeta in ONE pass over (x, dy): 3 HBM
streams of [N, D] instead of XLA's repeated re-reads, with dgamma/dbeta
accumulated across row blocks in f32 VMEM scratch (the TPU grid is
sequential, so cross-step scratch accumulation is race-free).

The backward recomputes mean/rstd from x (two row reductions in VMEM)
instead of saving them: stats would be [N]-shaped outputs whose (bn, 1)
blocks waste a 128-lane tile each, and the recompute is free against the
HBM stream.

Numerics: all statistics and the normalization run in f32 regardless of
the input dtype (matching flax's f32-stats behavior); outputs cast back.
Parity vs the jnp closed form: tests/test_layernorm.py.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256


def _resolve(impl: str) -> str:
    if impl != "auto":
        return impl
    return "xla" if jax.default_backend() == "cpu" else "pallas"


def layernorm_ref(x, scale, bias, eps: float = 1e-6):
    """jnp closed form (f32 stats), the CPU path and test oracle."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # [bn, D]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, g_ref, dx_ref, dg_ref, db_ref,
                dg_scr, db_scr, *, eps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_scr[:] = jnp.zeros_like(dg_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    x = x_ref[:].astype(jnp.float32)  # [bn, D]
    dy = dy_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)  # [1, D]
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rs = jax.lax.rsqrt(var + eps)
    xhat = xc * rs

    dg_scr[:] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_scr[:] += jnp.sum(dy, axis=0, keepdims=True)

    wdy = dy * g
    c1 = jnp.mean(wdy, axis=1, keepdims=True)
    c2 = jnp.mean(wdy * xhat, axis=1, keepdims=True)
    dx_ref[:] = ((wdy - c1 - xhat * c2) * rs).astype(dx_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dg_ref[:] = dg_scr[:]
        db_ref[:] = db_scr[:]


def _pad_rows(x2, bn):
    n = x2.shape[0]
    np_ = (n + bn - 1) // bn * bn
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))
    return x2, np_


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm over the LAST axis; leading axes are flattened to rows.

    x: [..., D]; scale, bias: [D]. f32 statistics, output in x.dtype."""
    y, _ = _fused_fwd(x, scale, bias, eps)
    return y


def _fused_fwd(x, scale, bias, eps):
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    n = x2.shape[0]
    bn = min(BLOCK_ROWS, max(8, n))
    x2p, np_ = _pad_rows(x2, bn)
    interp = jax.default_backend() == "cpu"
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, D), x.dtype),
        interpret=interp,
    )(x2p, scale.reshape(1, D), bias.reshape(1, D))
    y = y[:n].reshape(shape)
    return y, (x, scale)


def _fused_fwd_vjp(x, scale, bias, eps):
    y, res = _fused_fwd(x, scale, bias, eps)
    return y, res


def _fused_bwd(eps, res, dy):
    x, scale = res
    shape = x.shape
    D = shape[-1]
    x2 = x.reshape(-1, D)
    dy2 = dy.reshape(-1, D)
    n = x2.shape[0]
    bn = min(BLOCK_ROWS, max(8, n))
    x2p, np_ = _pad_rows(x2, bn)
    # zero-padded dy rows contribute nothing to dgamma/dbeta; padded dx
    # rows are sliced off below
    dy2p, _ = _pad_rows(dy2, bn)
    interp = jax.default_backend() == "cpu"
    dx, dg, db = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(np_ // bn,),
        in_specs=[
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, D), jnp.float32),
            pltpu.VMEM((1, D), jnp.float32),
        ],
        interpret=interp,
    )(x2p, dy2p, scale.reshape(1, D))
    dx = dx[:n].reshape(shape)
    return dx, dg[0].astype(scale.dtype), db[0].astype(scale.dtype)


fused_layernorm.defvjp(_fused_fwd_vjp, _fused_bwd)


def layernorm(x, scale, bias, eps: float = 1e-6, impl: str = "auto"):
    """Dispatch: fused Pallas kernel on TPU, jnp closed form elsewhere
    (and for tiny inputs -- e.g. the one-token decode path -- where the
    per-launch overhead would dominate)."""
    rows = x.size // x.shape[-1] if x.ndim >= 2 else 0
    if _resolve(impl) != "pallas" or x.shape[-1] % 128 or rows < 512:
        return layernorm_ref(x, scale, bias, eps)
    return fused_layernorm(x, scale, bias, eps)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (same "scale"/"bias" param tree) backed
    by the fused kernel on TPU.

    With ``drop_sub`` it computes ``LayerNorm(x + dropout(drop_sub))`` in
    ONE kernel (ops/fused_dropout.py) -- the per-layer sublayer pattern
    (music_multi.py:103,131-135) without materializing the dropout output
    or the pre-LN sum. ``drop_key`` is a typed PRNG key (``make_rng``);
    shapes the fused kernel can't take fall back to the composed
    recompute-dropout + layernorm path with the SAME parameters."""

    epsilon: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, drop_sub=None, drop_rate: float = 0.0,
                 drop_key=None):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        if drop_sub is not None:
            from .fused_dropout import dropout_add_layernorm, fusable

            key_data = jax.random.key_data(drop_key)
            if fusable(drop_sub):
                y = dropout_add_layernorm(
                    drop_sub, x, scale, bias, key_data, drop_rate,
                    self.epsilon,
                )
            else:
                from .dropout import dropout_recompute

                impl = str(jax.random.key_impl(drop_key))
                dropped = dropout_recompute(drop_sub, key_data, drop_rate,
                                            impl)
                y = layernorm(x + dropped, scale, bias, self.epsilon)
        else:
            y = layernorm(x, scale, bias, self.epsilon)
        return y.astype(self.dtype) if self.dtype is not None else y

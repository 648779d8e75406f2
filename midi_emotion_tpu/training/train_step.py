"""Jitted training and evaluation steps.

TPU-native replacement for the reference's fwd/bwd host loop
(train.py:276-333): one jitted function per step containing the forward,
loss, backward, gradient-accumulation scan, global-norm clipping, and Adam
update. Data parallelism comes from batch sharding over the mesh "data"
axis (GSPMD inserts the gradient psum); bf16 compute is a model-dtype
switch (no loss scaler needed on TPU -- the reference's fp16 GradScaler,
train.py:108, has no equivalent here by design).

Gradient accumulation reproduces ``--accumulate_step`` (train.py:309,
319-325) as a ``lax.scan`` over leading-axis microbatches inside one step.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.model import MusicTransformer
from .metrics import topk_accuracy


def cross_entropy_ignore_pad(
    logits: jnp.ndarray, target: jnp.ndarray, pad_id: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean CE over non-pad targets (torch CrossEntropyLoss(ignore_index),
    train.py:124). Returns (loss, n_valid)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)[..., 0]
    valid = target != pad_id
    n = jnp.maximum(jnp.sum(valid), 1)
    return -jnp.sum(jnp.where(valid, ll, 0.0)) / n, jnp.sum(valid)


def make_optimizer(clip: float) -> optax.GradientTransformation:
    """Adam with pre-clip, LR applied per-step as a runtime scalar
    (reference: clip_grad_norm_ then Adam, train.py:319-325, lr 2e-5)."""
    steps = []
    if clip > 0:
        steps.append(optax.clip_by_global_norm(clip))
    steps.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    steps.append(optax.scale(-1.0))  # descent; LR multiplied in at call site
    return optax.chain(*steps)


def _fast_dropout_key(key):
    """Re-wrap a threefry key as an "rbg" key: dropout mask generation then
    lowers to the TPU hardware RngBitGenerator instead of threefry2x32
    VPU code -- profiled at ~33 ms/step of xor/bitcast fusions for the
    flagship's 40 [B, T, 768] masks (scripts/profile_step.py). The
    Bernoulli(rate) semantics are unchanged; only the pseudorandom stream
    differs, which dropout does not contract on."""
    data = jax.random.key_data(key)  # [2] uint32
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data]), impl="rbg"
    )


def make_loss_fn(model: MusicTransformer) -> Callable:
    cfg = model.config

    def loss_fn(params, batch: Dict[str, jnp.ndarray], dropout_rng):
        logits = model.apply(
            {"params": params},
            batch["input"],
            batch["condition"],
            False,
            rngs={"dropout": dropout_rng},
        )
        if cfg.is_regression:
            # L1 training loss (train.py:283-284)
            loss = jnp.mean(jnp.abs(logits - batch["condition"]))
            n = jnp.asarray(batch["input"].size, jnp.int32)
        else:
            loss, _ = cross_entropy_ignore_pad(logits, batch["target"], cfg.pad_id)
            n = jnp.asarray(batch["input"].size, jnp.int32)
        return loss, n

    return loss_fn


def make_train_step(
    model: MusicTransformer,
    optimizer: optax.GradientTransformation,
    accumulate_steps: int = 1,
    donate: bool = True,
) -> Callable:
    """Returns jitted step(params, opt_state, batch, rng, lr) ->
    (params, opt_state, metrics).

    ``batch`` arrays carry a leading [accumulate_steps] microbatch axis.
    """
    loss_fn = make_loss_fn(model)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(params, opt_state, batch, rng, lr):
        def micro(carry, mb):
            grads_acc, loss_acc, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, _n), grads = grad_fn(params, mb, _fast_dropout_key(sub))
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, rng), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            micro, (zero, jnp.float32(0.0), rng), batch, length=accumulate_steps
        )
        # mean over microbatches = reference's loss/accumulate_step per bwd
        grads = jax.tree.map(lambda g: g / accumulate_steps, grads)
        loss = loss_sum / accumulate_steps

        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model: MusicTransformer) -> Callable:
    """Jitted eval step -> per-batch loss + metrics (evaluate(),
    train.py:222-274)."""
    cfg = model.config

    def step(params, batch):
        logits = model.apply(
            {"params": params}, batch["input"], batch["condition"], True
        )
        out: Dict[str, jnp.ndarray] = {}
        if cfg.is_regression:
            pred = jnp.clip(logits, -1.0, 1.0)  # train.py:247
            cond = batch["condition"]
            out["loss"] = jnp.mean(jnp.abs(pred - cond))
            out["l1_v"] = jnp.mean(jnp.abs(pred[:, 0] - cond[:, 0]))
            out["l1_a"] = jnp.mean(jnp.abs(pred[:, 1] - cond[:, 1]))
            out["l1_mean"] = (out["l1_v"] + out["l1_a"]) / 2
            out["l1_mean_normal"] = out["l1_mean"] / 2
            out["n_elements"] = jnp.asarray(pred.shape[0], jnp.int32)
        else:
            loss, _ = cross_entropy_ignore_pad(logits, batch["target"], cfg.pad_id)
            out["loss"] = loss
            accs = topk_accuracy(
                logits, batch["target"], (1, 5), ignore_index=cfg.pad_id
            )
            out["top1"] = accs["top1"]
            out["top5"] = accs["top5"]
            out["n_elements"] = jnp.asarray(batch["input"].size, jnp.int32)
        return out

    return jax.jit(step)

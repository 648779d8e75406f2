"""Checkpointing.

The reference writes five torch.save files per work dir -- model.pt,
optimizer.pt, scaler.pt, stats.pt, model_config.pt, plus mappings.pt
(train.py:114,180,397-407). Our native format mirrors that layout with
framework-neutral files:

    model_config.json   -- ModelConfig
    vocab.json          -- Vocab spec (replaces mappings.pt)
    model.msgpack       -- Flax params (flax.serialization)
    optimizer.msgpack   -- optax state
    stats.json          -- {step, hour, epoch, sample} (resume counters)
    performance.csv     -- metric log (utils.py:82-109 schema)

(no scaler: bf16 on TPU needs no loss scaling, SURVEY §2.)

``load_model_dir`` also accepts a *reference* work dir (model_config.pt /
model.pt / mappings.pt) via the torch converter, so pretrained PyTorch
checkpoints are a drop-in.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..models.config import ModelConfig
from ..vocab import Vocab

STATS_KEYS = ("step", "hour", "epoch", "sample")


def save_checkpoint(
    work_dir: str,
    params: Any,
    cfg: ModelConfig,
    vocab: Vocab,
    opt_state: Any = None,
    stats: Optional[Dict] = None,
) -> None:
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "model_config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(work_dir, "vocab.json"), "w") as f:
        json.dump(vocab.to_dict(), f)
    params = jax.device_get(params)
    with open(os.path.join(work_dir, "model.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    if opt_state is not None:
        with open(os.path.join(work_dir, "optimizer.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(opt_state)))
    if stats is not None:
        with open(os.path.join(work_dir, "stats.json"), "w") as f:
            json.dump({k: stats.get(k, 0) for k in STATS_KEYS}, f)


def load_params(work_dir: str, template: Any) -> Any:
    with open(os.path.join(work_dir, "model.msgpack"), "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_opt_state(work_dir: str, template: Any) -> Optional[Any]:
    fp = os.path.join(work_dir, "optimizer.msgpack")
    if not os.path.exists(fp):
        return None
    try:
        with open(fp, "rb") as f:
            return serialization.from_bytes(template, f.read())
    except Exception:
        # degrade gracefully like the reference (train.py:186-193)
        return None


def load_stats(work_dir: str) -> Dict:
    fp = os.path.join(work_dir, "stats.json")
    if os.path.exists(fp):
        try:
            with open(fp) as f:
                return json.load(f)
        except Exception:
            pass
    return {k: 0 for k in STATS_KEYS}


def is_native_dir(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, "model_config.json"))


def load_model_dir(model_dir: str) -> Tuple[ModelConfig, Any, Vocab]:
    """Load (config, params, vocab) from either a native work dir or a
    reference PyTorch work dir."""
    if is_native_dir(model_dir):
        with open(os.path.join(model_dir, "model_config.json")) as f:
            cfg = ModelConfig.from_json(f.read())
        with open(os.path.join(model_dir, "vocab.json")) as f:
            vocab = Vocab.from_dict(json.load(f))
        # build an un-initialized template purely from shapes via init
        from ..models.model import MusicTransformer, init_params

        template = init_params(MusicTransformer(cfg), jax.random.PRNGKey(0))
        params = load_params(model_dir, template)
        return cfg, params, vocab
    if os.path.exists(os.path.join(model_dir, "model_config.pt")):
        from ..convert.torch_import import load_reference_checkpoint

        cfg, params, vocab = load_reference_checkpoint(model_dir)
        if vocab is None:
            vocab = Vocab()
        return cfg, params, vocab
    raise FileNotFoundError(
        f"{model_dir}: neither model_config.json (native) nor "
        "model_config.pt (reference) found"
    )

"""PyTorch checkpoint -> JAX parameter conversion.

Loads the reference's on-disk artifacts (``model.pt`` state_dict,
``model_config.pt`` args dict, ``mappings.pt`` vocab maps -- written by
train.py:114,180,397-404) and produces the Flax parameter pytree for
``models.model.MusicTransformer``, so published pretrained checkpoints run
on TPU unchanged.

Name mapping (torch -> flax):

    embedding.weight                 -> embedding/embedding
    fc_condition.weight/bias         -> fc_condition/kernel^T, bias
    fc_condition.{i}.weight/bias     -> fc_condition_{i}/kernel^T, bias
    enc_layers.{i}.rga.{Wq,Wk,Wv,fc} -> enc_layers_{i}/rga/{...}/kernel^T
    enc_layers.{i}.rga.E             -> enc_layers_{i}/rga/E
    enc_layers.{i}.FFN_pre/suf       -> enc_layers_{i}/FFN_pre/suf
    enc_layers.{i}.layernorm{1,2}    -> weight->scale, bias->bias
    fc.weight/bias                   -> fc/kernel^T, bias
    fc.0.weight/bias (regression's Sequential head, music_regression.py:64)
                                     -> fc/kernel^T, bias

Linear weights are transposed: torch stores [out, in], Flax Dense [in, out].
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..models.config import ModelConfig
from ..vocab import Vocab


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def torch_state_dict_to_params(state_dict: Dict, cfg: ModelConfig) -> Dict:
    """Map a reference model state_dict onto the Flax parameter tree."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: Dict = {}

    params["embedding"] = {"embedding": sd.pop("embedding.weight")}

    if cfg.mode == "continuous_concat" and cfg.effective_d_condition > 0:
        params["fc_condition"] = {
            "kernel": sd.pop("fc_condition.weight").T,
            "bias": sd.pop("fc_condition.bias"),
        }
    if cfg.mode == "continuous_token":
        for i in range(cfg.n_conditions):
            params[f"fc_condition_{i}"] = {
                "kernel": sd.pop(f"fc_condition.{i}.weight").T,
                "bias": sd.pop(f"fc_condition.{i}.bias"),
            }

    for i in range(cfg.n_layer):
        p = f"enc_layers.{i}."
        layer: Dict = {"rga": {}}
        for name in ("Wq", "Wk", "Wv", "fc"):
            layer["rga"][name] = {
                "kernel": sd.pop(f"{p}rga.{name}.weight").T,
                "bias": sd.pop(f"{p}rga.{name}.bias"),
            }
        layer["rga"]["E"] = sd.pop(f"{p}rga.E")
        for name in ("FFN_pre", "FFN_suf"):
            layer[name] = {
                "kernel": sd.pop(f"{p}{name}.weight").T,
                "bias": sd.pop(f"{p}{name}.bias"),
            }
        for name in ("layernorm1", "layernorm2"):
            layer[name] = {
                "scale": sd.pop(f"{p}{name}.weight"),
                "bias": sd.pop(f"{p}{name}.bias"),
            }
        params[f"enc_layers_{i}"] = layer

    if "fc.weight" in sd:  # LM head
        params["fc"] = {"kernel": sd.pop("fc.weight").T, "bias": sd.pop("fc.bias")}
    else:  # regression Sequential(Linear, Tanh) head
        params["fc"] = {
            "kernel": sd.pop("fc.0.weight").T,
            "bias": sd.pop("fc.0.bias"),
        }

    leftover = [k for k in sd if not k.endswith("positional_embedding")]
    if leftover:
        raise ValueError(f"unconverted reference parameters: {leftover}")
    return params


def params_to_torch_state_dict(params: Dict, cfg: ModelConfig) -> Dict:
    """Inverse mapping (JAX -> torch tensors), for exporting checkpoints
    back to the reference format."""
    import torch

    sd = {}
    t = lambda a: torch.from_numpy(np.asarray(a).copy())
    sd["embedding.weight"] = t(params["embedding"]["embedding"])
    if "fc_condition" in params:
        sd["fc_condition.weight"] = t(params["fc_condition"]["kernel"]).T.contiguous()
        sd["fc_condition.bias"] = t(params["fc_condition"]["bias"])
    for i in range(cfg.n_conditions):
        key = f"fc_condition_{i}"
        if key in params:
            sd[f"fc_condition.{i}.weight"] = t(params[key]["kernel"]).T.contiguous()
            sd[f"fc_condition.{i}.bias"] = t(params[key]["bias"])
    for i in range(cfg.n_layer):
        layer = params[f"enc_layers_{i}"]
        p = f"enc_layers.{i}."
        for name in ("Wq", "Wk", "Wv", "fc"):
            sd[f"{p}rga.{name}.weight"] = t(layer["rga"][name]["kernel"]).T.contiguous()
            sd[f"{p}rga.{name}.bias"] = t(layer["rga"][name]["bias"])
        sd[f"{p}rga.E"] = t(layer["rga"]["E"])
        for name in ("FFN_pre", "FFN_suf"):
            sd[f"{p}{name}.weight"] = t(layer[name]["kernel"]).T.contiguous()
            sd[f"{p}{name}.bias"] = t(layer[name]["bias"])
        for name in ("layernorm1", "layernorm2"):
            sd[f"{p}{name}.weight"] = t(layer[name]["scale"])
            sd[f"{p}{name}.bias"] = t(layer[name]["bias"])
    head = "fc.0" if cfg.is_regression else "fc"
    sd[f"{head}.weight"] = t(params["fc"]["kernel"]).T.contiguous()
    sd[f"{head}.bias"] = t(params["fc"]["bias"])
    return sd


def load_reference_checkpoint(model_dir: str) -> Tuple[ModelConfig, Dict, Vocab]:
    """Load (config, params, vocab) from a reference work dir containing
    model_config.pt / model.pt / mappings.pt (generate.py:307-348)."""
    import torch

    config_d = torch.load(
        os.path.join(model_dir, "model_config.pt"), map_location="cpu",
        weights_only=False,
    )
    cfg = ModelConfig.from_reference_dict(config_d)
    model_fp = os.path.join(model_dir, "model.pt")
    if not os.path.exists(model_fp):
        alt = model_fp.replace("best_", "")
        if os.path.exists(alt):  # generate.py:343-346 fallback
            model_fp = alt
        else:
            raise FileNotFoundError(model_fp)
    state_dict = torch.load(model_fp, map_location="cpu", weights_only=False)
    params = torch_state_dict_to_params(state_dict, cfg)

    maps_fp = os.path.join(model_dir, "mappings.pt")
    vocab = None
    if os.path.exists(maps_fp):
        maps = torch.load(maps_fp, map_location="cpu", weights_only=False)
        vocab = Vocab.from_maps(maps)
    return cfg, params, vocab

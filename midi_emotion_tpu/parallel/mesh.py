"""Device mesh and sharding rules.

The reference is single-device (device chosen once, train.py:33-34, no
torch.distributed anywhere); scaling here is TPU-native: a
("data", "model") ``jax.sharding.Mesh``, batch sharded over "data",
parameters replicated (DP) or sharded over "model" (TP) via
``NamedSharding`` annotations -- XLA GSPMD inserts the psum/all-gather
collectives over ICI. Tensor parallelism is exactly a sharding-rule change
(SURVEY §2): attention projections shard the head dimension, the MLP shards
its hidden dimension, the embedding/LM head shard the vocab dimension.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` (DCN between
    hosts, ICI within a slice). No-op when the runtime is single-process
    or when env-based auto-detection applies (TPU pods set the
    coordination env vars themselves)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def host_local_batch_to_global(batch: dict, mesh: Mesh, leading_accum: bool = False):
    """Multi-host input path: each host feeds its local shard
    (jax.make_array_from_process_local_data assembles the global array).
    Single-process meshes fall through to shard_batch. With
    ``leading_accum`` the arrays carry a leading [accumulate_steps]
    microbatch axis (train_step.py) and the batch dim is axis 1.
    Exercised for real by tests/test_distributed.py (2 local processes,
    localhost coordinator, 4 virtual CPU devices each)."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, leading_accum=leading_accum)
    spec = P(None, "data") if leading_accum else P("data")
    sh = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sh, v) for k, v in batch.items()
    }


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    n_seq: int = 1,
) -> Mesh:
    """("data", "model") mesh, gaining a trailing "seq" axis when
    ``n_seq > 1`` (sequence-parallel ring attention,
    parallel/ring_attention.py). Innermost axes map to the
    closest-neighbor ICI links in the device order, which is where the
    ring's ppermute and TP's all-reduces want to live."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq)
    used = n_data * n_model * n_seq
    assert used <= len(devices), (n_data, n_model, n_seq, len(devices))
    if n_seq > 1:
        grid = np.array(devices[:used]).reshape(n_data, n_model, n_seq)
        return Mesh(grid, ("data", "model", "seq"))
    grid = np.array(devices[:used]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


# parameter path regex -> PartitionSpec over ("data", "model")
_TP_RULES = [
    # attention projections: shard heads (output dim of Wq/Wk/Wv, input of fc)
    (r"rga/(Wq|Wk|Wv)/kernel$", P(None, "model")),
    (r"rga/(Wq|Wk|Wv)/bias$", P("model")),
    (r"rga/fc/kernel$", P("model", None)),
    # MLP: shard the hidden dimension
    (r"FFN_pre/kernel$", P(None, "model")),
    (r"FFN_pre/bias$", P("model")),
    (r"FFN_suf/kernel$", P("model", None)),
    # embedding + LM head: shard the vocab dimension
    (r"^embedding/embedding$", P("model", None)),
    (r"^fc/kernel$", P(None, "model")),
    (r"^fc/bias$", P("model")),
]


def param_spec(path: str) -> P:
    """PartitionSpec for a '/'-joined parameter path."""
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def _feasible(spec: P, shape, mesh: Mesh) -> P:
    """Drop axis assignments whose dimension doesn't divide the mesh axis
    (e.g. the 1007-wide vocab dim): those fall back to replication."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None or i >= len(shape):
            out.append(axis)
            continue
        if shape[i] % mesh.shape[axis] == 0:
            out.append(axis)
        else:
            out.append(None)
    return P(*out)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params``. With mesh "model"=1
    every spec degenerates to full replication (pure DP)."""

    def to_sharding(kp, leaf):
        p = "/".join(str(getattr(k, "key", k)) for k in kp)
        spec = _feasible(param_spec(p), leaf.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, leading_accum: bool = False) -> dict:
    """Place a host batch on the mesh. On a single-device mesh this is a
    plain transfer: explicit NamedSharding placement on the remote-TPU
    tunnel used here forces params through the host every step (~90x
    slowdown measured), so sharding annotations are reserved for real
    multi-device meshes."""
    if mesh.size == 1:
        return batch
    spec = P(None, "data") if leading_accum else P("data")
    sh = NamedSharding(mesh, spec)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_params(params, mesh: Mesh):
    if mesh.size == 1:
        return params  # see shard_batch: avoid committed shardings on 1 dev
    return jax.device_put(params, param_shardings(params, mesh))

"""Worker process for tests/test_distributed.py.

Runs one data-parallel train step as one of two cooperating JAX processes
(localhost coordinator, CPU backend with gloo collectives, 4 virtual
devices each -> an 8-way global "data" mesh). Each process feeds ONLY its
host-local half of the global batch through
``parallel.mesh.host_local_batch_to_global``; the jitted step then runs on
the global view, with GSPMD inserting the cross-process gradient psum.
Prints ``RESULT {json}`` for the parent test to compare across processes.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import json
import os
import sys

import re

# force EXACTLY 4 local devices, replacing any inherited count (the test
# suite's conftest exports 8 for the single-process virtual mesh)
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=4"

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from midi_emotion_tpu.models.config import ModelConfig  # noqa: E402
from midi_emotion_tpu.models.model import MusicTransformer, init_params  # noqa: E402
from midi_emotion_tpu.parallel import mesh as mesh_lib  # noqa: E402
from midi_emotion_tpu.training.train_step import (  # noqa: E402
    make_optimizer, make_train_step,
)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

mesh = mesh_lib.make_mesh(n_data=4 * nproc, n_model=1)

cfg = ModelConfig(
    vocab_size=64, mode="continuous_concat", n_layer=1, n_head=2,
    d_model=32, d_inner=64, d_condition=8, dropout=0.0, max_seq=64,
    pad_id=0,
).validate()
model = MusicTransformer(cfg, dtype=jnp.float32, attn_impl="xla")
params = init_params(model, jax.random.PRNGKey(0))
params = mesh_lib.shard_params(params, mesh)
opt = make_optimizer(clip=1.0)
opt_state = jax.jit(opt.init)(params)
step = make_train_step(model, opt, accumulate_steps=1, donate=False)

# the GLOBAL batch is derived from a shared seed; each process slices out
# and feeds only its own half (rows [pid*half, (pid+1)*half))
B_global, T = 16, 32
rng = np.random.RandomState(0)
tokens = rng.randint(1, 63, size=(1, B_global, T)).astype(np.int32)
target = rng.randint(1, 63, size=(1, B_global, T)).astype(np.int32)
cond = rng.uniform(-1, 1, size=(1, B_global, 2)).astype(np.float32)
half = B_global // nproc
lo, hi = pid * half, (pid + 1) * half
local = {
    "input": tokens[:, lo:hi],
    "target": target[:, lo:hi],
    "condition": cond[:, lo:hi],
}
gbatch = mesh_lib.host_local_batch_to_global(local, mesh, leading_accum=True)
assert gbatch["input"].shape == (1, B_global, T), gbatch["input"].shape

params2, opt_state, metrics = step(
    params, opt_state, gbatch, jax.random.PRNGKey(1), jnp.float32(1e-3)
)
loss = float(jax.device_get(metrics["loss"]))
gnorm = float(jax.device_get(metrics["grad_norm"]))
# fully-replicated leaf: fetch works on every host; delta proves the
# update applied
delta = float(
    jnp.abs(
        jax.tree.leaves(params2)[0].astype(jnp.float32)
        - jax.tree.leaves(params)[0].astype(jnp.float32)
    ).sum()
)
print("RESULT " + json.dumps(
    {"pid": pid, "loss": loss, "grad_norm": gnorm, "delta": delta,
     "n_devices": len(jax.devices())}
), flush=True)

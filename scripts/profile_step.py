"""Capture a profiler trace of the best train config and print top ops."""
import glob, gzip, json, sys, collections
sys.path.insert(0, "/root/repo")
import jax
from midi_emotion_tpu.ops import pallas_attention as pa
from scripts.perf_train_configs import run

pa.BLOCK_Q = pa.BLOCK_K = 256
import numpy as np, jax.numpy as jnp
from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.training.train_step import make_optimizer, make_train_step
from scripts.perf_train_configs import FLAGSHIP, B, T

cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
params = init_params(model, jax.random.PRNGKey(0))
optimizer = make_optimizer(1.0)
opt_state = jax.jit(optimizer.init)(params)
step = make_train_step(model, optimizer, accumulate_steps=1)
rng = np.random.RandomState(0)
batch = {
    "input": rng.randint(2, 1000, size=(1, B, T)).astype(np.int32),
    "condition": np.zeros((1, B, 2), np.float32),
    "target": rng.randint(2, 1000, size=(1, B, T)).astype(np.int32),
}
lr = jnp.float32(2e-5)
params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(0), lr)
float(jax.device_get(m["loss"]))

import shutil, os
shutil.rmtree("/tmp/prof", ignore_errors=True)
N_STEPS = 3
jax.profiler.start_trace("/tmp/prof")
for i in range(N_STEPS):
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(i + 1), lr)
float(jax.device_get(m["loss"]))
jax.profiler.stop_trace()

# parse the trace: sum device op durations by name
paths = glob.glob("/tmp/prof/**/*.trace.json.gz", recursive=True)
print("traces:", paths, file=sys.stderr)
tot = collections.Counter()
for p in paths:
    with gzip.open(p, "rt") as f:
        d = json.load(f)
    for ev in d.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            cat = ev.get("args", {}).get("long_name", "") or ev.get("name", "")
            pid = ev.get("pid", 0)
            tot[(pid, ev.get("name", ""))] += ev["dur"]
# print top 60, per step
for (pid, name), us in tot.most_common(60):
    print(f"{us/1000/N_STEPS:10.3f} ms/step  pid={pid}  {name[:110]}")

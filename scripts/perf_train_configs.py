"""Train-step timing sweep over remat-policy x attention-impl on the real
chip. Honest-timing rules (CLAUDE.md): solo process, params/opt evolve per
step so no memoized replays, host fetch marks completion."""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.parallel import mesh as mesh_lib
from midi_emotion_tpu.training.train_step import make_optimizer, make_train_step

FLAGSHIP = dict(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
)
import os

B = int(os.environ.get("TRAIN_B", 8))
T = int(os.environ.get("TRAIN_T", 1216))


def run(remat, policy, attn, n_steps=10):
    cfg = ModelConfig(**FLAGSHIP, remat=remat, remat_policy=policy).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl=attn)
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
    t0 = time.time()
    params, opt_state, m = step(params, opt_state, batch, jax.random.PRNGKey(0), lr)
    float(jax.device_get(m["loss"]))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(n_steps):
        params, opt_state, m = step(
            params, opt_state, batch, jax.random.PRNGKey(i + 1), lr
        )
    loss = float(jax.device_get(m["loss"]))
    dt = (time.time() - t0) / n_steps
    return dict(
        remat=remat, policy=policy, attn=attn, ms_per_step=round(dt * 1000, 1),
        tok_per_s=round(B * T / dt, 1), compile_s=round(compile_s, 1),
        loss=round(loss, 4),
    )


if __name__ == "__main__":
    configs = [
        (True, "full", "xla"),    # round-1 shipped config
        (True, "dots", "xla"),
        (False, "full", "xla"),   # no remat
        (False, "full", "pallas"),
        (True, "dots", "pallas"),
    ]
    only = sys.argv[1:] or None
    for remat, policy, attn in configs:
        tag = f"{'remat-' + policy if remat else 'noremat'}/{attn}"
        if only and tag not in only:
            continue
        try:
            r = run(remat, policy, attn)
        except Exception as e:  # OOM etc -- record and continue
            r = dict(remat=remat, policy=policy, attn=attn,
                     error=repr(e)[:200])
        print(json.dumps(r), flush=True)

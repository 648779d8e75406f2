"""Generation throughput / large-batch decode repro (solo TPU).

Usage: python scripts/perf_decode.py [B ...]
"""
import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.ops.sampling import SamplingParams
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

FLAGSHIP = dict(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
)

G = 1024
cfg = ModelConfig(**FLAGSHIP).validate()
model = MusicTransformer(cfg, dtype=jnp.bfloat16)
params = init_params(model, jax.random.PRNGKey(0))

for B in [int(a) for a in (sys.argv[1:] or ["16", "32", "64", "128"])]:
    sp = SamplingParams(gen_len=G, max_input_len=1216, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=1)
    import os
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp,
                      kv_dtype=os.environ.get("KV_DTYPE", "native"))
    primers = np.ones((B, 1), np.int32)
    conds = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))
    try:
        sampler.generate(primers, continuous_conditions=conds,
                         rng=jax.random.PRNGKey(123))  # compile
        t0 = time.time()
        sampler.generate(primers, continuous_conditions=conds,
                         rng=jax.random.PRNGKey(456))
        dt = time.time() - t0
        print(json.dumps({"B": B, "gen_s": round(dt, 2),
                          "tok_per_s": round(B * (G - 1) / dt, 1)}), flush=True)
    except Exception:
        print(json.dumps({"B": B, "error": traceback.format_exc()[-2500:]}),
              flush=True)

"""End-to-end serving throughput at the bench configuration (round 4).

Times Sampler.generate exactly like bench.py's serving section (1-token
primer, gen_len 1024, best-of-2 with distinct RNG) so skip/staging/batch
changes can be evaluated without the full bench. Run SOLO on the TPU.

    python scripts/perf_serving_e2e.py <batch> <kv_dtype> [gen_len]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.ops.sampling import SamplingParams
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

FLAGSHIP = dict(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KV = sys.argv[2] if len(sys.argv) > 2 else "int8"
G = int(sys.argv[3]) if len(sys.argv) > 3 else 1024


def main():
    cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
    params = init_params(model, jax.random.PRNGKey(0))
    sp = SamplingParams(gen_len=G, max_input_len=1216,
                        temperatures=(1.2, 1.2), top_k=-1, top_p=0.7,
                        penalty_coeff=0.5, seed=1)
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=KV)
    primers = np.ones((B, 1), np.int32)
    conds = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))

    sampler.generate(primers, continuous_conditions=conds,
                     rng=jax.random.PRNGKey(123))  # compile
    best = float("inf")
    for r in range(2):
        t0 = time.time()
        sampler.generate(primers, continuous_conditions=conds,
                         rng=jax.random.PRNGKey(456 + r))
        best = min(best, time.time() - t0)
    tps = B * (G - 1) / best
    print(f"B={B} kv={KV} gen_len={G}: {best:.2f} s -> {tps:,.0f} tok/s")


if __name__ == "__main__":
    main()

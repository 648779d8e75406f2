"""Reproduce the round-1 'B>=64 fails in the remote compile helper' issue."""
import sys, time
import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.ops.sampling import SamplingParams
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
G = int(sys.argv[2]) if len(sys.argv) > 2 else 256

cfg = ModelConfig(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
).validate()
model = MusicTransformer(cfg, dtype=jnp.bfloat16)
params = init_params(model, jax.random.PRNGKey(0))
print("params ready; devices:", jax.devices(), flush=True)

sp = SamplingParams(gen_len=G, max_input_len=1216, temperatures=(1.2, 1.2),
                    top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=1)
sampler = Sampler(model, params, DEFAULT_VOCAB, sp)
primers = np.ones((B, 1), np.int32)
conds = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))

t0 = time.time()
song = sampler.generate(primers, continuous_conditions=conds,
                        rng=jax.random.PRNGKey(123))
print("warmup", time.time() - t0, "s", song.shape, flush=True)
t0 = time.time()
song = sampler.generate(primers, continuous_conditions=conds,
                        rng=jax.random.PRNGKey(456))
dt = time.time() - t0
print(f"B={B} G={G}: {dt:.2f}s = {B*(G-1)/dt:.1f} tok/s", flush=True)

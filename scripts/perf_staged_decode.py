"""Measure the staged-append decode win on the real chip.

Sweeps MIDI_EMOTION_DECODE_STAGE (S) for the int8 serving config
(B=128) and the bf16 stacked path at exact-path batches. Run SOLO on
the TPU. Usage: python scripts/perf_staged_decode.py [configs...]
where a config is kv:B:S (e.g. int8:128:8); default sweep below.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    FLAGSHIP = dict(
        vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
        d_model=768, d_inner=3072, d_condition=192, max_seq=2048,
        dropout=0.1,
    )
    cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
    params = init_params(model, jax.random.PRNGKey(0))
    G = 1024
    sp = SamplingParams(gen_len=G, max_input_len=1216,
                        temperatures=(1.2, 1.2), top_k=-1, top_p=0.7,
                        penalty_coeff=0.5, seed=1)

    configs = sys.argv[1:] or [
        "int8:128:0", "int8:128:8", "int8:128:16",
        "bf16:64:8", "bf16:96:8", "bf16:64:0",
    ]
    for spec in configs:
        kv, B, S = spec.split(":")
        B, S = int(B), int(S)
        primers = np.ones((B, 1), np.int32)
        conds = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))
        try:
            s = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=kv,
                        stage_steps=S)
            s.generate(primers, continuous_conditions=conds,
                       rng=jax.random.PRNGKey(123))  # compile
            best = float("inf")
            for r in range(2):
                t0 = time.time()
                s.generate(primers, continuous_conditions=conds,
                           rng=jax.random.PRNGKey(456 + r))
                best = min(best, time.time() - t0)
            tps = B * (G - 1) / best
            print(f"{spec:14s} {best:7.2f} s  {tps:9.1f} tok/s", flush=True)
            del s
        except Exception as e:
            print(f"{spec:14s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
        import gc

        gc.collect()


if __name__ == "__main__":
    main()

"""Round-5 e2e decode sweeps (VERDICT r4 item 4): bank the staged-append +
dead-block-skip wins with driver-credible numbers.

Sweeps, each a full generate (G=1024) timed best-of-2 with fresh RNG per
rep (CLAUDE.md benchmark-honesty rules):

  * serving: int8 stacked cache, B in --serve_batches, stage depth S in
    --stages. Round-3 ceiling was 24.4k at B=128, S=0 (no staging).
  * exact-unquantized: bf16 stacked cache (same math as the native path up
    to online-softmax summation order; zero quantization) across batches --
    the staging/skip ideas "transferred to the exact path" by routing the
    exact math through the staged stacked cache instead of rebuilding the
    machinery on the per-layer native buffers.
  * native: the per-layer-cache baseline at its round-3 best (B=64).

Run SOLO on the TPU:  python scripts/perf_r5_sweeps.py
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.ops.sampling import SamplingParams
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

FLAGSHIP = dict(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
)
G = 1024


def time_gen(s, B, reps=2):
    import jax.numpy as jnp  # noqa: F401

    prims = np.ones((B, 1), np.int32)
    cs = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))
    s.generate(prims, continuous_conditions=cs, rng=jax.random.PRNGKey(123))
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        s.generate(prims, continuous_conditions=cs,
                   rng=jax.random.PRNGKey(456 + r))
        best = min(best, time.time() - t0)
    return B * (G - 1) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve_batches", default="128")
    ap.add_argument("--stages", default="8,16,32")
    ap.add_argument("--bf16_batches", default="64,96,128")
    ap.add_argument("--native_batches", default="")
    ap.add_argument("--skip_serving", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    cfg = ModelConfig(**FLAGSHIP).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="xla")
    params = init_params(model, jax.random.PRNGKey(0))
    sp = SamplingParams(gen_len=G, max_input_len=1216,
                        temperatures=(1.2, 1.2), top_k=-1, top_p=0.7,
                        penalty_coeff=0.5, seed=1)
    import gc

    def run(kv, B, S):
        s = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=kv,
                    stage_steps=(None if S == "env" else S))
        try:
            tps = time_gen(s, B)
            print(f"RESULT kv={kv} B={B} S={S}: {tps:,.1f} tok/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001 -- sweep survives one OOM
            print(f"RESULT kv={kv} B={B} S={S}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        del s
        gc.collect()

    if not args.skip_serving:
        for B in [int(x) for x in args.serve_batches.split(",") if x]:
            for S in [int(x) for x in args.stages.split(",") if x]:
                run("int8", B, S)
    for B in [int(x) for x in args.bf16_batches.split(",") if x]:
        run("bf16", B, 8)
    for B in [int(x) for x in args.native_batches.split(",") if x]:
        run("native", B, 0)


if __name__ == "__main__":
    main()

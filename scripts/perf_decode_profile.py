"""Decompose the serving decode step (VERDICT r3 item 1).

Times four things at the serving config (int8 KV, B=128, W=1408 full-width
steady state, flagship model):

  1. the full sample+decode scan (the real serving step),
  2. the fused decode-attention kernel alone (20 chained layer reads),
  3. the dense step with attention stubbed out (embedding + QKVO/FFN/logits
     GEMMs + LN + cache appends + requantize),
  4. the sampling math alone (sample_step scan over fixed logits),

then captures a profiler trace of (1) and prints the per-op aggregation.
Run SOLO on the TPU.
"""

import collections
import glob
import gzip
import json
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from midi_emotion_tpu.models.config import ModelConfig
from midi_emotion_tpu.models.model import MusicTransformer, init_params
from midi_emotion_tpu.generation.sampler import Sampler
from midi_emotion_tpu.ops.sampling import SamplingParams, sample_step
from midi_emotion_tpu.vocab import DEFAULT_VOCAB

FLAGSHIP = dict(
    vocab_size=1007, mode="continuous_concat", n_layer=20, n_head=16,
    d_model=768, d_inner=3072, d_condition=192, max_seq=2048, dropout=0.1,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
W = 1408
PROMPT = 1216
N_STEPS = 64


def timed(fn, *args, reps=3, label=""):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for r in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.time() - t0)
    print(f"{label:44s} {best*1000:8.2f} ms total  {best*1000/N_STEPS:7.3f} ms/step")
    return best


def main():
    cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
    params = init_params(model, jax.random.PRNGKey(0))

    sp = SamplingParams(gen_len=1024, max_input_len=1216,
                        temperatures=(1.2, 1.2), top_k=-1, top_p=0.7,
                        penalty_coeff=0.5, seed=1)
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype="int8")

    rng = np.random.RandomState(0)
    prompt = rng.randint(2, 1000, size=(B, PROMPT)).astype(np.int32)
    cond = jnp.tile(jnp.asarray([[0.8, 0.8]], jnp.float32), (B, 1))

    prefill = sampler._prefill_core(PROMPT, W)
    logits, cache, ce = prefill(params, jnp.asarray(prompt), cond)
    jax.device_get(logits)
    print(f"prefilled: B={B} W={W} length={int(jax.device_get(cache['length']))}")

    # ---- 1. the real serving scan (sample + decode) ----
    scan = sampler._scan_core(N_STEPS, W, False)
    uniforms = jax.random.uniform(jax.random.PRNGKey(3), (N_STEPS, B))
    cond_seq = jnp.zeros((N_STEPS, B, 2), jnp.float32)
    temp_key = jnp.asarray(prompt[:, -1])
    counts = jnp.zeros((B,), jnp.int32)

    def run_scan(c):
        toks, lg, c2, ct = scan(params, c, logits, temp_key, counts,
                                uniforms, cond_seq, ce)
        return toks

    # NOTE: scan donates the cache; keep a template and re-pad per call
    import copy
    def fresh_cache():
        return jax.tree.map(lambda x: x + 0, cache)  # device copy

    c0 = fresh_cache()
    run_scan(c0)  # compile
    best = float("inf")
    for r in range(3):
        c0 = fresh_cache()
        toks = None
        t0 = time.time()
        toks = run_scan(c0)
        jax.device_get(toks)
        best = min(best, time.time() - t0)
    full_ms = best * 1000 / N_STEPS
    print(f"{'1. full serving scan':44s} {best*1000:8.2f} ms total  {full_ms:7.3f} ms/step")

    # ---- 2. kernel alone: 20 chained cache reads ----
    from midi_emotion_tpu.ops.decode_attention import (
        decode_attn_cached, expand_e_rows,
    )

    e_table = params["enc_layers_0"]["rga"]["E"]
    kv8, sc = cache["kv"], cache["sc"]
    length = cache["length"]

    @jax.jit
    def kernel_only(q0, kv8, sc, length):
        e_rows = expand_e_rows(e_table.astype(jnp.bfloat16), length + 1, W)

        def one_layer(q, i):
            acc, m, l = decode_attn_cached(q, kv8, sc, i, e_rows, length)
            # chain: next q depends on this layer's acc (forces sequential)
            q = (q + acc.reshape(q.shape) * 1e-6).astype(q.dtype)
            return q, acc

        def step_body(q, s):
            q, _ = jax.lax.scan(one_layer, q, jnp.arange(cfg.n_layer))
            return q, None

        q, _ = jax.lax.scan(step_body, q0, None, length=N_STEPS)
        return q

    q0 = jnp.asarray(rng.randn(B, cfg.n_head, cfg.d_head), jnp.bfloat16)
    kfn = lambda: kernel_only(q0, kv8, sc, length)
    kfn()
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.device_get(kfn())
        best = min(best, time.time() - t0)
    kern_ms = best * 1000 / N_STEPS
    bytes_step = float(cfg.n_layer) * B * W * 2 * cfg.d_model * 1 \
        + cfg.n_layer * B * 2 * cfg.n_head * W * 2
    print(f"{'2. decode kernel x20 (full W reads)':44s} {best*1000:8.2f} ms total  "
          f"{kern_ms:7.3f} ms/step  -> {bytes_step/1e9/ (kern_ms/1000):6.1f} GB/s "
          f"({bytes_step/1e9:.3f} GB/step)")

    # ---- 3. dense step with attention stubbed ----
    # (skipped when tight on HBM: a second compiled scan + donated-cache
    # copies OOM at B=128; dense ~= full - kernel)
    import gc
    import midi_emotion_tpu.ops.decode_attention as da

    dense_ms = full_ms - kern_ms
    if B <= 64:
        real = da.decode_attn_cached

        def stub(q_t, kv8, sc, layer, e_rows, length):
            Bq, H, dh = q_t.shape
            acc = jnp.zeros((Bq, H * dh), jnp.float32) + q_t.reshape(Bq, -1)
            m = jnp.zeros((Bq, H), jnp.float32)
            l = jnp.ones((Bq, H), jnp.float32)
            return acc, m, l

        # decode_q imports decode_attn_cached at call time from the module
        da.decode_attn_cached = stub
        try:
            sampler2 = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype="int8")
            scan2 = sampler2._scan_core(N_STEPS, W, False)

            def run_stub(c):
                toks, *_ = scan2(params, c, logits, temp_key, counts, uniforms,
                                 cond_seq, ce)
                return toks

            c1 = fresh_cache()
            run_stub(c1)
            best = float("inf")
            for _ in range(3):
                c1 = fresh_cache()
                t0 = time.time()
                jax.device_get(run_stub(c1))
                best = min(best, time.time() - t0)
            dense_ms = best * 1000 / N_STEPS
            print(f"{'3. step with attention stubbed':44s} {best*1000:8.2f} ms total  {dense_ms:7.3f} ms/step")
            del c1, scan2, sampler2
            gc.collect()
        finally:
            da.decode_attn_cached = real

    # ---- 4. sampling alone ----
    @jax.jit
    def sample_only(lg, tk, ct, us):
        def body(carry, u):
            lg, tk, ct = carry
            tok, ct = sample_step(lg, tk, ct, u, sampler.exclude_mask,
                                  sampler.ts_range, sp)
            lg = lg + tok[:, None].astype(jnp.float32) * 1e-9
            return (lg, tok, ct), tok

        (_, _, _), toks = jax.lax.scan(body, (lg, tk, ct), us)
        return toks

    lg32 = logits.astype(jnp.float32)
    sample_only(lg32, temp_key, counts, uniforms)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jax.device_get(sample_only(lg32, temp_key, counts, uniforms))
        best = min(best, time.time() - t0)
    samp_ms = best * 1000 / N_STEPS
    print(f"{'4. sampling scan alone':44s} {best*1000:8.2f} ms total  {samp_ms:7.3f} ms/step")

    print("\nledger (ms/step):")
    print(f"  full           {full_ms:7.3f}")
    print(f"  kernel         {kern_ms:7.3f}")
    print(f"  dense (stub)   {dense_ms:7.3f}")
    print(f"  sampling       {samp_ms:7.3f}")
    print(f"  kernel+dense   {kern_ms + dense_ms:7.3f}  (sampling is inside dense run)")

    # ---- profiler trace of the real scan ----
    shutil.rmtree("/tmp/prof_decode", ignore_errors=True)
    c2 = fresh_cache()
    jax.profiler.start_trace("/tmp/prof_decode")
    jax.device_get(run_scan(c2))
    jax.profiler.stop_trace()
    paths = glob.glob("/tmp/prof_decode/**/*.trace.json.gz", recursive=True)
    tot = collections.Counter()
    for p in paths:
        with gzip.open(p, "rt") as f:
            d = json.load(f)
        for ev in d.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                tot[(ev.get("pid", 0), ev.get("name", ""))] += ev["dur"]
    print("\ntop ops (ms/step):")
    for (pid, name), us in tot.most_common(45):
        print(f"{us/1000/N_STEPS:9.4f} ms/step  pid={pid}  {name[:100]}")


if __name__ == "__main__":
    main()

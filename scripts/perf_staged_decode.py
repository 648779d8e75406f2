"""On-chip validation + timing for the in-kernel staged decode append.

Round-4 follow-up to scripts/perf_decode_profile.py: the staged scan
(_scan_core_staged) folds the <=S pending rows into the decode kernel's
flash state IN-VMEM and appends the new row through an ALIASED kernel
output (ops/decode_attention.py staging notes). The CPU interpreter can't
prove the Mosaic lowering or the alias; this script does, then times the
staged vs legacy scans at the serving config. Run SOLO on the TPU.
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
W = 1408
PROMPT = 1216
N_STEPS = 64


def check_kernel_numerics():
    """Staged kernel (real Mosaic) vs exact decode at a small shape."""
    from midi_emotion_tpu.ops.attention import decode_rel_attention
    from midi_emotion_tpu.ops.decode_attention import (
        decode_attn_cached, expand_e_rows,
    )

    Bq, Wq, H, dh, S, MS, L = 8, 128, 4, 48, 6, 512, 2
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (Bq, H, dh), jnp.float32)
    kv_rows = jax.random.normal(ks[1], (S + 1, Bq, 2 * D), jnp.bfloat16)
    e = jax.random.normal(ks[2], (MS, dh), jnp.float32) * 0.3
    k_all = jnp.transpose(kv_rows[:, :, :D], (1, 0, 2)).astype(jnp.float32)
    v_all = jnp.transpose(kv_rows[:, :, D:], (1, 0, 2)).astype(jnp.float32)
    n = jnp.asarray(S + 1, jnp.int32)
    ref = np.asarray(
        decode_rel_attention(q, k_all, v_all, e, n).reshape(Bq, D),
        np.float32,
    )
    for quant in (False, True):
        if quant:
            kv8 = jnp.zeros((L, Bq, Wq, 2 * D), jnp.int8)
            sc = jnp.zeros((L, Bq, 2 * H, Wq), jnp.bfloat16)
        else:
            kv8 = jnp.zeros((L, Bq, Wq, 2 * D), jnp.bfloat16)
            sc = None
        pend = jnp.zeros((S + 1, L, Bq, 2 * D), jnp.bfloat16)
        pend = pend.at[:S, 1].set(kv_rows[:S])
        e_rows = expand_e_rows(e, n, Wq)
        e_pend = expand_e_rows(e, n, S + 2)  # index p_cnt=S is E[ms-1]
        row = kv_rows[S]  # also exercises the aliased append at slot S
        out, pend_out = decode_attn_cached(
            q, kv8, sc, jnp.asarray(1), e_rows, jnp.asarray(0, jnp.int32),
            pend, e_pend, jnp.asarray(S, jnp.int32), row,
        )
        out = np.asarray(out, np.float32)
        err = np.abs(out - ref) / (np.abs(ref).max() + 1e-9)
        app = np.asarray(pend_out[S, 1], np.float32)
        app_err = np.abs(app - np.asarray(row, np.float32)).max()
        print(f"  numerics quant={quant}: rel_err={err.max():.4f} "
              f"append_err={app_err:.4f}")
        assert err.max() < 0.02, (quant, err.max())
        assert app_err == 0.0, app_err


def main():
    print("== on-chip staged-kernel numerics ==")
    check_kernel_numerics()

    cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl="pallas")
    params = init_params(model, jax.random.PRNGKey(0))

    sp = SamplingParams(gen_len=1024, max_input_len=1216,
                        temperatures=(1.2, 1.2), top_k=-1, top_p=0.7,
                        penalty_coeff=0.5, seed=1)
    sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=KV)

    rng = np.random.RandomState(0)
    prompt = rng.randint(2, 1000, size=(B, PROMPT)).astype(np.int32)
    cond = jnp.tile(jnp.asarray([[0.8, 0.8]], jnp.float32), (B, 1))

    prefill = sampler._prefill_core(PROMPT, W)
    logits, cache, ce = prefill(params, jnp.asarray(prompt), cond)
    jax.device_get(logits)
    print(f"prefilled: B={B} kv={KV} W={W} "
          f"length={int(jax.device_get(cache['length']))}")

    uniforms = jax.random.uniform(jax.random.PRNGKey(3), (N_STEPS, B))
    cond_seq = jnp.zeros((N_STEPS, B, 2), jnp.float32)
    temp_key = jnp.asarray(prompt[:, -1])
    counts = jnp.zeros((B,), jnp.int32)

    def fresh(c):
        return jax.tree.map(lambda x: x + 0, c)

    def time_scan(scan, cache0, label):
        def run(c):
            toks, *_ = scan(params, c, logits, temp_key, counts, uniforms,
                            cond_seq, ce)
            return toks
        run(fresh(cache0))  # compile
        best = float("inf")
        for _ in range(3):
            c = fresh(cache0)
            t0 = time.time()
            toks = run(c)
            jax.device_get(toks)
            best = min(best, time.time() - t0)
        print(f"{label:34s} {best*1000:8.2f} ms total  "
              f"{best*1000/N_STEPS:7.3f} ms/step  "
              f"{B*N_STEPS/best:9.0f} tok/s steady-state")
        return toks, best

    legacy = sampler._scan_core(N_STEPS, W, False)
    toks_l, t_l = time_scan(legacy, cache, "legacy scan (per-step DUS append)")

    staged_cache = sampler._to_staged(cache, B)
    staged = sampler._scan_core_staged(N_STEPS, W, False)
    toks_s, t_s = time_scan(staged, staged_cache, "staged scan (in-kernel append)")

    same = np.mean(np.asarray(toks_l) == np.asarray(toks_s))
    print(f"token agreement legacy vs staged: {same:.3f} "
          f"(quantization-order noise expected < 1.0)")
    print(f"speedup: {t_l / t_s:.3f}x")


if __name__ == "__main__":
    main()

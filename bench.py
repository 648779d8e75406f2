"""Benchmark driver.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric: sampled MIDI tokens/sec, batched generation on the flagship
model (continuous_concat, 20 layers, d_model 768 -- the reference's default
config) with the reference's generation settings (window 1216, top-p 0.7,
dual temperature 1.2, repeat penalty 0.5).

Baseline: the PyTorch reference's generate() loop on CPU (its only
supported non-CUDA target), which re-forwards the full window every token
(generate.py:93-119). Its per-token cost is fitted as t(T) = a*T + b*T^2
from two measured forward lengths and integrated over the generation --
cheaper and more stable than running 1000+ CPU forwards. The fitted number
is cached in BASELINE_CPU.json.

Extra keys (same JSON object): train_tokens_per_sec_per_chip for the
flagship training step, the generation batch size, a best-known serving
entry (int8 KV cache at the swept-best batch), and roofline context
(train_mfu against v5e bf16 peak, decode_gbps against HBM bandwidth).

PROCESS ISOLATION (round 5): every measurement unit -- each exact-gen sweep
config, each serving config, the int8 run, the train step, the kernel
checks -- runs in its OWN subprocess, sequentially (never two TPU processes
at once; the tunnel time-shares). Round 5's first full run proved the
one-process design unsound on this backend: after the exact-gen sweep
(including two configs that legitimately OOM), HBM was never reclaimed and
EVERY later section died RESOURCE_EXHAUSTED -- train at B=8 "OOM'd" in a
process where a 16 GB chip sat mostly idle. A fresh process per unit makes
cross-unit leakage structurally impossible; a unit's crash is recorded in
its sweep slot / section_errors and cannot poison any other number.

Baseline caveat (ADVICE r2): the CPU batch-scale ratio is measured at one
length (T=256); if reference batch scaling differs at T~1024 the
vs_baseline multiplier carries that extrapolation error (noted in the
JSON as baseline_note).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_FP = os.path.join(REPO, "BASELINE_CPU.json")
UNIT_TAG = "UNIT_RESULT "

FLAGSHIP = dict(
    vocab_size=1007,
    mode="continuous_concat",
    n_layer=20,
    n_head=16,
    d_model=768,
    d_inner=3072,
    d_condition=192,
    max_seq=2048,
    dropout=0.1,
)


# v5e public peak numbers (How to Scale Your Model, jax-ml.github.io):
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0


def model_flops_per_token_train(cfg: dict, T: int) -> float:
    """Matmul-only model FLOPs per trained token (fwd + bwd = 3x fwd).

    Counts the QKVO/FFN/head projections plus the two attention
    contractions at the causal average length (the standard MFU
    convention -- kernel recompute and the relative-bias band matmuls are
    deliberately NOT counted, so MFU stays comparable across impls)."""
    d, L, di, V = cfg["d_model"], cfg["n_layer"], cfg["d_inner"], cfg["vocab_size"]
    t_avg = (T + 1) / 2.0
    fwd = 2 * d * V + L * (8 * d * d + 4 * d * di + 4 * d * t_avg)
    return 3.0 * fwd


def measure_reference_cpu(gen_len: int, batch: int) -> float:
    """Fit the reference CPU per-token cost and integrate. Returns
    tokens/sec for `batch` sequences of `gen_len` tokens."""
    import types

    sys.modules.setdefault("pypianoroll", types.ModuleType("pypianoroll"))
    sys.modules.setdefault("pretty_midi", types.ModuleType("pretty_midi"))
    sys.path.insert(0, "/root/reference/src")
    import torch

    from models.music_multi import MusicTransformerMulti

    torch.manual_seed(0)
    model = MusicTransformerMulti(
        embedding_dim=768, d_inner=3072, d_condition=192, vocab_size=1007,
        num_layer=20, num_head=16, max_seq=2048, dropout=0.0, pad_token=0,
    ).eval()

    def fwd_time(T: int, b: int, reps: int = 2) -> float:
        x = torch.randint(2, 1000, (b, T))
        c = torch.zeros(b, 2)
        with torch.no_grad():
            model(x, c)  # warmup
            t0 = time.time()
            for _ in range(reps):
                model(x, c)
        return (time.time() - t0) / reps

    # fit the quadratic at a small batch (a single T=1024 forward takes
    # minutes at large batch on this 1-core host) ...
    fit_b = min(batch, 4)
    t1, T1 = fwd_time(256, fit_b), 256
    t2, T2 = fwd_time(1024, fit_b), 1024
    # solve t(T) = a*T + b*T^2
    A = np.array([[T1, T1 * T1], [T2, T2 * T2]], float)
    a, b = np.linalg.solve(A, np.array([t1, t2]))
    Ts = np.minimum(np.arange(1, gen_len), 1216)
    total = float(np.sum(a * Ts + b * Ts * Ts))
    detail = {f"fwd_{T1}_s": t1, f"fwd_{T2}_s": t2, "fit_batch": fit_b}
    if batch > fit_b:
        # ... then MEASURE how cost scales to the requested batch at one
        # length (single-core torch is ~linear in batch; this pins the
        # actual ratio instead of assuming it)
        t1_big = fwd_time(256, batch, reps=1)
        ratio = t1_big / t1
        total = total * ratio
        detail.update(fwd_256_big_s=t1_big, batch_scale_ratio=ratio)
    toks_per_sec = batch * (gen_len - 1) / total
    return toks_per_sec, detail


def get_baseline(gen_len: int, batch: int) -> float:
    if os.path.exists(BASELINE_FP):
        with open(BASELINE_FP) as f:
            d = json.load(f)
        if d.get("gen_len") == gen_len and d.get("batch") == batch:
            return d["tokens_per_sec"]
    if not os.path.isdir("/root/reference"):
        return float("nan")
    toks, detail = measure_reference_cpu(gen_len, batch)
    with open(BASELINE_FP, "w") as f:
        json.dump(
            {
                "tokens_per_sec": toks,
                "gen_len": gen_len,
                "batch": batch,
                "hardware": "CPU (torch, reference generate loop, fitted)",
                **detail,
            },
            f,
            indent=2,
        )
    return toks


# --------------------------------------------------------------------------
# child side: run ONE measurement unit in this process and print its JSON
# fragment as the last stdout line, tagged UNIT_RESULT.
# --------------------------------------------------------------------------


def run_unit(args):
    import jax

    out = {"device": str(jax.devices()[0])}

    if args.unit == "kernel_checks":
        # On-chip kernel checks (VERDICT r3 item 4 / r4 item 2): the
        # fused-dropout hardware-PRNG assertions, flash fwd/bwd, fused LN,
        # and the decode-attention kernel in all 4 quant x staged modes
        # cannot be exercised on CPU (interpret mode is not a backend), so
        # bench.py -- the one script guaranteed to run solo on the real
        # chip every round -- records their pass/fail tally in the
        # driver-visible JSON.
        if jax.default_backend() != "cpu":
            from scripts.tpu_kernel_checks import run_checks

            out.update(run_checks())
        print(UNIT_TAG + json.dumps(out))
        return

    import jax.numpy as jnp

    from midi_emotion_tpu.models.config import ModelConfig
    from midi_emotion_tpu.models.model import MusicTransformer, init_params
    from midi_emotion_tpu.ops.sampling import SamplingParams
    from midi_emotion_tpu.generation.sampler import Sampler
    from midi_emotion_tpu.vocab import DEFAULT_VOCAB

    # remat off: the flash kernel is O(T) activation memory, so the flagship
    # training step fits without rematerialization (fastest measured config,
    # scripts/perf_train_configs.py)
    cfg = ModelConfig(**FLAGSHIP, remat=False).validate()
    model = MusicTransformer(cfg, dtype=jnp.bfloat16, attn_impl=args.attn_impl)
    params = init_params(model, jax.random.PRNGKey(0))

    G = args.gen_len
    sp = SamplingParams(gen_len=G, max_input_len=1216, temperatures=(1.2, 1.2),
                        top_k=-1, top_p=0.7, penalty_coeff=0.5, seed=1)

    def time_gen(s, B, reps=3):
        """Warm once, then best-of-`reps` (single-rep numbers on this
        tunnel vary +-5%, and its stall phases can poison a whole rep;
        max is the standard throughput convention). Different RNG per
        rep so nothing can serve a memoized result."""
        prims = np.ones((B, 1), np.int32)
        cs = np.tile(np.array([[0.8, 0.8]], np.float32), (B, 1))
        s.generate(prims, continuous_conditions=cs,
                   rng=jax.random.PRNGKey(123))
        best = float("inf")
        for r in range(reps):
            t0 = time.time()
            s.generate(prims, continuous_conditions=cs,
                       rng=jax.random.PRNGKey(456 + r))
            best = min(best, time.time() - t0)
        return best

    if args.unit.startswith("gen:"):
        # one exact-path / int8 generate config: gen:<kv>:<B>[:<stage>]
        parts = args.unit.split(":")
        kv, B = parts[1], int(parts[2])
        stage = int(parts[3]) if len(parts) > 3 else None
        kwargs = {} if stage is None else {"stage_steps": stage}
        sampler = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=kv,
                          **kwargs)
        out["seconds"] = time_gen(sampler, B)
        out["tokens_per_sec"] = B * (G - 1) / out["seconds"]
    elif args.unit == "quick_stacked":
        # --quick still COMPILES the stacked modes (VERDICT r4 item 2:
        # it used to skip them, which is how a decode-kernel lowering
        # regression could land without any cheap gate catching it)
        for kvd in ("int8", "bf16"):
            s = Sampler(model, params, DEFAULT_VOCAB, sp, kv_dtype=kvd)
            s.generate(np.ones((args.gen_batch, 1), np.int32),
                       continuous_conditions=np.tile(
                           np.array([[0.8, 0.8]], np.float32),
                           (args.gen_batch, 1)))
        out["quick_stacked_modes_compiled"] = ["int8", "bf16"]
    elif args.unit == "train":
        from midi_emotion_tpu.parallel import mesh as mesh_lib
        from midi_emotion_tpu.training.train_step import (
            make_optimizer, make_train_step,
        )

        mesh = mesh_lib.make_mesh()
        tparams = mesh_lib.shard_params(params, mesh)
        optimizer = make_optimizer(1.0)
        opt_state = jax.jit(optimizer.init)(tparams)
        step = make_train_step(model, optimizer, accumulate_steps=1)
        TB, T = args.train_batch, 1216
        rng = np.random.RandomState(0)
        batch = {
            "input": rng.randint(2, 1000, size=(1, TB, T)).astype(np.int32),
            "condition": np.zeros((1, TB, 2), np.float32),
            "target": rng.randint(2, 1000, size=(1, TB, T)).astype(np.int32),
        }
        sb = mesh_lib.shard_batch(batch, mesh, leading_accum=True)
        lr = jnp.float32(2e-5)
        # compile + 2 warmup steps. Sync each with a HOST FETCH:
        # block_until_ready is unreliable on this tunnel (CLAUDE.md), and
        # an unsynced compile remnant bleeding into the timed loop is
        # exactly how the r5 full bench recorded 3.1 s/step for a 0.17 s
        # step (a slow remote compile landed inside the timed region).
        for w in range(3):
            tparams, opt_state, m = step(
                tparams, opt_state, sb, jax.random.PRNGKey(-1 - w), lr
            )
            float(jax.device_get(m["loss"]))
        # time 3 chunks of 4 steps, report the BEST chunk: the tunnel
        # shows intermittent multi-second stalls, and one stall inside a
        # single timed window mis-reports a 0.17 s step by 10-300x. A
        # chunk keeps async dispatch pipelining (sync only at its end via
        # host fetch); params/opt_state evolve per step and rng varies,
        # so every call is a genuinely fresh execution.
        chunk, best = 4, float("inf")
        for c in range(3):
            t0 = time.time()
            for i in range(chunk):
                tparams, opt_state, m = step(
                    tparams, opt_state, sb,
                    jax.random.PRNGKey(c * chunk + i + 1), lr,
                )
            float(jax.device_get(m["loss"]))  # host fetch = completion
            best = min(best, (time.time() - t0) / chunk)
        out["seconds_per_step"] = best
        out["n_chips"] = len(jax.devices())
        out["train_batch"] = TB
        out["train_T"] = T
    else:
        raise SystemExit(f"unknown unit: {args.unit}")

    print(UNIT_TAG + json.dumps(out))


# --------------------------------------------------------------------------
# parent side: orchestrate units sequentially, merge fragments, print the
# single JSON line. The parent NEVER imports jax (it must not hold a tunnel
# client while a child owns the chip).
# --------------------------------------------------------------------------


def run_sub(args, unit, timeout=2400):
    cmd = [
        sys.executable, os.path.abspath(__file__), "--unit", unit,
        "--gen_len", str(args.gen_len), "--gen_batch", str(args.gen_batch),
        "--train_batch", str(args.train_batch),
        "--attn_impl", args.attn_impl,
    ]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=REPO)
    except subprocess.TimeoutExpired:
        return None, f"TIMEOUT after {timeout}s"
    for line in reversed(p.stdout.splitlines()):
        if line.startswith(UNIT_TAG):
            return json.loads(line[len(UNIT_TAG):]), None
    tail = [ln for ln in p.stderr.strip().splitlines() if ln.strip()][-3:]
    return None, f"rc={p.returncode}: " + " | ".join(tail)[:300]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_len", type=int, default=1024)
    ap.add_argument("--gen_batch", type=int, default=64)
    ap.add_argument("--sweep_gen_batch", type=str,
                    default="32,64,bf16:64,bf16:64:16,bf16:64:32,bf16:96",
                    help="comma list of exact-path configs to sweep for the "
                         "headline: 'B' (native per-layer cache), 'kv:B', "
                         "or 'kv:B:S' (S = stage depth) with kv in "
                         "{native, bf16} -- bf16 is the stacked staged "
                         "cache at IDENTICAL precision (no quantization; "
                         "it differs from native only in online-softmax "
                         "summation order), so both are legitimate "
                         "exact-path headline configs. Empty string "
                         "disables the sweep. Omitted from the default "
                         "(all measured round 5): native:96 = 7.8k (never "
                         "competitive), native:128 fails to compile at "
                         "this window, bf16:128's cache is 2x the int8:128 "
                         "HBM ceiling.")
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--serve_batch", type=int, default=128,
                    help="(legacy; superseded by --sweep_serving)")
    ap.add_argument("--sweep_serving", type=str,
                    default="128:8,128:16,128:32,144:8",
                    help="comma list of int8 serving configs 'batch:stage' "
                         "to sweep; the best becomes serving_tokens_per_sec. "
                         "144:8 probes the HBM-residency edge under the "
                         "full-width prealloc (fenced; pre-prealloc it was "
                         "RESOURCE_EXHAUSTED)")
    ap.add_argument("--attn_impl", type=str, default="pallas")
    ap.add_argument("--quick", action="store_true", help="tiny smoke sizes")
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--unit", type=str, default="",
                    help="(internal) run one measurement unit in-process")
    args = ap.parse_args()

    if args.unit:
        run_unit(args)
        return

    if args.quick:
        args.gen_len, args.gen_batch, args.train_batch = 64, 4, 2
        args.sweep_gen_batch = ""

    result = {
        "metric": "sampled MIDI tokens/sec (batched generate, continuous_concat 20L/768d)",
        "value": None,
        "unit": "tokens/sec",
        "device": None,
        "attn_impl": args.attn_impl,
        "process_isolation": "one subprocess per measurement unit",
    }
    errors = {}
    G = args.gen_len

    def note_device(frag):
        if result["device"] is None and frag and frag.get("device"):
            result["device"] = frag["device"]

    # ---- on-chip kernel checks (skipped under --quick, as before) ----
    if not args.quick:
        frag, err = run_sub(args, "kernel_checks", timeout=3600)
        note_device(frag)
        if err:
            errors["kernel_checks"] = err
        elif frag:
            frag.pop("device", None)
            result.update(frag)

    # ---- exact-path generate sweep (the headline `value`) ----
    def parse(tok):
        # token forms: "B" (native), "kv:B", "kv:B:S" (S = stage depth for
        # the stacked exact path; omitted -> the sampler's default staging)
        parts = tok.split(":")
        kv = parts[0] if len(parts) > 1 else "native"
        assert kv in ("native", "bf16"), tok  # both are exact-precision
        b = int(parts[-2] if len(parts) > 2 else parts[-1])
        s = int(parts[-1]) if len(parts) > 2 else None
        return kv, b, s

    sweep = [parse(x) for x in args.sweep_gen_batch.split(",") if x]
    configs = sweep if sweep else [("native", args.gen_batch, None)]
    best_tps, best_cfg, best_s, per_batch = -1.0, None, None, {}
    for kv, B, S in configs:
        key = f"{kv}:{B}" + (f":{S}" if S is not None else "")
        unit = f"gen:{kv}:{B}" + (f":{S}" if S is not None else "")
        frag, err = run_sub(args, unit)
        note_device(frag)
        if err:
            per_batch[key] = f"FAIL: {err[:160]}"
            continue
        tps = frag["tokens_per_sec"]
        per_batch[key] = round(tps, 1)
        if tps > best_tps:
            best_tps, best_cfg, best_s = tps, (kv, B), frag["seconds"]
    if best_cfg is None:
        errors["exact_generate"] = "every exact-gen config failed"
        result["gen_sweep_tokens_per_sec"] = per_batch
    else:
        result["value"] = round(best_tps, 1)
        result["gen_batch"] = best_cfg[1]
        result["gen_kv_path"] = best_cfg[0]
        result["gen_len"] = G
        result["gen_seconds"] = round(best_s, 2)
        if sweep:
            # VERDICT r3 item 8 / r4 item 6: the headline is provably the
            # swept-best exact configuration
            result["gen_batch_swept"] = True
            result["gen_sweep_tokens_per_sec"] = per_batch

    # ---- stacked-cache modes ----
    if args.quick:
        frag, err = run_sub(args, "quick_stacked")
        note_device(frag)
        if err:
            errors["quick_stacked"] = err
        elif frag:
            result["quick_stacked_modes_compiled"] = frag[
                "quick_stacked_modes_compiled"]
    else:
        # same settings/batch as the headline; sampled tokens can differ
        # from the exact path within int8 quantization error, so it is
        # reported separately, not as `value`
        B = result.get("gen_batch") or args.gen_batch
        frag, err = run_sub(args, f"gen:int8:{B}")
        note_device(frag)
        if err:
            errors["int8_generate"] = err
        elif frag:
            result["gen_tokens_per_sec_int8kv"] = round(
                frag["tokens_per_sec"], 1)

        # SERVING sweep: int8 stacked cache over (batch, stage-depth)
        # configs, each in its own subprocess (an OOM at the HBM-residency
        # edge or a stage-depth compile failure cannot leak into the rest).
        # Stage depth S amortizes the cache flush over S steps (staged
        # pending-row buffer, ops/decode_attention.py).
        best_tps, best_sbs, per_cfg = -1.0, None, {}
        for tok in args.sweep_serving.split(","):
            if not tok:
                continue
            SB, S = (int(x) for x in tok.split(":"))
            frag, err = run_sub(args, f"gen:int8:{SB}:{S}")
            note_device(frag)
            if err:
                per_cfg[tok] = f"FAIL: {err[:160]}"
                continue
            tps = frag["tokens_per_sec"]
            per_cfg[tok] = round(tps, 1)
            if tps > best_tps:
                best_tps, best_sbs = tps, (SB, S)
        result["serving_sweep_tokens_per_sec"] = per_cfg
        if best_sbs is None:
            errors["serving"] = "every serving config failed"
        else:
            SB = best_sbs[0]
            serve_tps = best_tps
            result["serving_tokens_per_sec"] = round(serve_tps, 1)
            result["serving_batch"] = SB
            result["serving_stage_steps"] = best_sbs[1]
            result["serving_kv_dtype"] = "int8"
            # decode roofline: bytes the fused kernel streams per step. The
            # cache is preallocated full-width but the dead-block skip reads
            # only ceil(length/bw) blocks, so the streamed width tracks the
            # LIVE length, not the allocation.
            hop = max(1, 1216 // 8)
            W = min((1216 + hop + 127) // 128 * 128, FLAGSHIP["max_seq"])
            bw = 128
            widths = np.minimum(np.ceil((np.arange(G) + 2) / bw) * bw, W)
            w_mean = float(widths.mean())
            D = FLAGSHIP["d_model"]
            H = FLAGSHIP["n_head"]
            Lr = FLAGSHIP["n_layer"]
            bytes_step = (
                Lr * SB * w_mean * 2 * D * 1 + Lr * SB * 2 * H * w_mean * 2
            )
            result["decode_window_mean"] = round(w_mean, 1)
            result["decode_window_max"] = W
            result["decode_bytes_per_step_gb"] = round(bytes_step / 1e9, 3)
            result["decode_gbps"] = round(
                bytes_step * (serve_tps / SB) / 1e9, 1)
            result["decode_gbps_peak"] = PEAK_HBM_GBPS

    # ---- train ----
    if not args.skip_train:
        frag, err = run_sub(args, "train")
        note_device(frag)
        if err:
            errors["train"] = err
        elif frag:
            TB, T = frag["train_batch"], frag["train_T"]
            train_tps = TB * T / frag["seconds_per_step"] / frag["n_chips"]
            result["train_tokens_per_sec_per_chip"] = round(train_tps, 1)
            result["train_batch"] = TB
            # roofline context: matmul-only model FLOPs vs v5e bf16 peak
            fpt = model_flops_per_token_train(FLAGSHIP, T)
            result["train_model_flops_per_token"] = round(fpt / 1e9, 4)
            result["train_mfu"] = round(
                train_tps * fpt / (PEAK_BF16_TFLOPS * 1e12), 4
            )
            result["train_peak_bf16_tflops"] = PEAK_BF16_TFLOPS

    # SAME-BATCH baseline: the reference loop fitted/integrated at the same
    # batch size as the TPU run, so vs_baseline is apples-to-apples. Runs
    # in-parent on CPU (torch only; never touches the chip).
    if not args.quick and result.get("value") is not None:
        try:
            B = result["gen_batch"]
            baseline = get_baseline(G, B)
            if np.isfinite(baseline):
                result["vs_baseline"] = round(result["value"] / baseline, 2)
                result["baseline_cpu_tokens_per_sec"] = round(baseline, 3)
            result["baseline_batch"] = B
            result["baseline_note"] = (
                "CPU batch-scale ratio measured at T=256 only; the "
                "quadratic fit extrapolates it to T<=1216 (see "
                "BASELINE_CPU.json)"
            )
        except Exception as e:  # noqa: BLE001 -- fence, report, continue
            errors["baseline"] = f"{type(e).__name__}: {str(e)[:200]}"

    result.setdefault("vs_baseline", None)
    if errors:
        result["section_errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Microbench: int8 KV-cache decode attention vs the bf16 dot-form.

Decode is HBM-bound on cache reads (perf_decode_attn.py: 677 GB/s effective
at B=64 bf16). An int8 cache halves the bytes -- IF the lowering reads the
int8 data directly: scores via a native int8 MXU dot (int8 x int8 ->
int32), the PV side via an elementwise fusion that converts in-register.
This script measures whether the pure-XLA formulation achieves that, for
comparison against the bf16 baseline and (later) a fused Pallas kernel.

Usage: python scripts/perf_decode_int8.py [B] [W] [L] [variants]
"""
import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1408
L = int(sys.argv[3]) if len(sys.argv) > 3 else 20
H, dh = 16, 48
D = H * dh
MAX_SEQ = 2048
N_STEPS = 32
DT = jnp.bfloat16

key = jax.random.PRNGKey(0)


def bench(name, make_state, step_fn, bytes_per_step):
    xs = jax.random.normal(key, (N_STEPS, B, D), DT)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, xs):
        def body(carry, x):
            return step_fn(carry, x), ()
        carry, _ = jax.lax.scan(body, state, xs)
        return carry

    state = run(make_state(), xs)  # compile + warmup
    jax.device_get(jax.tree_util.tree_map(lambda a: a.ravel()[0], state))
    reps = 3
    t0 = time.time()
    for i in range(reps):
        state = run(state, xs)
    jax.device_get(jax.tree_util.tree_map(lambda a: a.ravel()[0], state))
    dt = (time.time() - t0) / reps / N_STEPS * 1000
    gb = bytes_per_step / 1e9
    print(f"{name:44s} {dt:8.3f} ms/step  ({gb/dt*1000:6.0f} GB/s eff)",
          flush=True)


E = jax.random.normal(key, (MAX_SEQ, dh), jnp.float32)
SEL = jnp.asarray(np.repeat(np.eye(H, dtype=np.float32), dh, axis=1), DT)


def qkv(x):
    q = x.reshape(B, H, dh)
    return q, x, x


# ---- baseline: the real bf16 decode op -------------------------------------
def make_bf16():
    from midi_emotion_tpu.ops.attention import decode_rel_attention  # noqa
    ks = tuple(jax.random.normal(key, (B, W, D), DT) for _ in range(L))
    vs = tuple(jax.random.normal(key, (B, W, D), DT) for _ in range(L))
    return {"k": ks, "v": vs, "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def step_bf16(carry, x):
    from midi_emotion_tpu.ops.attention import decode_rel_attention
    x = x + carry["acc"]
    pos = carry["len"] - 1
    ks, vs = list(carry["k"]), list(carry["v"])
    for i in range(L):
        q, kt, vt = qkv(x)
        ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], kt[:, None, :], pos, 1)
        vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], vt[:, None, :], pos, 1)
        x = decode_rel_attention(q, ks[i], vs[i], E, carry["len"]).reshape(B, D)
    return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}


# ---- int8 cache, pure-XLA --------------------------------------------------
# cache: k8/v8 [B, W, D] int8; per-(row, head) scales [B, H, W] bf16
# (W on the lane axis -- [B, W, H] would pad 16 -> 128 lanes in HBM).
def quant_row(t):  # [B, D] -> int8 row + [B, H] scale
    t4 = t.reshape(B, H, dh)
    s = jnp.max(jnp.abs(t4), axis=-1) / 127.0 + 1e-8  # [B, H]
    q = jnp.round(t4 / s[..., None]).astype(jnp.int8).reshape(B, D)
    return q, s.astype(DT)


def make_i8():
    k8 = tuple(
        jax.random.randint(key, (B, W, D), -127, 127, jnp.int8)
        for _ in range(L)
    )
    v8 = tuple(
        jax.random.randint(key, (B, W, D), -127, 127, jnp.int8)
        for _ in range(L)
    )
    ks = tuple(jnp.ones((B, H, W), DT) * 0.01 for _ in range(L))
    vs = tuple(jnp.ones((B, H, W), DT) * 0.01 for _ in range(L))
    return {"k8": k8, "v8": v8, "ks": ks, "vs": vs,
            "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def attn_i8(q, k8, v8, ks, vs, length):
    # block-diagonal int8 q: [B, D, H]
    sq = jnp.max(jnp.abs(q), axis=-1) / 127.0 + 1e-8  # [B, H] f32
    q8 = jnp.round(q / sq[..., None])  # [B, H, dh]
    eye = jnp.eye(H, dtype=jnp.float32)
    q8bd = (q8.reshape(B, H, dh, 1) * eye[:, None, :]).reshape(B, D, H)
    q8bd = q8bd.astype(jnp.int8)
    # native int8 MXU dot -> int32, oriented [B, H, W] to match the scales
    scores = jax.lax.dot_general(
        q8bd, k8, (((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [B, H, W]
    # bias: q . E[max_seq - length + w]
    e_pad = jnp.pad(E, ((0, W), (0, 0)))
    e_rows = jax.lax.dynamic_slice_in_dim(e_pad, MAX_SEQ - length, W, 0)
    bias = jnp.einsum("bhd,wd->bhw", q.astype(jnp.float32), e_rows)
    logits = (
        scores.astype(jnp.float32)
        * (sq[:, :, None] * ks.astype(jnp.float32))
        + bias
    ) / math.sqrt(dh)
    w_idx = jnp.arange(W)[None, None, :]
    logits = jnp.where(w_idx < length, logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)  # [B, H, W]
    pv = (p * vs.astype(jnp.float32)).astype(DT)
    pexp = jnp.einsum("bhw,hD->bwD", pv, SEL)  # [B, W, D]
    out = jnp.sum(v8.astype(DT) * pexp, axis=1)  # [B, D]
    return out.astype(DT)


def step_i8(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    k8, v8 = list(carry["k8"]), list(carry["v8"])
    ks, vs = list(carry["ks"]), list(carry["vs"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        k8[i] = jax.lax.dynamic_update_slice_in_dim(k8[i], k8t[:, None, :], pos, 1)
        v8[i] = jax.lax.dynamic_update_slice_in_dim(v8[i], v8t[:, None, :], pos, 1)
        ks[i] = jax.lax.dynamic_update_slice(ks[i], kst[:, :, None], (0, 0, pos))
        vs[i] = jax.lax.dynamic_update_slice(vs[i], vst[:, :, None], (0, 0, pos))
        x = attn_i8(q, k8[i], v8[i], ks[i], vs[i], carry["len"])
    return {"k8": tuple(k8), "v8": tuple(v8), "ks": tuple(ks),
            "vs": tuple(vs), "len": carry["len"], "acc": x}


# ---- read-only baselines ---------------------------------------------------
def step_ro8(carry, x):
    acc = jnp.float32(0)
    for i in range(L):
        acc = acc + jnp.sum(carry["k8"][i], dtype=jnp.int32).astype(jnp.float32)
        acc = acc + jnp.sum(carry["v8"][i], dtype=jnp.int32).astype(jnp.float32)
    return {**carry, "len": carry["len"] + (acc < np.inf).astype(jnp.int32)}


def step_ro16(carry, x):
    acc = jnp.float32(0)
    for i in range(L):
        acc = acc + jnp.sum(carry["k"][i], dtype=jnp.float32)
        acc = acc + jnp.sum(carry["v"][i], dtype=jnp.float32)
    return {**carry, "len": carry["len"] + (acc < np.inf).astype(jnp.int32)}


# ---- int8 cache, fused Pallas kernel ---------------------------------------
def step_pl(carry, x):
    from midi_emotion_tpu.ops.decode_attention import decode_attn_quant
    x = x + carry["acc"]
    pos = carry["len"] - 1
    k8, v8 = list(carry["k8"]), list(carry["v8"])
    ks, vs = list(carry["ks"]), list(carry["vs"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        k8[i] = jax.lax.dynamic_update_slice_in_dim(k8[i], k8t[:, None, :], pos, 1)
        v8[i] = jax.lax.dynamic_update_slice_in_dim(v8[i], v8t[:, None, :], pos, 1)
        ks[i] = jax.lax.dynamic_update_slice(ks[i], kst[:, :, None], (0, 0, pos))
        vs[i] = jax.lax.dynamic_update_slice(vs[i], vst[:, :, None], (0, 0, pos))
        x = decode_attn_quant(
            q, k8[i], ks[i], v8[i], vs[i], E, carry["len"]
        ).reshape(B, D)
    return {"k8": tuple(k8), "v8": tuple(v8), "ks": tuple(ks),
            "vs": tuple(vs), "len": carry["len"], "acc": x}


def step_pl_noapp(carry, x):
    from midi_emotion_tpu.ops.decode_attention import decode_attn_quant
    x = x + carry["acc"]
    for i in range(L):
        q, kt, vt = qkv(x)
        x = decode_attn_quant(
            q, carry["k8"][i], carry["ks"][i], carry["v8"][i],
            carry["vs"][i], E, carry["len"]
        ).reshape(B, D)
    return {**carry, "acc": x}


def step_app_only(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    k8, v8 = list(carry["k8"]), list(carry["v8"])
    ks, vs = list(carry["ks"]), list(carry["vs"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        k8[i] = jax.lax.dynamic_update_slice_in_dim(k8[i], k8t[:, None, :], pos, 1)
        v8[i] = jax.lax.dynamic_update_slice_in_dim(v8[i], v8t[:, None, :], pos, 1)
        ks[i] = jax.lax.dynamic_update_slice(ks[i], kst[:, :, None], (0, 0, pos))
        vs[i] = jax.lax.dynamic_update_slice(vs[i], vst[:, :, None], (0, 0, pos))
        x = x + kst.reshape(B, H).sum(-1, keepdims=True).astype(DT)
    return {"k8": tuple(k8), "v8": tuple(v8), "ks": tuple(ks),
            "vs": tuple(vs), "len": carry["len"], "acc": x}


def step_app_kv(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    k8, v8 = list(carry["k8"]), list(carry["v8"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        k8[i] = jax.lax.dynamic_update_slice_in_dim(k8[i], k8t[:, None, :], pos, 1)
        v8[i] = jax.lax.dynamic_update_slice_in_dim(v8[i], v8t[:, None, :], pos, 1)
        x = x + kst.reshape(B, H).sum(-1, keepdims=True).astype(DT)
    return {**carry, "k8": tuple(k8), "v8": tuple(v8), "acc": x}


def step_app_s(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    ks, vs = list(carry["ks"]), list(carry["vs"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        ks[i] = jax.lax.dynamic_update_slice(ks[i], kst[:, :, None], (0, 0, pos))
        vs[i] = jax.lax.dynamic_update_slice(vs[i], vst[:, :, None], (0, 0, pos))
        x = x + k8t.sum(-1, keepdims=True).astype(DT)
    return {**carry, "ks": tuple(ks), "vs": tuple(vs), "acc": x}


def step_app_s_where(carry, x):
    # lane-dynamic dynamic_update_slice replaced by a masked rewrite
    x = x + carry["acc"]
    pos = carry["len"] - 1
    lane = jnp.arange(W)[None, None, :]
    ks, vs = list(carry["ks"]), list(carry["vs"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        ks[i] = jnp.where(lane == pos, kst[:, :, None], ks[i])
        vs[i] = jnp.where(lane == pos, vst[:, :, None], vs[i])
        x = x + k8t.sum(-1, keepdims=True).astype(DT)
    return {**carry, "ks": tuple(ks), "vs": tuple(vs), "acc": x}


def make_i8p():
    # int8 rows packed into int32 words: [B, W, D//4]
    k8 = tuple(
        jax.random.randint(key, (B, W, D // 4), -2**31, 2**31 - 1, jnp.int32)
        for _ in range(L)
    )
    v8 = tuple(
        jax.random.randint(key, (B, W, D // 4), -2**31, 2**31 - 1, jnp.int32)
        for _ in range(L)
    )
    return {"k8": k8, "v8": v8, "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def step_app_kv32(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    k8, v8 = list(carry["k8"]), list(carry["v8"])
    for i in range(L):
        q, kt, vt = qkv(x)
        k8t, kst = quant_row(kt)
        v8t, vst = quant_row(vt)
        pack = lambda t: jax.lax.bitcast_convert_type(
            t.reshape(B, D // 4, 4), jnp.int32
        )
        k8[i] = jax.lax.dynamic_update_slice_in_dim(
            k8[i], pack(k8t)[:, None, :], pos, 1
        )
        v8[i] = jax.lax.dynamic_update_slice_in_dim(
            v8[i], pack(v8t)[:, None, :], pos, 1
        )
        x = x + kst.reshape(B, H).sum(-1, keepdims=True).astype(DT)
    return {**carry, "k8": tuple(k8), "v8": tuple(v8), "acc": x}


BF16_BYTES = 2 * L * B * W * D * 2
I8_BYTES = L * B * W * (2 * D + 2 * H * 2)

print(f"B={B} W={W} L={L} H={H} dh={dh}", flush=True)
VARIANTS = {
    "bf16": lambda: bench("bf16 dot-form (current)", make_bf16, step_bf16,
                          BF16_BYTES),
    "i8": lambda: bench("int8 XLA (int8 dot + fused dequant)", make_i8,
                        step_i8, I8_BYTES),
    "pl": lambda: bench("int8 Pallas fused kernel", make_i8, step_pl,
                        I8_BYTES),
    "pl_noapp": lambda: bench("int8 Pallas, attn only (no append)", make_i8,
                              step_pl_noapp, I8_BYTES),
    "app": lambda: bench("append/quantize only (no attn)", make_i8,
                         step_app_only, I8_BYTES),
    "app_kv": lambda: bench("append int8 rows only", make_i8, step_app_kv,
                            I8_BYTES),
    "app_s": lambda: bench("append scale columns only", make_i8, step_app_s,
                           I8_BYTES),
    "app_s_where": lambda: bench("append scales via masked rewrite", make_i8,
                                 step_app_s_where, I8_BYTES),
    "app_kv32": lambda: bench("append int32-packed rows only", make_i8p,
                              step_app_kv32, I8_BYTES),
    "ro8": lambda: bench("read-only int8 (sum k8+v8)", make_i8, step_ro8,
                         L * B * W * 2 * D),
    "ro16": lambda: bench("read-only bf16 (sum k+v)", make_bf16, step_ro16,
                          BF16_BYTES),
}
names = sys.argv[4].split(",") if len(sys.argv) > 4 else ["bf16", "i8"]
for n in names:
    VARIANTS[n]()

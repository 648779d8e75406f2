"""Microbench decode attention variants inside a lax.scan (as the sampler
runs them): ms/step for cache layouts / accumulation choices at a given
(B, W). Usage: python scripts/perf_decode_attn.py [B] [W] [L]"""
import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1408
L = int(sys.argv[3]) if len(sys.argv) > 3 else 20  # layers simulated
H, dh = 16, 48
D = H * dh
N_STEPS = 32
DT = jnp.bfloat16

key = jax.random.PRNGKey(0)


def bench(name, make_state, step_fn):
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
    # cache bytes touched per step (read k+v once)
    gb = 2 * L * B * W * D * 2 / 1e9
    print(f"{name:40s} {dt:8.3f} ms/step  ({gb/dt*1000:6.0f} GB/s eff)", flush=True)


def qkv(x):
    # stand-in projections so the step has realistic structure
    q = x.reshape(B, H, dh)
    return q, x, x


# ---- variant 1: time-major [B, W, D], in-dtype accum -----------------------
def make_tm():
    ks = tuple(jax.random.normal(key, (B, W, D), DT) for _ in range(L))
    vs = tuple(jax.random.normal(key, (B, W, D), DT) for _ in range(L))
    return {"k": ks, "v": vs, "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def attn_tm(q, kc, vc, acc32):
    k4 = kc.reshape(B, W, H, dh)
    q4 = q.reshape(B, 1, H, dh)
    if acc32:
        s = jnp.sum(k4 * q4, axis=-1, dtype=jnp.float32)
    else:
        s = jnp.sum(k4 * q4, axis=-1).astype(jnp.float32)
    wts = jax.nn.softmax(s / math.sqrt(dh), axis=1)
    v4 = vc.reshape(B, W, H, dh)
    if acc32:
        o = jnp.sum(v4 * wts[..., None].astype(DT), axis=1, dtype=jnp.float32)
    else:
        o = jnp.sum(v4 * wts[..., None].astype(DT), axis=1)
    return o.astype(DT).reshape(B, D)


def step_tm(acc32):
    def f(carry, x):
        x = x + carry["acc"]
        pos = carry["len"] - 1
        ks, vs = list(carry["k"]), list(carry["v"])
        for i in range(L):
            q, kt, vt = qkv(x)
            ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], kt[:, None, :], pos, 1)
            vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], vt[:, None, :], pos, 1)
            x = attn_tm(q, ks[i], vs[i], acc32)
        return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}
    return f


# ---- variant 2: per-head [B, H, W, dh] dot (round-1 layout) ----------------
def make_ph():
    ks = tuple(jax.random.normal(key, (B, H, W, dh), DT) for _ in range(L))
    vs = tuple(jax.random.normal(key, (B, H, W, dh), DT) for _ in range(L))
    return {"k": ks, "v": vs, "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def step_ph(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    ks, vs = list(carry["k"]), list(carry["v"])
    for i in range(L):
        q, kt, vt = qkv(x)
        kt = kt.reshape(B, H, 1, dh)
        vt = vt.reshape(B, H, 1, dh)
        ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], kt, pos, 2)
        vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], vt, pos, 2)
        s = jnp.einsum("bhd,bhwd->bhw", q, ks[i]).astype(jnp.float32)
        wts = jax.nn.softmax(s / math.sqrt(dh), axis=-1).astype(DT)
        x = jnp.einsum("bhw,bhwd->bhd", wts, vs[i]).reshape(B, D)
    return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}


# ---- variant 4: interleaved channels [dl*H + h] ----------------------------
def step_il(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    ks, vs = list(carry["k"]), list(carry["v"])
    for i in range(L):
        q, kt, vt = qkv(x)  # q: [B, H, dh]
        q_il = q.transpose(0, 2, 1).reshape(B, D)  # [dl, h] channel order
        kt_il = kt.reshape(B, H, dh).transpose(0, 2, 1).reshape(B, D)
        vt_il = vt.reshape(B, H, dh).transpose(0, 2, 1).reshape(B, D)
        ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], kt_il[:, None, :], pos, 1)
        vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], vt_il[:, None, :], pos, 1)
        k4 = ks[i].reshape(B, W, dh, H)
        s = jnp.sum(k4 * q_il.reshape(B, 1, dh, H), axis=2)  # [B, W, H]
        wts = jax.nn.softmax(s.astype(jnp.float32) / math.sqrt(dh), axis=1)
        v4 = vs[i].reshape(B, W, dh, H)
        o = jnp.sum(v4 * wts[:, :, None, :].astype(DT), axis=1)  # [B, dh, H]
        x = o.transpose(0, 2, 1).reshape(B, D)
    return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}


# ---- variant 5: per-head dh padded to 64, contiguous segments --------------
DP = 64


def make_p64():
    Dp = H * DP
    ks = tuple(jax.random.normal(key, (B, W, Dp), DT) for _ in range(L))
    vs = tuple(jax.random.normal(key, (B, W, Dp), DT) for _ in range(L))
    return {"k": ks, "v": vs, "len": jnp.asarray(W // 2, jnp.int32),
            "acc": jnp.zeros((B, D), DT)}


def step_p64(carry, x):
    x = x + carry["acc"]
    pos = carry["len"] - 1
    ks, vs = list(carry["k"]), list(carry["v"])
    for i in range(L):
        q, kt, vt = qkv(x)
        padc = lambda y: jnp.pad(y.reshape(B, H, dh), ((0, 0), (0, 0), (0, DP - dh))).reshape(B, H * DP)
        qp = padc(q.reshape(B, D)).reshape(B, 1, H, DP)
        ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], padc(kt)[:, None, :], pos, 1)
        vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], padc(vt)[:, None, :], pos, 1)
        k4 = ks[i].reshape(B, W, H, DP)
        s = jnp.sum(k4 * qp, axis=-1)  # [B, W, H]
        wts = jax.nn.softmax(s.astype(jnp.float32) / math.sqrt(dh), axis=1)
        v4 = vs[i].reshape(B, W, H, DP)
        o = jnp.sum(v4 * wts[..., None].astype(DT), axis=1)  # [B, H, DP]
        x = o[:, :, :dh].reshape(B, D)
    return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}


# ---- variant 6: QK via block-diagonal MXU dot ------------------------------
SEL = None  # [H, D] selector, built lazily


def _sel():
    global SEL
    if SEL is None:
        s = np.zeros((H, D), np.float32)
        for h in range(H):
            s[h, h * dh:(h + 1) * dh] = 1.0
        SEL = jnp.asarray(s, DT)
    return SEL


def step_bd(pv_dot):
    def f(carry, x):
        x = x + carry["acc"]
        pos = carry["len"] - 1
        ks, vs = list(carry["k"]), list(carry["v"])
        for i in range(L):
            q, kt, vt = qkv(x)
            # block-diagonal q: [B, D, H], qbd[b, h*dh+d, h] = q[b,h,d]
            qbd = q.reshape(B, H, dh, 1) * jnp.eye(H, dtype=DT)[:, None, :]
            qbd = qbd.reshape(B, D, H)
            ks[i] = jax.lax.dynamic_update_slice_in_dim(ks[i], kt[:, None, :], pos, 1)
            vs[i] = jax.lax.dynamic_update_slice_in_dim(vs[i], vt[:, None, :], pos, 1)
            s = jnp.einsum("bwD,bDh->bwh", ks[i], qbd)  # MXU, fused reduce
            wts = jax.nn.softmax(s.astype(jnp.float32) / math.sqrt(dh), axis=1)
            if pv_dot:
                pexp = jnp.einsum("bwh,hD->bwD", wts.astype(DT), _sel())
                o = jnp.sum(vs[i] * pexp, axis=1)  # [B, D]
                x = o
            else:
                v4 = vs[i].reshape(B, W, H, dh)
                o = jnp.sum(v4 * wts[..., None].astype(DT), axis=1)
                x = o.reshape(B, D)
        return {"k": tuple(ks), "v": tuple(vs), "len": carry["len"], "acc": x}
    return f


# ---- variant 3: cache-read-only baseline (sum of cache rows) ---------------
def step_ro(carry, x):
    ks, vs = carry["k"], carry["v"]
    acc = 0.0
    for i in range(L):
        acc = acc + jnp.sum(ks[i]) + jnp.sum(vs[i])
    return {"k": ks, "v": vs, "len": carry["len"] + jnp.int32(acc < np.inf)}


print(f"B={B} W={W} L={L} H={H} dh={dh} dtype=bf16", flush=True)
VARIANTS = {
    "ro": lambda: bench("read-only (sum k+v)", make_tm, step_ro),
    "tm": lambda: bench("time-major, in-dtype accum", make_tm, step_tm(False)),
    "tm32": lambda: bench("time-major, f32 accum", make_tm, step_tm(True)),
    "ph": lambda: bench("per-head [B,H,W,dh] dots", make_ph, step_ph),
    "il": lambda: bench("interleaved [dl,h] channels", make_tm, step_il),
    "p64": lambda: bench("dh padded to 64, contiguous", make_p64, step_p64),
    "bd": lambda: bench("QK blockdiag dot, PV seg-reduce", make_tm, step_bd(False)),
    "bd2": lambda: bench("QK blockdiag dot, PV sel-dot", make_tm, step_bd(True)),
}
names = sys.argv[4].split(",") if len(sys.argv) > 4 else list(VARIANTS)
for n in names:
    VARIANTS[n]()

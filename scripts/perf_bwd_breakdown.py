"""Per-kernel breakdown of the flash backward at the flagship shape.

Times the dq/dE and dK/dV pallas launches separately, plus an ablated
dq/dE with the static unskew replaced by a pad-only placement (WRONG
numerics -- isolates the cost of the 2*log2(bq) roll+select passes).
Run solo on the TPU.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from midi_emotion_tpu.ops import pallas_attention as pa

B, H, T, dh, N = 8, 16, 1216, 48, 20
bq = bk = 256
max_seq = 2048


def prep(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    mk = lambda i: jax.random.normal(ks[i], (B, H, T, dh), jnp.bfloat16)
    q, k, v, g = mk(0), mk(1), mk(2), mk(3)
    e = jax.random.normal(ks[4], (max_seq, dh), jnp.float32)
    return q, k, v, e, g


def build(which):
    def one(q, k, v, e, g):
        out, lse = pa._flash_fwd_impl(q, k, v, e, True, None, return_lse=True)
        qf, kf, vf, e_pad, pk, Tp, pad_t, pad3 = pa._prepare(
            q, k, v, e, True, None, bq, bk
        )
        hpb = pa._heads_per_block(H)
        dof = pad3(g)
        outf = pad3(out)
        dsum = jnp.sum(
            dof.astype(jnp.float32) * outf.astype(jnp.float32), axis=-1
        )[:, :, None, :]
        common = dict(bq=bq, bk=bk, max_seq=max_seq + pad_t,
                      scale=1.0 / (dh ** 0.5), causal=True)
        if which == "fwd":
            return out.astype(jnp.float32).sum()
        if which == "dqde":
            call = (pa._bwd_dq_de_dist_call if pa.DQDE_IMPL == "dist"
                    else pa._bwd_dq_de_call)
            dq, de = call(
                qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp)
            return dq.astype(jnp.float32).sum() + de.sum()
        if which == "dkdv":
            dk, dv = pa._bwd_dkdv_call(
                qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp)
            return dk.astype(jnp.float32).sum() + dv.astype(jnp.float32).sum()
        if which == "dkdvdq":
            dk, dv, dqk = pa._bwd_dkdv_dq_call(
                qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp)
            return (dk.astype(jnp.float32).sum() + dv.astype(jnp.float32).sum()
                    + dqk.astype(jnp.float32).sum())
        if which == "dedqrel":
            dqr, de = pa._bwd_de_dqrel_call(
                qf, kf, vf, dof, lse, dsum, e_pad, pk, common, bq, bk, hpb, Tp)
            return dqr.astype(jnp.float32).sum() + de.sum()
        raise ValueError(which)

    def chain(q, k, v, e, g):
        def body(c, _):
            return c + one(q + c * 0, k, v, e, g) * 0 + 1.0, one(q, k, v, e, g)
        # simple N-rep chain with data dependence to defeat CSE: perturb q
        def body2(c, _):
            val = one(q + (c * 1e-6).astype(q.dtype), k, v, e, g)
            return c + val * 1e-20, val
        c, vals = jax.lax.scan(body2, jnp.float32(0.0), None, length=N)
        return c

    return jax.jit(chain)


def timed(fn, reps=2):
    argsets = [prep(100 + r) for r in range(reps + 1)]
    jax.device_get(fn(*argsets[0]))  # compile + warm
    t0 = time.time()
    outs = [fn(*argsets[1 + r]) for r in range(reps)]
    jax.device_get(outs[-1])
    return (time.time() - t0) / reps / N * 1000  # ms per application


def unskew_padonly(dsrel, bq, bk):
    lead = dsrel.shape[:-2]
    return jnp.concatenate(
        [jnp.zeros(lead + (bq, bq - 1), dsrel.dtype), dsrel,
         jnp.zeros(lead + (bq, 1), dsrel.dtype)], axis=-1)


# appended: A/B the dq/dE implementations (set via module flag)
def ab_compare():
    for impl in ("legacy", "dist"):
        pa.DQDE_IMPL = impl
        ms = timed(build("dqde"))
        print(json.dumps({"kernel": f"dqde[{impl}]",
                          "ms_per_layer": round(ms, 3)}), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    for which in ("fwd", "dkdv", "dqde"):
        ms = timed(build(which))
        print(json.dumps({"kernel": which, "ms_per_layer": round(ms, 3)}),
              flush=True)
    ab_compare()
    real = pa._unskew_band
    pa._unskew_band = unskew_padonly
    try:
        ms = timed(build("dqde"))
        print(json.dumps({"kernel": "dqde_noroll(WRONG)",
                          "ms_per_layer": round(ms, 3)}), flush=True)
    finally:
        pa._unskew_band = real

"""Block-size sweep for the split-backward kernels at the flagship shape.

The (256, 256) default was swept for the FUSED backward; the split
kernels have different cost structures (dedqrel's temporaries are
L=bq+bk wide; wider bk cuts both the L-total and the grid step count).
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
max_seq = 2048


def prep(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    mk = lambda i: jax.random.normal(ks[i], (B, H, T, dh), jnp.bfloat16)
    return mk(0), mk(1), mk(2), jax.random.normal(ks[4], (max_seq, dh), jnp.float32), mk(3)


def build(which, bq, bk):
    def one(q, k, v, e, g):
        out, lse = pa._flash_fwd_impl(q, k, v, e, True, None, bq=bq, bk=bk,
                                      return_lse=True)
        if which == "fwd":
            return out.astype(jnp.float32).sum()
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
            val = one(q + (c * 1e-6).astype(q.dtype), k, v, e, g)
            return c + val * 1e-20, val
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return c

    return jax.jit(chain)


def timed(fn, reps=2):
    argsets = [prep(100 + r) for r in range(reps + 1)]
    jax.device_get(fn(*argsets[0]))
    t0 = time.time()
    outs = [fn(*argsets[1 + r]) for r in range(reps)]
    jax.device_get(outs[-1])
    return (time.time() - t0) / reps / N * 1000


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    shapes = [(256, 256), (256, 512), (512, 256), (128, 512)]
    for which in ("dedqrel", "dkdvdq", "fwd"):
        for bq, bk in shapes:
            try:
                ms = timed(build(which, bq, bk))
                r = {"kernel": which, "bq": bq, "bk": bk,
                     "ms_per_layer": round(ms, 3)}
            except Exception as e:
                r = {"kernel": which, "bq": bq, "bk": bk,
                     "error": str(e)[:140]}
            print(json.dumps(r), flush=True)

"""On-chip kernel checks, run as a bench.py prologue (VERDICT r3 item 4).

The fused dropout kernels' hardware PRNG cannot be validated on CPU
(interpreted pltpu.prng_random_bits returns zeros), so the real checks are
tpu_only tests that SKIP in the CPU suite (tests/test_fused_dropout.py:123-170).
This module re-runs their assertions on the real chip -- plus a flash
attention fwd/bwd spot-check against the exact XLA reference -- and returns
a pass/fail tally that bench.py records in the driver-visible JSON every
round. Single process; call before any other TPU work in bench.py.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def run_checks() -> dict:
    import jax
    import jax.numpy as jnp

    from midi_emotion_tpu.ops import fused_dropout as fd
    from midi_emotion_tpu.ops import pallas_attention as pa

    RATE = 0.1
    INV_KEEP = 1.0 / (1.0 - RATE)
    kd = jax.random.key_data(jax.random.PRNGKey(7))
    results = {}

    import time

    def check(name, fn):
        t0 = time.time()
        print(f"[tpu_kernel_checks] {name} ...", file=sys.stderr, flush=True)
        try:
            fn()
            results[name] = "pass"
        except Exception as e:  # noqa: BLE001 -- tally, don't abort bench
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
        print(f"[tpu_kernel_checks] {name}: {results[name]} "
              f"({time.time() - t0:.1f}s)", file=sys.stderr, flush=True)

    def mask_statistics():
        x = jnp.ones((8, 1024, 768), jnp.bfloat16)
        y = np.asarray(
            jax.jit(lambda x: fd.fused_dropout(x, kd, RATE))(x), np.float32
        )
        kept = (y != 0).mean()
        assert abs(kept - (1 - RATE)) < 0.01, kept
        np.testing.assert_allclose(y[y != 0], INV_KEEP, rtol=1e-2)
        kd2 = jax.random.key_data(jax.random.PRNGKey(8))
        y2 = np.asarray(
            jax.jit(lambda x: fd.fused_dropout(x, kd2, RATE))(x), np.float32
        )
        assert (y != y2).any()

    def backward_matches_forward():
        x = jnp.asarray(np.random.RandomState(0).randn(8, 512, 768), jnp.float32)
        y = np.asarray(jax.jit(lambda x: fd.fused_dropout(x, kd, RATE))(x))
        g = np.asarray(
            jax.jit(jax.grad(lambda x: fd.fused_dropout(x, kd, RATE).sum()))(x)
        )
        keep = y != 0
        np.testing.assert_allclose(g, keep * INV_KEEP, atol=1e-5)

    def dal_matches_mask_oracle():
        rng = np.random.RandomState(1)
        sub = jnp.asarray(rng.randn(2048, 768), jnp.float32)
        res = jnp.asarray(rng.randn(2048, 768), jnp.float32)
        scale = jnp.asarray(rng.rand(768) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(768) * 0.1, jnp.float32)
        dropped = jax.jit(lambda s: fd.fused_dropout(s, kd, RATE))(sub)
        y = jax.jit(
            lambda s, r: fd.dropout_add_layernorm(s, r, scale, bias, kd, RATE)
        )(sub, res)
        x = res + dropped
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        want = (x - mu) / jnp.sqrt(var + 1e-6) * scale + bias
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=3e-5)

    def flash_fwd_bwd_spot():
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        B, H, T, dh = 2, 4, 320, 48
        q, k, v = (jax.random.normal(ks[i], (B, H, T, dh), jnp.float32)
                   for i in range(3))
        e = jax.random.normal(ks[3], (512, dh), jnp.float32)
        g = jax.random.normal(ks[4], (B, H, T, dh), jnp.float32)

        def flash(q, k, v, e):
            return pa.flash_relative_attention(q, k, v, e, True)

        out_f, vjp_f = jax.vjp(flash, q, k, v, e)
        grads_f = vjp_f(g)
        out_r, vjp_r = jax.vjp(
            lambda q, k, v, e: pa._xla_reference(q, k, v, e, True, None),
            q, k, v, e,
        )
        grads_r = vjp_r(g)
        # The kernel's dots run in bf16 on the MXU by design (training
        # trunk dtype) while _xla_reference is f32 einsums; measured
        # on-chip error at this shape is ~0.016 out / ~0.033 de (mean
        # 6e-4), so tolerances are bf16-calibrated with ~3x margin.
        np.testing.assert_allclose(
            np.asarray(out_f), np.asarray(out_r), rtol=0, atol=0.05
        )
        for got, want in zip(grads_f, grads_r):
            want = np.asarray(want, np.float32)
            atol = 0.05 + 0.01 * float(np.abs(want).max())
            np.testing.assert_allclose(
                np.asarray(got, np.float32), want, rtol=0, atol=atol
            )

    def decode_attn_all_modes():
        # The one kernel the CPU suite structurally cannot cover: every
        # decode test runs interpreted (decode_attention.py falls back on
        # CPU), so Mosaic lowering of decode_attn_cached had ZERO automated
        # evidence -- which is how round 4's staged self-term fold crashed
        # bench (VERDICT r4 item 2). Checks all 4 quant x staged modes
        # against the exact decode oracle, with a p_cnt sweep that hits
        # the LAST stage slot (S - 1).
        from midi_emotion_tpu.ops.attention import decode_rel_attention
        from midi_emotion_tpu.ops.decode_attention import (
            decode_attn_cached, expand_e_rows, merge_self, quantize_rows,
        )

        B, W, H, dh, MS, S, L, f = 8, 256, 4, 48, 512, 6, 2, 100
        D = H * dh
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (B, H, dh), jnp.float32)
        # rows 0..f-1 flushed; f..f+S-1 stageable; f+S is the current token
        rows16 = jax.random.normal(ks[1], (B, f + S + 1, 2 * D), jnp.bfloat16)
        rows = rows16.astype(jnp.float32)
        e = jax.random.normal(ks[2], (MS, dh), jnp.float32)

        for quant in (False, True):
            flushed = rows16[:, :f]
            if quant:
                kv8, sc = quantize_rows(flushed.astype(jnp.float32), 2 * H)
                kvW = jnp.zeros((B, W, 2 * D), jnp.int8)
                scW = jnp.zeros((B, 2 * H, W), jnp.bfloat16)
                kvW = kvW.at[:, :f].set(kv8)
                scW = scW.at[:, :, :f].set(sc)
                kvs = jnp.stack([jnp.zeros_like(kvW), kvW])
                scs = jnp.stack([jnp.zeros_like(scW), scW])
                tol = 0.05
            else:
                kvW = jnp.zeros((B, W, 2 * D), jnp.bfloat16)
                kvW = kvW.at[:, :f].set(flushed)
                kvs = jnp.stack([jnp.zeros_like(kvW), kvW])
                scs = None
                tol = 0.02
            lay = jnp.asarray(1)
            fl = jnp.asarray(f, jnp.int32)

            for p_cnt in (None, 0, 2, S - 1):
                p = 0 if p_cnt is None else p_cnt
                n_tot = f + p + 1
                cur = rows[:, f + p]
                k_all = rows[:, :n_tot].at[:, -1].set(cur)[:, :, :D]
                v_all = rows[:, :n_tot].at[:, -1].set(cur)[:, :, D:]
                want = np.asarray(
                    decode_rel_attention(
                        q, k_all, v_all, e, jnp.asarray(n_tot, jnp.int32)
                    ).reshape(B, D), np.float32)
                e_rows = expand_e_rows(e, jnp.asarray(n_tot, jnp.int32), W)
                if p_cnt is None:
                    acc, m, l = jax.jit(decode_attn_cached, static_argnums=())(
                        q, kvs, scs, lay, e_rows, fl)
                    got = merge_self(acc, m, l, q, cur[:, :D].astype(jnp.bfloat16),
                                     cur[:, D:].astype(jnp.bfloat16), e[MS - 1])
                else:
                    pend = jnp.zeros((S, L, B, 2 * D), jnp.bfloat16)
                    pend = pend.at[:p, 1].set(
                        jnp.transpose(rows16[:, f:f + p], (1, 0, 2)))
                    e_pend = expand_e_rows(e, jnp.asarray(p + 1, jnp.int32),
                                           S + 1)
                    got, pend_out = decode_attn_cached(
                        q, kvs, scs, lay, e_rows, fl, pend, e_pend,
                        jnp.asarray(p, jnp.int32),
                        rows16[:, f + p])
                    np.testing.assert_array_equal(
                        np.asarray(pend_out[p, 1], np.float32),
                        np.asarray(rows16[:, f + p], np.float32))
                got = np.asarray(got, np.float32)
                err = np.abs(got - want) / (np.abs(want).max() + 1e-9)
                assert err.max() < tol, (quant, p_cnt, err.max())

    def fused_layernorm_spot():
        from midi_emotion_tpu.ops import layernorm as ln

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1024, 768), jnp.float32)
        g = jnp.asarray(rng.rand(768) + 0.5, jnp.float32)
        b = jnp.asarray(rng.randn(768) * 0.1, jnp.float32)
        y = jax.jit(ln.fused_layernorm)(x, g, b)
        want = ln.layernorm_ref(x, g, b)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), atol=3e-5)
        loss = lambda f: lambda x, g, b: (f(x, g, b) * jnp.cos(x)).sum()
        got = jax.jit(jax.grad(loss(ln.fused_layernorm), (0, 1, 2)))(x, g, b)
        ref = jax.jit(jax.grad(loss(ln.layernorm_ref), (0, 1, 2)))(x, g, b)
        for a, w in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                       atol=2e-4, rtol=1e-4)

    check("dropout_mask_statistics", mask_statistics)
    check("dropout_backward_matches_forward", backward_matches_forward)
    check("dropout_add_layernorm_oracle", dal_matches_mask_oracle)
    check("flash_fwd_bwd_vs_xla", flash_fwd_bwd_spot)
    check("decode_attn_all_modes", decode_attn_all_modes)
    check("fused_layernorm_fwd_bwd", fused_layernorm_spot)

    n_pass = sum(1 for v in results.values() if v == "pass")
    return {
        "tpu_kernel_checks": f"{n_pass}/{len(results)}",
        "tpu_kernel_check_detail": results,
    }


if __name__ == "__main__":
    import json

    print(json.dumps(run_checks(), indent=2))

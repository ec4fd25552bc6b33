"""Packed-int4 matmul (ops/w4_matmul.py): pack/unpack, exactness of the
fallback vs the integer reference, Pallas kernel (interpret) vs fallback,
and the quant.py dispatch plumbing.

The packed path's integer math must be BIT-EXACT vs unpack-then-dot — the
representation change (nibbles per byte) must not change a single output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.ops.w4_matmul import (
    pack_int4, unpack_int4, w4_matmul, _kernel_fits,
)


def _rand_w4(rng, k, n):
    return rng.integers(-8, 8, (k, n)).astype(np.int8)


class TestPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        q = _rand_w4(rng, 64, 24)
        wp = pack_int4(q)
        assert wp.shape == (32, 24) and wp.dtype == np.int8
        np.testing.assert_array_equal(np.asarray(unpack_int4(jnp.asarray(wp))), q)

    def test_numpy_and_jnp_pack_agree(self):
        rng = np.random.default_rng(1)
        q = _rand_w4(rng, 32, 16)
        np.testing.assert_array_equal(
            pack_int4(q), np.asarray(pack_int4(jnp.asarray(q))))

    def test_stacked_leading_dims(self):
        rng = np.random.default_rng(2)
        q = rng.integers(-8, 8, (3, 16, 8)).astype(np.int8)
        wp = pack_int4(jnp.asarray(q))
        assert wp.shape == (3, 8, 8)
        np.testing.assert_array_equal(np.asarray(unpack_int4(wp)), q)


class TestMatmul:
    def test_w4a8_fallback_exact_vs_integer_reference(self):
        rng = np.random.default_rng(3)
        m, k, n = 5, 64, 24
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        want = (xq.astype(np.int32) @ q.astype(np.int32)).astype(np.float32)
        want = want * xs * ws[None, :]
        got = w4_matmul(jnp.asarray(xq), jnp.asarray(xs),
                        jnp.asarray(pack_int4(q)), jnp.asarray(ws),
                        out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_weight_only_matches_dequant_dense(self):
        rng = np.random.default_rng(4)
        m, k, n = 4, 32, 16
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        want = np.asarray(x) @ (q.astype(np.float32) * ws[None, :])
        got = w4_matmul(x, None, jnp.asarray(pack_int4(q)), jnp.asarray(ws),
                        out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_kernel_interpret_exact_vs_fallback(self):
        """The Pallas kernel (interpret mode on CPU) must reproduce the
        fallback bit-exactly for int8 activations (pure integer dots)."""
        rng = np.random.default_rng(5)
        m, k, n = 16, 1024, 512  # K/2=512 % 256 == 0, N % 512 == 0
        assert _kernel_fits(m, k // 2, n)
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        args = (jnp.asarray(xq), jnp.asarray(xs),
                jnp.asarray(pack_int4(q)), jnp.asarray(ws))
        want = w4_matmul(*args, out_dtype=jnp.float32)
        got = w4_matmul(*args, out_dtype=jnp.float32, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_kernel_interpret_bf16_x(self):
        rng = np.random.default_rng(6)
        m, k, n = 8, 512, 512
        x = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        args = (x, None, jnp.asarray(pack_int4(q)), jnp.asarray(ws))
        want = np.asarray(w4_matmul(*args, out_dtype=jnp.float32), np.float32)
        got = np.asarray(
            w4_matmul(*args, out_dtype=jnp.float32, interpret=True), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-3)

    def test_kernel_nondivisible_m(self):
        """m not a multiple of the row tile: the partial block must mask."""
        rng = np.random.default_rng(7)
        m, k, n = 300, 512, 512
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        args = (jnp.asarray(xq), jnp.asarray(xs),
                jnp.asarray(pack_int4(q)), jnp.asarray(ws))
        want = w4_matmul(*args, out_dtype=jnp.float32)
        got = w4_matmul(*args, out_dtype=jnp.float32, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_leading_dims(self):
        rng = np.random.default_rng(8)
        xq = rng.integers(-127, 128, (2, 3, 32)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (2, 3, 1)).astype(np.float32)
        q = _rand_w4(rng, 32, 16)
        ws = rng.uniform(0.01, 0.1, (16,)).astype(np.float32)
        got = w4_matmul(jnp.asarray(xq), jnp.asarray(xs),
                        jnp.asarray(pack_int4(q)), jnp.asarray(ws),
                        out_dtype=jnp.float32)
        assert got.shape == (2, 3, 16)
        want = (xq.reshape(6, 32).astype(np.int32) @ q.astype(np.int32))
        want = want.astype(np.float32) * xs.reshape(6, 1) * ws[None, :]
        np.testing.assert_allclose(np.asarray(got).reshape(6, 16), want,
                                   rtol=1e-6)


class TestQuantDispatch:
    def test_preq_dispatch_matches_integer_math(self):
        from unimedvl_tpu.quant import quantized_linear_preq

        rng = np.random.default_rng(9)
        m, k, n = 4, 32, 16
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (n,)).astype(np.float32)
        bias = rng.standard_normal((n,)).astype(np.float32)
        p = {"kernel_p4a": jnp.asarray(pack_int4(q)), "scale": jnp.asarray(ws),
             "bias": jnp.asarray(bias)}
        got = quantized_linear_preq(jnp.asarray(xq), jnp.asarray(xs), p,
                                    jnp.float32)
        want = (xq.astype(np.int32) @ q.astype(np.int32)).astype(np.float32)
        want = want * xs * ws[None, :] + bias[None, :]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_concat_linears_packed(self):
        from unimedvl_tpu.quant import _concat_linears

        rng = np.random.default_rng(10)
        k = 32
        qa = _rand_w4(rng, k, 16)
        qb = _rand_w4(rng, k, 8)
        pa = {"kernel_p4": jnp.asarray(pack_int4(qa)),
              "scale": jnp.ones((16,), jnp.float32)}
        pb = {"kernel_p4": jnp.asarray(pack_int4(qb)),
              "scale": jnp.ones((8,), jnp.float32)}
        fused = _concat_linears([pa, pb])
        assert fused["kernel_p4"].shape == (k // 2, 24)
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(fused["kernel_p4"])),
            np.concatenate([qa, qb], axis=-1))

    def test_quantized_linear_weight_only_packed(self):
        from unimedvl_tpu.quant import quantize_weight, quantized_linear

        rng = np.random.default_rng(11)
        w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        p = quantize_weight(w, bits=4)
        x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
        got = np.asarray(quantized_linear(x, p))
        from unimedvl_tpu.quant import dequantize_weight

        want = np.asarray(x) @ np.asarray(dequantize_weight(p, jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestGroupedScales:
    def test_grouped_quantize_roundtrip_tighter_than_per_channel(self):
        """Group-wise scales must reconstruct outlier-structured weights
        strictly better than per-channel (the reason the mode exists)."""
        from unimedvl_tpu.quant import quantize_weight, dequantize_weight

        rng = np.random.default_rng(12)
        w = rng.standard_normal((64, 16)).astype(np.float32)
        w[:8] *= 20.0  # one outlier-heavy row group
        wj = jnp.asarray(w)
        err_pc = np.abs(np.asarray(
            dequantize_weight(quantize_weight(wj, bits=4), jnp.float32)) - w)
        qg = quantize_weight(wj, bits=4, group_size=8)
        assert qg["scale"].shape == (8, 16)
        err_g = np.abs(np.asarray(
            dequantize_weight(qg, jnp.float32)) - w)
        assert err_g.mean() < err_pc.mean() * 0.5
        # via_host agrees exactly
        qh = quantize_weight(w, via_host=True, bits=4, group_size=8)
        np.testing.assert_array_equal(np.asarray(qg["kernel_p4"]),
                                      np.asarray(qh["kernel_p4"]))
        np.testing.assert_array_equal(np.asarray(qg["scale"]),
                                      np.asarray(qh["scale"]))

    def test_grouped_fallback_matches_integer_reference(self):
        rng = np.random.default_rng(13)
        m, k, n, g = 5, 64, 24, 16
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (k // g, n)).astype(np.float32)
        want = np.zeros((m, n), np.float32)
        for gi in range(k // g):
            d = (xq[:, gi * g:(gi + 1) * g].astype(np.int32)
                 @ q[gi * g:(gi + 1) * g].astype(np.int32))
            want += d.astype(np.float32) * ws[gi][None, :]
        want *= xs
        got = w4_matmul(jnp.asarray(xq), jnp.asarray(xs),
                        jnp.asarray(pack_int4(q)), jnp.asarray(ws),
                        out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_grouped_kernel_interpret_exact_vs_fallback(self):
        """Kernel with group-aligned scales (g multiple of the 512-row
        k-step) == the scan fallback bit-exactly for int8 activations."""
        rng = np.random.default_rng(14)
        m, k, n, g = 16, 2048, 512, 512  # 4 groups, 1 k-step each
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (k // g, n)).astype(np.float32)
        args = (jnp.asarray(xq), jnp.asarray(xs),
                jnp.asarray(pack_int4(q)), jnp.asarray(ws))
        want = w4_matmul(*args, out_dtype=jnp.float32)
        got = w4_matmul(*args, out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)

    def test_grouped_kernel_multistep_groups(self):
        """g spanning several k-steps (g=1024 = 2 k-steps per group). The
        kernel scales each 512-row k-step's int32 partial in f32, while the
        fallback accumulates the whole group in int32 first — a summation-
        order difference, so near-zero outputs carry f32 noise (measured
        max ~4e-4 rel at this shape); bound absolute error instead."""
        rng = np.random.default_rng(15)
        m, k, n, g = 8, 2048, 512, 1024
        xq = rng.integers(-127, 128, (m, k)).astype(np.int8)
        xs = rng.uniform(0.01, 0.1, (m, 1)).astype(np.float32)
        q = _rand_w4(rng, k, n)
        ws = rng.uniform(0.01, 0.1, (k // g, n)).astype(np.float32)
        args = (jnp.asarray(xq), jnp.asarray(xs),
                jnp.asarray(pack_int4(q)), jnp.asarray(ws))
        want = np.asarray(w4_matmul(*args, out_dtype=jnp.float32))
        got = np.asarray(w4_matmul(*args, out_dtype=jnp.float32,
                                   interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-3,
                                   atol=1e-4 * np.abs(want).max())

    def test_grouped_llm_params_decode(self):
        """quantize_llm_params(bits=4, group_size=...) end-to-end decode."""
        from unimedvl_tpu.quant import quantize_llm_params
        from unimedvl_tpu.models import bagel
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from unimedvl_tpu.config import BagelConfig, LLMConfig
        import jax as _jax
        from unimedvl_tpu.models import qwen2_mot as mot

        CFG = LLMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2,
        )
        params = {"llm": mot.init_params(_jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        cfg = BagelConfig(llm=CFG, vit=None, vae=None, visual_gen=False,
                          visual_und=False)
        q4 = {"llm": quantize_llm_params(params["llm"], bits=4,
                                         act_quant=True, group_size=16)}
        leaf = q4["llm"]["layers"]["attn"]["q"]
        assert leaf["kernel_p4a"].shape[-2] * 2 // 16 == leaf["scale"].shape[-2]
        S = 2
        cache = KVCache.create(CFG.num_hidden_layers, S, 32,
                               CFG.num_key_value_heads, CFG.head_dim,
                               jnp.float32)
        ids = jnp.asarray(np.arange(S * 8).reshape(S, 8) % CFG.vocab_size,
                          jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
        cache = bagel.prefill_text(q4, cfg, cache, ids, pos,
                                   jnp.ones((S, 8), bool))
        out, lens = bagel.generate_text(
            q4, cfg, cache, jnp.asarray([3, 5], jnp.int32),
            jnp.full((S,), 8, jnp.int32), 4, jnp.asarray(-1, jnp.int32))
        assert (np.asarray(lens) == 4).all()
        assert (np.asarray(out) >= 0).all()

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

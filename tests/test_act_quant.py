"""Fused Pallas silu·mul·quant kernel (ops/act_quant.py): interpret-mode
outputs must be BIT-identical to the kernel's own f32 spec
(quantize_activations of the straight-f32 silu·mul product), within one
quantization LSB of the XLA bf16 chain it replaces, and the wired _mlp
branch must stay inside the int8-noise envelope of the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimedvl_tpu.models import qwen2_mot
from unimedvl_tpu.ops.act_quant import silu_mul_quant, use_silu_quant_kernel
from unimedvl_tpu.quant import quantize_activations, quantize_weight


def _gu(shape, seed=0):
    kg, ku = jax.random.split(jax.random.PRNGKey(seed))
    g = (jax.random.normal(kg, shape) * 3).astype(jnp.bfloat16)
    u = (jax.random.normal(ku, shape) * 2).astype(jnp.bfloat16)
    return g, u


class TestKernel:
    @pytest.mark.parametrize("shape", [
        (64, 512),          # rows a multiple of the 32-row block
        (33, 384),          # ragged rows -> padded final block
        (5, 37, 256),       # 3-D leading dims, rows not divisible by 32
        (1, 128),           # single row
    ])
    def test_bit_exact_vs_f32_spec(self, shape):
        g, u = _gu(shape)
        # the kernel's DEFINED semantics: straight-f32 product, then the
        # quantize_activations formula (f32 elementwise ops are deterministic
        # under jit — no fusion-dependent rounding ambiguity)
        def spec(g, u):
            g32, u32 = g.astype(jnp.float32), u.astype(jnp.float32)
            return quantize_activations((g32 * jax.nn.sigmoid(g32)) * u32)

        want_q, want_s = jax.jit(spec)(g, u)
        got_q, got_s = silu_mul_quant(g, u, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))

    @pytest.mark.parametrize("shape", [(64, 512), (5, 37, 256)])
    def test_lsb_bound_vs_xla_path(self, shape):
        """vs the XLA bf16 chain the kernel replaces: scales within bf16
        relative error, quantized values within 1 LSB."""
        g, u = _gu(shape, seed=11)
        want_q, want_s = jax.jit(
            lambda g, u: quantize_activations(jax.nn.silu(g) * u))(g, u)
        got_q, got_s = silu_mul_quant(g, u, interpret=True)
        rel = np.abs(np.asarray(got_s) - np.asarray(want_s)) / np.asarray(
            want_s)
        assert rel.max() < 1e-2, rel.max()
        dq = np.abs(np.asarray(got_q, np.int32) - np.asarray(want_q, np.int32))
        assert dq.max() <= 1, dq.max()

    def test_zero_rows_scale_floor(self):
        g = jnp.zeros((8, 256), jnp.bfloat16)
        u = jnp.zeros((8, 256), jnp.bfloat16)
        q, s = silu_mul_quant(g, u, interpret=True)
        assert np.all(np.asarray(q) == 0)
        np.testing.assert_allclose(np.asarray(s), 1e-8 / 127.0)


class TestMlpWiring:
    def _mlp_params(self, H=64, I=128, fused=False, seed=3):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        gate = jax.random.normal(ks[0], (H, I)) * 0.2
        up = jax.random.normal(ks[1], (H, I)) * 0.2
        down = jax.random.normal(ks[2], (I, H)) * 0.2

        def qa(k):
            q = quantize_weight(jnp.asarray(k, jnp.float32))
            return {"kernel_qa": q.pop("kernel_q"), **q}

        if fused:
            return {"gate_up": qa(jnp.concatenate([gate, up], 1)),
                    "down": qa(down)}
        return {"gate": qa(gate), "up": qa(up), "down": qa(down)}

    @pytest.mark.parametrize("fused", [False, True])
    def test_mlp_matches_xla_path(self, monkeypatch, fused):
        from unimedvl_tpu.ops.activations import ACT2FN

        p = self._mlp_params(fused=fused)
        x = (jax.random.normal(jax.random.PRNGKey(9), (7, 64)) * 0.5
             ).astype(jnp.bfloat16)
        want = jax.jit(qwen2_mot._mlp, static_argnums=2)(
            x, p, ACT2FN["silu"])
        monkeypatch.setattr(qwen2_mot, "_FORCE_SILU_QUANT", True)
        got = jax.jit(qwen2_mot._mlp, static_argnums=2)(
            x, p, ACT2FN["silu"])
        # kernel quantization may differ from the XLA path by 1 LSB — the
        # down-proj output must stay inside that int8-noise envelope
        w, g_ = np.asarray(want, np.float32), np.asarray(got, np.float32)
        scale = np.abs(w).max()
        assert np.abs(g_ - w).max() <= 0.02 * scale, (
            np.abs(g_ - w).max(), scale)

    def test_gate_off_without_measurement(self):
        # off-TPU (CPU tests) the gate must never fire
        assert use_silu_quant_kernel(10_000_000) is False

    def test_non_silu_act_not_kerneled(self, monkeypatch):
        """gelu MLPs must never take the silu kernel branch even when
        forced — the marker keys on the activation identity."""
        from unimedvl_tpu.ops.activations import ACT2FN

        p = self._mlp_params()
        x = (jax.random.normal(jax.random.PRNGKey(2), (4, 64)) * 0.5
             ).astype(jnp.bfloat16)
        want = qwen2_mot._mlp(x, p, ACT2FN["gelu_pytorch_tanh"])
        monkeypatch.setattr(qwen2_mot, "_FORCE_SILU_QUANT", True)
        got = qwen2_mot._mlp(x, p, ACT2FN["gelu_pytorch_tanh"])
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32))

"""Pallas decode-attention kernel vs the jnp GQA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.ops.attention import gqa_attention_hm, gqa_attention_quant_hm
from unimedvl_tpu.ops.decode_attention import decode_attention
from unimedvl_tpu.models.qwen2_mot import _quantize_kv_block


def _mask(S, M, lens, base, col):
    kv = jnp.arange(M)[None, None, :]
    m = (kv < lens[:, None, None]) | (
        (kv >= base[:, None, None]) & (kv <= col[:, None, None])
    )
    return jnp.broadcast_to(m, (S, 1, M))


class TestDecodeAttention:
    @pytest.mark.parametrize("M", [130, 384])
    def test_bf16_matches_jnp(self, M):
        S, H, Hk, D = 3, 8, 2, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((S, 1, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        lens = jnp.asarray([7, 45, 100], jnp.int32)
        base = jnp.asarray([110, 110, 110], jnp.int32)
        col = jnp.asarray([115, 115, 115], jnp.int32)
        want = gqa_attention_hm(q, k, v, _mask(S, M, lens, base, col))
        got = decode_attention(q, k, v, lens, (base, col), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_int8_matches_jnp_quant(self):
        S, M, H, Hk, D = 2, 256, 28, 4, 128
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((S, 1, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        kq, ks = _quantize_kv_block(k)  # per-row scales over D: [S, Hk, M]
        vq, vs = _quantize_kv_block(v)
        lens = jnp.asarray([30, 200], jnp.int32)
        base = jnp.asarray([220, 220], jnp.int32)
        col = jnp.asarray([230, 230], jnp.int32)
        want = gqa_attention_quant_hm(
            q, kq, ks, vq, vs, _mask(S, M, lens, base, col)
        )
        got = decode_attention(
            q, kq, vq, lens, (base, col), k_scale=ks, v_scale=vs, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_degenerate_band_scatter_semantics(self):
        """band=(lens, lens): visibility kv <= lens — the serving decode
        (appended token at lens[s])."""
        S, M, H, Hk, D = 2, 128, 4, 2, 64
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((S, 1, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        lens = jnp.asarray([5, 60], jnp.int32)
        kv = jnp.arange(M)[None, None, :]
        mask = jnp.broadcast_to(kv <= lens[:, None, None], (S, 1, M))
        want = gqa_attention_hm(q, k, v, mask)
        got = decode_attention(q, k, v, lens, (lens, lens), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


class TestModelLevelDecodeKernel:
    """generate_text / scatter-decode through the Pallas kernel (interpret
    mode via _FORCE_FLASH) must match the jnp paths token-for-token."""

    def _setup(self, quantized):
        from unimedvl_tpu.config import LLMConfig, BagelConfig
        from unimedvl_tpu.models import qwen2_mot as mot
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from unimedvl_tpu.models import bagel

        llm = LLMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        )
        cfg = BagelConfig(llm=llm, vit=None, vae=None, visual_gen=False,
                          visual_und=False)
        params = {"llm": mot.init_params(jax.random.PRNGKey(0), llm,
                                         jnp.float32)}
        S, cap = 3, 64
        cache = KVCache.create(2, S, cap, 4, llm.head_dim, jnp.float32,
                               quantized=quantized)
        rng = np.random.default_rng(4)
        ids = jnp.asarray(rng.integers(0, 128, (S, 8)), jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
        # ragged contexts via q_valid
        valid = jnp.asarray([[True] * 8, [True] * 5 + [False] * 3,
                             [True] * 6 + [False] * 2])
        cache = bagel.prefill_text(params, cfg, cache, ids, pos, valid)
        return params, cfg, cache

    @pytest.mark.parametrize("quantized", [False, True])
    def test_generate_text_kernel_matches_jnp(self, monkeypatch, quantized):
        from unimedvl_tpu.models import bagel, qwen2_mot as mot

        params, cfg, cache = self._setup(quantized)
        start = jnp.asarray([3, 5, 9], jnp.int32)
        pos = jnp.asarray([8, 5, 6], jnp.int32)

        def run():
            out, _ = bagel.generate_text(
                params, cfg, cache, start, pos, 6, jnp.asarray(-1, jnp.int32)
            )
            return np.asarray(out)

        want = run()
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        got = run()
        agree = (want == got).mean()
        assert agree >= 0.9, (want, got)

    def test_scatter_decode_kernel_matches_jnp(self, monkeypatch):
        """The serving decode path (scatter write, ragged lens)."""
        from unimedvl_tpu.models import qwen2_mot as mot
        from unimedvl_tpu.models.qwen2_mot import ForwardSpec

        params, cfg, cache = self._setup(False)
        rng = np.random.default_rng(6)
        S = 3
        x = jnp.asarray(rng.standard_normal((S, 1, 32)), jnp.float32)
        pos = jnp.asarray([[8], [5], [6]], jnp.int32)

        def run():
            h, c = mot.forward(
                params["llm"], cfg.llm, x, pos, cache,
                ForwardSpec("und", True, True),
            )
            return np.asarray(h), np.asarray(c.lens)

        want_h, want_l = run()
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        got_h, got_l = run()
        np.testing.assert_array_equal(got_l, want_l)
        np.testing.assert_allclose(got_h, want_h, rtol=2e-4, atol=2e-4)

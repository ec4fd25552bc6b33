"""Pallas flash-attention kernel vs the jnp masked-softmax reference
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.ops.attention import gqa_attention
from unimedvl_tpu.models.qwen2_mot import _suffix_mask, _concat_mask
from unimedvl_tpu.ops.flash_attention import (
    flash_block_attention,
    flash_cache_block_attention,
)


def make_inputs(S, T, M, H, Hk, D, lens, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((S, T, H, D)).astype(np.float32)
    k = rng.standard_normal((S, M, Hk, D)).astype(np.float32)
    v = rng.standard_normal((S, M, Hk, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens, jnp.int32)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_incache_block_matches_reference(self, causal):
        """Block appended at [lens, lens+T) inside the cache (update path)."""
        S, T, M, H, Hk, D = 2, 128, 256, 4, 2, 128
        lens = np.asarray([37, 90])
        q, k, v, lens_j = make_inputs(S, T, M, H, Hk, D, lens)
        # reference mask path
        mask = _suffix_mask(M, T, lens_j, causal)
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, lens_j, causal, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_concat_block_matches_reference(self):
        """Block concatenated after the cache (no-update CFG path)."""
        S, T, M0, H, Hk, D = 1, 96, 128, 4, 4, 128
        lens = np.asarray([70])
        q, k, v, lens_j = make_inputs(S, T, M0 + T, H, Hk, D, lens, seed=1)
        mask = _concat_mask(M0, T, lens_j, False)
        want = gqa_attention(q, k, v, mask)
        bstart = jnp.asarray([M0], jnp.int32)
        got = flash_block_attention(
            q, k, v, lens_j, bstart, False, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("causal", [True, False])
    def test_two_phase_matches_concat(self, causal):
        """flash_cache_block_attention == jnp reference over concat(cache, block)."""
        S, T, M0, H, Hk, D = 2, 96, 192, 4, 2, 128
        lens = np.asarray([100, 37])
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        lens_j = jnp.asarray(lens, jnp.int32)

        k_all = jnp.concatenate([kc, kb], axis=1)
        v_all = jnp.concatenate([vc, vb], axis=1)
        mask = _concat_mask(M0, T, lens_j, causal)
        want = gqa_attention(q, k_all, v_all, mask)
        got = flash_cache_block_attention(
            q, kc, vc, kb, vb, lens_j, causal, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_head_dim_padding(self):
        """Non-128 head dims (SigLIP = 72) are zero-padded with correct scale."""
        S, T, M, H, Hk, D = 1, 64, 128, 4, 4, 72
        lens = np.asarray([50])
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        lens_j = jnp.asarray(lens, jnp.int32)
        # ViT-style: only kv < lens attended (block disabled via block_start=M)
        mask = jnp.arange(M)[None, None, :] < lens_j[:, None, None]
        mask = jnp.broadcast_to(mask, (S, T, M))
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, jnp.full_like(lens_j, M), False,
            block_q=64, block_k=64, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        assert got.shape == (S, T, H, D)

    def test_unaligned_sizes(self):
        """T and M not multiples of the block sizes."""
        S, T, M, H, Hk, D = 2, 50, 130, 2, 1, 128
        lens = np.asarray([30, 11])
        q, k, v, lens_j = make_inputs(S, T, M, H, Hk, D, lens, seed=2)
        mask = _suffix_mask(M, T, lens_j, True)
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, lens_j, True, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


class TestFusedQPreproc:
    """Fused in-kernel qk-norm + RoPE (gen-mode fp32 island, N7) vs the
    unfused XLA path: MoT-routed fp32 RMSNorm + RoPE outside the kernel."""

    def _outside(self, q_raw, w_und, w_gen, cos, sin, end_row, eps, out_dtype):
        from unimedvl_tpu.ops.norms import rms_norm
        from unimedvl_tpu.ops.rope import apply_rope

        q32 = q_raw.astype(jnp.float32)
        S, T = q32.shape[:2]

        def norm(t, w):
            return rms_norm(t, w.astype(jnp.float32), eps)

        y = norm(q32, w_gen)
        rows = [0, int(end_row)]
        for r in rows:
            y = y.at[:, r].set(norm(q32[:, r], w_und))
        y, _ = apply_rope(y, y, cos, sin)
        return y.astype(out_dtype)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_fused_matches_unfused_single_loop(self, dtype):
        S, T, M, H, Hk, D = 2, 96, 192, 4, 2, 128
        lens = np.asarray([37, 90])
        rng = np.random.default_rng(5)
        q_raw = jnp.asarray(rng.standard_normal((S, T, H, D)), dtype)
        k = jnp.asarray(rng.standard_normal((S, M, Hk, D)), dtype)
        v = jnp.asarray(rng.standard_normal((S, M, Hk, D)), dtype)
        lens_j = jnp.asarray(lens, jnp.int32)
        w_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        w_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        from unimedvl_tpu.ops.rope import rope_cos_sin

        pos = jnp.asarray(rng.integers(0, 500, (S, T)), jnp.int32)
        cos, sin = rope_cos_sin(pos, D, 1e6)
        eps = 1e-6

        q_proc = self._outside(q_raw, w_und, w_gen, cos, sin, T - 1, eps, dtype)
        want = flash_block_attention(
            q_proc, k, v, lens_j, lens_j, False, block_q=64, block_k=64,
            interpret=True,
        )
        got = flash_block_attention(
            q_raw, k, v, lens_j, lens_j, False, block_q=64, block_k=64,
            interpret=True,
            q_preproc=dict(w_und=w_und, w_gen=w_gen, cos=cos, sin=sin,
                           end_row=None, eps=eps),
        )
        tol = 2e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol,
        )

    def test_compact_row_constant_tables(self):
        """rope_const path: [S, 1, D] cos/sin (every block row shares one rope
        position — the image packing contract) must equal the full-table
        path."""
        S, T, M, H, Hk, D = 2, 96, 192, 4, 2, 128
        lens = np.asarray([37, 90])
        rng = np.random.default_rng(17)
        dtype = jnp.float32
        q_raw = jnp.asarray(rng.standard_normal((S, T, H, D)), dtype)
        k = jnp.asarray(rng.standard_normal((S, M, Hk, D)), dtype)
        v = jnp.asarray(rng.standard_normal((S, M, Hk, D)), dtype)
        lens_j = jnp.asarray(lens, jnp.int32)
        w_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        w_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        from unimedvl_tpu.ops.rope import rope_cos_sin

        pos1 = jnp.asarray(rng.integers(0, 500, (S, 1)), jnp.int32)
        cos1, sin1 = rope_cos_sin(pos1, D, 1e6)  # [S, 1, D] compact
        cosT = jnp.broadcast_to(cos1, (S, T, D))
        sinT = jnp.broadcast_to(sin1, (S, T, D))

        def run(cos, sin):
            return flash_block_attention(
                q_raw, k, v, lens_j, lens_j, False, block_q=64, block_k=64,
                interpret=True,
                q_preproc=dict(w_und=w_und, w_gen=w_gen, cos=cos, sin=sin,
                               end_row=None, eps=1e-6),
            )

        want = run(cosT, sinT)
        got = run(cos1, sin1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_fused_matches_unfused_two_phase_dynamic_end_row(self):
        S, T, M0, H, Hk, D = 1, 96, 640, 4, 2, 128
        lens = np.asarray([500])
        end_row = 77  # bucketed prefill: text end before the padded tail
        rng = np.random.default_rng(7)
        dtype = jnp.bfloat16
        q_raw = jnp.asarray(rng.standard_normal((S, T, H, D)), dtype)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        lens_j = jnp.asarray(lens, jnp.int32)
        w_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        w_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        from unimedvl_tpu.ops.rope import rope_cos_sin

        pos = jnp.asarray(rng.integers(0, 500, (S, T)), jnp.int32)
        cos, sin = rope_cos_sin(pos, D, 1e6)
        eps = 1e-6

        q_proc = self._outside(q_raw, w_und, w_gen, cos, sin, end_row, eps, dtype)
        want = flash_cache_block_attention(
            q_proc, kc, vc, kb, vb, lens_j, False, block_q=64, block_k=64,
            interpret=True,
        )
        got = flash_cache_block_attention(
            q_raw, kc, vc, kb, vb, lens_j, False, block_q=64, block_k=64,
            interpret=True,
            q_preproc=dict(w_und=w_und, w_gen=w_gen, cos=cos, sin=sin,
                           end_row=jnp.asarray([end_row], jnp.int32), eps=eps),
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )


class TestFusedKVPreproc:
    """Fused k-side fp32 island (kv_preproc) in the two-phase kernel vs the
    unfused path where k is normed/roped outside. Legal only when the cache is
    not updated — generate_latents' per-step forwards."""

    def _proc_k_outside(self, k_raw, w_und, w_gen, cos, sin, end_row, eps, dt):
        from unimedvl_tpu.ops.norms import rms_norm
        from unimedvl_tpu.ops.rope import apply_rope_one

        k32 = k_raw.astype(jnp.float32)

        def norm(t, w):
            return rms_norm(t, w.astype(jnp.float32), eps)

        y = norm(k32, w_gen)
        for r in (0, int(end_row)):
            y = y.at[:, r].set(norm(k32[:, r], w_und))
        return apply_rope_one(y, cos, sin).astype(dt)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_fused_kv_matches_unfused_two_phase(self, dtype):
        S, T, M0, H, Hk, D = 2, 96, 192, 4, 2, 128
        lens = np.asarray([100, 37])
        rng = np.random.default_rng(11)
        q_raw = jnp.asarray(rng.standard_normal((S, T, H, D)), dtype)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        kb_raw = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        lens_j = jnp.asarray(lens, jnp.int32)
        wq_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        wq_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        wk_und = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        wk_gen = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        from unimedvl_tpu.ops.rope import rope_cos_sin

        pos = jnp.asarray(rng.integers(0, 500, (S, T)), jnp.int32)
        cos, sin = rope_cos_sin(pos, D, 1e6)
        eps = 1e-6
        qp = dict(w_und=wq_und, w_gen=wq_gen, cos=cos, sin=sin,
                  end_row=None, eps=eps)

        kb_proc = self._proc_k_outside(
            kb_raw, wk_und, wk_gen, cos, sin, T - 1, eps, dtype
        )
        want = flash_cache_block_attention(
            q_raw, kc, vc, kb_proc, vb, lens_j, False, block_q=64, block_k=64,
            interpret=True, q_preproc=qp,
        )
        got = flash_cache_block_attention(
            q_raw, kc, vc, kb_raw, vb, lens_j, False, block_q=64, block_k=64,
            interpret=True, q_preproc=qp,
            kv_preproc=dict(w_und=wk_und, w_gen=wk_gen),
        )
        tol = 2e-5 if dtype == jnp.float32 else 2e-2
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=tol, atol=tol,
        )

    def test_fused_kv_causal_unaligned(self):
        """Causal block visibility + T not a block multiple."""
        S, T, M0, H, Hk, D = 1, 70, 128, 2, 1, 128
        lens = np.asarray([64])
        rng = np.random.default_rng(13)
        dtype = jnp.float32
        q_raw = jnp.asarray(rng.standard_normal((S, T, H, D)), dtype)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), dtype)
        kb_raw = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), dtype)
        lens_j = jnp.asarray(lens, jnp.int32)
        w = lambda: jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, dtype)
        wq_und, wq_gen, wk_und, wk_gen = w(), w(), w(), w()
        from unimedvl_tpu.ops.rope import rope_cos_sin

        pos = jnp.asarray(rng.integers(0, 500, (S, T)), jnp.int32)
        cos, sin = rope_cos_sin(pos, D, 1e6)
        qp = dict(w_und=wq_und, w_gen=wq_gen, cos=cos, sin=sin,
                  end_row=None, eps=1e-6)
        kb_proc = self._proc_k_outside(
            kb_raw, wk_und, wk_gen, cos, sin, T - 1, 1e-6, dtype
        )
        want = flash_cache_block_attention(
            q_raw, kc, vc, kb_proc, vb, lens_j, True, block_q=64, block_k=64,
            interpret=True, q_preproc=qp,
        )
        got = flash_cache_block_attention(
            q_raw, kc, vc, kb_raw, vb, lens_j, True, block_q=64, block_k=64,
            interpret=True, q_preproc=qp,
            kv_preproc=dict(w_und=wk_und, w_gen=wk_gen),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


class TestModelLevelFusedPath:
    """Full mot.forward gen parity: flash path (fused q preproc, interpret
    mode) vs the jnp path, at head_dim 128 where the fusion activates."""

    def test_gen_forward_flash_vs_jnp(self, monkeypatch):
        from unimedvl_tpu.config import LLMConfig
        from unimedvl_tpu.models import qwen2_mot as mot
        from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache

        llm = LLMConfig(
            vocab_size=64, hidden_size=256, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
            head_dim_override=128, layer_module="Qwen2MoTDecoderLayer",
            qk_norm=True,
        )
        params = mot.init_params(jax.random.PRNGKey(0), llm, jnp.float32)
        rng = np.random.default_rng(0)
        S, T = 2, 66
        x = jnp.asarray(rng.standard_normal((S, T, 256)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 300, (S, T)), jnp.int32)
        cache = KVCache.create(2, S, 128, 1, 128, jnp.float32)
        cache = KVCache(k=cache.k, v=cache.v, lens=jnp.asarray([40, 7], jnp.int32))
        # pre-fill the visible cache region with noise so context attention
        # actually matters
        kf = jnp.asarray(rng.standard_normal(cache.k.shape), jnp.float32)
        cache = KVCache(k=kf, v=jnp.asarray(
            rng.standard_normal(cache.v.shape), jnp.float32), lens=cache.lens)

        spec = ForwardSpec("gen", False, False)
        want, _ = mot.forward(params, llm, x, pos, cache, spec)
        assert not mot._FORCE_FLASH
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        got, _ = mot.forward(params, llm, x, pos, cache, spec)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

    def test_gen_update_cache_flash_vs_jnp(self, monkeypatch):
        """vae prefill shape (update_cache=True, causal False) — the k written
        to the cache must be identical in both paths (processed outside)."""
        from unimedvl_tpu.config import LLMConfig
        from unimedvl_tpu.models import qwen2_mot as mot
        from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache

        llm = LLMConfig(
            vocab_size=64, hidden_size=256, intermediate_size=128,
            num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=1,
            head_dim_override=128, layer_module="Qwen2MoTDecoderLayer",
            qk_norm=True,
        )
        params = mot.init_params(jax.random.PRNGKey(1), llm, jnp.float32)
        rng = np.random.default_rng(1)
        S, T = 1, 64
        x = jnp.asarray(rng.standard_normal((S, T, 256)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 300, (S, T)), jnp.int32)

        def run():
            cache = KVCache.create(1, S, 256, 1, 128, jnp.float32)
            cache = KVCache(k=cache.k, v=cache.v, lens=jnp.asarray([32], jnp.int32))
            spec = ForwardSpec("gen", True, False)
            h, new_cache = mot.forward(params, llm, x, pos, cache, spec)
            return h, new_cache

        want_h, want_c = run()
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        got_h, got_c = run()
        np.testing.assert_allclose(
            np.asarray(got_h), np.asarray(want_h), rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_c.k), np.asarray(want_c.k), rtol=1e-6, atol=1e-6
        )


class TestHeadMajorLayout:
    """kv_head_major=True (native KVCache layout) must match the default
    [S, M, Hk, D] call bit-for-bit, and the head-major jnp primitives must
    match their token-major twins."""

    def test_flash_block_head_major_matches(self):
        S, T, M, H, Hk, D = 2, 128, 256, 4, 2, 128
        lens = np.asarray([37, 90])
        q, k, v, lens_j = make_inputs(S, T, M, H, Hk, D, lens, seed=7)
        want = flash_block_attention(
            q, k, v, lens_j, lens_j, True, block_q=64, block_k=64,
            interpret=True,
        )
        got = flash_block_attention(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            lens_j, lens_j, True, block_q=64, block_k=64, interpret=True,
            kv_head_major=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_cache_block_head_major_matches(self):
        S, T, M0, H, Hk, D = 2, 96, 192, 4, 2, 128
        rng = np.random.default_rng(8)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        lens = jnp.asarray([10, 150], jnp.int32)
        want = flash_cache_block_attention(
            q, kc, vc, kb, vb, lens, False, block_q=64, block_k=64,
            interpret=True,
        )
        got = flash_cache_block_attention(
            q, kc.transpose(0, 2, 1, 3), vc.transpose(0, 2, 1, 3), kb, vb,
            lens, False, block_q=64, block_k=64, interpret=True,
            cache_head_major=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_gqa_hm_matches_token_major(self):
        from unimedvl_tpu.ops.attention import (
            gqa_attention_hm, gqa_attention_quant, gqa_attention_quant_hm,
        )
        from unimedvl_tpu.models.qwen2_mot import _quantize_kv_block

        S, Tq, M, H, Hk, D = 2, 3, 64, 8, 2, 32
        rng = np.random.default_rng(9)
        q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        mask = jnp.asarray(rng.random((S, Tq, M)) > 0.3)
        mask = mask.at[:, :, 0].set(True)  # no fully-masked rows
        want = gqa_attention(q, k, v, mask)
        got = gqa_attention_hm(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), mask
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

        kq, ks = _quantize_kv_block(k)
        vq, vs = _quantize_kv_block(v)
        want_q = gqa_attention_quant(q, kq, ks, vq, vs, mask)
        got_q = gqa_attention_quant_hm(
            q, kq.transpose(0, 2, 1, 3), ks.transpose(0, 2, 1),
            vq.transpose(0, 2, 1, 3), vs.transpose(0, 2, 1), mask,
        )
        np.testing.assert_allclose(
            np.asarray(got_q), np.asarray(want_q), rtol=1e-5, atol=1e-5
        )


class TestPartialCombine:
    """Partial attention over disjoint kv sets + online-softmax combine must
    equal single-pass attention over the union — the algebra behind the SP
    denoise gather overlap (parallel/sp_denoise.py overlap_gather)."""

    def test_jnp_lse_partials_match_full(self):
        from unimedvl_tpu.ops.attention import (
            combine_attention_partials,
            gqa_attention_hm,
            gqa_attention_hm_lse,
        )

        S, Tq, M, H, Hk, D = 2, 5, 96, 8, 2, 32
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        mask = jnp.asarray(rng.random((S, Tq, M)) > 0.3)
        mask = mask.at[:, :, 0].set(True)
        want = gqa_attention_hm(q, k, v, mask)
        cut = 40
        oa, la = gqa_attention_hm_lse(q, k[:, :, :cut], v[:, :, :cut],
                                      mask[:, :, :cut])
        ob, lb = gqa_attention_hm_lse(q, k[:, :, cut:], v[:, :, cut:],
                                      mask[:, :, cut:])
        got = combine_attention_partials([(oa, la), (ob, lb)])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )

    def test_jnp_lse_all_masked_partial_is_zero_weight(self):
        from unimedvl_tpu.ops.attention import (
            combine_attention_partials,
            gqa_attention_hm,
            gqa_attention_hm_lse,
        )

        S, Tq, M, H, Hk, D = 1, 3, 32, 4, 2, 16
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.standard_normal((S, Tq, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, Hk, M, D)), jnp.float32)
        mask = jnp.ones((S, Tq, M), bool)
        want = gqa_attention_hm(q, k, v, mask)
        oa, la = gqa_attention_hm_lse(q, k, v, mask)
        ob, lb = gqa_attention_hm_lse(q, k, v, jnp.zeros_like(mask))
        assert np.all(np.asarray(lb) < -1e30)
        assert np.allclose(np.asarray(ob), 0.0)
        got = combine_attention_partials([(oa, la), (ob, lb)])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_flash_lse_partials_match_single_call(self):
        """Two flash calls (cache-only + block-only, return_lse) combined ==
        one flash call over the concatenated kv, incl. the fused q preproc."""
        from unimedvl_tpu.ops.attention import combine_attention_partials
        from unimedvl_tpu.ops.rope import rope_cos_sin

        S, T, M0, H, Hk, D = 2, 96, 192, 4, 2, 128
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((S, Hk, M0, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((S, Hk, M0, D)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((S, Hk, T, D)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((S, Hk, T, D)), jnp.float32)
        lens = jnp.asarray([150, 63], jnp.int32)
        cos, sin = rope_cos_sin(jnp.full((S, 1), 7, jnp.int32), D, 1e6)
        qp = dict(
            w_und=jnp.asarray(rng.standard_normal((D,)), jnp.float32),
            w_gen=jnp.asarray(rng.standard_normal((D,)), jnp.float32),
            cos=cos, sin=sin, end_row=None, eps=1e-6,
        )

        k_all = jnp.concatenate([kc, kb], axis=2)
        v_all = jnp.concatenate([vc, vb], axis=2)
        want = flash_block_attention(
            q, k_all, v_all, lens, jnp.full((S,), M0, jnp.int32), False,
            block_q=64, block_k=64, interpret=True,
            q_valid_len=jnp.full((S,), T, jnp.int32), q_preproc=qp,
            kv_head_major=True,
        )
        zeros = jnp.zeros((S,), jnp.int32)
        o_c, lse_c = flash_block_attention(
            q, kc, vc, lens, lens, False, block_q=64, block_k=64,
            interpret=True, q_valid_len=zeros, q_preproc=qp,
            kv_head_major=True, return_lse=True,
        )
        o_b, lse_b = flash_block_attention(
            q, kb, vb, jnp.full((S,), T, jnp.int32),
            jnp.full((S,), T, jnp.int32), False, block_q=64, block_k=64,
            interpret=True, q_valid_len=zeros, q_preproc=qp,
            kv_head_major=True, return_lse=True,
        )
        got = combine_attention_partials([(o_c, lse_c), (o_b, lse_b)])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

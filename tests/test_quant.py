"""Int8 weight-quantization serving mode tests."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from unimedvl_tpu.config import LLMConfig
from unimedvl_tpu.models import qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache
from unimedvl_tpu.quant import (
    dequantize_weight,
    quantize_llm_params,
    quantize_weight,
    quantized_linear,
)

CFG = LLMConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
)


class TestQuant:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        q = quantize_weight(w)
        assert q["kernel_q"].dtype == jnp.int8
        back = dequantize_weight(q, jnp.float32)
        err = np.abs(np.asarray(back) - np.asarray(w))
        col_max = np.abs(np.asarray(w)).max(axis=0)
        assert (err <= col_max[None, :] / 127.0 * 1.01).all()

    def test_quantized_linear_matches_dequant(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 32)).astype(np.float32))
        q = quantize_weight(w)
        got = quantized_linear(x, q)
        want = x @ dequantize_weight(q, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_quantized_decode_runs_and_approximates_bf16(self):
        params = mot.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        qparams = dict(params)
        qparams = {**params, **{"lm_head": params["lm_head"]}}
        qllm = quantize_llm_params(params)

        # structure: layer kernels replaced, norms untouched
        lp = jax.tree.map(lambda a: a, qllm["layers"], is_leaf=lambda x: hasattr(x, "dtype"))
        assert qllm["layers"]["attn"]["q"]["kernel_q"].dtype == jnp.int8
        assert "scale" in qllm["layers"]["mlp"]["gate"]
        assert qllm["layers"]["input_layernorm"]["scale"].dtype != jnp.int8
        assert qllm["lm_head"]["kernel_q"].dtype == jnp.int8

        S, T = 1, 6
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((S, T, CFG.hidden_size)).astype(np.float32))
        pos = jnp.arange(T)[None]
        cache = KVCache.create(2, S, 16, CFG.num_key_value_heads, CFG.head_dim, jnp.float32)

        ref, _ = mot.forward(params, CFG, x, pos, cache, ForwardSpec("und", True, True))
        got, _ = mot.forward(qllm, CFG, x, pos, cache, ForwardSpec("und", True, True))
        # int8 error is small per layer; require qualitative agreement
        r, g = np.asarray(ref), np.asarray(got)
        cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
        assert cos > 0.99, cos

        logits_ref = mot.lm_head(params, ref[:, -1])
        logits_q = mot.lm_head(qllm, ref[:, -1])
        assert int(jnp.argmax(logits_ref)) == int(jnp.argmax(logits_q))


class TestQuantGenPath:
    """Int8 serving mode on the GEN (denoise) path: quantizing both MoT
    experts must track the bf16 denoise trajectory closely — the full-depth
    single-chip t2i measurement (benchmarks/denoise_full_bench.py) relies on
    the int8 gen path standing in for bf16."""

    def _setup(self):
        from unimedvl_tpu.config import BagelConfig, VAEConfig
        from unimedvl_tpu.models import bagel

        llm = LLMConfig(
            vocab_size=64, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            layer_module="Qwen2MoTDecoderLayer", qk_norm=True,
        )
        cfg = BagelConfig(
            llm=llm, vit=None,
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, downsample=2),
            visual_und=False, latent_patch_size=2, max_latent_size=8,
        )
        params = bagel.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32, llm2vae_zero=False)
        return cfg, params

    @pytest.mark.slow
    def test_int8_gen_velocity_close_to_bf16(self):
        from unimedvl_tpu.models import bagel

        cfg, params = self._setup()
        qparams = dict(params)
        qparams["llm"] = quantize_llm_params(params["llm"])
        # both experts' kernels quantized
        assert "kernel_q" in qparams["llm"]["layers"]["mlp_moe_gen"]["gate"]
        assert "kernel_q" in qparams["llm"]["layers"]["attn"]["q_gen"]

        n = 16
        caches = KVCache.create(2, 3, 32, 2, cfg.llm.head_dim, jnp.float32)
        caches = KVCache(k=caches.k, v=caches.v,
                         lens=jnp.asarray([8, 5, 6], jnp.int32))
        positions = jnp.asarray([3, 2, 2], jnp.int32)
        pos_ids = jnp.arange(n) % 64
        noise = jax.random.normal(jax.random.PRNGKey(1), (n, 16), jnp.float32)
        se = jnp.asarray([7, 8], jnp.int32)

        def run(p):
            return np.asarray(bagel.generate_latents(
                p, cfg, caches, positions, pos_ids, noise, se,
                num_timesteps=4, timestep_shift=3.0,
                cfg_text_scale=4.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
                cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            ), np.float32)

        want = run(params)
        got = run(qparams)
        assert np.isfinite(got).all()
        # relative L2 error of the final latent across the whole 4-step loop
        rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
        assert rel < 0.05, rel


class TestServingFusion:
    """fuse_serving_projections: fused qkv / gate_up leaves must be forward-
    exact vs the checkpoint layout up to fp32 matmul reduction order."""

    def _forward(self, params, spec, gen=False):
        S, T, cap = 2, 4, 16
        cfg = CFG
        cache = KVCache.create(
            cfg.num_hidden_layers, S, cap, cfg.num_key_value_heads,
            cfg.head_dim, jnp.float32,
        )
        cache = KVCache(k=cache.k, v=cache.v, lens=jnp.asarray([3, 5], jnp.int32))
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((S, T, cfg.hidden_size)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 30, (S, T)), jnp.int32)
        h, new_cache = mot.forward(params, cfg, x, pos, cache, spec)
        return np.asarray(h), np.asarray(new_cache.k)

    def test_fused_matches_unfused_und(self):
        from unimedvl_tpu.quant import fuse_serving_projections

        params = mot.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
        fused = dict(params, **fuse_serving_projections(params))
        spec = ForwardSpec("und", True, True)
        want_h, want_k = self._forward(params, spec)
        got_h, got_k = self._forward(fused, spec)
        np.testing.assert_allclose(got_h, want_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-5)

    def test_fused_matches_unfused_gen_mot(self):
        from unimedvl_tpu.quant import fuse_serving_projections

        cfg = LLMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            layer_module="Qwen2MoTDecoderLayer",
        )
        params = mot.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
        fused = dict(params, **fuse_serving_projections(params))
        S, T, cap = 1, 6, 16
        cache = KVCache.create(cfg.num_hidden_layers, S, cap,
                               cfg.num_key_value_heads, cfg.head_dim, jnp.float32)
        cache = KVCache(k=cache.k, v=cache.v, lens=jnp.asarray([4], jnp.int32))
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((S, T, cfg.hidden_size)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 30, (S, T)), jnp.int32)
        spec = ForwardSpec("gen", False, False)
        want, _ = mot.forward(params, cfg, x, pos, cache, spec)
        got, _ = mot.forward(fused, cfg, x, pos, cache, spec)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_tp_interleaved_layout(self):
        """fuse_serving_projections(tp=N): even column shards of the fused
        dim must each be [q_s|k_s|v_s] — i.e. de-interleaving the tp blocks
        recovers the plain (tp=1) fused kernel."""
        from unimedvl_tpu.quant import fuse_serving_projections

        params = mot.init_params(jax.random.PRNGKey(6), CFG, dtype=jnp.float32)
        plain = fuse_serving_projections(params)
        inter = fuse_serving_projections(params, tp=2)
        for key, widths in (
            ("qkv", (CFG.num_attention_heads * CFG.head_dim,
                     CFG.num_key_value_heads * CFG.head_dim,
                     CFG.num_key_value_heads * CFG.head_dim)),
            ("gate_up", (CFG.intermediate_size, CFG.intermediate_size)),
        ):
            tree_key = "attn" if key == "qkv" else "mlp"
            pk = np.asarray(plain["layers"][tree_key][key]["kernel"])
            ik = np.asarray(inter["layers"][tree_key][key + "_tp2"]["kernel"])
            tot = pk.shape[-1]
            shards = np.split(ik, 2, axis=-1)  # per-chip column blocks
            rebuilt_parts = [[] for _ in widths]
            for sh in shards:
                off = 0
                for i, w in enumerate(widths):
                    rebuilt_parts[i].append(sh[..., off : off + w // 2])
                    off += w // 2
            rebuilt = np.concatenate(
                [np.concatenate(p, axis=-1) for p in rebuilt_parts], axis=-1
            )
            np.testing.assert_array_equal(rebuilt, pk)
            assert ik.shape[-1] == tot

    def test_tp_interleaved_global_forward_exact(self):
        """A tp=2-interleaved fused tree fed to the GLOBAL-view mot.forward
        must match the plain tree bitwise: the shard-aligned de-interleave
        (qwen2_mot._deinterleave) recovers the exact original q/k/v and
        gate/up column order, so ONE tp-fused tree serves prefill/decode AND
        the manual-TP denoise."""
        from unimedvl_tpu.quant import fuse_serving_projections

        params = mot.init_params(jax.random.PRNGKey(3), CFG, dtype=jnp.float32)
        fused2 = dict(params, **fuse_serving_projections(params, tp=2))
        spec = ForwardSpec("und", True, True)
        want_h, want_k = self._forward(params, spec)
        got_h, got_k = self._forward(fused2, spec)
        np.testing.assert_allclose(got_h, want_h, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(got_k, want_k, rtol=1e-6, atol=1e-6)

    def test_tp_interleaved_global_forward_gen_mot(self):
        from unimedvl_tpu.quant import fuse_serving_projections

        cfg = LLMConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            layer_module="Qwen2MoTDecoderLayer",
        )
        params = mot.init_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
        fused2 = dict(params, **fuse_serving_projections(params, tp=2))
        S, T, cap = 1, 6, 16
        cache = KVCache.create(cfg.num_hidden_layers, S, cap,
                               cfg.num_key_value_heads, cfg.head_dim, jnp.float32)
        cache = KVCache(k=cache.k, v=cache.v, lens=jnp.asarray([4], jnp.int32))
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.standard_normal((S, T, cfg.hidden_size)), jnp.float32)
        pos = jnp.asarray(rng.integers(0, 30, (S, T)), jnp.int32)
        spec = ForwardSpec("gen", False, False)
        want, _ = mot.forward(params, cfg, x, pos, cache, spec)
        got, _ = mot.forward(fused2, cfg, x, pos, cache, spec)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_fused_composes_with_int8(self):
        from unimedvl_tpu.quant import fuse_serving_projections

        params = mot.init_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
        q = quantize_llm_params(params)
        fused_q = dict(q, **fuse_serving_projections(q))
        spec = ForwardSpec("und", True, True)
        want_h, want_k = self._forward(q, spec)
        got_h, got_k = self._forward(fused_q, spec)
        np.testing.assert_allclose(got_h, want_h, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-5)


class TestActQuant:
    """Full-int8 matmuls (dynamic per-token activation quantization feeding
    the s8 x s8 MXU path). The MXU-compute-bound lever at large decode batch
    (DECODE_PROFILE_BS256.json: dequant-to-bf16 matmuls at ~90% bf16 peak;
    the int8 dot measured ~4x faster on v5e)."""

    def test_quantized_linear_act_error_bounded(self):
        from unimedvl_tpu.quant import quantized_linear_act

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
        q = quantize_weight(w)
        q = {"kernel_qa": q["kernel_q"], "scale": q["scale"]}
        got = np.asarray(quantized_linear_act(x, q))
        want = np.asarray(x @ w)
        # error bound: per-term quantization error of x and w accumulates
        # over the 64-term contraction; generous statistical bound
        denom = np.abs(np.asarray(x)).max() * np.abs(np.asarray(w)).max() * 64
        assert np.abs(got - want).max() <= denom * (2 / 127) * 1.01

    def test_act_quant_key_rename_and_marker(self):
        params = mot.init_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
        qa = quantize_llm_params(params, act_quant=True)
        leaf = qa["layers"]["attn"]["q"]
        assert "kernel_qa" in leaf and "kernel_q" not in leaf
        assert leaf["kernel_qa"].dtype == jnp.int8
        assert "kernel_qa" in qa["lm_head"]

    def test_act_quant_greedy_close_to_fp(self):
        from unimedvl_tpu.models.qwen2_mot import KVCache

        params = {"llm": mot.init_params(jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        qparams = {"llm": quantize_llm_params(params["llm"], act_quant=True)}
        run = TestInt8KVCache._run_decode

        def fresh():
            return KVCache.create(CFG.num_hidden_layers, 3, 32,
                                  CFG.num_key_value_heads, CFG.head_dim,
                                  jnp.float32)

        want = run(self, params, fresh())
        got = run(self, qparams, fresh())
        agree = (want == got).mean()
        assert agree >= 0.7, (agree, want, got)

    def test_act_quant_gen_velocity_close_to_bf16(self):
        """Full-int8 on the GEN (denoise) path: the full-depth t2i
        measurement can only use act-quant if the quantized trajectory
        tracks fp closely over a multi-step CFG denoise loop."""
        from unimedvl_tpu.models import bagel
        from unimedvl_tpu.models.qwen2_mot import KVCache

        cfg, params = TestQuantGenPath._setup(self)
        qparams = dict(params)
        qparams["llm"] = quantize_llm_params(params["llm"], act_quant=True)
        assert "kernel_qa" in qparams["llm"]["layers"]["mlp_moe_gen"]["gate"]

        n = 16
        caches = KVCache.create(2, 3, 32, 2, cfg.llm.head_dim, jnp.float32)
        caches = KVCache(k=caches.k, v=caches.v,
                         lens=jnp.asarray([8, 5, 6], jnp.int32))
        positions = jnp.asarray([3, 2, 2], jnp.int32)
        pos_ids = jnp.arange(n) % 64
        noise = jax.random.normal(jax.random.PRNGKey(1), (n, 16), jnp.float32)
        se = jnp.asarray([7, 8], jnp.int32)

        def run(p):
            return np.asarray(bagel.generate_latents(
                p, cfg, caches, positions, pos_ids, noise, se,
                num_timesteps=4, timestep_shift=3.0,
                cfg_text_scale=4.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
                cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            ), np.float32)

        want = run(params)
        got = run(qparams)
        assert np.isfinite(got).all()
        rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-9)
        # per-token act quant on top of per-channel weights: a further
        # non-parity step vs weight-only (<0.05); still must track the
        # fp trajectory
        assert rel < 0.10, rel

    def test_fusion_composes_with_act_quant(self):
        from unimedvl_tpu.quant import fuse_serving_projections

        params = mot.init_params(jax.random.PRNGKey(5), CFG, dtype=jnp.float32)
        qa = fuse_serving_projections(quantize_llm_params(params, act_quant=True))
        attn = qa["layers"]["attn"]
        assert "qkv" in attn and "kernel_qa" in attn["qkv"]
        assert "gate_up" in qa["layers"]["mlp"]
        assert "kernel_qa" in qa["layers"]["mlp"]["gate_up"]


class TestInt8KVCache:
    """Opt-in int8 KV cache: quantize-at-write / fused-dequant-at-read."""

    def _run_decode(self, params, cache, steps=6):
        from unimedvl_tpu.models import bagel
        from unimedvl_tpu.config import BagelConfig

        cfg = BagelConfig(llm=CFG, vit=None, vae=None, visual_gen=False,
                          visual_und=False)
        S = cache.num_streams
        ids = jnp.asarray(np.arange(S * 8).reshape(S, 8) % CFG.vocab_size,
                          jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
        valid = jnp.ones((S, 8), bool)
        cache = bagel.prefill_text(params, cfg, cache, ids, pos, valid)
        start = jnp.asarray([3] * S, jnp.int32)
        dpos = jnp.full((S,), 8, jnp.int32)
        out, _ = bagel.generate_text(
            params, cfg, cache, start, dpos, steps, jnp.asarray(-1, jnp.int32)
        )
        return np.asarray(out)

    def test_quantized_cache_decode_close_to_fp(self):
        from unimedvl_tpu.models.qwen2_mot import KVCache

        params = {"llm": mot.init_params(jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        S, cap = 3, 32
        base = KVCache.create(CFG.num_hidden_layers, S, cap,
                              CFG.num_key_value_heads, CFG.head_dim,
                              jnp.float32)
        quant = KVCache.create(CFG.num_hidden_layers, S, cap,
                               CFG.num_key_value_heads, CFG.head_dim,
                               quantized=True)
        assert quant.quantized and not base.quantized
        want = self._run_decode(params, base)
        got = self._run_decode(params, quant)
        # int8 kv error is small; greedy tokens should overwhelmingly agree
        agree = (want == got).mean()
        assert agree >= 0.8, (agree, want, got)

    def test_quantized_cache_roundtrip_error_bounded(self):
        from unimedvl_tpu.models.qwen2_mot import (
            KVCache, _scatter_kv, dequant_slice,
        )

        rng = np.random.default_rng(5)
        L, S, M, Hk, D = 2, 3, 16, 2, 8
        cache = KVCache.create(L, S, M, Hk, D, quantized=True)
        block = jnp.asarray(rng.standard_normal((S, 4, Hk, D)), jnp.float32)
        lens = jnp.asarray([0, 2, 5], jnp.int32)
        k, ks = _scatter_kv(cache.k, cache.k_scale, jnp.asarray(1), block, lens)
        back = dequant_slice(k[1], ks[1], jnp.float32)  # [S, Hk, M, D]
        for s_i, off in enumerate([0, 2, 5]):
            got = np.swapaxes(np.asarray(back[s_i, :, off : off + 4]), 0, 1)
            want = np.asarray(block[s_i])
            absmax = np.abs(want).max(axis=-1, keepdims=True)
            assert (np.abs(got - want) <= absmax / 127 * 1.01).all()

    def test_aligned_cm_scales_match_scatter_path(self):
        """generate_text carries int8-kv scales column-major [L, Hk, M, S]
        (dense per-step column writes — see mot._update_kv_col). With EQUAL
        lens the aligned columns land exactly where generate_text_ctx's
        per-row scatter writes and both paths see the same visible kv set,
        so greedy tokens must agree exactly."""
        from unimedvl_tpu.models import bagel
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from unimedvl_tpu.config import BagelConfig

        params = {"llm": mot.init_params(jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        cfg = BagelConfig(llm=CFG, vit=None, vae=None, visual_gen=False,
                          visual_und=False)
        S, cap, steps = 3, 32, 6
        cache = KVCache.create(CFG.num_hidden_layers, S, cap,
                               CFG.num_key_value_heads, CFG.head_dim,
                               quantized=True)
        ids = jnp.asarray(np.arange(S * 8).reshape(S, 8) % CFG.vocab_size,
                          jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
        cache = bagel.prefill_text(params, cfg, cache, ids, pos,
                                   jnp.ones((S, 8), bool))
        start = jnp.asarray([3, 5, 7], jnp.int32)
        dpos = jnp.full((S,), 8, jnp.int32)
        eos = jnp.asarray(-1, jnp.int32)
        aligned, alens = bagel.generate_text(
            params, cfg, cache, start, dpos, steps, eos)
        ctx, clens, _ = bagel.generate_text_ctx(
            params, cfg, cache, start, dpos, steps, eos)
        np.testing.assert_array_equal(np.asarray(aligned), np.asarray(ctx))
        np.testing.assert_array_equal(np.asarray(alens), np.asarray(clens))

    def test_int4_kv_cache_decode(self):
        """kv_bits=4: int4 cache values; decode runs every path (prefill
        windowed scatter, aligned-column write, quant attention) and tracks
        the fp trajectory loosely (int4 kv is a bigger accuracy step)."""
        from unimedvl_tpu.models.qwen2_mot import KVCache

        params = {"llm": mot.init_params(jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        S, cap = 3, 32
        base = KVCache.create(CFG.num_hidden_layers, S, cap,
                              CFG.num_key_value_heads, CFG.head_dim,
                              jnp.float32)
        kv4 = KVCache.create(CFG.num_hidden_layers, S, cap,
                             CFG.num_key_value_heads, CFG.head_dim,
                             quantized=True, kv_bits=4)
        assert kv4.k.dtype == jnp.int4
        want = self._run_decode(params, base)
        got = self._run_decode(params, kv4)
        assert (got >= -1).all()  # decoded tokens are in-range / finite path
        agree = (want == got).mean()
        assert agree >= 0.5, (agree, want, got)

    def test_int4_weight_roundtrip_and_decode(self):
        """bits=4: PACKED int4 storage (two nibbles per int8 byte along the
        in dim — ops/w4_matmul.py), per-channel scales; decode stays finite
        and close to fp on a tiny model (w4 is a further non-parity step)."""
        from unimedvl_tpu.quant import (
            quantize_weight, dequantize_weight, quantize_llm_params,
        )
        from unimedvl_tpu.models import bagel
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from unimedvl_tpu.config import BagelConfig

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        q = quantize_weight(w, bits=4)
        assert q["kernel_p4"].dtype == jnp.int8
        assert q["kernel_p4"].shape == (16, 16)  # in dim halved by packing
        back = np.asarray(dequantize_weight(q, jnp.float32))
        absmax = np.abs(np.asarray(w)).max(axis=0)
        assert (np.abs(back - np.asarray(w)) <= absmax / 7 * 0.51).all()
        # via_host path produces the same packed leaf
        qh = quantize_weight(np.asarray(w), via_host=True, bits=4)
        np.testing.assert_array_equal(
            np.asarray(q["kernel_p4"]), np.asarray(qh["kernel_p4"]))

        params = {"llm": mot.init_params(jax.random.PRNGKey(11), CFG,
                                         dtype=jnp.float32)}
        cfg = BagelConfig(llm=CFG, vit=None, vae=None, visual_gen=False,
                          visual_und=False)
        for act_quant in (False, True):
            q4 = {"llm": quantize_llm_params(params["llm"], bits=4,
                                             act_quant=act_quant)}
            leaf = q4["llm"]["layers"]["attn"]
            key = "kernel_p4a" if act_quant else "kernel_p4"
            assert leaf["q"][key].dtype == jnp.int8
            # lm_head stays int8
            lm_key = "kernel_qa" if act_quant else "kernel_q"
            assert q4["llm"]["lm_head"][lm_key].dtype == jnp.int8
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

    def test_gqa_attention_quant_matches_dequant(self):
        from unimedvl_tpu.ops.attention import gqa_attention, gqa_attention_quant
        from unimedvl_tpu.models.qwen2_mot import _quantize_kv_block, dequant_slice

        rng = np.random.default_rng(7)
        B, Tq, Tk, H, Hk, D = 2, 1, 16, 4, 2, 8
        q = jnp.asarray(rng.standard_normal((B, Tq, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Tk, Hk, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Tk, Hk, D)), jnp.float32)
        mask = jnp.asarray(rng.random((B, Tq, Tk)) > 0.3)
        mask = mask.at[:, :, 0].set(True)  # at least one visible key
        kq, ks = _quantize_kv_block(k)
        vq, vs = _quantize_kv_block(v)
        want = gqa_attention(
            q, dequant_slice(kq, ks, jnp.float32),
            dequant_slice(vq, vs, jnp.float32), mask,
        )
        got = gqa_attention_quant(q, kq, ks, vq, vs, mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

"""TP×SP denoise (parallel/sp_denoise.py) vs single-device generate_latents
on the simulated 8-device CPU mesh.

The layout under test is the measured-best v5e-8 denoise layout
(docs/MULTICHIP_DENOISE.md TP2×SP4): vae latent tokens shard over "seq",
both MoT experts narrow over "model", text rows replicated per shard, one
block k/v all-gather per layer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from unimedvl_tpu.config import BagelConfig, LLMConfig, VAEConfig
from unimedvl_tpu.models import bagel, qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import KVCache
from unimedvl_tpu.parallel.sp_denoise import (
    generate_latents_dp_tp_sp,
    generate_latents_tp_sp,
)

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    ),
    vit=None, visual_und=False,
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                  downsample=2),
    max_latent_size=8,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    params = bagel.init_params(jax.random.PRNGKey(0), CFG)
    return params


def _mesh(tp, sp):
    devices = np.asarray(jax.devices()[: tp * sp]).reshape(tp, sp)
    return Mesh(devices, ("model", "seq"))


def _denoise_inputs(S, n, cap, seed=1):
    caches = KVCache.create(
        CFG.llm.num_hidden_layers, S, cap, CFG.llm.num_key_value_heads,
        CFG.llm.head_dim, jnp.float32,
    )
    rng = np.random.default_rng(seed)
    caches = KVCache(
        k=jnp.asarray(rng.standard_normal(caches.k.shape), jnp.float32),
        v=jnp.asarray(rng.standard_normal(caches.v.shape), jnp.float32),
        lens=jnp.asarray((rng.integers(1, cap // 2, (S,))), jnp.int32),
    )
    positions = jnp.asarray(rng.integers(1, 5, (S,)), jnp.int32)
    pos_ids = jnp.asarray(np.arange(n) % (CFG.max_latent_size**2))
    noise = jax.random.normal(jax.random.PRNGKey(7), (n, CFG.patch_latent_dim),
                              jnp.float32)
    se = jnp.asarray([3, 4], jnp.int32)
    return caches, positions, pos_ids, noise, se


class TestSPDenoise:
    @pytest.mark.parametrize("renorm", ["global", "channel", "text_channel"])
    def test_tp2_sp4_matches_single_device(self, setup, renorm):
        params = setup
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap)
        kw = dict(
            num_timesteps=4, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.3, 1.0),
            cfg_renorm_type=renorm, cfg_renorm_min=0.1,
            use_text_cfg=True, use_img_cfg=True,
        )
        want = bagel.generate_latents(
            params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_overlap_chunks_equivalence(self, setup):
        """overlap_chunks=2 (row-chunked post-attention chain so the Megatron
        psums overlap the other chunk's compute) must match the single-chain
        program bitwise-tightly: the chunk split only reorders INDEPENDENT
        row computations, never a reduction."""
        params = setup
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap,
                                                                seed=5)
        kw = dict(
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
            cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            mesh=_mesh(2, 4),
        )
        one = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            overlap_chunks=1, **kw,
        )
        two = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            overlap_chunks=2, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(two), np.asarray(one), rtol=1e-5, atol=1e-6
        )

    def test_dedup_text_mlp_exact(self, setup):
        """dedup_text_mlp (owner-rotated und-expert MLP for the 2
        seq-replicated text rows + tiny seq psum broadcast) must match the
        every-rank-computes program EXACTLY: the owner computes bitwise the
        same value each rank computed before, and the psum of one non-zero
        contribution is a broadcast."""
        params = setup
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap,
                                                                seed=7)
        kw = dict(
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
            cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            mesh=_mesh(2, 4),
        )
        off = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            dedup_text_mlp=False, **kw,
        )
        on = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            dedup_text_mlp=True, **kw,
        )
        np.testing.assert_array_equal(np.asarray(on), np.asarray(off))

    def test_single_stream_no_cfg(self, setup):
        params = setup
        S, n, cap = 1, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=3)
        kw = dict(num_timesteps=3, timestep_shift=3.0)
        want = bagel.generate_latents(
            params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_sp_only_layout(self, setup):
        """tp=1 (pure SP8): no model-axis narrowing, 8 seq shards of 2 tokens."""
        params = setup
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=5)
        kw = dict(
            num_timesteps=3, cfg_text_scale=2.0, use_text_cfg=True,
            cfg_renorm_type="global",
        )
        want = bagel.generate_latents(
            params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(1, 8), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_int8_params_tp_sp(self, setup):
        """int8 serving-mode leaves shard correctly (kernel_q/scale specs)."""
        from unimedvl_tpu.quant import quantize_llm_params

        params = dict(setup)
        params["llm"] = quantize_llm_params(setup["llm"])
        S, n, cap = 1, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=9)
        kw = dict(num_timesteps=3)
        want = bagel.generate_latents(
            params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_act_quant_fused_tp_sp(self, setup):
        """Full-int8 leaves (kernel_qa, dynamic per-token activation quant)
        + tp-interleaved fusion through the SP denoise — the act_quant
        serving mode at the TP2xSP4 layout. Act-quant changes numerics
        (s8xs8 matmuls), so the oracle is the single-device loop on the SAME
        quantized params."""
        from unimedvl_tpu.quant import fuse_serving_projections, quantize_llm_params

        qa_llm = quantize_llm_params(setup["llm"], act_quant=True)
        ref_params = dict(setup)
        ref_params["llm"] = qa_llm
        params = dict(setup)
        params["llm"] = fuse_serving_projections(qa_llm, tp=2)
        S, n, cap = 1, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=17)
        kw = dict(num_timesteps=3)
        want = bagel.generate_latents(
            ref_params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_fused_projections_tp_sp(self, setup):
        """Fused qkv/gate_up leaves in the tp-interleaved block layout
        (quant.fuse_serving_projections(tp=2)) on a TP2xSP4 mesh must match
        the unfused single-device denoise: fusion only concatenates output
        columns, so each chip's [q_s|k_s|v_s] block computes the identical
        dot products."""
        from unimedvl_tpu.quant import fuse_serving_projections

        params = dict(setup)
        params["llm"] = fuse_serving_projections(setup["llm"], tp=2)
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=11)
        kw = dict(
            num_timesteps=3, cfg_text_scale=2.0, cfg_img_scale=1.5,
            cfg_interval=(0.0, 1.0), cfg_renorm_type="global",
            use_text_cfg=True, use_img_cfg=True,
        )
        want = bagel.generate_latents(
            setup, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_fused_int8_projections_tp_sp(self, setup):
        """Fusion composes with int8 serving quantization under manual TP
        (kernel_q + per-column scale both tp-interleaved)."""
        from unimedvl_tpu.quant import fuse_serving_projections, quantize_llm_params

        q_llm = quantize_llm_params(setup["llm"])
        ref_params = dict(setup)
        ref_params["llm"] = q_llm
        params = dict(setup)
        params["llm"] = fuse_serving_projections(q_llm, tp=2)
        S, n, cap = 1, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap, seed=13)
        kw = dict(num_timesteps=3)
        want = bagel.generate_latents(
            ref_params, CFG, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 4), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )


class TestGroupedDenoise:
    def test_dp2_tp2_sp2_matches_single_device_per_group(self, setup):
        """DP2×TP2×SP2 (docs/MULTICHIP_DENOISE.md lever 3: two independent
        images per pod): each group must reproduce the single-device denoise
        for ITS OWN cache/noise/positions — the data axis is pure
        replication, no cross-group collectives."""
        params = setup
        S, n, cap, G = 3, 16, 32, 2
        groups = [_denoise_inputs(S, n, cap, seed=20 + g) for g in range(G)]
        se = groups[0][4]
        kw = dict(
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.3, 1.0),
            cfg_renorm_type="global", cfg_renorm_min=0.1,
            use_text_cfg=True, use_img_cfg=True,
        )
        want = [
            bagel.generate_latents(
                params, CFG, caches, positions, pos_ids, noise, se, **kw
            )
            for caches, positions, pos_ids, noise, _ in groups
        ]
        devices = np.asarray(jax.devices()).reshape(2, 2, 2)
        mesh = Mesh(devices, ("data", "model", "seq"))
        got = generate_latents_dp_tp_sp(
            params, CFG,
            [g[0] for g in groups], [g[1] for g in groups],
            [g[2] for g in groups], [g[3] for g in groups],
            se, mesh=mesh, **kw,
        )
        assert got.shape == (G, n, CFG.patch_latent_dim)
        for g in range(G):
            np.testing.assert_allclose(
                np.asarray(got[g]), np.asarray(want[g]), rtol=2e-4, atol=2e-5
            )


class TestSPDenoiseFlashPath:
    """The actual TPU kernel path (fused q+k preproc, gathered raw k,
    block_len) exercised in interpret mode under shard_map: validates the
    real multi-chip program semantics without multi-chip hardware."""

    def test_flash_sp_matches_single_device(self, monkeypatch):
        cfg = BagelConfig(
            llm=LLMConfig(
                vocab_size=64, hidden_size=256, intermediate_size=128,
                num_hidden_layers=1, num_attention_heads=2,
                num_key_value_heads=2, head_dim_override=128,
            ),
            vit=None, visual_und=False,
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, downsample=2),
            max_latent_size=16,
        )
        params = bagel.init_params(jax.random.PRNGKey(2), cfg)
        S, n, cap = 2, 124, 32  # nloc = 62 -> local block 64 >= flash cutoff
        caches = KVCache.create(1, S, cap, 2, 128, jnp.float32)
        rng = np.random.default_rng(11)
        caches = KVCache(
            k=jnp.asarray(rng.standard_normal(caches.k.shape), jnp.float32),
            v=jnp.asarray(rng.standard_normal(caches.v.shape), jnp.float32),
            lens=jnp.asarray([5, 9], jnp.int32),
        )
        positions = jnp.asarray([2, 1], jnp.int32)
        pos_ids = jnp.asarray(np.arange(n) % (cfg.max_latent_size**2))
        noise = jax.random.normal(jax.random.PRNGKey(8), (n, cfg.patch_latent_dim),
                                  jnp.float32)
        se = jnp.asarray([3, 4], jnp.int32)
        kw = dict(num_timesteps=2, cfg_text_scale=2.0, use_text_cfg=True,
                  cfg_renorm_type="text_channel")

        want = bagel.generate_latents(
            params, cfg, caches, positions, pos_ids, noise, se, **kw
        )
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        got = generate_latents_tp_sp(
            params, cfg, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 2), **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )


class TestOverlapGather:
    def test_overlap_gather_equivalence(self, setup):
        """overlap_gather=True (cache/block attention partials + online-
        softmax combine so the per-layer seq all-gather overlaps the cache
        partial's compute) must match the single-chain program: the split
        is exact softmax algebra, not an approximation."""
        params = setup
        S, n, cap = 3, 16, 32
        caches, positions, pos_ids, noise, se = _denoise_inputs(S, n, cap,
                                                                seed=23)
        kw = dict(
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
            cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            mesh=_mesh(2, 4),
        )
        one = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            overlap_gather=False, **kw,
        )
        two = generate_latents_tp_sp(
            params, CFG, caches, positions, pos_ids, noise, se,
            overlap_gather=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(two), np.asarray(one), rtol=1e-4, atol=1e-5
        )

    def test_overlap_gather_vs_single_device_flash(self, setup, monkeypatch):
        """The flash variant of the overlap split (two Pallas partial calls
        with return_lse + fused q preproc) vs the single-device oracle, at a
        head_dim-128 geometry large enough for the kernel path (lT >= 64)."""
        cfg = BagelConfig(
            llm=LLMConfig(
                vocab_size=128, hidden_size=256, intermediate_size=128,
                num_hidden_layers=1, num_attention_heads=2,
                num_key_value_heads=2,
            ),
            vit=None, visual_und=False,
            vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, downsample=2),
            max_latent_size=16,
        )
        assert cfg.llm.head_dim == 128
        monkeypatch.setattr(mot, "_FORCE_FLASH", True)
        params = bagel.init_params(jax.random.PRNGKey(1), cfg)
        S, n, cap = 1, 124, 32  # lT = 124/2 + 2 = 64 per shard at sp=2
        caches = KVCache.create(1, S, cap, 2, 128, jnp.float32)
        rng = np.random.default_rng(31)
        caches = KVCache(
            k=jnp.asarray(rng.standard_normal(caches.k.shape), jnp.float32),
            v=jnp.asarray(rng.standard_normal(caches.v.shape), jnp.float32),
            lens=jnp.asarray([5], jnp.int32),
        )
        positions = jnp.asarray([3], jnp.int32)
        pos_ids = jnp.asarray(np.arange(n) % (cfg.max_latent_size**2))
        noise = jax.random.normal(jax.random.PRNGKey(9),
                                  (n, cfg.patch_latent_dim), jnp.float32)
        se = jnp.asarray([3, 4], jnp.int32)
        kw = dict(num_timesteps=2, timestep_shift=3.0)
        want = bagel.generate_latents(
            params, cfg, caches, positions, pos_ids, noise, se, **kw
        )
        got = generate_latents_tp_sp(
            params, cfg, caches, positions, pos_ids, noise, se,
            mesh=_mesh(2, 2), overlap_gather=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

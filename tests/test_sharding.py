"""Sharding tests on the simulated 8-device CPU mesh: TP-sharded forward ==
single-device forward; cache sharding; decode under mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.models import bagel, qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache
from unimedvl_tpu.parallel import (
    create_mesh,
    shard_params,
    shard_cache,
)

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=4,
    ),
    vit=ViTConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=8, patch_size=2, rope=False,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, downsample=2),
    max_latent_size=8,
    vit_max_num_patch_per_side=8,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = create_mesh((2, 4))  # data=2, model=4
    params = bagel.init_params(jax.random.PRNGKey(0), CFG)
    return mesh, params


class TestSharding:
    def test_tp_forward_matches_single_device(self, setup):
        mesh, params = setup
        sharded = shard_params(params, CFG, mesh)

        S, T = 2, 6
        rng = np.random.default_rng(0)
        x = rng.standard_normal((S, T, CFG.llm.hidden_size)).astype(np.float32)
        positions = np.tile(np.arange(T), (S, 1))
        cache = KVCache.create(2, S, 16, CFG.llm.num_key_value_heads, CFG.llm.head_dim, jnp.float32)

        ref, ref_cache = mot.forward(
            params["llm"], CFG.llm, jnp.asarray(x), jnp.asarray(positions),
            cache, ForwardSpec("und", True, True),
        )
        with jax.set_mesh(mesh):
            got, got_cache = mot.forward(
                sharded["llm"], CFG.llm, jnp.asarray(x), jnp.asarray(positions),
                shard_cache(cache, mesh), ForwardSpec("und", True, True),
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_cache.k), np.asarray(ref_cache.k), rtol=2e-4, atol=1e-5
        )

    def test_stream_parallel_denoise(self, setup):
        """Multi-chip t2i: the 3 CFG streams shard over 'data' (zero-comms
        stream parallelism) with TP over 'model' — must match single-device."""
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from unimedvl_tpu.models import bagel as bagel_mod

        _, params = setup
        # 3 streams x TP2 on 6 of the 8 virtual devices
        devices = np.asarray(jax.devices()[:6]).reshape(3, 2)
        mesh = Mesh(devices, ("data", "model"))
        sharded = shard_params(params, CFG, mesh)

        S, n, cap = 3, 16, 32
        caches = KVCache.create(2, S, cap, CFG.llm.num_key_value_heads,
                                CFG.llm.head_dim, jnp.float32)
        caches = KVCache(k=caches.k, v=caches.v, lens=jnp.asarray([6, 3, 4], jnp.int32))
        positions = jnp.asarray([2, 1, 1], jnp.int32)
        pos_ids = jnp.asarray(np.arange(n) % (CFG.max_latent_size**2))
        noise = jax.random.normal(jax.random.PRNGKey(1), (n, CFG.patch_latent_dim), jnp.float32)
        se = jnp.asarray([3, 4], jnp.int32)

        def run(p, c):
            return bagel_mod.generate_latents(
                p, CFG, c, positions, pos_ids, noise, se,
                num_timesteps=3, timestep_shift=3.0,
                cfg_text_scale=2.0, cfg_img_scale=1.5, cfg_interval=(0.0, 1.0),
                cfg_renorm_type="global", use_text_cfg=True, use_img_cfg=True,
            )

        want = run(params, caches)
        cache_spec = KVCache(
            k=P(None, "data", None, "model", None),
            v=P(None, "data", None, "model", None),
            lens=P("data"),
        )
        sharded_caches = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), caches, cache_spec
        )
        with jax.set_mesh(mesh):
            got = run(sharded, sharded_caches)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )

    def test_sharded_decode_loop(self, setup):
        mesh, params = setup
        sharded = shard_params(params, CFG, mesh)
        cache = KVCache.create(2, 2, 32, CFG.llm.num_key_value_heads, CFG.llm.head_dim, jnp.float32)
        start = jnp.asarray([3, 5], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        ref_out, _ = bagel.generate_text(
            params, CFG, cache, start, pos, 5, jnp.asarray(1, jnp.int32)
        )
        with jax.set_mesh(mesh):
            got_out, _ = bagel.generate_text(
                sharded, CFG, shard_cache(cache, mesh), start, pos, 5,
                jnp.asarray(1, jnp.int32),
            )
        np.testing.assert_array_equal(np.asarray(got_out), np.asarray(ref_out))

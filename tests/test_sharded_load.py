"""Sharded/streaming checkpoint load: conversion stages on HOST (numpy
leaves, no device commit), and ``place_params(mesh=...)`` lands every leaf
directly under its NamedSharding so no device ever holds the full model
(the TPU analogue of accelerate's load_checkpoint_and_dispatch,
reference interactive_vqa_inferencer.py:163-189).
"""

import os
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.parallel import create_mesh
from unimedvl_tpu.weights import bagel_loader


def _lazy_zeros_get(cfg: BagelConfig):
    """A ``Get`` producing correctly-shaped arrays on demand — a synthetic
    checkpoint without writing safetensors to disk. Values are a cheap
    deterministic function of the key so numeric round-trips are checkable."""
    C = cfg.llm.hidden_size
    I = cfg.llm.intermediate_size
    V = cfg.llm.vocab_size
    H = cfg.llm.num_attention_heads
    Hk = cfg.llm.num_key_value_heads
    D = cfg.llm.head_dim
    vh = cfg.vit.hidden_size if cfg.vit else 0
    vi = cfg.vit.intermediate_size if cfg.vit else 0
    pd = cfg.patch_latent_dim

    def shape_of(key: str):
        k = key
        if k.startswith("language_model."):
            k = k[len("language_model."):]
            if k == "model.embed_tokens.weight":
                return (V, C)
            if k == "lm_head.weight":
                return (V, C)
            if k == "model.norm.weight" or k == "model.norm_moe_gen.weight":
                return (C,)
            # per-layer
            name = k.split(".", 3)[-1]
            if name.startswith("self_attn.q_proj"):
                return (C,) if name.endswith("bias") else (H * D, C)
            if name.startswith("self_attn.k_proj") or name.startswith("self_attn.v_proj"):
                return (Hk * D,) if name.endswith("bias") else (Hk * D, C)
            if name.startswith("self_attn.o_proj"):
                return (C, H * D)
            if "q_norm" in name or "k_norm" in name:
                return (D,)
            if "layernorm" in name:
                return (C,)
            if "gate_proj" in name or "up_proj" in name:
                return (I, C)
            if "down_proj" in name:
                return (C, I)
        if k.startswith("vit_model.vision_model."):
            k2 = k[len("vit_model.vision_model."):]
            p = cfg.vit.patch_size
            if k2 == "embeddings.patch_embedding.weight":
                return (vh, 3, p, p)
            if k2 == "embeddings.patch_embedding.bias":
                return (vh,)
            if k2 == "embeddings.position_embedding.weight":
                return (cfg.vit.num_patches_per_side**2, vh)
            if "layer_norm" in k2 or k2.startswith("post_layernorm"):
                return (vh,)
            if "self_attn" in k2:
                return (vh,) if k2.endswith("bias") else (vh, vh)
            if "mlp.fc1" in k2:
                return (vi,) if k2.endswith("bias") else (vi, vh)
            if "mlp.fc2" in k2:
                return (vh,) if k2.endswith("bias") else (vh, vi)
        if k.startswith("connector.fc1"):
            return (C,) if k.endswith("bias") else (C, vh)
        if k.startswith("connector.fc2"):
            return (C,) if k.endswith("bias") else (C, C)
        if k == "vit_pos_embed.pos_embed":
            return (cfg.vit_max_num_patch_per_side**2, C)
        if k == "latent_pos_embed.pos_embed":
            return (cfg.max_latent_size**2, C)
        if k.startswith("vae2llm"):
            return (C,) if k.endswith("bias") else (C, pd)
        if k.startswith("llm2vae"):
            return (pd,) if k.endswith("bias") else (pd, C)
        if k.startswith("time_embedder.mlp.0"):
            return (C,) if k.endswith("bias") else (C, 256)
        if k.startswith("time_embedder.mlp.2"):
            return (C,) if k.endswith("bias") else (C, C)
        raise KeyError(key)

    def get(key: str, dtype=np.float32) -> np.ndarray:
        shape = shape_of(key)
        val = (hash(key) % 997) / 997.0
        return np.full(shape, val, dtype=dtype)

    return get


TINY = BagelConfig(
    llm=LLMConfig(
        vocab_size=320, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=8, num_key_value_heads=4,
    ),
    vit=ViTConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=2, rope=False,
    ),
    vae=VAEConfig(downsample=4, z_channels=4, ch=32, ch_mult=(1, 2, 2), num_res_blocks=1),
    latent_patch_size=2, max_latent_size=8, vit_max_num_patch_per_side=8,
)


def _per_device_bytes(params) -> dict:
    by_dev = defaultdict(int)
    for leaf in jax.tree.leaves(params):
        for shard in leaf.addressable_shards:
            by_dev[shard.device.id] += shard.data.nbytes
    return dict(by_dev)


class TestHostStaging:
    def test_convert_stays_on_host(self):
        params = bagel_loader.convert_bagel(_lazy_zeros_get(TINY), TINY, dtype=jnp.bfloat16)
        for leaf in jax.tree.leaves(params):
            assert isinstance(leaf, np.ndarray), type(leaf)
        assert params["llm"]["embed_tokens"].dtype == jnp.bfloat16

    def test_place_default_matches_sharded(self):
        params_np = bagel_loader.convert_bagel(
            _lazy_zeros_get(TINY), TINY, dtype=jnp.float32
        )
        single = bagel_loader.place_params(params_np, TINY)
        mesh = create_mesh((2, 4))
        sharded = bagel_loader.place_params(params_np, TINY, mesh=mesh)
        a = jax.tree.leaves(single)
        b = jax.tree.leaves(sharded)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_sharded_per_device_bytes(self):
        """TP=4: per-device bytes of the LLM must be ~1/4 of the total — this
        is what makes a 28 GB checkpoint loadable on 16 GB chips."""
        params_np = bagel_loader.convert_bagel(
            _lazy_zeros_get(TINY), TINY, dtype=jnp.float32
        )
        llm_np = params_np["llm"]
        total = sum(leaf.nbytes for leaf in jax.tree.leaves(llm_np))
        mesh = create_mesh((2, 4))
        sharded = bagel_loader.place_params(params_np, TINY, mesh=mesh)
        by_dev = _per_device_bytes(sharded["llm"])
        assert len(by_dev) == 8
        # TP-sharded big leaves divide by 4; norms/small leaves replicate.
        assert max(by_dev.values()) <= total / 4 * 1.2, (max(by_dev.values()), total)

    def test_big_llm_leaves_are_split(self):
        params_np = bagel_loader.convert_bagel(
            _lazy_zeros_get(TINY), TINY, dtype=jnp.float32
        )
        mesh = create_mesh((2, 4))
        sharded = bagel_loader.place_params(params_np, TINY, mesh=mesh)
        q = sharded["llm"]["layers"]["attn"]["q"]["kernel"]
        assert q.addressable_shards[0].data.shape[-1] == q.shape[-1] // 4
        emb = sharded["llm"]["embed_tokens"]
        assert emb.addressable_shards[0].data.shape[0] == emb.shape[0] // 4


@pytest.mark.skipif(
    os.environ.get("UNIMEDVL_FULL_GEOM") != "1",
    reason="full-geometry load is slow; set UNIMEDVL_FULL_GEOM=1",
)
def test_full_geometry_sharded_load():
    """Synthetic 28L/3584h/152k-vocab (14B-class) checkpoint loads under the
    8-device mesh with per-device bytes ~ total/4 — the real release cannot
    fit one v5e chip, so this is the load path that matters."""
    cfg = BagelConfig(
        llm=LLMConfig(),  # full 28L/3584/152064 geometry
        vit=ViTConfig(),
        vae=VAEConfig(),
    )
    import functools

    import ml_dtypes

    # real checkpoints ship bf16 tensors (the reference caches ema_bf16);
    # producing bf16 from the reader makes the conversion cast-free, which is
    # what the production load path sees.
    get = functools.partial(_lazy_zeros_get(cfg), dtype=ml_dtypes.bfloat16)
    params_np = bagel_loader.convert_bagel(get, cfg, dtype=jnp.bfloat16)
    total = sum(leaf.nbytes for leaf in jax.tree.leaves(params_np))
    assert total > 20e9, total  # really 14B-class (bf16)
    mesh = create_mesh((2, 4))
    sharded = bagel_loader.place_params(params_np, cfg, mesh=mesh)
    by_dev = _per_device_bytes(sharded)
    assert max(by_dev.values()) <= total / 4 * 1.2, (max(by_dev.values()), total)

"""Weight-conversion tests: synthetic torch-named state dicts -> params,
checking tree structure against init_params and math conventions vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.imaging import patchify
from unimedvl_tpu.models import bagel, qwen2_mot as mot, siglip
from unimedvl_tpu.weights import bagel_loader

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=50, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    ),
    vit=ViTConfig(
        hidden_size=12, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, image_size=8, patch_size=2, rope=False,
    ),
    vae=VAEConfig(),
    max_latent_size=4,
    vit_max_num_patch_per_side=4,
)


def synthetic_state_dict(cfg: BagelConfig, seed=0):
    """Random torch state dict with reference module names."""
    rng = np.random.default_rng(seed)
    sd = {}

    def add(name, *shape):
        sd[name] = rng.standard_normal(shape).astype(np.float32) * 0.1

    l = cfg.llm
    C, I, V = l.hidden_size, l.intermediate_size, l.vocab_size
    H, Hk, D = l.num_attention_heads, l.num_key_value_heads, l.head_dim
    add("language_model.model.embed_tokens.weight", V, C)
    for i in range(l.num_hidden_layers):
        p = f"language_model.model.layers.{i}."
        for suffix, wshape, bias in [
            ("self_attn.q_proj", (H * D, C), True),
            ("self_attn.k_proj", (Hk * D, C), True),
            ("self_attn.v_proj", (Hk * D, C), True),
            ("self_attn.o_proj", (C, H * D), False),
            ("self_attn.q_proj_moe_gen", (H * D, C), True),
            ("self_attn.k_proj_moe_gen", (Hk * D, C), True),
            ("self_attn.v_proj_moe_gen", (Hk * D, C), True),
            ("self_attn.o_proj_moe_gen", (C, H * D), False),
            ("mlp.gate_proj", (I, C), False),
            ("mlp.up_proj", (I, C), False),
            ("mlp.down_proj", (C, I), False),
            ("mlp_moe_gen.gate_proj", (I, C), False),
            ("mlp_moe_gen.up_proj", (I, C), False),
            ("mlp_moe_gen.down_proj", (C, I), False),
        ]:
            add(p + suffix + ".weight", *wshape)
            if bias:
                add(p + suffix + ".bias", wshape[0])
        for norm in [
            "self_attn.q_norm", "self_attn.k_norm",
            "self_attn.q_norm_moe_gen", "self_attn.k_norm_moe_gen",
        ]:
            add(p + norm + ".weight", D)
        for norm in [
            "input_layernorm", "input_layernorm_moe_gen",
            "post_attention_layernorm", "post_attention_layernorm_moe_gen",
        ]:
            add(p + norm + ".weight", C)
    add("language_model.model.norm.weight", C)
    add("language_model.model.norm_moe_gen.weight", C)
    add("language_model.lm_head.weight", V, C)

    v = cfg.vit
    vc, vi = v.hidden_size, v.intermediate_size
    # conv form patch embedding [D, 3, p, p]
    add("vit_model.vision_model.embeddings.patch_embedding.weight", vc, 3, v.patch_size, v.patch_size)
    add("vit_model.vision_model.embeddings.patch_embedding.bias", vc)
    add("vit_model.vision_model.embeddings.position_embedding.weight", v.num_patches_per_side**2, vc)
    for i in range(v.num_hidden_layers):
        p = f"vit_model.vision_model.encoder.layers.{i}."
        for s, shape in [
            ("self_attn.q_proj", (vc, vc)), ("self_attn.k_proj", (vc, vc)),
            ("self_attn.v_proj", (vc, vc)), ("self_attn.out_proj", (vc, vc)),
            ("mlp.fc1", (vi, vc)), ("mlp.fc2", (vc, vi)),
        ]:
            add(p + s + ".weight", *shape)
            add(p + s + ".bias", shape[0])
        for s in ["layer_norm1", "layer_norm2"]:
            add(p + s + ".weight", vc)
            add(p + s + ".bias", vc)
    add("vit_model.vision_model.post_layernorm.weight", vc)
    add("vit_model.vision_model.post_layernorm.bias", vc)

    add("connector.fc1.weight", C, vc)
    add("connector.fc1.bias", C)
    add("connector.fc2.weight", C, C)
    add("connector.fc2.bias", C)
    add("vit_pos_embed.pos_embed", cfg.vit_max_num_patch_per_side**2, C)

    pd = cfg.patch_latent_dim
    add("vae2llm.weight", C, pd)
    add("vae2llm.bias", C)
    add("llm2vae.weight", pd, C)
    add("llm2vae.bias", pd)
    add("time_embedder.mlp.0.weight", C, 256)
    add("time_embedder.mlp.0.bias", C)
    add("time_embedder.mlp.2.weight", C, C)
    add("time_embedder.mlp.2.bias", C)
    add("latent_pos_embed.pos_embed", cfg.max_latent_size**2, C)
    return sd


class TestBagelLoader:
    def test_structure_matches_init(self):
        sd = synthetic_state_dict(CFG)
        params = bagel_loader.convert_bagel(lambda k: sd[k], CFG, dtype=jnp.float32)
        ref = bagel.init_params(jax.random.PRNGKey(0), CFG)
        del ref["vae"]  # loader handles the VAE separately
        assert jax.tree.structure(params) == jax.tree.structure(ref)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
            assert a.shape == b.shape, (a.shape, b.shape)

    def test_linear_convention(self):
        sd = synthetic_state_dict(CFG)
        params = bagel_loader.convert_bagel(lambda k: sd[k], CFG, dtype=jnp.float32)
        x = np.random.default_rng(1).standard_normal((3, CFG.llm.hidden_size)).astype(np.float32)
        got = np.asarray(x @ np.asarray(params["llm2vae"]["kernel"]) + np.asarray(params["llm2vae"]["bias"]))
        lin = torch.nn.Linear(CFG.llm.hidden_size, CFG.patch_latent_dim)
        lin.weight.data = torch.from_numpy(sd["llm2vae.weight"])
        lin.bias.data = torch.from_numpy(sd["llm2vae.bias"])
        want = lin(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_patch_embedding_conv_to_linear(self):
        """patchify + converted-linear == torch conv2d (siglip_navit.py:167-182)."""
        sd = synthetic_state_dict(CFG)
        params = bagel_loader.convert_bagel(lambda k: sd[k], CFG, dtype=jnp.float32)
        p = CFG.vit.patch_size
        img = np.random.default_rng(2).standard_normal((3, 8, 8)).astype(np.float32)
        tokens = patchify(img, p)  # [16, 12]
        pe = params["vit"]["patch_embedding"]
        got = tokens @ np.asarray(pe["kernel"]) + np.asarray(pe["bias"])

        conv = torch.nn.Conv2d(3, CFG.vit.hidden_size, p, stride=p)
        conv.weight.data = torch.from_numpy(
            sd["vit_model.vision_model.embeddings.patch_embedding.weight"]
        )
        conv.bias.data = torch.from_numpy(
            sd["vit_model.vision_model.embeddings.patch_embedding.bias"]
        )
        want = conv(torch.from_numpy(img)[None]).detach().numpy()[0]  # [D, 4, 4]
        want = want.reshape(CFG.vit.hidden_size, -1).T  # [16, D] raster order
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_attention_qkv_convention(self):
        """Full MoT layer-0 q projection matches torch."""
        sd = synthetic_state_dict(CFG)
        params = bagel_loader.convert_bagel(lambda k: sd[k], CFG, dtype=jnp.float32)
        x = np.random.default_rng(3).standard_normal((5, CFG.llm.hidden_size)).astype(np.float32)
        qp = jax.tree.map(lambda a: a[0], params["llm"]["layers"])["attn"]["q"]
        got = x @ np.asarray(qp["kernel"]) + np.asarray(qp["bias"])
        want = (
            torch.from_numpy(x) @ torch.from_numpy(sd["language_model.model.layers.0.self_attn.q_proj.weight"]).T
            + torch.from_numpy(sd["language_model.model.layers.0.self_attn.q_proj.bias"])
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_safetensors_reader_roundtrip(self, tmp_path):
        from safetensors.numpy import save_file

        sd = synthetic_state_dict(CFG)
        save_file(sd, str(tmp_path / "ema.safetensors"))
        reader = bagel_loader.SafetensorsReader(str(tmp_path))
        params = bagel_loader.convert_bagel(reader, CFG, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(params["llm"]["embed_tokens"]),
            sd["language_model.model.embed_tokens.weight"],
        )

    def test_load_with_base_checkpoint_merge(self, tmp_path):
        """load_bagel_checkpoint(base_dir=...) merges base+finetune with
        finetune keys winning (reference eval/vlm/utils.py:281-317)."""
        from safetensors.numpy import save_file

        base = synthetic_state_dict(CFG, seed=0)
        fine = {
            "language_model.model.embed_tokens.weight": (
                base["language_model.model.embed_tokens.weight"] + 1.0
            )
        }
        (tmp_path / "base").mkdir()
        (tmp_path / "fine").mkdir()
        save_file(base, str(tmp_path / "base" / "ema.safetensors"))
        save_file(fine, str(tmp_path / "fine" / "ema.safetensors"))

        params = bagel_loader.load_bagel_checkpoint(
            str(tmp_path / "fine"), CFG, dtype=jnp.float32,
            base_dir=str(tmp_path / "base"),
        )
        np.testing.assert_allclose(
            np.asarray(params["llm"]["embed_tokens"]),
            fine["language_model.model.embed_tokens.weight"],
        )
        # non-overridden key comes from base
        np.testing.assert_allclose(
            np.asarray(params["llm"]["norm"]["scale"]),
            base["language_model.model.norm.weight"],
        )

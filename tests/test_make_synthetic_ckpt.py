"""The synthetic-checkpoint generator's key enumeration must satisfy the
loader exactly (every key convert_bagel requests exists, with the shape the
converters expect) — at a scaled-down geometry so the check is cheap. Guards
the expensive full-geometry generation + real-chip parity-gate rehearsal."""

import numpy as np
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.weights import bagel_loader

from scripts import make_synthetic_ckpt as gen

LLM_SMALL = {
    "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2,
}
VIT_SMALL = {
    "hidden_size": 12, "intermediate_size": 24,
    "num_hidden_layers": 3,  # shipped; reader drops one
    "num_attention_heads": 2, "image_size": 8, "patch_size": 2,
}


def _small_sd():
    sd = {}
    its = [gen.iter_llm_keys(LLM_SMALL), gen.iter_vit_keys(VIT_SMALL),
           gen.iter_aux_keys(LLM_SMALL, VIT_SMALL, vit_max_patch=4,
                             max_latent=4, patch_latent_dim=16)]
    for it in its:
        for key, shape in it:
            assert key not in sd, f"duplicate key {key}"
            sd[key] = np.zeros(shape, np.float16)
    return sd


def test_generated_keys_satisfy_loader():
    sd = _small_sd()
    cfg = BagelConfig(
        llm=LLMConfig(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        ),
        vit=ViTConfig(
            hidden_size=12, intermediate_size=24,
            num_hidden_layers=2,  # after the forced drop of the last layer
            num_attention_heads=2, image_size=8, patch_size=2, rope=False,
        ),
        vae=VAEConfig(resolution=32, downsample=4, ch=32, ch_mult=(1, 2, 2),
                      num_res_blocks=1, z_channels=4),
        max_latent_size=4,
        vit_max_num_patch_per_side=4,
        latent_patch_size=2,
    )
    assert cfg.patch_latent_dim == 16  # latent_patch_size**2 * z_channels

    requested = []

    def get(key):
        requested.append(key)
        assert key in sd, f"loader wants missing key {key}"
        return sd[key]

    params = bagel_loader.convert_bagel(get, cfg, dtype=jnp.float32)
    # shape agreement end-to-end: structure must match the model init
    from unimedvl_tpu.models import bagel
    import jax

    ref = bagel.init_params(jax.random.PRNGKey(0), cfg)
    ref.pop("vae")  # ships separately as ae.safetensors; not in ema state dict
    ref_shapes = jax.tree.map(lambda x: jnp.shape(x), ref)
    got_shapes = jax.tree.map(lambda x: jnp.shape(x), params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes

    # the shipped-but-dropped last ViT layer is deliberately never requested
    dropped = [k for k in sd if ".encoder.layers.2." in k]
    assert dropped and not any(k in requested for k in dropped)


def test_full_geometry_key_count_and_param_total():
    """The full-geometry enumeration lands at ~14B params (README's '14B')."""
    total = 0
    for it in (gen.iter_llm_keys(), gen.iter_vit_keys(), gen.iter_aux_keys()):
        for _, shape in it:
            total += int(np.prod(shape))
    assert 13.5e9 < total < 15.5e9, total

"""Checkpoint exporter round-trip: export_bagel_checkpoint writes the
released UniMedVL layout (interactive_vqa_inferencer.py:127-213 —
llm_config.json / vit_config.json / ema.safetensors [+index] /
ae.safetensors), and load_bagel_checkpoint reads back the identical tree —
so load -> finetune -> export -> reload is closed under the framework's own
tooling."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.models import bagel
from unimedvl_tpu.weights.bagel_export import export_bagel_checkpoint
from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    ),
    vit=ViTConfig(
        hidden_size=12, intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=2, image_size=8, patch_size=2, rope=False,
    ),
    vae=VAEConfig(resolution=32, downsample=4, ch=32, ch_mult=(1, 2, 2),
                  num_res_blocks=1, z_channels=4),
    max_latent_size=4,
    vit_max_num_patch_per_side=4,
    latent_patch_size=2,
)


def _tiny_params(seed=0):
    p = bagel.init_params(jax.random.PRNGKey(seed), CFG, dtype=jnp.float32)
    # randomize llm2vae too (init zeros it) so equality checks are meaningful
    p["llm2vae"] = jax.tree.map(
        lambda x: jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype),
        p["llm2vae"],
    )
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)


def _assert_trees_equal(a, b):
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    for pa, (pb_path, pb) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        la = np.asarray(pa[1]).astype(np.float32)
        lb = np.asarray(pb).astype(np.float32)
        np.testing.assert_array_equal(
            la, lb, err_msg=jax.tree_util.keystr(pb_path)
        )


class TestExportRoundTrip:
    def test_single_file_roundtrip(self, tmp_path):
        params = _tiny_params()
        out = str(tmp_path / "ckpt")
        written = export_bagel_checkpoint(out, params, CFG)
        assert written["ema.safetensors"] == "weights"
        assert written["ae.safetensors"] == "weights"
        # bf16 on disk, like the released checkpoints
        from safetensors import safe_open

        with safe_open(os.path.join(out, "ema.safetensors"), framework="np") as f:
            keys = list(f.keys())
            sl = f.get_slice("language_model.lm_head.weight")
            assert sl.get_dtype() == "BF16"
            assert tuple(sl.get_shape()) == (64, 16)  # torch [out, in]
        # the shipped-but-unused trailing ViT layer is present (reload drops it)
        assert any(".encoder.layers.2." in k for k in keys)

        reloaded = load_bagel_checkpoint(out, cfg=CFG, dtype=jnp.bfloat16)
        _assert_trees_equal(params, reloaded)

    def test_sharded_roundtrip(self, tmp_path):
        params = _tiny_params(seed=3)
        out = str(tmp_path / "ckpt")
        written = export_bagel_checkpoint(out, params, CFG, shard_gb=2e-5)
        shard_files = [k for k, v in written.items()
                       if v == "weights" and k.startswith("ema-")]
        assert len(shard_files) > 1
        assert "model.safetensors.index.json" in written
        with open(os.path.join(out, "model.safetensors.index.json")) as f:
            weight_map = json.load(f)["weight_map"]
        assert set(weight_map.values()) == set(shard_files)

        reloaded = load_bagel_checkpoint(out, cfg=CFG, dtype=jnp.bfloat16)
        _assert_trees_equal(params, reloaded)

    def test_config_json_roundtrip(self, tmp_path):
        out = str(tmp_path / "ckpt")
        export_bagel_checkpoint(out, _tiny_params(), CFG)
        llm = LLMConfig.from_json_file(os.path.join(out, "llm_config.json"))
        assert llm == CFG.llm
        vit = ViTConfig.from_json_file(os.path.join(out, "vit_config.json"))
        assert vit == CFG.vit  # from_json_file re-applies the -1 layer drop

    def test_lora_is_merged_on_export(self, tmp_path):
        from unimedvl_tpu.training.lora import add_lora, merge_lora

        params = _tiny_params(seed=5)
        adapted = add_lora(params, jax.random.PRNGKey(7), rank=2,
                           targets=("q", "v"))
        # give the adapters a real (nonzero) contribution
        adapted = jax.tree_util.tree_map_with_path(
            lambda path, x: (jnp.ones_like(x) * 0.01
                             if "lora_b" in jax.tree_util.keystr(path) else x),
            adapted,
        )
        out = str(tmp_path / "ckpt")
        export_bagel_checkpoint(out, adapted, CFG)
        reloaded = load_bagel_checkpoint(out, cfg=CFG, dtype=jnp.bfloat16)
        _assert_trees_equal(merge_lora(adapted), reloaded)

    def test_quantized_tree_rejected(self, tmp_path):
        params = _tiny_params()
        attn = dict(params["llm"]["layers"]["attn"])
        q = dict(attn["q"])
        kern = q.pop("kernel")
        q["kernel_q"] = kern.astype(jnp.int8)
        q["scale"] = jnp.ones(kern.shape[-1], jnp.float32)
        attn["q"] = q
        params["llm"]["layers"] = dict(params["llm"]["layers"], attn=attn)
        with pytest.raises(ValueError, match="kernel_q"):
            export_bagel_checkpoint(str(tmp_path / "x"), params, CFG)

    def test_base_plus_finetune_merge_reads_export(self, tmp_path):
        """An exported checkpoint works as the finetune side of the loader's
        base+finetune merge path (eval/vlm/utils.py:281-317)."""
        base = _tiny_params(seed=11)
        fine = _tiny_params(seed=12)
        base_dir, fine_dir = str(tmp_path / "base"), str(tmp_path / "fine")
        export_bagel_checkpoint(base_dir, base, CFG)
        export_bagel_checkpoint(fine_dir, fine, CFG)
        merged = load_bagel_checkpoint(fine_dir, cfg=CFG, dtype=jnp.bfloat16,
                                       base_dir=base_dir)
        _assert_trees_equal(fine, merged)  # finetune keys win everywhere

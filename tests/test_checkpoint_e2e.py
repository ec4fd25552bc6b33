"""End-to-end checkpoint-directory test: write a synthetic released-format
checkpoint (llm_config.json / vit_config.json / ema.safetensors /
ae.safetensors / tokenizer.json), then load it through the public path
(BagelConfig.from_checkpoint_dir + load_bagel_checkpoint + load_tokenizer)
and run VQA chat + t2i through the pipeline."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.inference import InterleaveInferencer
from unimedvl_tpu.models import vae as jvae

from tests.test_weights import CFG as SMALL_CFG, synthetic_state_dict

VAE_SMALL = VAEConfig(
    resolution=32, downsample=4, ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
    z_channels=4,
)

import dataclasses

# the aux projections (vae2llm/llm2vae) must match the small VAE's latent dim
E2E_CFG = dataclasses.replace(SMALL_CFG, vae=VAE_SMALL)


def make_tokenizer_json(path):
    """Minimal byte-level BPE tokenizer.json loadable by AutoTokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders

    vocab = {chr(i + 33): i for i in range(40)}
    # BPE requires its alphabet in vocab
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[], unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.save(str(path / "tokenizer.json"))
    (path / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast"})
    )


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    path = tmp_path_factory.mktemp("ckpt")
    # configs as the released checkpoints ship them (pre-override values)
    l = SMALL_CFG.llm
    (path / "llm_config.json").write_text(json.dumps({
        "vocab_size": l.vocab_size,
        "hidden_size": l.hidden_size,
        "intermediate_size": l.intermediate_size,
        "num_hidden_layers": l.num_hidden_layers,
        "num_attention_heads": l.num_attention_heads,
        "num_key_value_heads": l.num_key_value_heads,
        "rope_theta": 10000.0,
        "tie_word_embeddings": True,  # must be overridden to False by reader
    }))
    v = SMALL_CFG.vit
    (path / "vit_config.json").write_text(json.dumps({
        "hidden_size": v.hidden_size,
        "intermediate_size": v.intermediate_size,
        # reader must drop one layer
        "num_hidden_layers": v.num_hidden_layers + 1,
        "num_attention_heads": v.num_attention_heads,
        "image_size": v.image_size,
        "patch_size": v.patch_size,
        "rope": True,  # must be forced off
    }))
    sd = synthetic_state_dict(E2E_CFG)
    save_file(sd, str(path / "ema.safetensors"))

    # VAE weights from the jax init (converted to torch-name layout)
    import torch

    vae_params = jvae.init_params(jax.random.PRNGKey(5), VAE_SMALL)

    def to_sd(prefix, p, out):
        for name, leaf in p.items():
            key = f"{prefix}.{name}" if prefix else name
            if isinstance(leaf, dict):
                if "kernel" in leaf:  # conv
                    out[key + ".weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
                    out[key + ".bias"] = np.asarray(leaf["bias"])
                elif "scale" in leaf:  # norm
                    out[key + ".weight"] = np.asarray(leaf["scale"])
                    out[key + ".bias"] = np.asarray(leaf["bias"])
                else:
                    to_sd(key, leaf, out)
            elif isinstance(leaf, list):
                for i, item in enumerate(leaf):
                    to_sd(f"{key}.{i}", item, out)
        return out

    vae_sd = {}
    to_sd("encoder", vae_params["encoder"], vae_sd)
    to_sd("decoder", vae_params["decoder"], vae_sd)
    # normalise block lists: jax uses down.[i].block list -> down.i.block.j
    save_file({k: v.astype(np.float32) for k, v in vae_sd.items()}, str(path / "ae.safetensors"))

    make_tokenizer_json(path)
    return path


class TestCheckpointE2E:
    def test_config_readers_apply_overrides(self, ckpt_dir):
        cfg = BagelConfig.from_checkpoint_dir(
            str(ckpt_dir), vae=VAE_SMALL, max_latent_size=4,
            vit_max_num_patch_per_side=4,
        )
        assert cfg.llm.tie_word_embeddings is False
        assert cfg.llm.qk_norm is True
        assert cfg.llm.layer_module == "Qwen2MoTDecoderLayer"
        assert cfg.vit.rope is False
        assert cfg.vit.num_hidden_layers == SMALL_CFG.vit.num_hidden_layers

    def test_full_load_and_inference(self, ckpt_dir):
        from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint
        from unimedvl_tpu.data.tokenizer import load_tokenizer

        cfg = BagelConfig.from_checkpoint_dir(
            str(ckpt_dir), vae=VAE_SMALL, max_latent_size=4,
            vit_max_num_patch_per_side=4,
        )
        params = load_bagel_checkpoint(str(ckpt_dir), cfg, dtype=jnp.float32)
        assert "vae" in params  # ae.safetensors picked up
        tokenizer, new_token_ids, _ = load_tokenizer(str(ckpt_dir))
        assert new_token_ids["bos_token_id"] != new_token_ids["eos_token_id"]

        inferencer = InterleaveInferencer(
            params, cfg, tokenizer, new_token_ids,
            vae_transform=ImageTransform(32, 8, 8, 1024),
            vit_transform=ImageTransform(8, 4, 2, 1024),
        )
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
        answer = inferencer.chat([img], "lesion?", max_length=6)
        assert isinstance(answer, str)

        out = inferencer(
            text="generate", understanding_output=False,
            num_timesteps=2, image_shapes=(32, 32), cfg_text_scale=2.0,
        )
        assert out["image"] is not None

"""Full-stack parity oracle against the ACTUAL reference implementation.

Instantiates the reference ``Bagel`` + ``Qwen2ForCausalLM`` + NaViT SigLIP
(tiny random config, CPU, bf16 — the production dtype) with a torch-SDPA
implementation of ``flash_attn_varlen_func`` injected, loads the identical
weights into this framework via the production converter
(weights/bagel_loader.convert_bagel), and asserts:

  * greedy token-for-token decode parity (reference bagel.py:1236-1317)
  * greedy parity with a ViT image context (bagel.py:460-615)
  * greedy parity with a VAE latent (gen-expert) context (bagel.py:617-806)
  * rectified-flow denoise closeness with text CFG (bagel.py:901-1211)

This converts "parity by construction" (self-written oracles) into "parity by
measurement" against the reference code itself. Skipped when the reference
tree is unavailable.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _install_flash_stub():
    """torch-SDPA emulation of flash_attn_varlen_func (fp32 accumulation,
    bottom-right-aligned causal masking — flash-attn's documented semantics)."""

    def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k,
                               max_seqlen_q=None, max_seqlen_k=None,
                               causal=False, **kw):
        outs = []
        n = len(cu_seqlens_q) - 1
        rep = q.shape[1] // k.shape[1]
        for i in range(n):
            qs, qe = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
            ks, ke = int(cu_seqlens_k[i]), int(cu_seqlens_k[i + 1])
            qi = q[qs:qe].transpose(0, 1).float()
            ki = k[ks:ke].repeat_interleave(rep, dim=1).transpose(0, 1).float()
            vi = v[ks:ke].repeat_interleave(rep, dim=1).transpose(0, 1).float()
            with torch.autocast(device_type="cpu", enabled=False):
                if causal:
                    Tq, Tk = qe - qs, ke - ks
                    mask = torch.tril(
                        torch.ones(Tq, Tk, dtype=torch.bool), diagonal=Tk - Tq
                    )
                    out = F.scaled_dot_product_attention(qi, ki, vi, attn_mask=mask)
                else:
                    out = F.scaled_dot_product_attention(qi, ki, vi)
            outs.append(out.transpose(0, 1).to(q.dtype))
        return torch.cat(outs, 0)

    if "flash_attn" in sys.modules:
        sys.modules["flash_attn"].flash_attn_varlen_func = flash_attn_varlen_func
    else:
        stub = types.ModuleType("flash_attn")
        stub.flash_attn_varlen_func = flash_attn_varlen_func
        stub.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
        sys.modules["flash_attn"] = stub


_install_flash_stub()
sys.path.insert(0, "/root/reference/codes")

try:
    from modeling.unimedvl.qwen2_navit import (  # noqa: E402
        NaiveCache,
        Qwen2Config,
        Qwen2ForCausalLM,
    )
    from modeling.unimedvl.siglip_navit import (  # noqa: E402
        SiglipVisionConfig,
        SiglipVisionModel,
    )
    from modeling.unimedvl.bagel import Bagel, BagelConfig as RefBagelConfig  # noqa: E402

    HAVE_REF = True
except Exception:  # pragma: no cover - reference tree not present
    HAVE_REF = False

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.imaging import ImageTransform, patchify, position_ids_extrapolate
from unimedvl_tpu.models import bagel as my_bagel
from unimedvl_tpu.models.qwen2_mot import KVCache
from unimedvl_tpu.weights.bagel_loader import convert_bagel

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")

NEW_TOKEN_IDS = dict(
    bos_token_id=290, eos_token_id=291, start_of_image=292, end_of_image=293
)

MY_CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0,
    ),
    vit=ViTConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=2, rope=False,
    ),
    vae=VAEConfig(downsample=4, z_channels=4, ch=32, ch_mult=(1, 2, 2), num_res_blocks=1),
    latent_patch_size=2, max_latent_size=8, vit_max_num_patch_per_side=16,
    timestep_shift=3.0,
)


class FakeTok:
    def encode(self, text):
        return [ord(c) % 256 for c in text]


class _VAEGeom:
    downsample = 4
    z_channels = 4


@pytest.fixture(scope="module")
def models():
    """(reference torch Bagel bf16, converted jax params bf16)."""
    torch.manual_seed(0)
    llm_config = Qwen2Config(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, qk_norm=True, tie_word_embeddings=False,
        layer_module="Qwen2MoTDecoderLayer",
    )
    vit_config = SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=2, rope=False,
    )
    ref_cfg = RefBagelConfig(
        visual_gen=True, visual_und=True,
        llm_config=llm_config, vit_config=vit_config, vae_config=_VAEGeom(),
        latent_patch_size=2, max_latent_size=8, vit_max_num_patch_per_side=16,
        timestep_shift=3.0,
    )
    llm = Qwen2ForCausalLM(llm_config)
    vit = SiglipVisionModel(vit_config)
    vit.vision_model.embeddings.convert_conv2d_to_linear(vit_config)
    ref = Bagel(llm, vit, ref_cfg)
    # Bagel._init_weights zeroes llm2vae (bagel.py:156-159), which would make
    # every velocity zero and the denoise comparison vacuous — randomize it.
    torch.nn.init.normal_(ref.llm2vae.weight, std=0.15)
    torch.nn.init.normal_(ref.llm2vae.bias, std=0.05)
    ref = ref.eval().to(torch.bfloat16)

    sd = ref.state_dict()
    params = convert_bagel(lambda k: sd[k].float().numpy(), MY_CFG, dtype=jnp.bfloat16)
    return ref, params


def _my_prefill_text(params, cache, text, pos0):
    ids = (
        [NEW_TOKEN_IDS["bos_token_id"]]
        + FakeTok().encode(text)
        + [NEW_TOKEN_IDS["eos_token_id"]]
    )
    T = len(ids)
    cache = my_bagel.prefill_text(
        params, MY_CFG, cache,
        jnp.asarray([ids], jnp.int32),
        jnp.asarray([[pos0 + i for i in range(T)]], jnp.int32),
        jnp.ones((1, T), bool),
    )
    return cache, pos0 + T


def _my_greedy(params, cache, pos, max_length):
    out, _ = my_bagel.generate_text(
        params, MY_CFG, cache,
        jnp.asarray([NEW_TOKEN_IDS["bos_token_id"]], jnp.int32),
        jnp.asarray([pos], jnp.int32),
        max_length, jnp.asarray(NEW_TOKEN_IDS["eos_token_id"], jnp.int32),
    )
    return [t for t in np.asarray(out)[0].tolist() if t >= 0]


def _ref_text_context(ref, text):
    past = NaiveCache(ref.config.llm_config.num_hidden_layers)
    gi, kvlens, ropes = ref.prepare_prompts([0], [0], [text], FakeTok(), NEW_TOKEN_IDS)
    past = ref.forward_cache_update_text(past, **gi)
    return past, kvlens, ropes


def _ref_greedy(ref, past, kvlens, ropes, max_length):
    start = ref.prepare_start_tokens(kvlens, ropes, NEW_TOKEN_IDS)
    return ref.generate_text(
        past_key_values=past, max_length=max_length, do_sample=False,
        end_token_id=NEW_TOKEN_IDS["eos_token_id"], **start,
    ).squeeze(1).tolist()


def _se():
    return jnp.asarray(
        [NEW_TOKEN_IDS["start_of_image"], NEW_TOKEN_IDS["end_of_image"]], jnp.int32
    )


class TestReferenceParity:
    def test_greedy_text_decode(self, models):
        ref, params = models
        past, kvlens, ropes = _ref_text_context(ref, "what is it")
        ref_tokens = _ref_greedy(ref, past, kvlens, ropes, 12)

        cache = KVCache.create(2, 1, 64, 2, MY_CFG.llm.head_dim, jnp.bfloat16)
        cache, pos = _my_prefill_text(params, cache, "what is it", 0)
        assert _my_greedy(params, cache, pos, 12) == ref_tokens

    def test_greedy_with_vit_context(self, models):
        ref, params = models
        rng = np.random.default_rng(3)
        from PIL import Image

        pil = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        # torchvision is unavailable here so the reference ImageTransform
        # cannot import; resize/normalize parity is covered by
        # test_imaging.py. Feed both sides the SAME preprocessed tensor.
        arr = np.asarray(ImageTransform(32, 8, 2, 1024)(pil))  # [3, H, W]

        class Shim:
            def __call__(self, img, img_num=1):
                return torch.from_numpy(arr)

        past = NaiveCache(2)
        vit_in, kvlens, ropes = ref.prepare_vit_images(
            [0], [0], [pil], Shim(), NEW_TOKEN_IDS
        )
        with torch.autocast(device_type="cpu", dtype=torch.bfloat16):
            past = ref.forward_cache_update_vit(past, **vit_in)
        gi, kvlens, ropes = ref.prepare_prompts(
            kvlens, ropes, ["what?"], FakeTok(), NEW_TOKEN_IDS
        )
        past = ref.forward_cache_update_text(past, **gi)
        ref_tokens = _ref_greedy(ref, past, kvlens, ropes, 10)

        H, W = arr.shape[1], arr.shape[2]
        ptoks = patchify(arr, 2)
        vit_pos = position_ids_extrapolate(H, W, 2, MY_CFG.vit_max_num_patch_per_side)
        cache = KVCache.create(2, 1, 256, 2, MY_CFG.llm.head_dim, jnp.bfloat16)
        cache = my_bagel.prefill_vit(
            params, MY_CFG, cache,
            jnp.asarray(ptoks, jnp.float32)[None],
            jnp.asarray(vit_pos)[None],
            _se(),
            jnp.asarray([0], jnp.int32),
        )
        cache, pos = _my_prefill_text(params, cache, "what?", 1)
        assert _my_greedy(params, cache, pos, 10) == ref_tokens

    def test_greedy_with_vae_context(self, models):
        """i2i conditioning: VAE latent tokens prefilled through the gen
        expert at timestep 0 (bagel.py:617-806). A deterministic fake VAE is
        injected on the reference side (forward_cache_update_vae takes
        vae_model as an argument) so no cross-framework sampling is needed."""
        ref, params = models
        rng = np.random.default_rng(5)
        lat_np = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)

        class FakeVAE:
            def encode(self, images):
                return torch.from_numpy(lat_np)

        class Shim:
            def __call__(self, img, img_num=1):
                return torch.zeros(3, 32, 32)

        from PIL import Image

        pil = Image.new("RGB", (32, 32))
        past = NaiveCache(2)
        vae_in, kvlens, ropes = ref.prepare_vae_images(
            [0], [0], [pil], Shim(), NEW_TOKEN_IDS, timestep=0
        )
        with torch.autocast(device_type="cpu", dtype=torch.bfloat16):
            past = ref.forward_cache_update_vae(FakeVAE(), past, **vae_in)
        gi, kvlens, ropes = ref.prepare_prompts(
            kvlens, ropes, ["edit it"], FakeTok(), NEW_TOKEN_IDS
        )
        past = ref.forward_cache_update_text(past, **gi)
        ref_tokens = _ref_greedy(ref, past, kvlens, ropes, 10)

        # same latent -> [h*w, p*p*zc] tokens with the hwpqc ordering
        z = lat_np[0].transpose(1, 2, 0)  # [8, 8, zc]
        h = w = 4
        p = 2
        zt = z.reshape(h, p, w, p, 4).transpose(0, 2, 1, 3, 4).reshape(h * w, -1)
        vae_pos = position_ids_extrapolate(32, 32, 8, MY_CFG.max_latent_size)
        cache = KVCache.create(2, 1, 64, 2, MY_CFG.llm.head_dim, jnp.bfloat16)
        cache = my_bagel.prefill_vae(
            params, MY_CFG, cache,
            jnp.asarray(zt, jnp.float32)[None],
            jnp.asarray(vae_pos)[None],
            _se(),
            jnp.asarray([0], jnp.int32),
            jnp.asarray(0.0, jnp.float32),
        )
        cache, pos = _my_prefill_text(params, cache, "edit it", 1)
        assert _my_greedy(params, cache, pos, 10) == ref_tokens

    def test_denoise_with_text_cfg(self, models):
        """Rectified-flow loop, 3 timesteps, text CFG 2.0, global renorm —
        final latents must agree to bf16 accumulation tolerance."""
        ref, params = models
        past, kvlens, ropes = _ref_text_context(ref, "a cat")
        cfg_text_past = NaiveCache(2)  # empty pre-text context

        torch.manual_seed(7)
        vae_input = ref.prepare_vae_latent(kvlens, ropes, [(32, 32)], NEW_TOKEN_IDS)
        cfg_input = ref.prepare_vae_latent_cfg([0], [0], [(32, 32)])
        with torch.autocast(device_type="cpu", dtype=torch.bfloat16):
            ref_lat = ref.generate_image(
                past_key_values=past,
                num_timesteps=3,
                timestep_shift=3.0,
                cfg_text_scale=2.0,
                cfg_img_scale=1.0,
                cfg_interval=[0.0, 1.0],
                cfg_renorm_min=0.0,
                cfg_renorm_type="global",
                cfg_text_past_key_values=cfg_text_past,
                cfg_text_packed_query_indexes=cfg_input["cfg_packed_query_indexes"],
                cfg_text_packed_position_ids=cfg_input["cfg_packed_position_ids"],
                cfg_text_key_values_lens=cfg_input["cfg_key_values_lens"],
                cfg_text_packed_key_value_indexes=cfg_input["cfg_packed_key_value_indexes"],
                **vae_input,
            )[0].float().numpy()

        cap = 64
        cacheA = KVCache.create(2, 1, cap, 2, MY_CFG.llm.head_dim, jnp.bfloat16)
        cacheA, posA = _my_prefill_text(params, cacheA, "a cat", 0)
        cacheB = KVCache.create(2, 1, cap, 2, MY_CFG.llm.head_dim, jnp.bfloat16)
        stacked = KVCache(
            k=jnp.concatenate([cacheA.k, cacheB.k], axis=1),
            v=jnp.concatenate([cacheA.v, cacheB.v], axis=1),
            lens=jnp.concatenate([cacheA.lens, cacheB.lens]),
        )
        my_lat = my_bagel.generate_latents(
            params, MY_CFG, stacked,
            jnp.asarray([posA, 0], jnp.int32),
            jnp.asarray(vae_input["packed_vae_position_ids"].numpy()),
            jnp.asarray(vae_input["packed_init_noises"].numpy()),
            _se(),
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.0, cfg_interval=(0.0, 1.0),
            cfg_renorm_min=0.0, cfg_renorm_type="global",
            use_text_cfg=True, use_img_cfg=False,
        )
        my_lat = np.asarray(my_lat, dtype=np.float32)
        err = np.abs(my_lat - ref_lat).max()
        scale = np.abs(ref_lat).mean()
        assert err <= 0.08, (err, scale)  # observed ~0.027 at scale ~1.0


MOE_CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, layer_module="Qwen2MoEDecoderLayer",
    ),
    vit=MY_CFG.vit, vae=MY_CFG.vae,
    latent_patch_size=2, max_latent_size=8, vit_max_num_patch_per_side=16,
    timestep_shift=3.0,
)


def _patch_reference_packed_attention_typo():
    """The reference's PackedAttention.forward_inference (used by the MoE and
    dense layer variants, NOT by MoT) ends in ``return packed_attn_output,
    past_keye_values`` — a NameError TYPO (qwen2_navit.py:386) that makes MoE
    and dense INFERENCE unrunnable upstream. Recompile that one function
    in-memory with the token fixed so a behavioral comparison is possible;
    the reference tree on disk is untouched."""
    import inspect
    import textwrap

    from modeling.unimedvl import qwen2_navit as ref_mod
    from modeling.unimedvl.qwen2_navit import PackedAttention

    src = inspect.getsource(PackedAttention.forward_inference)
    if "past_keye_values" not in src:  # upstream fixed it
        return
    src = textwrap.dedent(src).replace("past_keye_values", "past_key_values")
    loc = {}
    exec(compile(src, "<typo-patched qwen2_navit.py:386>", "exec"),
         vars(ref_mod), loc)
    PackedAttention.forward_inference = loc["forward_inference"]


@pytest.fixture(scope="module")
def models_moe():
    """Qwen2MoEDecoderLayer (qwen2_navit.py:905-1004): SHARED attention,
    per-expert MLP only — dead for released checkpoints (all MoT) but part of
    the reference's layer_module surface; this pins the inference-side
    routing (mode == "gen" splits MLP by text/vae rows, mode == "und" runs
    the und MLP on everything)."""
    _patch_reference_packed_attention_typo()
    torch.manual_seed(1)
    llm_config = Qwen2Config(
        vocab_size=300, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, qk_norm=True, tie_word_embeddings=False,
        layer_module="Qwen2MoEDecoderLayer",
    )
    vit_config = SiglipVisionConfig(
        hidden_size=24, intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=2, rope=False,
    )
    ref_cfg = RefBagelConfig(
        visual_gen=True, visual_und=True,
        llm_config=llm_config, vit_config=vit_config, vae_config=_VAEGeom(),
        latent_patch_size=2, max_latent_size=8, vit_max_num_patch_per_side=16,
        timestep_shift=3.0,
    )
    llm = Qwen2ForCausalLM(llm_config)
    vit = SiglipVisionModel(vit_config)
    vit.vision_model.embeddings.convert_conv2d_to_linear(vit_config)
    ref = Bagel(llm, vit, ref_cfg)
    torch.nn.init.normal_(ref.llm2vae.weight, std=0.15)
    torch.nn.init.normal_(ref.llm2vae.bias, std=0.05)
    ref = ref.eval().to(torch.bfloat16)
    sd = ref.state_dict()
    params = convert_bagel(lambda k: sd[k].float().numpy(), MOE_CFG,
                           dtype=jnp.bfloat16)
    return ref, params


class TestMoEInferenceParity:
    """Inference parity for the use_moe-and-not-mot_attention layer variant
    (previously only train-side tested — PARITY.md caveat)."""

    def test_greedy_text_decode(self, models_moe):
        ref, params = models_moe
        past, kvlens, ropes = _ref_text_context(ref, "what is it")
        ref_tokens = _ref_greedy(ref, past, kvlens, ropes, 12)

        cache = KVCache.create(2, 1, 64, 2, MOE_CFG.llm.head_dim, jnp.bfloat16)
        ids = ([NEW_TOKEN_IDS["bos_token_id"]] + FakeTok().encode("what is it")
               + [NEW_TOKEN_IDS["eos_token_id"]])
        cache = my_bagel.prefill_text(
            params, MOE_CFG, cache, jnp.asarray([ids], jnp.int32),
            jnp.asarray([list(range(len(ids)))], jnp.int32),
            jnp.ones((1, len(ids)), bool),
        )
        out, _ = my_bagel.generate_text(
            params, MOE_CFG, cache,
            jnp.asarray([NEW_TOKEN_IDS["bos_token_id"]], jnp.int32),
            jnp.asarray([len(ids)], jnp.int32),
            12, jnp.asarray(NEW_TOKEN_IDS["eos_token_id"], jnp.int32),
        )
        mine = [t for t in np.asarray(out)[0].tolist() if t >= 0]
        assert mine == ref_tokens

    def test_denoise_with_text_cfg(self, models_moe):
        """gen-mode MLP routing (text rows -> und MLP, vae rows -> gen MLP)
        through the shared-attention layer over a 3-step CFG denoise."""
        ref, params = models_moe
        past = NaiveCache(2)
        gi, kvlens, ropes = ref.prepare_prompts(
            [0], [0], ["a cat"], FakeTok(), NEW_TOKEN_IDS)
        past = ref.forward_cache_update_text(past, **gi)
        cfg_text_past = NaiveCache(2)

        torch.manual_seed(9)
        vae_input = ref.prepare_vae_latent(kvlens, ropes, [(32, 32)],
                                           NEW_TOKEN_IDS)
        cfg_input = ref.prepare_vae_latent_cfg([0], [0], [(32, 32)])
        with torch.autocast(device_type="cpu", dtype=torch.bfloat16):
            ref_lat = ref.generate_image(
                past_key_values=past,
                num_timesteps=3, timestep_shift=3.0,
                cfg_text_scale=2.0, cfg_img_scale=1.0,
                cfg_interval=[0.0, 1.0], cfg_renorm_min=0.0,
                cfg_renorm_type="global",
                cfg_text_past_key_values=cfg_text_past,
                cfg_text_packed_query_indexes=cfg_input["cfg_packed_query_indexes"],
                cfg_text_packed_position_ids=cfg_input["cfg_packed_position_ids"],
                cfg_text_key_values_lens=cfg_input["cfg_key_values_lens"],
                cfg_text_packed_key_value_indexes=cfg_input["cfg_packed_key_value_indexes"],
                **vae_input,
            )[0].float().numpy()

        cap = 64
        cacheA = KVCache.create(2, 1, cap, 2, MOE_CFG.llm.head_dim, jnp.bfloat16)
        ids = ([NEW_TOKEN_IDS["bos_token_id"]] + FakeTok().encode("a cat")
               + [NEW_TOKEN_IDS["eos_token_id"]])
        cacheA = my_bagel.prefill_text(
            params, MOE_CFG, cacheA, jnp.asarray([ids], jnp.int32),
            jnp.asarray([list(range(len(ids)))], jnp.int32),
            jnp.ones((1, len(ids)), bool),
        )
        cacheB = KVCache.create(2, 1, cap, 2, MOE_CFG.llm.head_dim, jnp.bfloat16)
        stacked = KVCache(
            k=jnp.concatenate([cacheA.k, cacheB.k], axis=1),
            v=jnp.concatenate([cacheA.v, cacheB.v], axis=1),
            lens=jnp.concatenate([cacheA.lens, cacheB.lens]),
        )
        my_lat = my_bagel.generate_latents(
            params, MOE_CFG, stacked,
            jnp.asarray([len(ids), 0], jnp.int32),
            jnp.asarray(vae_input["packed_vae_position_ids"].numpy()),
            jnp.asarray(vae_input["packed_init_noises"].numpy()),
            _se(),
            num_timesteps=3, timestep_shift=3.0,
            cfg_text_scale=2.0, cfg_img_scale=1.0, cfg_interval=(0.0, 1.0),
            cfg_renorm_min=0.0, cfg_renorm_type="global",
            use_text_cfg=True, use_img_cfg=False,
        )
        my_lat = np.asarray(my_lat, dtype=np.float32)
        err = np.abs(my_lat - ref_lat).max()
        assert err <= 0.08, (err, np.abs(ref_lat).mean())

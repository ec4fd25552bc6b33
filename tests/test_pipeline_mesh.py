"""Multi-chip inference as a PRODUCT feature: InterleaveInferencer(mesh=...)
must produce identical outputs to the single-device pipeline — TP decode on a
(2, 4) mesh and CFG-stream-parallel t2i on a (3, 2) mesh (the production
multi-chip denoise layout: 3 CFG streams over "data", TP within groups).
"""

import numpy as np
import jax
import pytest
from PIL import Image

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.data.tokenizer import add_special_tokens
from unimedvl_tpu.inference import InterleaveInferencer
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel import create_mesh

from tests.test_pipeline import FakeTokenizer, TINY


def _make(mesh=None, seed=0, **kw):
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    tok = FakeTokenizer()
    tok, new_token_ids, _ = add_special_tokens(tok)
    return InterleaveInferencer(
        params, TINY, tok, new_token_ids,
        vae_transform=ImageTransform(32, 8, 8, 1024),
        vit_transform=ImageTransform(32, 8, 2, 1024),
        seed=seed,
        mesh=mesh,
        **kw,
    )


def _image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))


@pytest.fixture(scope="module")
def single():
    return _make()


class TestMeshPipeline:
    def test_chat_parity_tp_mesh(self, single):
        mesh = create_mesh((2, 4))
        sharded = _make(mesh=mesh)
        want = single.chat([_image()], "what is this?", max_length=8)
        got = sharded.chat([_image()], "what is this?", max_length=8)
        assert got == want

    def test_spec_decode_chat_parity_tp_mesh(self, single):
        """Speculative decode under a TP mesh (sharded params + kv cache):
        same answer as the unsharded plain decode."""
        mesh = create_mesh((2, 4))
        sharded = _make(mesh=mesh, spec_decode=True, spec_k=4)
        want = single.chat([_image()], "what is this?", max_length=8)
        got = sharded.chat([_image()], "what is this?", max_length=8)
        assert got == want

    def test_t2i_parity_stream_mesh(self, single):
        """3 CFG streams over data=3 x TP=2 — the multi-chip denoise layout."""
        devices = jax.devices()[:6]
        mesh = create_mesh((3, 2), devices=devices)
        sharded = _make(mesh=mesh, seed=3)
        single3 = _make(seed=3)  # same rng stream for identical init noise

        kwargs = dict(
            text="a tiny image",
            image_shapes=(16, 16),
            num_timesteps=3,
            cfg_text_scale=2.0,
            cfg_img_scale=1.5,
            cfg_interval=(0.0, 1.0),
            cfg_renorm_type="global",
        )
        want = single3(**kwargs)["image"]
        got = sharded(**kwargs)["image"]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1.0
        )

    def test_t2i_latent_parity_stream_mesh(self, single):
        """rtol-level parity on the DENOISED LATENTS (not just the uint8
        image round-trip, which can hide divergence below atol=1)."""
        devices = jax.devices()[:6]
        mesh = create_mesh((3, 2), devices=devices)
        sharded = _make(mesh=mesh, seed=11)
        single11 = _make(seed=11)

        def latent(inf):
            # mirror interleave_inference's t2i recipe at the latent level
            gen = inf.init_gen_context()
            cfg_img = gen.fork()
            cfg_text = gen.fork()
            gen = inf.update_context_text("a tiny image", gen)
            cfg_img = inf.update_context_text("a tiny image", cfg_img)
            return np.asarray(
                inf.gen_image_latent(
                    (16, 16), gen,
                    cfg_text_precontext=cfg_text,
                    cfg_img_precontext=cfg_img,
                    cfg_text_scale=2.0, cfg_img_scale=1.5,
                    cfg_interval=(0.0, 1.0),
                    cfg_renorm_type="global",
                    num_timesteps=3,
                ),
                np.float32,
            )

        want = latent(single11)
        got = latent(sharded)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_t2i_latent_parity_sp_mesh(self, single):
        """InterleaveInferencer(sp_mesh=...): the TP×SP denoise layout
        (docs/MULTICHIP_DENOISE.md) as a product path — latent parity vs the
        single-device pipeline."""
        from jax.sharding import Mesh

        devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
        sp_mesh = Mesh(devices, ("model", "seq"))
        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        tok, new_token_ids, _ = add_special_tokens(FakeTokenizer())
        sharded = InterleaveInferencer(
            params, TINY, tok, new_token_ids,
            vae_transform=ImageTransform(32, 8, 8, 1024),
            vit_transform=ImageTransform(32, 8, 2, 1024),
            seed=21, sp_mesh=sp_mesh,
        )
        single21 = _make(seed=21)

        def latent(inf):
            gen = inf.init_gen_context()
            cfg_img = gen.fork()
            cfg_text = gen.fork()
            gen = inf.update_context_text("a tiny image", gen)
            cfg_img = inf.update_context_text("a tiny image", cfg_img)
            return np.asarray(
                inf.gen_image_latent(
                    (16, 16), gen,
                    cfg_text_precontext=cfg_text,
                    cfg_img_precontext=cfg_img,
                    cfg_text_scale=2.0, cfg_img_scale=1.5,
                    cfg_interval=(0.0, 1.0),
                    cfg_renorm_type="global",
                    num_timesteps=3,
                ),
                np.float32,
            )

        want = latent(single21)
        got = latent(sharded)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_int8_fused_params_tp_mesh(self):
        """int8 + fused serving weights PLACE and run under the TP mesh (the
        production multi-chip serving mode): same answer as the identical
        int8+fused tree on one device. bagel_param_specs builds layer specs
        from the actual tree, so quantized/fused layouts shard correctly."""
        from unimedvl_tpu.quant import fuse_serving_projections, quantize_llm_params

        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        q = dict(params)
        q["llm"] = fuse_serving_projections(quantize_llm_params(params["llm"]))
        tok, ids, _ = add_special_tokens(FakeTokenizer())

        def make(mesh):
            return InterleaveInferencer(
                q, TINY, tok, ids,
                vae_transform=ImageTransform(32, 8, 8, 1024),
                vit_transform=ImageTransform(32, 8, 2, 1024),
                seed=0, mesh=mesh,
            )

        want = make(None).chat([_image()], "what is this?", max_length=8)
        got = make(create_mesh((2, 4))).chat(
            [_image()], "what is this?", max_length=8
        )
        assert got == want
        # int8 per-column scale leaves really sharded over "model"
        sharded = make(create_mesh((2, 4)))
        lay = sharded.params["llm"]["layers"]
        sc = lay["mlp"]["gate_up"]["scale"]
        assert sc.sharding.shard_shape(sc.shape)[1] * 4 == sc.shape[1]

    def test_sp_mesh_with_tp_fused_params(self, single):
        """ONE tp-interleaved fused tree (quant.fuse_serving_projections
        (tp=2)) serves the whole pipeline: chat runs the global-view
        de-interleave path, t2i runs the manual-TP sp_denoise fused path —
        both matching the unfused single-device pipeline."""
        from jax.sharding import Mesh
        from unimedvl_tpu.quant import fuse_serving_projections

        devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
        sp_mesh = Mesh(devices, ("model", "seq"))
        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        params = dict(params)
        params["llm"] = fuse_serving_projections(params["llm"], tp=2)
        tok, new_token_ids, _ = add_special_tokens(FakeTokenizer())
        fused_inf = InterleaveInferencer(
            params, TINY, tok, new_token_ids,
            vae_transform=ImageTransform(32, 8, 8, 1024),
            vit_transform=ImageTransform(32, 8, 2, 1024),
            seed=21, sp_mesh=sp_mesh,
        )
        single21 = _make(seed=21)

        # chat: global-view forward must de-interleave exactly
        want_txt = single21.chat([_image()], "what is this?", max_length=8)
        got_txt = fused_inf.chat([_image()], "what is this?", max_length=8)
        assert got_txt == want_txt

        def latent(inf):
            gen = inf.init_gen_context()
            cfg_img = gen.fork()
            cfg_text = gen.fork()
            gen = inf.update_context_text("a tiny image", gen)
            cfg_img = inf.update_context_text("a tiny image", cfg_img)
            return np.asarray(
                inf.gen_image_latent(
                    (16, 16), gen,
                    cfg_text_precontext=cfg_text,
                    cfg_img_precontext=cfg_img,
                    cfg_text_scale=2.0, cfg_img_scale=1.5,
                    cfg_interval=(0.0, 1.0),
                    cfg_renorm_type="global",
                    num_timesteps=3,
                ),
                np.float32,
            )

        want = latent(single21)
        got = latent(fused_inf)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_i2i_latent_parity_tp_mesh(self, single):
        mesh = create_mesh((2, 4))
        sharded = _make(mesh=mesh, seed=13)
        single13 = _make(seed=13)

        def latent(inf):
            gen = inf.init_gen_context()
            cfg_img = gen.fork()
            img = inf.vae_transform.resize_transform(_image().convert("RGB"))
            gen = inf.update_context_image(img, gen, vae=True, vit=True)
            cfg_text = gen.fork()
            gen = inf.update_context_text("edit this", gen)
            cfg_img = inf.update_context_text("edit this", cfg_img)
            return np.asarray(
                inf.gen_image_latent(
                    (16, 16), gen,
                    cfg_text_precontext=cfg_text,
                    cfg_img_precontext=cfg_img,
                    cfg_text_scale=2.0, cfg_img_scale=2.0,
                    cfg_interval=(0.0, 1.0),
                    cfg_renorm_type="text_channel",
                    num_timesteps=3,
                ),
                np.float32,
            )

        want = latent(single13)
        got = latent(sharded)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_i2i_parity_tp_mesh(self, single):
        mesh = create_mesh((2, 4))
        sharded = _make(mesh=mesh, seed=7)
        single7 = _make(seed=7)
        kwargs = dict(
            image=_image(),
            text="edit this",
            image_shapes=(16, 16),
            num_timesteps=3,
            cfg_text_scale=2.0,
            cfg_img_scale=2.0,
            cfg_interval=(0.0, 1.0),
            cfg_renorm_type="text_channel",
        )
        want = single7(**kwargs)["image"]
        got = sharded(**kwargs)["image"]
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1.0
        )

"""End-to-end pipeline tests with a tiny random model: VQA chat, text->image,
image->image, decode-loop equivalence, context forking, determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.inference import InterleaveInferencer
from unimedvl_tpu.models import bagel, qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache


class FakeTokenizer:
    """Byte-level fake tokenizer: char -> id. ids 0-255 chars; specials 256+."""

    def __init__(self):
        self.specials = {}
        self.special_tokens_map = {}

    def add_tokens(self, tokens):
        for t in tokens:
            if t not in self.specials:
                self.specials[t] = 256 + len(self.specials)
        return len(tokens)

    def convert_tokens_to_ids(self, tok):
        return self.specials[tok]

    def encode(self, text):
        return [ord(c) % 256 for c in text]

    def decode(self, ids):
        inv = {v: k for k, v in self.specials.items()}
        return "".join(inv.get(i, chr(i)) for i in ids)


TINY = BagelConfig(
    llm=LLMConfig(
        vocab_size=300,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    ),
    vit=ViTConfig(
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=2,
        rope=False,
    ),
    vae=VAEConfig(
        resolution=32,
        downsample=4,
        ch=32,
        ch_mult=(1, 2, 2),
        num_res_blocks=1,
        z_channels=4,
    ),
    latent_patch_size=2,
    max_latent_size=8,
    vit_max_num_patch_per_side=16,
)


@pytest.fixture(scope="module")
def inferencer():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    tok = FakeTokenizer()
    from unimedvl_tpu.data.tokenizer import add_special_tokens

    tok, new_token_ids, _ = add_special_tokens(tok)
    return InterleaveInferencer(
        params,
        TINY,
        tok,
        new_token_ids,
        vae_transform=ImageTransform(32, 8, 8, 1024),
        vit_transform=ImageTransform(32, 8, 2, 1024),
        seed=0,
    )


def _image():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))


class TestPipeline:
    def test_chat_vqa(self, inferencer):
        out = inferencer.chat([_image()], "what is this?", max_length=8)
        assert isinstance(out, str)

    def test_decode_loop_matches_manual(self, inferencer):
        """The jitted while_loop decode == a manual per-token Python loop."""
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text("hello", ctx)
        max_len = 6
        ctx2 = inferencer._ensure_capacity(ctx, max_len + 1)
        bos = inferencer.new_token_ids["bos_token_id"]
        eos = inferencer.new_token_ids["eos_token_id"]
        out, lengths = bagel.generate_text(
            inferencer.params, TINY, ctx2.cache,
            jnp.asarray([bos], jnp.int32), jnp.asarray([ctx2.rope], jnp.int32),
            max_len, jnp.asarray(eos, jnp.int32), False, 1.0,
            jax.random.PRNGKey(1),
        )
        got = np.asarray(out[0])
        got = got[got >= 0].tolist()

        # manual loop
        cache = ctx2.cache
        cur = bos
        pos = ctx2.rope
        manual = []
        for _ in range(max_len):
            manual.append(cur)
            x = mot.embed_tokens(inferencer.params["llm"], jnp.asarray([[cur]]))
            h, cache = mot.forward(
                inferencer.params["llm"], TINY.llm, x,
                jnp.asarray([[pos]]), cache, ForwardSpec("und", True, True),
            )
            logits = mot.lm_head(inferencer.params["llm"], h[:, 0])
            cur = int(jnp.argmax(logits, axis=-1)[0])
            pos += 1
            if cur == eos:
                break
        assert got == manual

    def test_generate_text_ctx_cache_matches_prefill(self, inferencer):
        """Contiguous-cache decode (generate_text_ctx) must leave the cache
        EXACTLY as if the emitted tokens had been prefilled: the kept-context
        multi-turn chat rests on this equivalence (reference keeps its cache,
        bagel.py:1259-1314)."""
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text("hello", ctx)
        max_len = 6
        ctx2 = inferencer._ensure_capacity(ctx, max_len + 1)
        bos = inferencer.new_token_ids["bos_token_id"]
        eos = inferencer.new_token_ids["eos_token_id"]
        out, lengths, cache = bagel.generate_text_ctx(
            inferencer.params, TINY, ctx2.cache,
            jnp.asarray([bos], jnp.int32), jnp.asarray([ctx2.rope], jnp.int32),
            max_len, jnp.asarray(eos, jnp.int32), False, 1.0,
            jax.random.PRNGKey(1),
        )
        # same greedy tokens as the aligned-column variant
        out_ac, lengths_ac = bagel.generate_text(
            inferencer.params, TINY, ctx2.cache,
            jnp.asarray([bos], jnp.int32), jnp.asarray([ctx2.rope], jnp.int32),
            max_len, jnp.asarray(eos, jnp.int32), False, 1.0,
            jax.random.PRNGKey(1),
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ac))

        n = int(lengths[0])
        ids = np.asarray(out[0])[:n]
        assert int(cache.lens[0]) == int(ctx2.cache.lens[0]) + n
        # oracle: prefill the emitted ids into a fork of the pre-decode cache
        T_pad = ids.shape[0]
        want = bagel.prefill_text(
            inferencer.params, TINY, ctx2.cache,
            jnp.asarray(ids)[None],
            jnp.arange(ctx2.rope, ctx2.rope + n, dtype=jnp.int32)[None],
            jnp.ones((1, T_pad), bool),
        )
        total = int(want.lens[0])
        np.testing.assert_allclose(
            np.asarray(cache.k[:, 0, :, :total], dtype=np.float32),
            np.asarray(want.k[:, 0, :, :total], dtype=np.float32),
            rtol=2e-4, atol=2e-5,
        )

    def test_generate_text_ctx_multistream_lens(self, inferencer):
        """Streams finishing at different steps advance lens independently
        (q_valid masking of done streams)."""
        bos = inferencer.new_token_ids["bos_token_id"]
        ctx_a = inferencer.update_context_text("aa", inferencer.init_gen_context())
        ctx_b = inferencer.update_context_text("bbbb", inferencer.init_gen_context())
        cache, positions = inferencer._stack_contexts([ctx_a, ctx_b])
        max_len = 5
        out, lengths, cache2 = bagel.generate_text_ctx(
            inferencer.params, TINY, cache,
            jnp.asarray([bos, bos], jnp.int32), positions,
            max_len, jnp.asarray(10**9, jnp.int32),  # eos never fires
        )
        np.testing.assert_array_equal(
            np.asarray(cache2.lens), np.asarray(cache.lens) + np.asarray(lengths)
        )

    def test_chat_turn_multi_turn_keeps_context(self, inferencer):
        """Turn 2 prefills ONLY the new user text: kv_len grows by exactly
        answer_1 tokens + turn-2 prompt tokens (+bos/eos), and answers are
        deterministic strings."""
        a1, ctx = inferencer.chat_turn(None, "first question")
        kv_after_1 = ctx.kv_len
        assert int(ctx.cache.lens[0]) == kv_after_1
        prompt2 = "second question"
        a2, ctx2 = inferencer.chat_turn(ctx, prompt2)
        n_prompt2 = len(inferencer._encode_prompt(prompt2))
        n_answer2 = int(ctx2.cache.lens[0]) - kv_after_1 - n_prompt2
        assert n_answer2 >= 1  # start token at minimum
        assert ctx2.kv_len == int(ctx2.cache.lens[0])
        assert isinstance(a1, str) and isinstance(a2, str)

    def test_spec_decode_pipeline_parity(self, inferencer):
        """spec_decode=True must produce the identical greedy chat answers
        AND identical kept-context bookkeeping across turns (greedy-exact
        speculative decode, models/bagel.py::generate_text_spec)."""
        from unimedvl_tpu.data.tokenizer import add_special_tokens

        tok, new_token_ids, _ = add_special_tokens(FakeTokenizer())
        spec_inf = InterleaveInferencer(
            inferencer.params, TINY, tok, new_token_ids,
            vae_transform=ImageTransform(32, 8, 8, 1024),
            vit_transform=ImageTransform(32, 8, 2, 1024),
            seed=0, spec_decode=True, spec_k=4,
        )
        a1, ctx1 = inferencer.chat_turn(None, "first question")
        b1, sctx1 = spec_inf.chat_turn(None, "first question")
        assert a1 == b1
        assert int(sctx1.cache.lens[0]) == int(ctx1.cache.lens[0])
        assert sctx1.kv_len == ctx1.kv_len and sctx1.rope == ctx1.rope
        a2, ctx2 = inferencer.chat_turn(ctx1, "second question")
        b2, sctx2 = spec_inf.chat_turn(sctx1, "second question")
        assert a2 == b2
        assert int(sctx2.cache.lens[0]) == int(ctx2.cache.lens[0])
        # VQA one-shot (image context flows through hist bookkeeping)
        va = inferencer.chat([_image()], "what is this?", max_length=8)
        vb = spec_inf.chat([_image()], "what is this?", max_length=8)
        assert va == vb

    def test_gen_text_stream_matches_gen_text(self, inferencer):
        """Streaming decode: concatenated chunks == the one-shot greedy
        answer, for both a chunk smaller and larger than the answer."""
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text("hello streaming", ctx)
        want = inferencer.gen_text(ctx, max_length=9, do_sample=False)
        for chunk in (2, 32):
            got = "".join(
                inferencer.gen_text_stream(ctx, max_length=9, chunk=chunk)
            )
            assert got == want, (chunk, got, want)

    @pytest.mark.parametrize("spec", [False, True])
    def test_gen_text_stream_kept_context(self, inferencer, spec):
        """Streaming with result= returns the SAME kept context as
        gen_text(return_ctx=True): lens, rope, kv content — the streaming
        multi-turn chat contract (plain and speculative chunks)."""
        from unimedvl_tpu.data.tokenizer import add_special_tokens

        inf = inferencer
        if spec:
            tok, ids_map, _ = add_special_tokens(FakeTokenizer())
            inf = InterleaveInferencer(
                inferencer.params, TINY, tok, ids_map,
                vae_transform=ImageTransform(32, 8, 8, 1024),
                vit_transform=ImageTransform(32, 8, 2, 1024),
                seed=0, spec_decode=True, spec_k=3,
            )
        ctx = inf.init_gen_context()
        ctx = inf.update_context_text("stream and keep", ctx)
        want_txt, want_ctx = inf.gen_text(ctx, max_length=7, return_ctx=True)
        res = {}
        got_txt = "".join(
            inf.gen_text_stream(ctx, max_length=7, chunk=2, result=res)
        )
        assert got_txt == want_txt == res["text"]
        got_ctx = res["ctx"]
        assert got_ctx.kv_len == want_ctx.kv_len
        assert got_ctx.rope == want_ctx.rope
        assert got_ctx.hist == want_ctx.hist
        n = int(want_ctx.cache.lens[0])
        assert int(got_ctx.cache.lens[0]) == n
        np.testing.assert_allclose(
            np.asarray(got_ctx.cache.k[:, 0, :, :n], np.float32),
            np.asarray(want_ctx.cache.k[:, 0, :, :n], np.float32),
            rtol=1e-5, atol=1e-6,
        )
        # turn 2 continues from the streamed context identically
        a2, _ = inf.chat_turn(want_ctx, "follow up")
        b2, _ = inf.chat_turn(got_ctx, "follow up")
        assert a2 == b2

    def test_gen_image_shapes_and_determinism(self, inferencer):
        out1 = inferencer.interleave_inference(
            ["a chest x-ray"], understanding_output=False,
            num_timesteps=3, image_shapes=(32, 32),
            cfg_text_scale=2.0, cfg_img_scale=1.5,
        )
        assert isinstance(out1[-1], Image.Image)
        assert out1[-1].size == (32, 32)

    def test_image_editing_flow(self, inferencer):
        """image + text -> image (i2i with dual CFG contexts)."""
        out = inferencer.interleave_inference(
            [_image(), "make it brighter"],
            understanding_output=False,
            num_timesteps=2, image_shapes=(32, 32),
            cfg_text_scale=2.0, cfg_img_scale=2.0,
        )
        assert isinstance(out[-1], Image.Image)

    def test_multi_image_interleaved(self, inferencer):
        """Two conditioning images + instruction -> image (SURVEY §3.3 flow:
        each input runs VAE(+ViT) context updates, dual CFG contexts)."""
        rng = np.random.default_rng(5)
        img2 = Image.fromarray(rng.integers(0, 255, (20, 24, 3), dtype=np.uint8))
        out = inferencer.interleave_inference(
            [_image(), img2, "merge the two scans"],
            understanding_output=False,
            num_timesteps=2, image_shapes=(32, 32),
            cfg_text_scale=2.0, cfg_img_scale=1.5,
        )
        assert isinstance(out[-1], Image.Image)

    def test_multi_image_chat(self, inferencer):
        rng = np.random.default_rng(6)
        img2 = Image.fromarray(rng.integers(0, 255, (16, 20, 3), dtype=np.uint8))
        answer = inferencer.chat([_image(), img2], "compare", max_length=5)
        assert isinstance(answer, str)

    def test_understanding_call_api(self, inferencer):
        out = inferencer(image=_image(), text="what?", understanding_output=True,
                         max_think_token_n=5)
        assert out["text"] is not None

    def test_bucketed_vit_prefill_matches_exact(self, inferencer):
        """Shape-bucketed image prefill must produce the same cache contents
        as the exact-shape program (padding masked + overwritten)."""
        from unimedvl_tpu.data.imaging import patchify, position_ids_extrapolate

        img = _image()
        ctx = inferencer.update_context_image(
            img, inferencer.init_gen_context(), vae=False, vit=True
        )

        resized = inferencer.vit_transform.resize_transform(img)
        arr = np.asarray(resized, dtype=np.uint8)
        H, W = arr.shape[:2]
        p = TINY.vit.patch_size
        tokens = bagel.preprocess_vit_image(TINY, jnp.asarray(arr))
        pos = position_ids_extrapolate(H, W, p, TINY.vit_max_num_patch_per_side)
        exact = bagel.prefill_vit(
            inferencer.params, TINY, inferencer.init_gen_context().cache,
            tokens, jnp.asarray(pos)[None],
            inferencer._start_end(), jnp.asarray([0], jnp.int32),
        )
        n_total = tokens.shape[1] + 2
        assert int(ctx.cache.lens[0]) == int(exact.lens[0]) == n_total
        np.testing.assert_allclose(
            np.asarray(ctx.cache.k[:, 0, :, :n_total], dtype=np.float32),
            np.asarray(exact.k[:, 0, :, :n_total], dtype=np.float32),
            rtol=1e-5, atol=1e-5,
        )

    def test_image_rope_bookkeeping(self, inferencer):
        """Images consume ONE rope position but n+2 kv slots
        (bagel.py:501-504 — the critical parity detail)."""
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_image(_image(), ctx, vae=False, vit=True)
        assert ctx.rope == 1
        assert ctx.kv_len > 3  # n image tokens + start/end
        kv_after_image = ctx.kv_len
        ctx = inferencer.update_context_text("hi", ctx)
        # text advances rope by len([bos] + ids + [eos])
        n_text = len(inferencer._encode_prompt("hi"))
        assert ctx.rope == 1 + n_text
        assert ctx.kv_len == kv_after_image + n_text
        assert int(ctx.cache.lens[0]) == ctx.kv_len

    def test_context_fork_is_isolated(self, inferencer):
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text("base", ctx)
        fork = ctx.fork()
        ctx2 = inferencer.update_context_text("more", ctx)
        assert fork.kv_len == ctx.kv_len
        assert ctx2.kv_len > fork.kv_len
        # fork's cache lens unchanged
        assert int(fork.cache.lens[0]) == fork.kv_len

    def test_cache_growth(self, inferencer):
        ctx = inferencer.init_gen_context(capacity=8)
        long_text = "x" * 40
        ctx = inferencer.update_context_text(long_text, ctx)
        assert ctx.cache.capacity >= ctx.kv_len

    def test_vqa_reconstruction_ver1(self, inferencer):
        out = inferencer.interleave_inference_for_vqa_reconstruction_ver1(
            [_image(), "what is shown?"],
            reconstruct_image=True,
            max_think_token_n=4,
            num_timesteps=2,
        )
        assert isinstance(out[0], str)
        assert isinstance(out[1], Image.Image)

    def test_vqa_reconstruction_ver0(self, inferencer):
        out = inferencer.interleave_inference_for_vqa_reconstruction_ver0(
            [_image(), "describe"],
            reconstruct_image=True,
            max_think_token_n=4,
            num_timesteps=2,
        )
        assert isinstance(out[0], str)
        assert isinstance(out[1], Image.Image)

    def test_seeded_determinism(self):
        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        tok = FakeTokenizer()
        from unimedvl_tpu.data.tokenizer import add_special_tokens

        tok, ids, _ = add_special_tokens(tok)

        def run():
            inf = InterleaveInferencer(
                params, TINY, tok, ids,
                vae_transform=ImageTransform(32, 8, 8, 1024),
                vit_transform=ImageTransform(32, 8, 2, 1024),
                seed=7,
            )
            out = inf.interleave_inference(
                ["mri scan"], understanding_output=False,
                num_timesteps=2, image_shapes=(32, 32),
                cfg_text_scale=2.0,
            )
            return np.asarray(out[-1])

        a, b = run(), run()
        np.testing.assert_array_equal(a, b)


class TestGroupedGenImages:
    def test_grouped_latents_match_single_path(self):
        """gen_image_latents_grouped (DP2xTP2xSP2) must reproduce
        gen_image_latent per image: same contexts, and the grouped call's G
        sequential rng draws line up with G single-path calls on a
        same-seeded inferencer."""
        from jax.sharding import Mesh

        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        tok = FakeTokenizer()
        from unimedvl_tpu.data.tokenizer import add_special_tokens

        tok, ids, _ = add_special_tokens(tok)

        def make():
            return InterleaveInferencer(
                params, TINY, tok, ids,
                vae_transform=ImageTransform(32, 8, 8, 1024),
                vit_transform=ImageTransform(32, 8, 2, 1024),
                seed=11,
            )

        inf = make()
        prompts = ["a chest x-ray", "an abdominal ct"]
        gen_ctxs, pre_ctxs = [], []
        for p in prompts:
            base = inf.init_gen_context()
            pre_ctxs.append(base)  # text-CFG stream: context WITHOUT the prompt
            gen_ctxs.append(inf.update_context_text(p, base))
        kw = dict(
            cfg_text_scale=2.0, cfg_interval=(0.0, 1.0),
            cfg_renorm_type="global", num_timesteps=3,
        )
        single = make()
        want = [
            single.gen_image_latent(
                (32, 32), gen_ctxs[g], cfg_text_precontext=pre_ctxs[g], **kw
            )
            for g in range(2)
        ]
        mesh = Mesh(
            np.asarray(jax.devices()).reshape(2, 2, 2), ("data", "model", "seq")
        )
        grouped = make()
        got = grouped.gen_image_latents_grouped(
            (32, 32), gen_ctxs, mesh, cfg_text_precontexts=pre_ctxs, **kw
        )
        assert got.shape[0] == 2
        for g in range(2):
            np.testing.assert_allclose(
                np.asarray(got[g]), np.asarray(want[g]), rtol=2e-4, atol=2e-5
            )

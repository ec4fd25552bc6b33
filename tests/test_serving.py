"""Continuous-batching engine tests: outputs must match unbatched decoding."""

import numpy as np
import jax
import pytest
from PIL import Image

from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.inference import InterleaveInferencer
from unimedvl_tpu.inference.serving import ContinuousBatcher, Request
from unimedvl_tpu.models import bagel

from tests.test_pipeline import TINY, FakeTokenizer


@pytest.fixture(scope="module")
def setup():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    from unimedvl_tpu.data.tokenizer import add_special_tokens

    tok, ids, _ = add_special_tokens(FakeTokenizer())
    return params, tok, ids


class TestContinuousBatching:
    def test_matches_unbatched(self, setup):
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        prompts = ["alpha", "beta question", "gamma?", "delta scan", "eps"]
        # unbatched references via the pipeline
        want = {}
        for i, p in enumerate(prompts):
            ctx = inferencer.init_gen_context()
            ctx = inferencer.update_context_text(p, ctx)
            want[i] = inferencer.gen_text(ctx, max_length=6, do_sample=False)

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
        )
        rids = [batcher.submit(Request(prompt=p, max_new_tokens=6)) for p in prompts]
        got = batcher.run()
        assert set(got.keys()) == set(rids)
        for i, rid in enumerate(rids):
            assert got[rid] == want[i], (i, got[rid], want[i])

    def test_with_images(self, setup):
        params, tok, ids = setup
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        vit_t = ImageTransform(32, 8, 2, 1024)
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        want = inferencer.chat([img], "what?", max_length=5)

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
            vit_transform=vit_t,
        )
        rid = batcher.submit(Request(prompt="what?", image=img, max_new_tokens=5))
        got = batcher.run()
        assert got[rid] == want

    def test_overcapacity_rejected_before_prefill(self, setup):
        """A request that cannot fit is rejected up-front into .errors and the
        rest of the batch completes (the old engine raised mid-run AFTER
        doing the prefill work)."""
        params, tok, ids = setup
        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=64, chunk=4,
            vit_transform=ImageTransform(32, 8, 2, 1024),
        )
        ok = batcher.submit(Request(prompt="fits", max_new_tokens=5))
        bad = batcher.submit(Request(prompt="way too long", max_new_tokens=10_000))
        ok2 = batcher.submit(Request(prompt="also fits", max_new_tokens=5))
        got = batcher.run()
        assert ok in got and ok2 in got
        assert bad not in got
        assert bad in batcher.errors
        assert "rejected before prefill" in batcher.errors[bad]

    def test_batched_admission_matches_sequential(self, setup):
        """Admitting several requests at once (ONE batched text prefill) must
        produce the same outputs as one-slot-at-a-time admission."""
        params, tok, ids = setup
        prompts = ["one", "two two", "three three three", "four"]

        def run_with_slots(n):
            b = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=n, capacity=128, chunk=4,
                vit_transform=ImageTransform(32, 8, 2, 1024),
            )
            rids = [b.submit(Request(prompt=p, max_new_tokens=6)) for p in prompts]
            out = b.run()
            return [out[r] for r in rids]

        assert run_with_slots(4) == run_with_slots(1)

    def test_image_group_prefill_matches_unbatched(self, setup):
        """Several image requests admitted in ONE round run through the
        batched group prefill (bagel.prefill_vit_group) — outputs must match
        per-request chat exactly."""
        params, tok, ids = setup
        rng = np.random.default_rng(11)
        vit_t = ImageTransform(32, 8, 2, 1024)
        # three distinct sizes (two share a bucket, one differs) + one
        # text-only request mixed in
        imgs = [
            Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8)),
            Image.fromarray(rng.integers(0, 255, (26, 22, 3), dtype=np.uint8)),
            Image.fromarray(rng.integers(0, 255, (10, 12, 3), dtype=np.uint8)),
        ]
        prompts = ["what?", "describe", "count", "no image here"]
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        want = [inferencer.chat([img], p, max_length=5)
                for img, p in zip(imgs, prompts)]
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text(prompts[3], ctx)
        want.append(inferencer.gen_text(ctx, max_length=5, do_sample=False))

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=4, capacity=512, chunk=4,
            vit_transform=vit_t,
        )
        rids = [
            batcher.submit(Request(prompt=p, image=img, max_new_tokens=5))
            for img, p in zip(imgs, prompts)
        ]
        rids.append(batcher.submit(Request(prompt=prompts[3], max_new_tokens=5)))
        got = batcher.run()
        assert not batcher.errors, batcher.errors
        for rid, w in zip(rids, want):
            assert got[rid] == w, (rid, got[rid], w)

    def test_near_capacity_coadmission_not_dropped(self, setup):
        """REGRESSION: a near-capacity image request co-admitted with a
        longer-prompt request must keep its text prefill. The batched text
        prefill pads to the group T_max; the windowed FILL_OR_DROP scatter
        drops an overflowing window WHOLE, so before the text-group split the
        image slot's window [kv_img, kv_img + T_max) > capacity lost ALL its
        text (lens still advanced -> silent garbage)."""
        params, tok, ids = setup
        rng = np.random.default_rng(12)
        vit_t = ImageTransform(32, 8, 2, 1024)
        img = Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8))
        # image req: bucket 16 -> kv_img 18, prompt "hey" T=5, T_pad=32,
        # extent = max(18+32, 18+5+5) = 50 <= 64. long req: T=40 -> T_pad=64
        # fits alone. co-admitted T_max=64: image window 18+64=82 > 64.
        long_prompt = "x" * 38
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        want_img = inferencer.chat([img], "hey", max_length=5)
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text(long_prompt, ctx)
        want_long = inferencer.gen_text(ctx, max_length=5, do_sample=False)

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=64, chunk=4,
            vit_transform=vit_t,
        )
        rid_img = batcher.submit(Request(prompt="hey", image=img, max_new_tokens=5))
        rid_long = batcher.submit(Request(prompt=long_prompt, max_new_tokens=5))
        got = batcher.run()
        assert not batcher.errors, batcher.errors
        assert got[rid_img] == want_img, (got[rid_img], want_img)
        assert got[rid_long] == want_long, (got[rid_long], want_long)

    def test_legacy_pool_path_when_block_exceeds_capacity(self, setup):
        """An image whose compact block (bucket + 2 + T_pad) would exceed pool
        capacity, while the request itself fits (kv_img + T_pad <= capacity,
        n < bucket), must fall back to the legacy pool-append path and still
        match unbatched chat exactly."""
        params, tok, ids = setup
        rng = np.random.default_rng(13)
        vit_t = ImageTransform(32, 8, 2, 1024)
        # 10x12 -> 5x6 = 30 patches -> bucket 32: kv_img = 32, T_pad = 32,
        # capacity 64: kv_img + T_pad = 64 <= 64 but bucket+2+T_pad = 66 > 64
        img = Image.fromarray(rng.integers(0, 255, (10, 12, 3), dtype=np.uint8))
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        want = inferencer.chat([img], "hey", max_length=5)

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=64, chunk=4,
            vit_transform=vit_t,
        )
        rid = batcher.submit(Request(prompt="hey", image=img, max_new_tokens=5))
        rid_txt = batcher.submit(Request(prompt="text co-admit", max_new_tokens=5))
        got = batcher.run()
        assert not batcher.errors, batcher.errors
        assert got[rid] == want, (got[rid], want)
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text("text co-admit", ctx)
        want_txt = inferencer.gen_text(ctx, max_length=5, do_sample=False)
        assert got[rid_txt] == want_txt

    def test_failed_image_does_not_kill_batch(self, setup):
        params, tok, ids = setup

        class BadImage:
            def __getattr__(self, name):
                raise RuntimeError("corrupt image")

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
            vit_transform=ImageTransform(32, 8, 2, 1024),
        )
        good = batcher.submit(Request(prompt="hello", max_new_tokens=5))
        bad = batcher.submit(Request(prompt="oops", image=BadImage(), max_new_tokens=5))
        got = batcher.run()
        assert good in got
        assert bad in batcher.errors


class TestSpecServing:
    def test_spec_engine_matches_plain(self, setup):
        """Speculative continuous batching must produce IDENTICAL greedy
        outputs to the plain chunked engine on a mixed batch (slot recycling,
        eos mid-chunk, budget exhaustion)."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        prompts = ["alpha", "beta question", "gamma?", "delta scan", "eps",
                   "repeat repeat repeat repeat"]
        lens = [6, 9, 4, 7, 6, 12]

        def run(spec):
            batcher = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
                vit_transform=vit_t, spec_decode=spec, spec_k=3,
            )
            rids = [batcher.submit(Request(prompt=p, max_new_tokens=n))
                    for p, n in zip(prompts, lens)]
            return batcher.run(), rids

        want, rids_w = run(False)
        got, rids_g = run(True)
        assert rids_w == rids_g
        for rid in rids_w:
            assert got[rid] == want[rid], (rid, got[rid], want[rid])

    def test_max_new_tokens_one_is_start_token_only(self, setup):
        """max_new_tokens counts the start token (reference max_length
        semantics): a budget of 1 emits exactly [bos] — plain and spec
        engines agree (the plain path had an off-by-one here)."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        bos_text = tok.decode([ids["bos_token_id"]])
        expect = bos_text.split("<|im_end|>")[0]
        if "<|im_start|>" in expect:
            expect = expect.split("<|im_start|>")[1]
        results = {}
        for spec in (False, True):
            batcher = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
                vit_transform=vit_t, spec_decode=spec,
            )
            r1 = batcher.submit(Request(prompt="alpha", max_new_tokens=1))
            r2 = batcher.submit(Request(prompt="beta", max_new_tokens=3))
            out = batcher.run()
            assert out[r1] == expect, (spec, out[r1])
            results[spec] = out[r2]
        assert results[True] == results[False]

    def test_spec_engine_with_images(self, setup):
        params, tok, ids = setup
        rng = np.random.default_rng(3)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        vit_t = ImageTransform(32, 8, 2, 1024)

        def run(spec):
            batcher = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=384, chunk=4,
                vit_transform=vit_t, spec_decode=spec, spec_k=3,
            )
            r1 = batcher.submit(Request(prompt="what?", image=img,
                                        max_new_tokens=5))
            r2 = batcher.submit(Request(prompt="and text only"))
            out = batcher.run()
            return out[r1], out[r2]

        assert run(True) == run(False)


class TestUnifiedServing:
    """t2i requests interleaved with text decode in ONE engine
    (Request(image_size=...), ContinuousBatcher(pipeline=...))."""

    def _pipe(self, params, tok, ids, seed=7):
        return InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024),
            vit_transform=ImageTransform(32, 8, 2, 1024), seed=seed,
        )

    @staticmethod
    def _t2i_contexts(pipe, prompt):
        g = pipe.init_gen_context()
        ci = g.fork()
        ct = g.fork()
        g = pipe.update_context_text(prompt, g)
        ci = pipe.update_context_text(prompt, ci)
        return g, ct, ci

    def test_chunked_gen_job_matches_one_shot(self, setup):
        """start/advance/finish in 2-step segments must produce EXACTLY the
        one-shot gen_image result (same schedule, same rng consumption)."""
        params, tok, ids = setup
        knobs = dict(cfg_text_scale=2.0, cfg_img_scale=1.5, num_timesteps=5)

        pipe1 = self._pipe(params, tok, ids)
        g, ct, ci = self._t2i_contexts(pipe1, "a scan")
        want = pipe1.gen_image(
            (32, 32), g, cfg_text_precontext=ct, cfg_img_precontext=ci, **knobs
        )

        pipe2 = self._pipe(params, tok, ids)
        g, ct, ci = self._t2i_contexts(pipe2, "a scan")
        job = pipe2.start_gen_job(
            (32, 32), g, cfg_text_precontext=ct, cfg_img_precontext=ci, **knobs
        )
        segments = 0
        while not job.done:
            job = pipe2.advance_gen_job(job, 2)
            segments += 1
        assert segments == 2  # 4 scan steps in 2-step segments
        got = pipe2.finish_gen_job(job)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_unified_serving_text_and_t2i(self, setup):
        """Mixed batch: text outputs match the plain engine, the generated
        image matches the one-shot interleave_inference recipe bitwise."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        want_img = self._pipe(params, tok, ids, seed=3).interleave_inference(
            ["a chest x-ray"], understanding_output=False,
            num_timesteps=5, image_shapes=(32, 32),
        )[-1]

        eng0 = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
        )
        r0 = [eng0.submit(Request(prompt=p, max_new_tokens=5))
              for p in ("alpha", "beta")]
        out0 = eng0.run()
        want_text = [out0[x] for x in r0]

        eng = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
            pipeline=self._pipe(params, tok, ids, seed=3), gen_chunk=2,
        )
        rt = [eng.submit(Request(prompt=p, max_new_tokens=5))
              for p in ("alpha", "beta")]
        rg = eng.submit(Request(
            prompt="a chest x-ray", image_size=(32, 32),
            gen_params=dict(num_timesteps=5),
        ))
        out = eng.run()
        assert not eng.errors, eng.errors
        assert [out[x] for x in rt] == want_text
        assert isinstance(out[rg], Image.Image)
        np.testing.assert_array_equal(np.asarray(out[rg]), np.asarray(want_img))
        assert eng.stats["gen_images"] == 1
        assert eng.stats["gen_s"] > 0

    def test_dynamic_window_matches_static(self, setup):
        """gen_window_dynamic=True: ONE compiled program per (geometry, G,
        window) — a traced window start plus tail masking and always-S1
        streams with a gated CFG combine. Must compose to EXACTLY the
        one-shot gen_image result."""
        params, tok, ids = setup
        knobs = dict(cfg_text_scale=2.0, cfg_img_scale=1.5, num_timesteps=5)

        pipe1 = self._pipe(params, tok, ids)
        g, ct, ci = self._t2i_contexts(pipe1, "a scan")
        want = pipe1.gen_image(
            (32, 32), g, cfg_text_precontext=ct, cfg_img_precontext=ci, **knobs
        )

        pipe2 = self._pipe(params, tok, ids)
        pipe2.gen_window_dynamic = True
        g, ct, ci = self._t2i_contexts(pipe2, "a scan")
        job = pipe2.start_gen_job(
            (32, 32), g, cfg_text_precontext=ct, cfg_img_precontext=ci, **knobs
        )
        while not job.done:
            job = pipe2.advance_gen_job(job, 3)  # 4 steps: window + tail
        got = pipe2.finish_gen_job(job)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_dynamic_window_grouped_engine(self, setup):
        """Dynamic windows compose with gen_group in the engine: outputs
        match the static-window grouped engine exactly."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        prompts = ["a chest x-ray", "a brain mri"]

        def run_engine(dynamic):
            pipe = self._pipe(params, tok, ids, seed=3)
            pipe.gen_window_dynamic = dynamic
            eng = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
                vit_transform=vit_t, pipeline=pipe, gen_chunk=2, gen_group=2,
            )
            rids = [eng.submit(Request(
                prompt=p, image_size=(32, 32),
                gen_params=dict(num_timesteps=5),
            )) for p in prompts]
            out = eng.run()
            assert not eng.errors, eng.errors
            return [out[r] for r in rids]

        want = run_engine(False)
        got = run_engine(True)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    def test_grouped_gen_matches_sequential(self, setup):
        """gen_group>1 fuses concurrent t2i jobs into ONE batched denoise
        (bagel.generate_latents_group); images must match the ungrouped
        engine exactly (same rng draw order, per-image math untouched)."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        prompts = ["a chest x-ray", "a brain mri"]

        def run_engine(group):
            eng = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
                vit_transform=vit_t,
                pipeline=self._pipe(params, tok, ids, seed=3), gen_chunk=2,
                gen_group=group,
            )
            rids = [eng.submit(Request(
                prompt=p, image_size=(32, 32),
                gen_params=dict(num_timesteps=5),
            )) for p in prompts]
            out = eng.run()
            assert not eng.errors, eng.errors
            return [out[r] for r in rids], eng

        want, eng1 = run_engine(1)
        got, eng2 = run_engine(2)
        assert eng2.stats["gen_images"] == 2
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # the grouped engine ran ONE denoise schedule for both members:
        # fewer gen segments than the sequential engine's two schedules
        assert eng2.stats["rounds"] < eng1.stats["rounds"]

    def test_grouped_gen_incompatible_sizes_split(self, setup):
        """Different geometries never merge — each runs its own schedule."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        eng = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
            pipeline=self._pipe(params, tok, ids, seed=3), gen_chunk=2,
            gen_group=4,
        )
        r1 = eng.submit(Request(prompt="a", image_size=(32, 32),
                                gen_params=dict(num_timesteps=5)))
        r2 = eng.submit(Request(prompt="b", image_size=(64, 32),
                                gen_params=dict(num_timesteps=5)))
        out = eng.run()
        assert not eng.errors, eng.errors
        assert out[r1].size == (32, 32)
        assert out[r2].size == (32, 64)

    def test_cancel_one_group_member(self, setup):
        """Cancelling one member mid-denoise keeps the rest of the group
        running; the cancelled rid lands in errors."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        eng = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=vit_t,
            pipeline=self._pipe(params, tok, ids, seed=3), gen_chunk=1,
            gen_group=2,
        )
        r1 = eng.submit(Request(prompt="a", image_size=(32, 32),
                                gen_params=dict(num_timesteps=5)))
        r2 = eng.submit(Request(prompt="b", image_size=(32, 32),
                                gen_params=dict(num_timesteps=5)))
        eos = eng.new_token_ids["eos_token_id"]
        eng._reset_stats()
        eng._round(eng.stats, eos)  # group starts + first segment
        assert eng._gen_job is not None and len(eng._gen_job[0]) == 2
        assert eng.cancel(r2)
        out = eng.run()
        assert isinstance(out[r1], Image.Image)
        assert r2 in eng.errors and "cancel" in eng.errors[r2]

    def test_t2i_without_pipeline_rejected(self, setup):
        params, tok, ids = setup
        eng = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=128, chunk=4,
            vit_transform=ImageTransform(32, 8, 2, 1024),
        )
        rid = eng.submit(Request(prompt="draw", image_size=(32, 32)))
        ok = eng.submit(Request(prompt="hello", max_new_tokens=4))
        out = eng.run()
        assert rid in eng.errors and "pipeline" in eng.errors[rid]
        assert ok in out


class TestChunkEarlyExit:
    def test_chunk_exits_when_all_slots_hit_eos(self):
        """With eos given, tokens after every active slot finished stay
        zero-filled (the loop exited) and outputs up to the exit match the
        no-eos chunk."""
        import jax.numpy as jnp
        from unimedvl_tpu.inference.serving import decode_chunk
        from unimedvl_tpu.models import bagel as bagel_mod
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from tests.test_pipeline import TINY

        params = bagel_mod.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        S, K = 2, 8
        cur = jnp.asarray([3, 5], jnp.int32)
        pos = jnp.asarray([0, 0], jnp.int32)
        active = jnp.ones((S,), bool)

        def fresh():
            # decode_chunk donates the cache — build a new one per call
            return KVCache.create(
                TINY.llm.num_hidden_layers, S, 64,
                TINY.llm.num_key_value_heads, TINY.llm.head_dim, jnp.float32,
            )

        toks_free, *_ = decode_chunk(
            params, TINY, fresh(), cur, pos, active, K, jax.random.PRNGKey(1)
        )
        toks_free = np.asarray(toks_free)
        # pick the token both slots greedily emit at step 0 as the "eos":
        # slot 0's first token — then slot 0 finishes at step 1
        eos = int(toks_free[0, 0])
        toks, *_ = decode_chunk(
            params, TINY, fresh(), cur, pos, active, K, jax.random.PRNGKey(1),
            eos=jnp.asarray(eos, jnp.int32),
        )
        toks = np.asarray(toks)
        # up to the exit step the emitted tokens are identical
        finished = np.zeros(S, bool)
        exit_step = K
        for i in range(K):
            finished |= toks_free[:, i] == eos
            if finished.all():
                exit_step = i + 1
                break
        np.testing.assert_array_equal(toks[:, :exit_step], toks_free[:, :exit_step])
        if exit_step < K:
            assert (toks[:, exit_step:] == 0).all()

    def test_near_capacity_falls_back_to_scatter_chunk(self, setup):
        """The aligned band needs max(live kv extent) + chunk <= capacity;
        an engine whose slots run close to capacity must take the scatter
        chunk (host gate) and still match the unbatched oracle."""
        params, tok, ids = setup
        vit_t = ImageTransform(32, 8, 2, 1024)
        inferencer = InterleaveInferencer(
            params, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        # capacity 64: prompt ~40 ids + 20 new tokens -> kv extent ~62;
        # base_est + chunk(8) > 64 from the second chunk on
        prompt = "q" * 38
        ctx = inferencer.init_gen_context()
        ctx = inferencer.update_context_text(prompt, ctx)
        want = inferencer.gen_text(ctx, max_length=20, do_sample=False)

        batcher = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=2, capacity=64, chunk=8,
            vit_transform=vit_t,
        )
        rid = batcher.submit(Request(prompt=prompt, max_new_tokens=20))
        got = batcher.run()
        assert not batcher.errors, batcher.errors
        assert got[rid] == want, (got[rid], want)

    @pytest.mark.parametrize("quantized", [False, True])
    def test_aligned_chunk_matches_scatter_chunk(self, quantized):
        """decode_chunk_aligned (band write + one compaction scatter) must
        reproduce decode_chunk's tokens, positions, lens AND each stream's
        valid cache region on MIXED prefill lengths — the returned cache
        keeps the contiguous contract so chunk flavors interleave freely."""
        import jax.numpy as jnp
        from unimedvl_tpu.inference.serving import (
            decode_chunk, decode_chunk_aligned,
        )
        from unimedvl_tpu.models import bagel as bagel_mod
        from unimedvl_tpu.models.qwen2_mot import KVCache
        from tests.test_pipeline import TINY

        params = bagel_mod.init_params(
            jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        S, K, M = 3, 5, 64
        ids = jnp.asarray(
            np.arange(S * 8).reshape(S, 8) % TINY.llm.vocab_size, jnp.int32)
        pos8 = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (S, 8))
        valid = jnp.asarray(  # mixed prefill lengths: 8, 5, 3
            [[True] * 8, [True] * 5 + [False] * 3, [True] * 3 + [False] * 5])

        def fresh():
            c = KVCache.create(
                TINY.llm.num_hidden_layers, S, M,
                TINY.llm.num_key_value_heads, TINY.llm.head_dim, jnp.float32,
                quantized=quantized,
            )
            return bagel_mod.prefill_text(params, TINY, c, ids, pos8, valid)

        cur = jnp.asarray([3, 5, 7], jnp.int32)
        pos = jnp.asarray([8, 5, 3], jnp.int32)
        active = jnp.asarray([True, True, False])
        rng = jax.random.PRNGKey(2)
        tok_s, last_s, pos_s, cache_s = decode_chunk(
            params, TINY, fresh(), cur, pos, active, K, rng)
        tok_a, last_a, pos_a, cache_a = decode_chunk_aligned(
            params, TINY, fresh(), cur, pos, active, K, rng)
        # Compare ACTIVE rows only: an inactive stream computes garbage in
        # both paths but over genuinely different visible sets (scatter
        # overwrites its column at lens; aligned parks its writes in the
        # band), so its tokens may differ — by contract they are never read.
        act = np.asarray(active)
        np.testing.assert_array_equal(
            np.asarray(tok_s)[act], np.asarray(tok_a)[act])
        np.testing.assert_array_equal(
            np.asarray(last_s)[act], np.asarray(last_a)[act])
        np.testing.assert_array_equal(np.asarray(pos_s), np.asarray(pos_a))
        np.testing.assert_array_equal(
            np.asarray(cache_s.lens), np.asarray(cache_a.lens))
        lens = np.asarray(cache_s.lens)
        for s in range(S):
            n = int(lens[s])
            for name in ("k", "v"):
                a = np.asarray(getattr(cache_a, name)[:, s, :, :n])
                w = np.asarray(getattr(cache_s, name)[:, s, :, :n])
                np.testing.assert_allclose(a, w, rtol=0, atol=1e-5)
            if quantized:
                for name in ("k_scale", "v_scale"):
                    a = np.asarray(getattr(cache_a, name)[:, s, :, :n])
                    w = np.asarray(getattr(cache_s, name)[:, s, :, :n])
                    np.testing.assert_allclose(a, w, rtol=1e-6, atol=0)


class TestInt8KVServing:
    def test_kv_quantized_engine_close_to_fp(self, setup):
        """int8 slot-pool cache: same mixed batch (incl. an image request)
        must produce near-identical greedy outputs."""
        params, tok, ids = setup
        rng = np.random.default_rng(3)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        vit_t = ImageTransform(32, 8, 2, 1024)
        prompts = ["alpha", "beta question", "gamma?"]

        def run(kv_quantized):
            b = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
                vit_transform=vit_t, kv_quantized=kv_quantized,
            )
            rids = [b.submit(Request(prompt=p, max_new_tokens=6))
                    for p in prompts]
            rids.append(b.submit(Request(prompt="look", image=img,
                                         max_new_tokens=6)))
            out = b.run()
            assert not b.errors, b.errors
            return [out[r] for r in rids]

        want = run(False)
        got = run(True)
        agree = np.mean([w == g for w, g in zip(want, got)])
        assert agree >= 0.5, (want, got)
        # per-token agreement across all outputs should be high
        tok_agree = np.mean([
            np.mean([a == b for a, b in zip(w, g)]) if w and g else 1.0
            for w, g in zip(want, got)
        ])
        assert tok_agree >= 0.7, (want, got)


class TestPoolLadder:
    """Drain-tail pool rightsizing (ContinuousBatcher(pool_ladder=True)):
    the pool must physically shrink/grow along the rung ladder while outputs
    stay identical to the fixed-pool engine."""

    def _run(self, setup, *, ladder, prompts, max_new, num_slots=8,
             min_pool=2, img_idx=(), kv_quantized=False, track=None):
        params, tok, ids = setup
        rng = np.random.default_rng(5)
        vit_t = ImageTransform(32, 8, 2, 1024)
        b = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=num_slots, capacity=512,
            chunk=4, vit_transform=vit_t, pool_ladder=ladder,
            min_pool=min_pool, kv_quantized=kv_quantized,
        )
        if track is not None:
            orig = b._round

            def spy(st, eos):
                orig(st, eos)
                track.append(b.pool)

            b._round = spy
        rids = []
        for i, (p, m) in enumerate(zip(prompts, max_new)):
            img = None
            if i in img_idx:
                img = Image.fromarray(
                    rng.integers(0, 255, (24, 28, 3), dtype=np.uint8)
                )
            rids.append(b.submit(Request(prompt=p, image=img,
                                         max_new_tokens=m)))
        out = b.run()
        assert not b.errors, b.errors
        return [out[r] for r in rids], b

    def test_ladder_matches_fixed_pool(self, setup):
        """Mixed output lengths: the long request drains alone, the ladder
        shrinks under it, tokens must match the fixed-pool engine exactly."""
        prompts = ["alpha", "beta question", "gamma?", "delta", "eps longer"]
        max_new = [3, 12, 3, 5, 3]
        want, _ = self._run(setup, ladder=False, prompts=prompts,
                            max_new=max_new)
        sizes = []
        got, eng = self._run(setup, ladder=True, prompts=prompts,
                             max_new=max_new, track=sizes)
        assert got == want, (got, want)
        assert eng.stats["repacks"] >= 1
        assert min(sizes) < 8, sizes  # it really shrank mid-drain
        assert eng.pool in eng._rungs

    def test_ladder_grows_for_backlog(self, setup):
        """More pending than the shrunken pool: admission grows a rung ahead
        and every request still completes with fixed-pool outputs."""
        prompts = [f"req {i}" for i in range(9)]
        max_new = [4] * 9
        want, _ = self._run(setup, ladder=False, prompts=prompts,
                            max_new=max_new)
        # first a tiny run to shrink the pool to min_pool, then the batch
        params, tok, ids = setup
        b = ContinuousBatcher(
            params, TINY, tok, ids, num_slots=8, capacity=512, chunk=4,
            vit_transform=ImageTransform(32, 8, 2, 1024), pool_ladder=True,
            min_pool=2,
        )
        warm = b.submit(Request(prompt="w", max_new_tokens=2))
        b.run()
        assert b.pool == 2, b.pool  # drained -> min rung
        rids = [b.submit(Request(prompt=p, max_new_tokens=m))
                for p, m in zip(prompts, max_new)]
        out = b.run()
        assert not b.errors, b.errors
        assert b.pool <= 8
        assert [out[r] for r in rids] == want
        assert warm not in rids

    def test_ladder_with_images_and_int8_kv(self, setup):
        """Image admission (group prefill + pool scatter) and quantized
        scale rows must survive repacks bit-exactly."""
        prompts = ["look here", "alpha", "beta question", "gamma?"]
        max_new = [10, 3, 3, 3]
        want, _ = self._run(setup, ladder=False, prompts=prompts,
                            max_new=max_new, img_idx=(0,), kv_quantized=True)
        got, eng = self._run(setup, ladder=True, prompts=prompts,
                             max_new=max_new, img_idx=(0,), kv_quantized=True)
        assert got == want, (got, want)
        assert eng.stats["repacks"] >= 1


class TestPrefixCache:
    """register_prefix + Request(prefix_id): admission seeds the preamble KV
    into the slot pool instead of re-prefilling it per request. Outputs must
    be byte-identical to the plain engine decoding [preamble + prompt]
    (byte-level tokenizer => identical token split)."""

    PREAMBLE = "you are a radiology assistant. answer concisely. "

    def _engine(self, setup, **kw):
        params, tok, ids = setup
        kw = {"num_slots": 4, "capacity": 512, "chunk": 4,
              "vit_transform": ImageTransform(32, 8, 2, 1024), **kw}
        return ContinuousBatcher(params, TINY, tok, ids, **kw)

    def _want(self, setup, suffixes, max_new, **kw):
        b = self._engine(setup, **kw)
        rids = [b.submit(Request(prompt=self.PREAMBLE + s, max_new_tokens=m))
                for s, m in zip(suffixes, max_new)]
        out = b.run()
        assert not b.errors, b.errors
        return [out[r] for r in rids]

    def _got(self, setup, suffixes, max_new, **kw):
        b = self._engine(setup, **kw)
        pid = b.register_prefix(self.PREAMBLE)
        rids = [b.submit(Request(prompt=s, max_new_tokens=m, prefix_id=pid))
                for s, m in zip(suffixes, max_new)]
        out = b.run()
        assert not b.errors, b.errors
        return [out[r] for r in rids], b

    def test_matches_unprefixed(self, setup):
        suffixes = ["is there a fracture?", "describe the lungs",
                    "any effusion?", "impression?", "cardiac size?"]
        max_new = [6, 9, 4, 7, 5]
        want = self._want(setup, suffixes, max_new)
        got, eng = self._got(setup, suffixes, max_new)
        assert got == want, (got, want)
        assert len(eng._prefixes) == 1

    def test_int8_kv_prefix(self, setup):
        suffixes = ["alpha?", "beta question long enough"]
        max_new = [5, 8]
        want = self._want(setup, suffixes, max_new, kv_quantized=True)
        got, _ = self._got(setup, suffixes, max_new, kv_quantized=True)
        assert got == want

    def test_spec_decode_prefix(self, setup):
        suffixes = ["gamma?", "delta findings"]
        max_new = [6, 6]
        want = self._want(setup, suffixes, max_new)
        got, _ = self._got(setup, suffixes, max_new, spec_decode=True)
        assert got == want

    def test_mixed_prefixes_and_plain(self, setup):
        """Two different registered prefixes + an unprefixed request in one
        submission wave: each admission group carries its own preamble."""
        params, tok, ids = setup
        b = self._engine(setup)
        pa = b.register_prefix("preamble A: ")
        pb = b.register_prefix("a different preamble B!! ")
        r1 = b.submit(Request(prompt="q one", max_new_tokens=5, prefix_id=pa))
        r2 = b.submit(Request(prompt="q two", max_new_tokens=5, prefix_id=pb))
        r3 = b.submit(Request(prompt="plain request", max_new_tokens=5))
        out = b.run()
        assert not b.errors, b.errors

        w = self._engine(setup)
        w1 = w.submit(Request(prompt="preamble A: q one", max_new_tokens=5))
        w2 = w.submit(Request(
            prompt="a different preamble B!! q two", max_new_tokens=5))
        w3 = w.submit(Request(prompt="plain request", max_new_tokens=5))
        wout = w.run()
        assert [out[r1], out[r2], out[r3]] == [wout[w1], wout[w2], wout[w3]]

    def test_prefix_with_image_rejected(self, setup):
        rng = np.random.default_rng(3)
        b = self._engine(setup)
        pid = b.register_prefix(self.PREAMBLE)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        bad = b.submit(Request(prompt="look", image=img, max_new_tokens=4,
                               prefix_id=pid))
        ok = b.submit(Request(prompt="fine", max_new_tokens=4, prefix_id=pid))
        out = b.run()
        assert bad in b.errors and "text-only" in b.errors[bad]
        assert ok in out

    def test_prefix_pool_ladder(self, setup):
        suffixes = ["one?", "two?", "three?", "four?", "five six seven"]
        max_new = [4, 4, 4, 4, 10]
        want = self._want(setup, suffixes, max_new)
        got, eng = self._got(setup, suffixes, max_new,
                             pool_ladder=True, min_pool=2, num_slots=8)
        assert got == want, (got, want)
        assert eng.stats["repacks"] >= 1

    def test_bad_prefix_id_isolated(self, setup):
        b = self._engine(setup)
        bad = b.submit(Request(prompt="x", max_new_tokens=4, prefix_id=7))
        ok = b.submit(Request(prompt="y", max_new_tokens=4))
        out = b.run()
        assert bad in b.errors
        assert ok in out


class TestW4Serving:
    def test_w4a8_engine_matches_unbatched_pipeline(self, setup):
        """Packed-int4 weights (quant bits=4, kernel_p4a dispatch) through
        the full serving engine: outputs must EXACTLY match the unbatched
        pipeline under the SAME quantized params (the engine contract of
        test_matches_unbatched, here over the packed-int4 dispatch), and an
        image request (vit/connector stay bf16, only LLM linears pack) must
        complete without engine errors."""
        from unimedvl_tpu.quant import quantize_llm_params

        params, tok, ids = setup
        rng = np.random.default_rng(4)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        vit_t = ImageTransform(32, 8, 2, 1024)
        prompts = ["alpha", "beta question", "gamma?"]

        p4 = dict(params)
        p4["llm"] = quantize_llm_params(params["llm"], bits=4, act_quant=True)

        inferencer = InterleaveInferencer(
            p4, TINY, tok, ids,
            vae_transform=ImageTransform(32, 8, 8, 1024), vit_transform=vit_t,
        )
        want = []
        for p in prompts:
            ctx = inferencer.init_gen_context()
            ctx = inferencer.update_context_text(p, ctx)
            want.append(inferencer.gen_text(ctx, max_length=6, do_sample=False))

        b = ContinuousBatcher(
            p4, TINY, tok, ids, num_slots=2, capacity=512, chunk=4,
            vit_transform=vit_t,
        )
        rids = [b.submit(Request(prompt=q, max_new_tokens=6))
                for q in prompts]
        rids.append(b.submit(Request(prompt="look", image=img,
                                     max_new_tokens=6)))
        out = b.run()
        assert not b.errors, b.errors
        got = [out[r] for r in rids[:-1]]
        assert got == want, (got, want)
        assert isinstance(out[rids[-1]], str)

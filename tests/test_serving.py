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

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

"""Eval-glue tests: batched VQA runner parity with single chat, metrics."""

import numpy as np
import jax
import pytest
from PIL import Image

from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.eval import exact_match_accuracy, run_vqa_eval, process_conversation
from unimedvl_tpu.models import bagel

from tests.test_pipeline import TINY, FakeTokenizer


class TestMetrics:
    def test_exact_match(self):
        assert exact_match_accuracy(["Yes", "no", "left lung"], ["yes", "yes", "Left Lung"]) == pytest.approx(2 / 3)

    def test_containment(self):
        assert exact_match_accuracy(["the answer is pneumonia."], ["pneumonia"]) == 1.0

    def test_process_conversation(self):
        img = Image.new("RGBA", (4, 4), (255, 0, 0, 0))
        imgs, conv = process_conversation([img], [{"q": "x"}])
        assert imgs[0].mode == "RGB"


class TestRunner:
    def test_run_vqa_eval(self, monkeypatch):
        params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
        from unimedvl_tpu.data.tokenizer import add_special_tokens

        tok, ids, _ = add_special_tokens(FakeTokenizer())
        rng = np.random.default_rng(0)
        img = Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))
        samples = [
            {"image": img, "question": "q one", "answer": "a"},
            {"image": None, "question": "q two", "answer": "b"},
        ]
        # use a tiny transform compatible with the tiny ViT
        import unimedvl_tpu.eval.vqa as vqa_mod

        monkeypatch.setattr(
            vqa_mod, "build_transform", lambda: ImageTransform(32, 8, 2, 1024)
        )
        preds, acc = run_vqa_eval(
            params, TINY, tok, ids, samples,
            max_new_tokens=5, num_slots=2, capacity=512,
        )
        assert len(preds) == 2
        assert acc is not None and 0.0 <= acc <= 1.0

"""Multi-chip serving as a PRODUCT feature: ContinuousBatcher(mesh=...) and
run_vqa_eval(mesh=...) must produce identical outputs to the single-device
engine for a mixed image/text batch — replacing the reference's accelerate
device_map placement (interactive_vqa_inferencer.py:163-189) for the
batched-eval path (BASELINE config 3).
"""

import numpy as np
import jax
import pytest
from PIL import Image

from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.inference.serving import ContinuousBatcher, Request
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel import create_mesh

from tests.test_pipeline import TINY, FakeTokenizer


@pytest.fixture(scope="module")
def setup():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    from unimedvl_tpu.data.tokenizer import add_special_tokens

    tok, ids, _ = add_special_tokens(FakeTokenizer())
    return params, tok, ids


def _image(seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, (24, 28, 3), dtype=np.uint8))


def _run(params, tok, ids, mesh=None, **kw):
    vit_t = ImageTransform(32, 8, 2, 1024)
    batcher = ContinuousBatcher(
        params, TINY, tok, ids, num_slots=4, capacity=512, chunk=4,
        vit_transform=vit_t, mesh=mesh, **kw,
    )
    reqs = [
        Request(prompt="alpha", max_new_tokens=6),
        Request(prompt="what is shown?", image=_image(1), max_new_tokens=5),
        Request(prompt="beta question", max_new_tokens=6),
        Request(prompt="describe", image=_image(2), max_new_tokens=5),
        Request(prompt="gamma?", max_new_tokens=4),
        Request(prompt="over capacity " * 40, max_new_tokens=120),  # rejected
    ]
    rids = [batcher.submit(r) for r in reqs]
    done = batcher.run()
    return rids, done, batcher.errors


class TestServingMesh:
    def test_mixed_batch_parity_tp_dp_mesh(self, setup):
        """slots over data=2 x TP=4: sharded engine == single-device engine."""
        params, tok, ids = setup
        rids, want, want_err = _run(params, tok, ids, mesh=None)
        mesh = create_mesh((2, 4))
        rids2, got, got_err = _run(params, tok, ids, mesh=mesh)
        assert rids2 == rids
        assert set(got.keys()) == set(want.keys())
        for rid in want:
            assert got[rid] == want[rid], (rid, got[rid], want[rid])
        # the over-capacity rejection fires identically
        assert set(got_err) == set(want_err) and len(got_err) == 1

    def test_spec_engine_parity_tp_dp_mesh(self, setup):
        """Speculative continuous batching under the mesh: identical outputs
        to the single-device plain engine on the same mixed batch."""
        params, tok, ids = setup
        rids, want, _ = _run(params, tok, ids, mesh=None)
        mesh = create_mesh((2, 4))
        rids2, got, _ = _run(params, tok, ids, mesh=mesh,
                             spec_decode=True, spec_k=3)
        assert rids2 == rids
        for rid in want:
            assert got[rid] == want[rid], (rid, got[rid], want[rid])

    def test_vqa_eval_mesh_parity(self, setup):
        params, tok, ids = setup
        from unimedvl_tpu.eval.vqa import run_vqa_eval

        samples = [
            {"image": _image(3), "question": "color?", "answer": "red"},
            {"image": None, "question": "ok?", "answer": "yes"},
            {"image": _image(4), "question": "what organ?", "answer": "lung"},
        ]
        # build_transform() uses the 980px production geometry — too big for
        # TINY's 8px ViT, so drive the batcher directly with the tiny
        # transform through run_vqa_eval's own engine parameters
        import unimedvl_tpu.eval.vqa as vqa_mod

        tiny_t = ImageTransform(32, 8, 2, 1024)
        orig = vqa_mod.build_transform
        vqa_mod.build_transform = lambda: tiny_t
        try:
            preds, acc = run_vqa_eval(
                params, TINY, tok, ids, samples, max_new_tokens=5,
                num_slots=4, capacity=512,
            )
            mesh = create_mesh((2, 4))
            preds_m, acc_m = run_vqa_eval(
                params, TINY, tok, ids, samples, max_new_tokens=5,
                num_slots=4, capacity=512, mesh=mesh,
            )
        finally:
            vqa_mod.build_transform = orig
        assert preds_m == preds
        assert acc_m == acc


class TestPrefixMesh:
    def test_prefix_cache_on_mesh(self, setup):
        """register_prefix + seeded admission must compose with the sharded
        cache pool: outputs identical to the single-device prefix engine."""
        params, tok, ids = setup
        pre = "shared preamble: "

        def run(mesh):
            b = ContinuousBatcher(
                params, TINY, tok, ids, num_slots=4, capacity=512, chunk=4,
                vit_transform=ImageTransform(32, 8, 2, 1024), mesh=mesh,
            )
            pid = b.register_prefix(pre)
            rids = [b.submit(Request(prompt=p, max_new_tokens=m,
                                     prefix_id=pid))
                    for p, m in (("alpha", 6), ("beta question", 5),
                                 ("gamma?", 4))]
            out = b.run()
            assert not b.errors, b.errors
            return [out[r] for r in rids]

        want = run(None)
        got = run(create_mesh((2, 4)))
        assert got == want, (got, want)

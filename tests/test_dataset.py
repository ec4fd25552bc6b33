"""Training data pipeline tests: dataset -> packed batches -> consecutive
sharded train steps (the reference ships no training pipeline at all,
README.md:60-67)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from unimedvl_tpu.data.imaging import ImageTransform
from unimedvl_tpu.data.tokenizer import add_special_tokens
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel.mesh import create_mesh
from unimedvl_tpu.training import trainer
from unimedvl_tpu.training.dataset import (
    Example, PackedBatchIterator, example_to_items, make_latent_fn,
    stack_packed,
)

from tests.test_pipeline import TINY, FakeTokenizer


def _img(seed, shape=(24, 28, 3)):
    r = np.random.default_rng(seed)
    return Image.fromarray(r.integers(0, 255, shape, dtype=np.uint8))


@pytest.fixture(scope="module")
def setup():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    tok, ids, _ = add_special_tokens(FakeTokenizer())
    return params, tok, ids


def _iterator(params, tok, ids, **kw):
    return PackedBatchIterator(
        [
            Example("vlm_sft", "what is shown?", image=_img(1), answer="a lung."),
            Example("t2i_pretrain", "a chest x-ray", image=_img(2)),
            Example("unified_edit", "add contrast", image=_img(3),
                    target_image=_img(4)),
        ],
        tok, ids, TINY,
        vit_transform=ImageTransform(32, 8, 2, 1024),
        vae_transform=ImageTransform(32, 8, 8, 1024),
        latent_fn=make_latent_fn(params, TINY),
        **kw,
    )


class TestExampleToItems:
    def test_task_item_structure(self, setup):
        params, tok, ids = setup
        rng = np.random.default_rng(0)
        lf = make_latent_fn(params, TINY)
        vit_t = ImageTransform(32, 8, 2, 1024)
        vae_t = ImageTransform(32, 8, 8, 1024)

        sft = example_to_items(
            Example("vlm_sft", "q?", image=_img(1), answer="yes"),
            tok, ids, TINY, vit_t, vae_t, lf, rng)
        assert [i["type"] for i in sft] == ["text", "vit", "text"]
        assert sft[0]["loss"] is False and sft[2]["loss"] is True

        t2i = example_to_items(
            Example("t2i_pretrain", "caption", image=_img(2)),
            tok, ids, TINY, vit_t, vae_t, lf, rng)
        assert [i["type"] for i in t2i] == ["text", "vae"]
        assert t2i[1]["loss"] is True

        edit = example_to_items(
            Example("unified_edit", "edit", image=_img(3),
                    target_image=_img(4)),
            tok, ids, TINY, vit_t, vae_t, lf, rng)
        assert [i["type"] for i in edit] == ["text", "vit", "vae", "vae"]
        assert edit[2]["loss"] is False and edit[3]["loss"] is True
        # conditioning latents enter at t ~ 0 (clean)
        assert edit[2]["timestep_raw"] < -20

    def test_latent_fn_matches_model_encode(self, setup):
        params, tok, ids = setup
        lf = make_latent_fn(params, TINY)
        arr = np.asarray(_img(7, (16, 16, 3)), np.uint8)
        got = lf(arr)
        img = bagel.preprocess_vae_image(TINY, jnp.asarray(arr))
        want = np.asarray(
            bagel.encode_vae_latent_tokens(params, TINY, img, None)[0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestIterator:
    def test_stable_shapes_and_budget(self, setup):
        params, tok, ids = setup
        it = iter(_iterator(params, tok, ids, batch_size=2, seq_len=256))
        b1 = next(it)
        b2 = next(it)
        assert set(b1) == set(b2)
        for k in b1:
            assert b1[k].shape[0] == 2
            assert b1[k].shape == b2[k].shape or k in (
                "vit_patch_tokens", "vit_pos_ids", "vit_valid",
                "vit_scatter_idx", "vae_clean_tokens", "vae_latent_pos_ids",
                "vae_scatter_idx", "vae_timesteps_raw", "mse_weight",
                "ce_idx", "ce_labels", "ce_weight", "packed_text_ids",
                "packed_text_indexes", "und_idx", "gen_idx",
            ), k
        assert b1["packed_position_ids"].shape[1] == 256

    def test_stack_packed_synthesizes_missing_modalities(self):
        T = 64
        base = {
            "packed_position_ids": np.zeros(T, np.int32),
            "packed_text_ids": np.zeros(8, np.int32),
            "packed_text_indexes": np.full(8, T, np.int32),
            "und_idx": np.full(8, T, np.int32),
            "gen_idx": np.full(8, T, np.int32),
            "mask_document_id": np.zeros(T, np.int32),
        }
        with_ce = dict(base)
        with_ce["ce_idx"] = np.asarray([0, 1], np.int32)
        with_ce["ce_labels"] = np.asarray([5, 6], np.int32)
        with_ce["ce_weight"] = np.asarray([1.0, 1.0], np.float32)
        out = stack_packed([with_ce, base])
        assert out["ce_idx"].shape == (2, 2)
        # synthesized row: indexes T (dropped), zero weight
        assert (out["ce_idx"][1] == T).all()
        assert (out["ce_weight"][1] == 0).all()

    def test_batches_drive_train_forward(self, setup):
        params, tok, ids = setup
        it = iter(_iterator(params, tok, ids, batch_size=2, seq_len=256))
        batch = next(it)
        out = jax.vmap(
            lambda b, r: bagel.train_forward(params, TINY, b, r)
        )(jax.tree.map(jnp.asarray, batch), jax.random.split(jax.random.PRNGKey(0), 2))
        assert np.isfinite(np.asarray(out["loss"])).all()
        assert float(out["ce"].mean()) > 0
        assert float(out["mse"].mean()) > 0


@pytest.mark.slow
class TestConvergenceSmoke:
    def test_losses_decrease_over_consecutive_steps(self, setup):
        """40 sharded steps on the virtual mesh: loss must drop by >30%, both
        experts must move (the fuller 200-step curve: scripts/toy_overfit.py
        -> benchmarks/TOY_OVERFIT.json)."""
        params, tok, ids = setup
        it = iter(_iterator(params, tok, ids, batch_size=2, seq_len=256))
        mesh = create_mesh((2, 4))
        optimizer = trainer.make_optimizer(learning_rate=3e-3)
        step_fn, init_state = trainer.make_train_step(
            TINY, mesh, params, optimizer=optimizer)
        w0_und = np.asarray(
            params["llm"]["layers"]["mlp"]["gate"]["kernel"], np.float32
        ).copy()
        w0_gen = np.asarray(
            params["llm"]["layers"]["mlp_moe_gen"]["gate"]["kernel"],
            np.float32).copy()
        state = init_state()
        losses = []
        key = jax.random.PRNGKey(7)
        for _ in range(40):
            key, sub = jax.random.split(key)
            state, loss = step_fn(
                state, jax.tree.map(jnp.asarray, next(it)), sub)
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < 0.7 * np.mean(losses[:5]), losses
        l1 = jax.device_get(state.params)["llm"]["layers"]
        assert np.abs(np.asarray(l1["mlp"]["gate"]["kernel"], np.float32)
                      - w0_und).max() > 0
        assert np.abs(np.asarray(l1["mlp_moe_gen"]["gate"]["kernel"],
                                 np.float32) - w0_gen).max() > 0

    def test_freeze_und_keeps_und_expert_fixed_over_steps(self, setup):
        params, tok, ids = setup
        frozen_cfg = dataclasses.replace(
            TINY, llm=dataclasses.replace(TINY.llm, freeze_und=True))
        it = iter(_iterator(params, tok, ids, batch_size=2, seq_len=256))
        mesh = create_mesh((2, 4))
        step_fn, init_state = trainer.make_train_step(
            frozen_cfg, mesh, params,
            optimizer=trainer.make_optimizer(learning_rate=3e-3))
        w0 = np.asarray(
            params["llm"]["layers"]["mlp"]["gate"]["kernel"], np.float32
        ).copy()
        state = init_state()
        key = jax.random.PRNGKey(9)
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, _ = step_fn(
                state, jax.tree.map(jnp.asarray, next(it)), sub)
        l1 = jax.device_get(state.params)["llm"]["layers"]
        d_und = np.abs(np.asarray(l1["mlp"]["gate"]["kernel"], np.float32)
                       - w0).max()
        assert d_und == 0.0, d_und


class TestPrefetcher:
    def test_preserves_order_and_values(self):
        from unimedvl_tpu.training.dataset import Prefetcher

        base = [{"a": np.full((2,), i)} for i in range(7)]
        got = list(Prefetcher(iter(base), depth=3))
        assert len(got) == 7
        for i, b in enumerate(got):
            np.testing.assert_array_equal(b["a"], np.full((2,), i))

    def test_place_fn_runs_in_worker(self):
        from unimedvl_tpu.training.dataset import Prefetcher

        import threading

        main = threading.get_ident()
        seen = []

        def place(x):
            seen.append(threading.get_ident())
            return x * 2

        out = list(Prefetcher(iter([1, 2, 3]), place_fn=place))
        assert out == [2, 4, 6]
        assert all(t != main for t in seen)

    def test_worker_exception_propagates(self):
        from unimedvl_tpu.training.dataset import Prefetcher

        def gen():
            yield 1
            raise ValueError("boom")

        it = Prefetcher(gen())
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)

    def test_close_stops_infinite_stream(self):
        from unimedvl_tpu.training.dataset import Prefetcher

        import itertools

        it = Prefetcher(itertools.count(), depth=2)
        assert next(it) == 0
        it.close()  # worker drains out without blocking interpreter exit

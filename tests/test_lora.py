"""LoRA / QLoRA fine-tuning (beyond-reference; the reference ships no
fine-tuning code, README.md:60-67).

Semantics pinned here:
  * step-0 identity (lora_b = 0) — adding adapters changes nothing;
  * runtime adapter math == merge_lora'd weights (exact low-rank algebra);
  * apply_lora_only trains ONLY adapters (AdamW decay must not move the
    frozen base);
  * make_lora_train_step trains over an int8 base (QLoRA) where full-tree
    jax.grad would reject the integer leaves, and matches the full-tree
    step's loss trajectory on a bf16 base;
  * placement: the adapter leaves get Megatron-consistent specs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unimedvl_tpu.models import bagel
from unimedvl_tpu.quant import (
    fuse_serving_projections,
    quantize_llm_params,
)
from unimedvl_tpu.training import (
    add_lora,
    apply_lora_only,
    count_lora_params,
    create_train_state,
    make_lora_train_step,
    merge_lora,
    train_step,
)
from unimedvl_tpu.training.lora import has_lora, lora_labels

from tests.test_training import CFG, make_batch


def _params(seed=0):
    return bagel.init_params(jax.random.PRNGKey(seed), CFG, llm2vae_zero=False)


def _randomize_b(params, seed=7):
    """lora_b is zero-initialised; give it values so adapters matter."""
    k = [jax.random.PRNGKey(seed)]

    def walk(path, x):
        if path and getattr(path[-1], "key", None) == "lora_b":
            k[0], sub = jax.random.split(k[0])
            return jax.random.normal(sub, x.shape, jnp.float32).astype(x.dtype) * 0.1
        return x

    return jax.tree_util.tree_map_with_path(walk, params)


class TestLoRAForward:
    def test_step0_identity(self):
        params = _params()
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        base = bagel.train_forward(params, CFG, batch, jax.random.PRNGKey(1))
        lp = add_lora(params, jax.random.PRNGKey(2), rank=4)
        assert has_lora(lp) and not has_lora(params)
        out = bagel.train_forward(lp, CFG, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            float(base["loss"]), float(out["loss"]), rtol=1e-6)

    def test_runtime_matches_merged(self):
        lp = _randomize_b(add_lora(_params(), jax.random.PRNGKey(2), rank=4,
                                   dtype=jnp.float32))
        merged = merge_lora(lp)
        assert not has_lora(merged)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        a = bagel.train_forward(lp, CFG, batch, jax.random.PRNGKey(1))
        b = bagel.train_forward(merged, CFG, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(a["loss"]), float(b["loss"]),
                                   rtol=2e-5)
        # and the adapters did change the function
        c = bagel.train_forward(_params(), CFG, batch, jax.random.PRNGKey(1))
        assert abs(float(a["loss"]) - float(c["loss"])) > 1e-6

    def test_adapter_sites_and_count(self):
        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4,
                      targets=("q", "down"), experts=("gen",))
        attn = lp["llm"]["layers"]["attn"]
        assert "lora_a" in attn["q_gen"] and "lora_a" not in attn["q"]
        assert "lora_a" in lp["llm"]["layers"]["mlp_moe_gen"]["down"]
        assert "lora_a" not in lp["llm"]["layers"]["mlp"]["down"]
        assert count_lora_params(lp) > 0

    def test_fuse_refuses_unmerged_adapters(self):
        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4)
        with pytest.raises(ValueError, match="merge_lora"):
            fuse_serving_projections(lp["llm"])

    def test_merge_refuses_quantized_base(self):
        lp = add_lora({"llm": quantize_llm_params(_params()["llm"])},
                      jax.random.PRNGKey(2), rank=4)
        with pytest.raises(ValueError, match="quantized"):
            merge_lora(lp)


class TestLoRATraining:
    def test_apply_lora_only_freezes_base(self):
        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4)
        opt = apply_lora_only(optax.adamw(1e-2), lp)
        state = create_train_state(lp, optimizer=opt)
        snap = jax.tree.map(np.asarray, lp)
        batch = {k: jnp.asarray(v)[None] for k, v in make_batch().items()}
        state2, loss = train_step(state, CFG, batch, jax.random.PRNGKey(3),
                                  optimizer=opt)
        assert np.isfinite(float(loss))
        labels = lora_labels(snap)

        def check(path, before, after, label):
            moved = not np.allclose(before, np.asarray(after))
            if label == "train":
                return moved
            assert not moved, f"frozen leaf moved: {jax.tree_util.keystr(path)}"
            return False

        moved_flags = jax.tree_util.tree_map_with_path(
            check, snap, state2.params, labels)
        assert any(jax.tree_util.tree_leaves(moved_flags))

    def test_lean_step_matches_full_step_bf16(self):
        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4)
        opt = optax.adamw(1e-2, b1=0.9, b2=0.95)
        batch = {k: jnp.asarray(v)[None] for k, v in make_batch().items()}

        # full-tree step with masking (donates its state -> feed it copies so
        # the lean step below can still read lp's arrays)
        state = create_train_state(jax.tree.map(jnp.copy, lp),
                                   optimizer=apply_lora_only(opt, lp))
        state2, loss_full = train_step(
            state, CFG, batch, jax.random.PRNGKey(3),
            optimizer=apply_lora_only(opt, lp))

        # lean step
        step, ad, opt_state, base, combine = make_lora_train_step(CFG, lp, opt)
        ad2, _, loss_lean = step(ad, opt_state, base, batch,
                                 jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(loss_full), float(loss_lean),
                                   rtol=1e-6)
        got = combine(ad2, base)
        want = state2.params
        b_got = got["llm"]["layers"]["attn"]["q_gen"]["lora_b"]
        b_want = want["llm"]["layers"]["attn"]["q_gen"]["lora_b"]
        np.testing.assert_allclose(np.asarray(b_got, np.float32),
                                   np.asarray(b_want, np.float32),
                                   atol=2e-4)

    def test_qlora_int8_base_trains(self):
        params = _params()
        params["llm"] = quantize_llm_params(params["llm"])
        lp = add_lora(params, jax.random.PRNGKey(2), rank=4)
        step, ad, opt_state, base, combine = make_lora_train_step(
            CFG, lp, optax.adamw(5e-3))
        batch = {k: jnp.asarray(v)[None] for k, v in make_batch().items()}
        losses = []
        for i in range(4):
            ad, opt_state, loss = step(ad, opt_state, base, batch,
                                       jax.random.PRNGKey(3))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses
        # forward with the tuned adapters still runs (int8 base intact)
        full = combine(ad, base)
        out = bagel.train_forward(
            full, CFG, {k: v[0] for k, v in batch.items()},
            jax.random.PRNGKey(1))
        assert np.isfinite(float(out["loss"]))

    def test_qlora_int4_base_trains(self):
        """4-bit QLoRA: the frozen base streams packed int4 (quantize_llm_
        params bits=4); only the bf16 adapters train — same _linear dispatch."""
        params = _params()
        params["llm"] = quantize_llm_params(params["llm"], bits=4)
        lp = add_lora(params, jax.random.PRNGKey(2), rank=4)
        import jax.numpy as jnp2
        assert lp["llm"]["layers"]["attn"]["q"]["kernel_p4"].dtype == jnp2.int8
        step, ad, opt_state, base, combine = make_lora_train_step(
            CFG, lp, optax.adamw(5e-3))
        batch = {k: jnp.asarray(v)[None] for k, v in make_batch().items()}
        losses = []
        for i in range(4):
            ad, opt_state, loss = step(ad, opt_state, base, batch,
                                       jax.random.PRNGKey(3))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_quantize_after_add_preserves_adapters(self):
        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4)
        q = quantize_llm_params(lp["llm"])
        assert "lora_a" in q["layers"]["attn"]["q"]
        assert "kernel_q" in q["layers"]["attn"]["q"]


class TestLoRAPlacement:
    def test_specs_cover_adapters(self):
        from unimedvl_tpu.parallel.mesh import bagel_param_specs

        lp = add_lora(_params(), jax.random.PRNGKey(2), rank=4)
        specs = bagel_param_specs(CFG, lp, fsdp=True)
        q = specs["llm"]["layers"]["attn"]["q"]
        assert q["lora_b"] == jax.sharding.PartitionSpec(None, None, "model")
        down = specs["llm"]["layers"]["mlp"]["down"]
        assert down["lora_a"] == jax.sharding.PartitionSpec(None, "model", None)
        # structure matches exactly (place-ability)
        jax.tree.map(lambda *_: None, lp, specs)

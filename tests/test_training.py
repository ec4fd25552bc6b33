"""Training-path tests: mask algebra parity vs the reference flex-attention
mask functions, packing, and an end-to-end train step (grads flow, loss
decreases shape sanity)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.packing import pack_training_batch
from unimedvl_tpu.models import bagel
from unimedvl_tpu.ops.blockmask import (
    dense_packed_mask,
    dense_sample_mask,
    packed_segment_ids,
)

sys.path.insert(0, "/root/reference/codes")


def _ref_data_utils():
    try:
        from data import data_utils
        return data_utils
    except Exception:
        return None


CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    ),
    vit=ViTConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=8, patch_size=2, rope=False,
    ),
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, downsample=2),
    latent_patch_size=2,
    max_latent_size=4,
    vit_max_num_patch_per_side=4,
    timestep_shift=1.0,
)


class TestMaskParity:
    def test_packed_mask_vs_reference(self):
        du = _ref_data_utils()
        if du is None:
            pytest.skip("reference data_utils not importable")
        import torch

        sample_lens = [10, 8]
        split_lens = [4, 3, 3, 2, 6]
        attn_modes = ["causal", "full", "noise", "causal", "noise"]

        ref_fn = du.create_sparse_mask(sample_lens, split_lens, attn_modes, "cpu")
        T = sum(sample_lens)
        q = torch.arange(T)[:, None].expand(T, T).reshape(-1)
        k = torch.arange(T)[None, :].expand(T, T).reshape(-1)
        b = torch.zeros((), dtype=torch.long)
        h = torch.zeros((), dtype=torch.long)
        want = ref_fn(b, h, q, k).reshape(T, T).numpy().astype(bool)

        doc, fn, nz = packed_segment_ids(sample_lens, split_lens, attn_modes)
        got = np.asarray(
            dense_packed_mask(jnp.asarray(doc), jnp.asarray(fn), jnp.asarray(nz))
        )
        np.testing.assert_array_equal(got, want)

    def test_sample_mask_vs_reference(self):
        du = _ref_data_utils()
        if du is None:
            pytest.skip("reference data_utils not importable")
        split_lens = [3, 4, 2]
        attn_modes = ["causal", "noise", "full"]
        want = du.prepare_attention_mask_per_sample(split_lens, attn_modes).numpy()
        got = dense_sample_mask(split_lens, attn_modes)
        # reference returns 0/-inf float mask
        np.testing.assert_array_equal(got, want == 0)


def make_batch():
    rng = np.random.default_rng(0)
    p = CFG.latent_patch_size
    n_lat = 4  # 2x2 latent grid
    samples = [
        [  # t2i sample: caption + noised latents
            {"type": "text", "ids": [1, 5, 9, 3], "loss": True},
            {
                "type": "vae",
                "clean_tokens": rng.standard_normal((n_lat, CFG.patch_latent_dim)).astype(np.float32),
                "pos_ids": np.arange(n_lat),
                "timestep_raw": 0.3,
                "loss": True,
            },
        ],
        [  # vqa sample: image + question + answer
            {
                "type": "vit",
                "patch_tokens": rng.standard_normal((16, 12)).astype(np.float32),
                "pos_ids": np.arange(16) % 16,
            },
            {"type": "text", "ids": [2, 7, 8, 4, 6], "loss": True},
        ],
    ]
    return pack_training_batch(samples, pad_multiple=16)


class TestTrainForward:
    def test_losses_finite(self):
        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        out = bagel.train_forward(params, CFG, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(out["loss"]))
        assert np.isfinite(float(out["ce"]))
        assert np.isfinite(float(out["mse"]))

    def test_grads_flow_to_both_experts(self):
        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}

        def loss(p):
            return bagel.train_forward(p, CFG, batch, jax.random.PRNGKey(1))["loss"]

        grads = jax.grad(loss)(params)
        g_und = float(jnp.abs(grads["llm"]["layers"]["mlp"]["gate"]["kernel"]).sum())
        g_gen = float(jnp.abs(grads["llm"]["layers"]["mlp_moe_gen"]["gate"]["kernel"]).sum())
        g_vit = float(jnp.abs(grads["vit"]["patch_embedding"]["kernel"]).sum())
        g_v2l = float(jnp.abs(grads["vae2llm"]["kernel"]).sum())
        assert g_und > 0 and g_gen > 0 and g_vit > 0 and g_v2l > 0

    def test_train_step_updates(self):
        from unimedvl_tpu.training import create_train_state, train_step

        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        state = create_train_state(params)
        # train_step donates the state; snapshot before stepping.
        before = np.asarray(params["llm"]["layers"]["mlp"]["gate"]["kernel"]).copy()
        batch = {k: jnp.asarray(v)[None] for k, v in make_batch().items()}  # B=1
        state2, loss = train_step(state, CFG, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        after = np.asarray(state2.params["llm"]["layers"]["mlp"]["gate"]["kernel"])
        assert not np.allclose(before, after)

    def test_diffusion_feature_tap(self):
        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
        out = bagel.train_forward(
            params, CFG, batch, jax.random.PRNGKey(1), diffusion_feature_layer=0
        )
        feats = out["diffusion_features"]
        assert feats.shape == (batch["vae_scatter_idx"].shape[0], CFG.llm.hidden_size)
        assert np.isfinite(np.asarray(feats)).all()

    def test_freeze_und_blocks_und_gradients(self):
        import dataclasses

        llm = dataclasses.replace(CFG.llm, freeze_und=True)
        cfg = dataclasses.replace(CFG, llm=llm)
        params = bagel.init_params(jax.random.PRNGKey(0), cfg, llm2vae_zero=False)
        batch = {k: jnp.asarray(v) for k, v in make_batch().items()}

        def loss(p):
            return bagel.train_forward(p, cfg, batch, jax.random.PRNGKey(1))["mse"]

        grads = jax.grad(loss)(params)
        g_und_mlp = float(jnp.abs(grads["llm"]["layers"]["mlp"]["gate"]["kernel"]).sum())
        g_gen_mlp = float(jnp.abs(grads["llm"]["layers"]["mlp_moe_gen"]["gate"]["kernel"]).sum())
        assert g_und_mlp == 0.0, "frozen und expert must get no grad from MSE"
        assert g_gen_mlp > 0.0

    def test_sharded_train_step(self):
        from unimedvl_tpu.parallel import create_mesh
        from unimedvl_tpu.training.trainer import make_train_step

        cfg = dataclasses_replace_heads(CFG)
        mesh = create_mesh((2, 4))
        params = bagel.init_params(jax.random.PRNGKey(0), cfg, llm2vae_zero=False)
        step, init_state = make_train_step(cfg, mesh, params)
        state = init_state()
        b = make_batch()
        batch = {k: jnp.asarray(np.stack([v, v])) for k, v in b.items()}  # B=2 DP
        with jax.set_mesh(mesh):
            state2, loss = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))


def dataclasses_replace_heads(cfg: BagelConfig) -> BagelConfig:
    import dataclasses

    llm = dataclasses.replace(cfg.llm, num_attention_heads=8, num_key_value_heads=4)
    return dataclasses.replace(cfg, llm=llm)


class TestFSDPAndAccum:
    """FSDP (ZeRO-3 style param/moment sharding over "data") and gradient
    accumulation in make_train_step. Both must be numerically transparent:
    sharding layout and the grad-sum scan change WHERE values live, not what
    they are."""

    def _setup(self, fsdp, accum_steps=1):
        from unimedvl_tpu.parallel import create_mesh
        from unimedvl_tpu.training.trainer import make_train_step

        cfg = dataclasses_replace_heads(CFG)
        mesh = create_mesh((2, 4))
        params = bagel.init_params(jax.random.PRNGKey(0), cfg, llm2vae_zero=False)
        step, init_state = make_train_step(
            cfg, mesh, params, fsdp=fsdp, accum_steps=accum_steps
        )
        return cfg, mesh, params, step, init_state

    def test_fsdp_step_matches_tp_step(self):
        b = make_batch()
        batch = {k: jnp.asarray(np.stack([v, v])) for k, v in b.items()}
        results = {}
        for fsdp in (False, True):
            cfg, mesh, params, step, init_state = self._setup(fsdp)
            with jax.set_mesh(mesh):
                state2, loss = step(init_state(), batch, jax.random.PRNGKey(3))
            results[fsdp] = (
                float(loss),
                np.asarray(state2.params["llm"]["layers"]["mlp"]["down"]["kernel"]),
                np.asarray(state2.params["llm"]["embed_tokens"]),
            )
        np.testing.assert_allclose(results[False][0], results[True][0], rtol=2e-5)
        np.testing.assert_allclose(results[False][1], results[True][1], rtol=2e-4, atol=2e-6)
        np.testing.assert_allclose(results[False][2], results[True][2], rtol=2e-4, atol=2e-6)

    def test_fsdp_shards_params_and_moments_over_both_axes(self):
        cfg, mesh, params, step, init_state = self._setup(fsdp=True)
        state = init_state()
        k = state.params["llm"]["layers"]["mlp"]["down"]["kernel"]
        ss = k.sharding.shard_shape(k.shape)
        assert ss[1] * 4 == k.shape[1] and ss[2] * 2 == k.shape[2], (ss, k.shape)
        # Adam moments follow the param sharding (optimizer.init on placed params)
        leaves = [
            x
            for x in jax.tree.leaves(state.opt_state)
            if hasattr(x, "sharding") and x.shape == k.shape
        ]
        assert leaves, "no moment leaf matching the kernel shape"
        for m in leaves:
            assert m.sharding.shard_shape(m.shape) == ss, m.sharding

    @pytest.mark.slow
    def test_accum_matches_manual_mean_grad(self):
        from unimedvl_tpu.training.trainer import (
            loss_fn,
            make_optimizer,
            create_train_state,
        )

        cfg, mesh, params, step, init_state = self._setup(fsdp=False, accum_steps=2)
        b = make_batch()
        micro = {k: jnp.asarray(np.stack([v, v])) for k, v in b.items()}  # [B=2]
        batch = {k: jnp.stack([v, v]) for k, v in micro.items()}  # [A=2, B=2]
        rng = jax.random.PRNGKey(7)
        with jax.set_mesh(mesh):
            state2, loss = step(init_state(), batch, rng)

        # manual: mean grad over the same two microbatches/rngs, one update
        rngs = jax.random.split(rng, 2)
        gfn = jax.value_and_grad(loss_fn, has_aux=True)
        (l0, _), g0 = gfn(params, cfg, micro, rngs[0], None)
        (l1, _), g1 = gfn(params, cfg, micro, rngs[1], None)
        grads = jax.tree.map(lambda a, c: (a + c) / 2.0, g0, g1)
        opt = make_optimizer()
        st = create_train_state(params, opt, cfg)
        updates, _ = opt.update(grads, st.opt_state, params)
        import optax

        want = optax.apply_updates(params, updates)
        np.testing.assert_allclose(float(loss), float((l0 + l1) / 2.0), rtol=1e-5)
        got_k = np.asarray(state2.params["llm"]["layers"]["mlp"]["down"]["kernel"])
        want_k = np.asarray(want["llm"]["layers"]["mlp"]["down"]["kernel"])
        np.testing.assert_allclose(got_k, want_k, rtol=2e-4, atol=2e-6)

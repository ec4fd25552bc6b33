"""e2e-VAE training extras (reference bagel.py:63-88, 122-199): latent
batch-norm vs a torch BatchNorm2d oracle, REPA cosine alignment with a random
frozen teacher, and finite gradients through both MoT experts with the
config-gated losses on."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, E2EVAEConfig, LLMConfig, VAEConfig, ViTConfig
from unimedvl_tpu.models import bagel
from unimedvl_tpu.training.e2e_vae import (
    BatchNormState,
    init_repa_params,
    latent_batch_norm,
    repa_alignment_loss,
)


class TestLatentBatchNorm:
    def test_matches_torch_batchnorm2d(self):
        torch = pytest.importorskip("torch")
        zc, p = 4, 2
        N = 12
        rng = np.random.default_rng(0)
        # latent [1, zc, h*p, w*p] -> patchified tokens [N, p*p*zc]
        h = w = int(np.sqrt(N))
        lat = rng.standard_normal((1, zc, h * p, w * p)).astype(np.float32) * 2 + 0.5

        bn = torch.nn.BatchNorm2d(zc, eps=1e-4, momentum=0.1, affine=False,
                                  track_running_stats=True)
        bn.train()
        want = bn(torch.from_numpy(lat)).numpy()

        # same elements as tokens: chpwq -> hwpqc
        z = lat[0].reshape(zc, h, p, w, p)
        tokens = np.einsum("chpwq->hwpqc", z).reshape(h * w, p * p * zc)
        state = BatchNormState.create(zc)
        normed, new_state = latent_batch_norm(
            jnp.asarray(tokens), state, zc, training=True, momentum=0.1, eps=1e-4
        )
        # map the oracle through the same patchify for comparison
        zw = want[0].reshape(zc, h, p, w, p)
        want_tokens = np.einsum("chpwq->hwpqc", zw).reshape(h * w, p * p * zc)
        np.testing.assert_allclose(np.asarray(normed), want_tokens, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state.mean), bn.running_mean.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(new_state.var), bn.running_var.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_eval_mode_uses_running_stats(self):
        zc = 4
        state = BatchNormState(
            mean=jnp.asarray([1.0, 2.0, 3.0, 4.0]),
            var=jnp.asarray([4.0, 1.0, 0.25, 9.0]),
        )
        tokens = jnp.ones((3, 4 * zc))
        normed, new_state = latent_batch_norm(
            tokens, state, zc, training=False, eps=0.0
        )
        x = np.asarray(normed).reshape(-1, zc)
        want = (1.0 - np.array([1, 2, 3, 4])) / np.sqrt([4.0, 1.0, 0.25, 9.0])
        np.testing.assert_allclose(x, np.tile(want, (12, 1)), rtol=1e-5)
        assert new_state is state


class TestRepaAlignment:
    def test_cosine_value_and_frozen_teacher(self):
        rng = np.random.default_rng(1)
        N, C, Dt = 6, 16, 8
        feats = jnp.asarray(rng.standard_normal((N, C)), jnp.float32)
        teacher = jnp.asarray(rng.standard_normal((N, Dt)), jnp.float32)
        params = init_repa_params(jax.random.PRNGKey(0), C, E2EVAEConfig(teacher_feature_dim=Dt))

        loss = repa_alignment_loss(feats, teacher, params)
        # manual
        z = np.asarray(feats) @ np.asarray(params["proj"]["kernel"]) + np.asarray(params["proj"]["bias"])
        zn = z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        tn = np.asarray(teacher) / (np.linalg.norm(teacher, axis=-1, keepdims=True) + 1e-8)
        want = float(np.mean(1 - np.sum(zn * tn, axis=-1)))
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

        # gradient flows to student+proj, NOT to teacher
        g_feats, g_teacher, g_proj = jax.grad(
            lambda f, t, p: repa_alignment_loss(f, t, p), argnums=(0, 1, 2)
        )(feats, teacher, params)
        assert float(jnp.abs(g_feats).sum()) > 0
        assert float(jnp.abs(g_teacher).sum()) == 0.0
        assert float(jnp.abs(g_proj["proj"]["kernel"]).sum()) > 0


E2E_CFG = BagelConfig(
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
    max_latent_size=8,
    vit_max_num_patch_per_side=8,
    e2e=E2EVAEConfig(
        enable_batch_norm=True, teacher_feature_dim=8, diffusion_feature_layer=1,
    ),
)


class TestE2ETrainForward:
    @pytest.mark.slow
    def test_losses_and_grads_through_both_experts(self):
        from unimedvl_tpu.data.packing import pack_training_batch

        params = bagel.init_params(jax.random.PRNGKey(0), E2E_CFG, llm2vae_zero=False)
        assert "repa_proj" in params

        rng = np.random.default_rng(0)
        n_vae = 4
        sample = [
            {"type": "text", "ids": [1, 5, 9, 3, 2], "loss": True},
            {
                "type": "vae",
                "clean_tokens": rng.standard_normal((n_vae, E2E_CFG.patch_latent_dim)).astype(np.float32),
                "pos_ids": np.arange(n_vae, dtype=np.int64),
                "timestep_raw": 0.3,
                "loss": True,
            },
        ]
        batch = {k: jnp.asarray(v) for k, v in pack_training_batch([sample], pad_multiple=16).items()}
        # random frozen teacher: any callable producing [N, Dt] works; here a
        # fixed random projection of the clean latents stands in for DINOv2
        teacher_w = jnp.asarray(
            rng.standard_normal((E2E_CFG.patch_latent_dim, 8)), jnp.float32
        )
        batch["repa_teacher_features"] = batch["vae_clean_tokens"] @ teacher_w

        bn_state = BatchNormState.create(E2E_CFG.vae.z_channels)

        def loss_fn(p):
            out = bagel.train_forward(p, E2E_CFG, batch, jax.random.PRNGKey(1), bn_state=bn_state)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        assert "repa_align" in out and np.isfinite(float(out["repa_align"]))
        assert "repa_vae_align" in out and np.isfinite(float(out["repa_vae_align"]))
        assert "bn_state" in out
        # running stats moved off their init
        assert float(jnp.abs(out["bn_state"].mean).sum()) > 0

        # gradients reach BOTH experts and both repa projections
        g_und = grads["llm"]["layers"]["mlp"]["gate"]["kernel"]
        g_gen = grads["llm"]["layers"]["mlp_moe_gen"]["gate"]["kernel"]
        g_proj = grads["repa_proj"]["proj"]["kernel"]
        g_vae_proj = grads["repa_vae_proj"]["proj"]["kernel"]
        assert float(jnp.abs(g_und).sum()) > 0
        assert float(jnp.abs(g_gen).sum()) > 0
        assert float(jnp.abs(g_proj).sum()) > 0
        assert float(jnp.abs(g_vae_proj).sum()) > 0

        # repa_vae_coeff is actually consumed: the loss moves with the knob
        import dataclasses

        cfg2 = dataclasses.replace(
            E2E_CFG, e2e=dataclasses.replace(E2E_CFG.e2e, repa_vae_coeff=0.0)
        )
        out2 = bagel.train_forward(
            params, cfg2, batch, jax.random.PRNGKey(1), bn_state=bn_state
        )
        want_delta = E2E_CFG.e2e.repa_vae_coeff * float(out["repa_vae_align"])
        np.testing.assert_allclose(
            float(loss) - float(out2["loss"]), want_delta, rtol=1e-4
        )

    def test_vae_alignment_grad_reaches_latents(self):
        """The VAE-side alignment gradient must flow into the latent tokens
        themselves (so a traced VAE encoder would receive it)."""
        from unimedvl_tpu.data.packing import pack_training_batch

        params = bagel.init_params(jax.random.PRNGKey(0), E2E_CFG, llm2vae_zero=False)
        rng = np.random.default_rng(7)
        n_vae = 4
        sample = [
            {"type": "text", "ids": [1, 2], "loss": True},
            {
                "type": "vae",
                "clean_tokens": rng.standard_normal((n_vae, E2E_CFG.patch_latent_dim)).astype(np.float32),
                "pos_ids": np.arange(n_vae, dtype=np.int64),
                "timestep_raw": 0.3,
                "loss": True,
            },
        ]
        batch = {k: jnp.asarray(v) for k, v in pack_training_batch([sample], pad_multiple=16).items()}
        teacher_w = jnp.asarray(
            rng.standard_normal((E2E_CFG.patch_latent_dim, 8)), jnp.float32
        )
        batch["repa_teacher_features"] = batch["vae_clean_tokens"] @ teacher_w

        def vae_align_only(clean_tokens):
            b = dict(batch)
            b["vae_clean_tokens"] = clean_tokens
            out = bagel.train_forward(params, E2E_CFG, b, jax.random.PRNGKey(1))
            return E2E_CFG.e2e.repa_vae_coeff * out["repa_vae_align"]

        g = jax.grad(vae_align_only)(batch["vae_clean_tokens"])
        assert float(jnp.abs(g).sum()) > 0

    def test_bn_changes_flow_target(self):
        """With BN on, the MSE target must be built from the NORMED latents —
        turning BN off must change the loss for non-normalized inputs."""
        from unimedvl_tpu.data.packing import pack_training_batch

        params = bagel.init_params(jax.random.PRNGKey(0), E2E_CFG, llm2vae_zero=False)
        rng = np.random.default_rng(3)
        sample = [
            {"type": "text", "ids": [2, 4], "loss": True},
            {
                "type": "vae",
                "clean_tokens": (rng.standard_normal((4, E2E_CFG.patch_latent_dim)) * 3 + 1).astype(np.float32),
                "pos_ids": np.arange(4, dtype=np.int64),
                "timestep_raw": 0.3,
                "loss": True,
            },
        ]
        batch = {k: jnp.asarray(v) for k, v in pack_training_batch([sample], pad_multiple=16).items()}
        bn_state = BatchNormState.create(E2E_CFG.vae.z_channels)
        with_bn = bagel.train_forward(
            params, E2E_CFG, batch, jax.random.PRNGKey(1), bn_state=bn_state
        )
        without_bn = bagel.train_forward(
            params, E2E_CFG, batch, jax.random.PRNGKey(1), bn_state=None
        )
        assert float(with_bn["mse"]) != pytest.approx(float(without_bn["mse"]))

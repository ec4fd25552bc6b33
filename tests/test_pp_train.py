"""Pipeline-parallel training (parallel/pp_train.py): GPipe schedule over a
"pipe" mesh axis must be numerically transparent — same loss and grads as
the mean of per-microbatch bagel.train_forward calls on one device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.packing import pack_training_batch
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel import create_mesh, pipeline_train_loss


CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
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


def make_microbatches(m=3, seed=0):
    rng = np.random.default_rng(seed)
    outs = []
    for i in range(m):
        sample = [
            {"type": "text", "ids": [1, 5 + i, 9, 3, 2], "loss": True},
            {
                "type": "vit",
                "patch_tokens": rng.standard_normal((16, 12)).astype(np.float32),
                "pos_ids": np.arange(16, dtype=np.int64),
            },
            {
                "type": "vae",
                "clean_tokens": rng.standard_normal((4, CFG.patch_latent_dim)).astype(
                    np.float32
                ),
                "pos_ids": np.arange(4, dtype=np.int64),
                "timestep_raw": 0.3 + 0.1 * i,
                "loss": True,
            },
        ]
        outs.append(pack_training_batch([sample], pad_multiple=16))
    return {k: jnp.asarray(np.stack([o[k] for o in outs])) for k in outs[0]}


def reference_mean_loss(params, batches, rng, m):
    rngs = jax.random.split(rng, m)

    def one(batch, r):
        return bagel.train_forward(params, CFG, batch, r)["loss"]

    losses = jax.vmap(one)(batches, rngs)
    return jnp.mean(losses)


class TestPipelineParallel:
    @pytest.mark.slow
    @pytest.mark.parametrize("stages,m", [(2, 3), (4, 4)])
    def test_loss_and_grad_parity(self, stages, m):
        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batches = make_microbatches(m)
        rng = jax.random.PRNGKey(7)
        mesh = create_mesh((stages,), ("pipe",), devices=jax.devices()[:stages])

        def pp_loss(p):
            loss, _ = pipeline_train_loss(p, CFG, mesh, batches, rng)
            return loss

        def ref_loss(p):
            return reference_mean_loss(p, batches, rng, m)

        with jax.set_mesh(mesh):
            got, got_g = jax.value_and_grad(pp_loss)(params)
        want, want_g = jax.value_and_grad(ref_loss)(params)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        for path in (
            ("llm", "layers", "mlp", "down", "kernel"),
            ("llm", "layers", "attn", "q", "kernel"),
            ("llm", "embed_tokens"),
            ("llm2vae", "kernel"),
        ):
            g1, g2 = got_g, want_g
            for k in path:
                g1, g2 = g1[k], g2[k]
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=1e-6,
                err_msg=str(path),
            )

    def test_pp_tp_composed_parity(self):
        """("pipe", "model") mesh: manual GPipe over pipe, auto TP over model
        (partial-auto shard_map) — same loss/grads as the single-device mean."""
        from unimedvl_tpu.parallel.pp_train import place_params_pp

        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batches = make_microbatches(3)
        rng = jax.random.PRNGKey(7)
        mesh = create_mesh((2, 2), ("pipe", "model"), devices=jax.devices()[:4])
        placed = place_params_pp(params, mesh, cfg=CFG)
        k = placed["llm"]["layers"]["mlp"]["down"]["kernel"]
        ss = k.sharding.shard_shape(k.shape)
        assert ss[0] * 2 == k.shape[0] and ss[1] * 2 == k.shape[1], (ss, k.shape)

        def pp_loss(p):
            loss, _ = pipeline_train_loss(p, CFG, mesh, batches, rng)
            return loss

        with jax.set_mesh(mesh):
            got, got_g = jax.jit(jax.value_and_grad(pp_loss))(placed)
        want, want_g = jax.value_and_grad(
            lambda p: reference_mean_loss(p, batches, rng, 3)
        )(params)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        for path in (
            ("llm", "layers", "mlp", "down", "kernel"),
            ("llm", "layers", "attn", "q_gen", "kernel"),
            ("llm", "embed_tokens"),
        ):
            g1, g2 = got_g, want_g
            for kk in path:
                g1, g2 = g1[kk], g2[kk]
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=1e-6,
                err_msg=str(path),
            )

    def test_pp_dp_tp_3d_parity(self):
        """("data", "pipe", "model") mesh — microbatches shard over "data"
        (independent pipeline per data slice), layers pipe-shard, TP auto
        over "model": loss/grads must equal the single-device mean over all
        4 microbatches exactly (full 3D composition)."""
        from unimedvl_tpu.parallel.pp_train import place_params_pp

        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batches = make_microbatches(4)
        rng = jax.random.PRNGKey(11)
        mesh = create_mesh((2, 2, 2), ("data", "pipe", "model"))
        placed = place_params_pp(params, mesh, cfg=CFG)

        def pp_loss(p):
            loss, _ = pipeline_train_loss(p, CFG, mesh, batches, rng)
            return loss

        with jax.set_mesh(mesh):
            got, got_g = jax.jit(jax.value_and_grad(pp_loss))(placed)
        want, want_g = jax.value_and_grad(
            lambda p: reference_mean_loss(p, batches, rng, 4)
        )(params)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        for path in (
            ("llm", "layers", "mlp", "down", "kernel"),
            ("llm", "layers", "attn", "q_gen", "kernel"),
            ("llm", "embed_tokens"),
        ):
            g1, g2 = got_g, want_g
            for kk in path:
                g1, g2 = g1[kk], g2[kk]
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=1e-6,
                err_msg=str(path),
            )

    def test_pp_tp_train_step(self):
        from unimedvl_tpu.training.trainer import make_pp_train_step

        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batches = make_microbatches(2)
        mesh = create_mesh((2, 2), ("pipe", "model"), devices=jax.devices()[:4])
        step, init_state = make_pp_train_step(CFG, mesh, params)
        state = init_state()
        k = state.params["llm"]["layers"]["mlp"]["down"]["kernel"]
        ss = k.sharding.shard_shape(k.shape)
        assert ss[0] * 2 == k.shape[0] and ss[1] * 2 == k.shape[1], (ss, k.shape)
        with jax.set_mesh(mesh):
            state, l0 = step(state, batches, jax.random.PRNGKey(5))
            state, l1 = step(state, batches, jax.random.PRNGKey(5))
        assert np.isfinite([float(l0), float(l1)]).all()
        assert float(l1) < float(l0)

    def test_pp_train_step_runs_and_improves(self):
        from unimedvl_tpu.training.trainer import make_pp_train_step

        params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
        batches = make_microbatches(2)
        mesh = create_mesh((2,), ("pipe",), devices=jax.devices()[:2])
        step, init_state = make_pp_train_step(CFG, mesh, params)
        state = init_state()
        # layer stack must actually be sharded over pipe
        k = state.params["llm"]["layers"]["mlp"]["down"]["kernel"]
        assert k.sharding.shard_shape(k.shape)[0] * 2 == k.shape[0]
        losses = []
        with jax.set_mesh(mesh):
            for i in range(3):
                state, loss = step(state, batches, jax.random.PRNGKey(5))
                losses.append(float(loss))
        assert np.isfinite(losses).all(), losses
        assert losses[-1] < losses[0], losses  # same batch, loss must drop

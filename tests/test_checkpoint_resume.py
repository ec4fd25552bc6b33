"""Training checkpoint/resume: an FSDP-sharded TrainState must orbax-save,
restore onto the mesh, and continue EXACTLY as the uninterrupted run
(same next-step loss and params) — the production resume contract
(SURVEY.md §5 checkpoint/resume)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from unimedvl_tpu.config import BagelConfig, LLMConfig, ViTConfig, VAEConfig
from unimedvl_tpu.data.packing import pack_training_batch
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel import create_mesh
from unimedvl_tpu.training.trainer import make_train_step
from unimedvl_tpu.weights.snapshot import save_snapshot, restore_snapshot


CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
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


def _batch():
    rng = np.random.default_rng(0)
    sample = [
        {"type": "text", "ids": [1, 5, 9, 3, 2], "loss": True},
        {
            "type": "vae",
            "clean_tokens": rng.standard_normal((4, CFG.patch_latent_dim)).astype(
                np.float32
            ),
            "pos_ids": np.arange(4, dtype=np.int64),
            "timestep_raw": 0.3,
            "loss": True,
        },
    ]
    one = pack_training_batch([sample], pad_multiple=16)
    return {k: jnp.asarray(np.stack([v, v])) for k, v in one.items()}


@pytest.mark.slow
def test_fsdp_train_state_save_restore_resume(tmp_path):
    mesh = create_mesh((2, 4))
    params = bagel.init_params(jax.random.PRNGKey(0), CFG, llm2vae_zero=False)
    step, init_state = make_train_step(CFG, mesh, params, fsdp=True)
    batch = _batch()

    with jax.set_mesh(mesh):
        state1, _ = step(init_state(), batch, jax.random.PRNGKey(1))
    save_snapshot(str(tmp_path / "snap"), state1)

    # uninterrupted continuation
    with jax.set_mesh(mesh):
        state2a, loss2a = step(state1, batch, jax.random.PRNGKey(2))
    ref_kernel = np.asarray(state2a.params["llm"]["layers"]["mlp"]["down"]["kernel"])

    # resume path: fresh (differently-valued) state supplies structure +
    # shardings as the restore target, then the step continues
    restored = restore_snapshot(str(tmp_path / "snap"), target=init_state())
    k = restored.params["llm"]["layers"]["mlp"]["down"]["kernel"]
    assert k.sharding.shard_shape(k.shape)[1] * 4 == k.shape[1], "TP lost"
    assert k.sharding.shard_shape(k.shape)[2] * 2 == k.shape[2], "FSDP lost"
    assert int(restored.step) == 1
    with jax.set_mesh(mesh):
        state2b, loss2b = step(restored, batch, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(loss2a), float(loss2b), rtol=1e-6)
    np.testing.assert_allclose(
        ref_kernel,
        np.asarray(state2b.params["llm"]["layers"]["mlp"]["down"]["kernel"]),
        rtol=1e-6,
    )

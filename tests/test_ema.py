"""EMA parameter tracking in the trainer: the released UniMedVL checkpoints
are EMA weights (ema.safetensors, interactive_vqa_inferencer.py:127-161), so
training maintains an fp32 EMA shadow sharded exactly like params, and the
shadow exports through the released-format writer."""

import numpy as np
import jax
import jax.numpy as jnp

from unimedvl_tpu.config import BagelConfig, LLMConfig
from unimedvl_tpu.data.packing import pack_training_batch
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel import create_mesh
from unimedvl_tpu.training.trainer import make_train_step

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    ),
    vit=None, vae=None, visual_und=False, visual_gen=False,
)

DECAY = 0.5  # large 1-decay so two steps produce a visibly mixed shadow


def _batch(seed=0):
    b = pack_training_batch(
        [[{"type": "text", "ids": [1, 5, 9, 3, 2, 8], "loss": True}]],
        pad_multiple=16,
    )
    return {k: jnp.asarray(np.stack([v, v])) for k, v in b.items()}


def _leaf(tree):
    return np.asarray(tree["llm"]["layers"]["mlp"]["down"]["kernel"],
                      dtype=np.float32)


class TestEMA:
    def _run(self, **kw):
        params = bagel.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        mesh = create_mesh((2, 4))
        step, init_state = make_train_step(
            CFG, mesh, params, ema_decay=DECAY, **kw
        )
        with jax.set_mesh(mesh):
            state = init_state()
            p_hist = [_leaf(state.params)]
            e0 = _leaf(state.ema_params)
            np.testing.assert_array_equal(e0, p_hist[0])  # starts equal
            for i in range(2):
                state, _ = step(state, _batch(i), jax.random.PRNGKey(i))
                p_hist.append(_leaf(state.params))
        return state, p_hist

    def test_ema_follows_decay_recurrence(self):
        state, p = self._run()
        e1 = DECAY * p[0] + (1 - DECAY) * p[1]
        e2 = DECAY * e1 + (1 - DECAY) * p[2]
        np.testing.assert_allclose(_leaf(state.ema_params), e2,
                                   rtol=1e-6, atol=1e-7)
        # the shadow lags params (it is not just a copy)
        assert not np.allclose(_leaf(state.ema_params), p[2])

    def test_ema_sharded_like_params_fsdp(self):
        state, _ = self._run(fsdp=True)
        k = state.params["llm"]["layers"]["mlp"]["down"]["kernel"]
        e = state.ema_params["llm"]["layers"]["mlp"]["down"]["kernel"]
        assert e.dtype == jnp.float32
        assert e.sharding.shard_shape(e.shape) == k.sharding.shard_shape(k.shape)

    def test_ema_exports_released_format(self, tmp_path):
        from unimedvl_tpu.weights.bagel_export import export_bagel_checkpoint
        from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

        state, _ = self._run()
        out = str(tmp_path / "ema_ckpt")
        export_bagel_checkpoint(out, jax.device_get(state.ema_params), CFG)
        reloaded = load_bagel_checkpoint(out, cfg=CFG, dtype=jnp.bfloat16)
        want = np.asarray(
            _leaf(state.ema_params).astype(jnp.bfloat16), dtype=np.float32
        )
        np.testing.assert_array_equal(_leaf(reloaded), want)

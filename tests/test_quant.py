"""Int8 weight-quantization serving mode tests."""

import numpy as np
import jax
import jax.numpy as jnp

from unimedvl_tpu.config import LLMConfig
from unimedvl_tpu.models import qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache
from unimedvl_tpu.quant import (
    dequantize_weight,
    quantize_llm_params,
    quantize_weight,
    quantized_linear,
)

CFG = LLMConfig(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
)


class TestQuant:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
        q = quantize_weight(w)
        assert q["kernel_q"].dtype == jnp.int8
        back = dequantize_weight(q, jnp.float32)
        err = np.abs(np.asarray(back) - np.asarray(w))
        col_max = np.abs(np.asarray(w)).max(axis=0)
        assert (err <= col_max[None, :] / 127.0 * 1.01).all()

    def test_quantized_linear_matches_dequant(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((5, 32)).astype(np.float32))
        q = quantize_weight(w)
        got = quantized_linear(x, q)
        want = x @ dequantize_weight(q, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    def test_quantized_decode_runs_and_approximates_bf16(self):
        params = mot.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
        qparams = dict(params)
        qparams = {**params, **{"lm_head": params["lm_head"]}}
        qllm = quantize_llm_params(params)

        # structure: layer kernels replaced, norms untouched
        lp = jax.tree.map(lambda a: a, qllm["layers"], is_leaf=lambda x: hasattr(x, "dtype"))
        assert qllm["layers"]["attn"]["q"]["kernel_q"].dtype == jnp.int8
        assert "scale" in qllm["layers"]["mlp"]["gate"]
        assert qllm["layers"]["input_layernorm"]["scale"].dtype != jnp.int8
        assert qllm["lm_head"]["kernel_q"].dtype == jnp.int8

        S, T = 1, 6
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((S, T, CFG.hidden_size)).astype(np.float32))
        pos = jnp.arange(T)[None]
        cache = KVCache.create(2, S, 16, CFG.num_key_value_heads, CFG.head_dim, jnp.float32)

        ref, _ = mot.forward(params, CFG, x, pos, cache, ForwardSpec("und", True, True))
        got, _ = mot.forward(qllm, CFG, x, pos, cache, ForwardSpec("und", True, True))
        # int8 error is small per layer; require qualitative agreement
        r, g = np.asarray(ref), np.asarray(got)
        cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
        assert cos > 0.99, cos

        logits_ref = mot.lm_head(params, ref[:, -1])
        logits_q = mot.lm_head(qllm, ref[:, -1])
        assert int(jnp.argmax(logits_ref)) == int(jnp.argmax(logits_q))

"""Prompt-lookup speculative decode (bagel.generate_text_spec): GREEDY-EXACT
parity with the contiguous-cache decode (generate_text_ctx) — same tokens,
lengths, and final cache — while verifying k draft tokens per forward.
Exactness must hold regardless of draft quality (a draft is accepted only
when it equals the greedy argmax at its position), so parity is asserted in
both the no-acceptance regime (random drafts) and an engineered
full-acceptance regime (oracle continuation planted in the lookup history).
Reference greedy loop being accelerated: bagel.py:1259-1314."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.config import BagelConfig, LLMConfig, VAEConfig
from unimedvl_tpu.models import bagel, qwen2_mot as mot

CFG = BagelConfig(
    llm=LLMConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
    ),
    vit=None, visual_und=False,
    vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                  downsample=2),
    max_latent_size=8,
)
HL = 96  # hist buffer capacity
CAP = 128  # kv cache capacity


@pytest.fixture(scope="module")
def params():
    return bagel.init_params(jax.random.PRNGKey(0), CFG)


def _prefill(params, prompts):
    """prompts: list[list[int]] (ragged). Returns cache, start_tokens,
    positions, hist_ids, hist_lens. The LAST prompt id is the start token
    (it is forwarded by the decode, not the prefill)."""
    S = len(prompts)
    from unimedvl_tpu.models.qwen2_mot import KVCache

    cache = KVCache.create(
        CFG.llm.num_hidden_layers, S, CAP, CFG.llm.num_key_value_heads,
        CFG.llm.head_dim, jnp.float32,
    )
    T = max(len(p) - 1 for p in prompts)
    ids = np.zeros((S, T), np.int32)
    pos = np.zeros((S, T), np.int32)
    valid = np.zeros((S, T), bool)
    for s, p in enumerate(prompts):
        n = len(p) - 1
        ids[s, :n] = p[:-1]
        pos[s, :n] = np.arange(n)
        valid[s, :n] = True
    cache = bagel.prefill_text(
        params, CFG, cache, jnp.asarray(ids), jnp.asarray(pos),
        jnp.asarray(valid),
    )
    start = jnp.asarray([p[-1] for p in prompts], jnp.int32)
    positions = jnp.asarray([len(p) - 1 for p in prompts], jnp.int32)
    hist = np.zeros((S, HL), np.int32)
    hlen = np.zeros((S,), np.int32)
    for s, p in enumerate(prompts):
        hist[s, : len(p)] = p
        hlen[s] = len(p)
    return cache, start, positions, jnp.asarray(hist), jnp.asarray(hlen)


def _assert_same(params, prompts, max_len, eos, hist=None, hlen=None,
                 k_draft=4, ngram=3):
    cache, start, positions, hist0, hlen0 = _prefill(params, prompts)
    if hist is None:
        hist, hlen = hist0, hlen0
    eos = jnp.asarray(eos, jnp.int32)
    want_out, want_len, want_cache = bagel.generate_text_ctx(
        params, CFG, cache, start, positions, max_len, eos,
    )
    got_out, got_len, got_cache, n_fwd = bagel.generate_text_spec(
        params, CFG, cache, start, positions, max_len, eos,
        hist, hlen, k_draft=k_draft, ngram=ngram,
    )
    np.testing.assert_array_equal(np.asarray(got_out), np.asarray(want_out))
    np.testing.assert_array_equal(np.asarray(got_len), np.asarray(want_len))
    np.testing.assert_array_equal(
        np.asarray(got_cache.lens), np.asarray(want_cache.lens)
    )
    for s in range(len(prompts)):
        n = int(want_cache.lens[s])
        np.testing.assert_allclose(
            np.asarray(got_cache.k[:, s, :, :n], dtype=np.float32),
            np.asarray(want_cache.k[:, s, :, :n], dtype=np.float32),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got_cache.v[:, s, :, :n], dtype=np.float32),
            np.asarray(want_cache.v[:, s, :, :n], dtype=np.float32),
            rtol=1e-5, atol=1e-6,
        )
    return want_out, want_len, int(n_fwd)


class TestSpecDecode:
    def test_random_prompt_parity(self, params):
        """No-acceptance regime: lookup drafts are junk, parity must hold."""
        _assert_same(params, [[5, 17, 3, 44, 9]], 10, eos=1)

    def test_multistream_parity(self, params):
        """Streams drain at different rates (per-stream freeze/lens)."""
        _assert_same(
            params, [[5, 17, 3, 44, 9], [7, 2], [31, 8, 8, 12]], 8, eos=1
        )

    def test_eos_parity(self, params):
        """eos chosen from the actual greedy continuation so both variants
        must truncate identically."""
        out, lens, _ = _assert_same(params, [[5, 17, 3, 44, 9]], 12, eos=1)
        ids = np.asarray(out[0])
        ids = ids[ids >= 0]
        if len(ids) > 2:  # stop mid-way through the continuation
            _assert_same(params, [[5, 17, 3, 44, 9]], 12, eos=int(ids[2]))

    def test_planted_oracle_accepts_multi(self, params):
        """Plant the true greedy continuation in the lookup history: every
        draft matches, so the loop takes ~len/(k+1) forwards while output
        stays exact. This pins the multi-token acceptance path (matched
        prefix, lens bookkeeping, windowed emission) deterministically."""
        prompt = [5, 17, 3, 44, 9]
        max_len = 12
        # plain run gives the oracle continuation
        cache, start, positions, _, _ = _prefill(params, [prompt])
        want_out, want_len, _ = bagel.generate_text_ctx(
            params, CFG, cache, start, positions, max_len,
            jnp.asarray(1, jnp.int32),
        )
        cont = np.asarray(want_out[0])
        cont = cont[cont >= 0][1:]  # emitted after the start token
        # hist = [tail-ngram-of-prompt + start + continuation] ++ prompt:
        # the first lookup's trailing n-gram (..., 44, 9) matches the planted
        # copy and proposes the true continuation
        planted = list(prompt[-3:]) + list(cont)
        hist = np.zeros((1, HL), np.int32)
        seq = planted + prompt
        hist[0, : len(seq)] = seq
        hlen = jnp.asarray([len(seq)], jnp.int32)
        _, _, n_fwd = _assert_same(
            params, [prompt], max_len, eos=1,
            hist=jnp.asarray(hist), hlen=hlen, k_draft=4, ngram=3,
        )
        n_tokens = int(want_len[0])
        assert n_fwd < n_tokens, (n_fwd, n_tokens)
        assert n_fwd <= -(-(n_tokens) // 5) + 2, (n_fwd, n_tokens)

    def test_int8_kv_cache_parity(self, params):
        """Spec decode over a QUANTIZED kv cache (serving / kv_quantized
        pipeline mode): same tokens and lens as the plain contiguous decode
        on the same quantized cache."""
        from unimedvl_tpu.models.qwen2_mot import KVCache

        prompts = [[5, 17, 3, 44, 9], [7, 2, 11]]
        S = len(prompts)
        cache = KVCache.create(
            CFG.llm.num_hidden_layers, S, CAP, CFG.llm.num_key_value_heads,
            CFG.llm.head_dim, jnp.float32, quantized=True,
        )
        T = max(len(p) - 1 for p in prompts)
        ids = np.zeros((S, T), np.int32)
        pos = np.zeros((S, T), np.int32)
        valid = np.zeros((S, T), bool)
        for s, p in enumerate(prompts):
            n = len(p) - 1
            ids[s, :n] = p[:-1]
            pos[s, :n] = np.arange(n)
            valid[s, :n] = True
        cache = bagel.prefill_text(
            params, CFG, cache, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid),
        )
        assert cache.k_scale is not None
        start = jnp.asarray([p[-1] for p in prompts], jnp.int32)
        positions = jnp.asarray([len(p) - 1 for p in prompts], jnp.int32)
        hist = np.zeros((S, HL), np.int32)
        hlen = np.zeros((S,), np.int32)
        for s, p in enumerate(prompts):
            hist[s, : len(p)] = p
            hlen[s] = len(p)
        eos = jnp.asarray(1, jnp.int32)
        want_out, want_len, want_cache = bagel.generate_text_ctx(
            params, CFG, cache, start, positions, 8, eos,
        )
        got_out, got_len, got_cache, _ = bagel.generate_text_spec(
            params, CFG, cache, start, positions, 8, eos,
            jnp.asarray(hist), jnp.asarray(hlen), k_draft=3,
        )
        np.testing.assert_array_equal(np.asarray(got_out), np.asarray(want_out))
        np.testing.assert_array_equal(
            np.asarray(got_cache.lens), np.asarray(want_cache.lens)
        )
        assert got_cache.k_scale is not None

    def test_k1_equals_k7(self, params):
        """Draft width must not change output."""
        a = _assert_same(params, [[9, 9, 2, 9, 9]], 9, eos=1, k_draft=1)
        b = _assert_same(params, [[9, 9, 2, 9, 9]], 9, eos=1, k_draft=7)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

"""Pallas flash-attention kernel vs the jnp masked-softmax reference
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.ops.attention import gqa_attention
from unimedvl_tpu.models.qwen2_mot import _suffix_mask, _concat_mask
from unimedvl_tpu.ops.flash_attention import (
    flash_block_attention,
    flash_cache_block_attention,
)


def make_inputs(S, T, M, H, Hk, D, lens, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((S, T, H, D)).astype(np.float32)
    k = rng.standard_normal((S, M, Hk, D)).astype(np.float32)
    v = rng.standard_normal((S, M, Hk, D)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lens, jnp.int32)


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_incache_block_matches_reference(self, causal):
        """Block appended at [lens, lens+T) inside the cache (update path)."""
        S, T, M, H, Hk, D = 2, 128, 256, 4, 2, 128
        lens = np.asarray([37, 90])
        q, k, v, lens_j = make_inputs(S, T, M, H, Hk, D, lens)
        # reference mask path
        mask = _suffix_mask(M, T, lens_j, causal)
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, lens_j, causal, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_concat_block_matches_reference(self):
        """Block concatenated after the cache (no-update CFG path)."""
        S, T, M0, H, Hk, D = 1, 96, 128, 4, 4, 128
        lens = np.asarray([70])
        q, k, v, lens_j = make_inputs(S, T, M0 + T, H, Hk, D, lens, seed=1)
        mask = _concat_mask(M0, T, lens_j, False)
        want = gqa_attention(q, k, v, mask)
        bstart = jnp.asarray([M0], jnp.int32)
        got = flash_block_attention(
            q, k, v, lens_j, bstart, False, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("causal", [True, False])
    def test_two_phase_matches_concat(self, causal):
        """flash_cache_block_attention == jnp reference over concat(cache, block)."""
        S, T, M0, H, Hk, D = 2, 96, 192, 4, 2, 128
        lens = np.asarray([100, 37])
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        kc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        vc = jnp.asarray(rng.standard_normal((S, M0, Hk, D)), jnp.float32)
        kb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        vb = jnp.asarray(rng.standard_normal((S, T, Hk, D)), jnp.float32)
        lens_j = jnp.asarray(lens, jnp.int32)

        k_all = jnp.concatenate([kc, kb], axis=1)
        v_all = jnp.concatenate([vc, vb], axis=1)
        mask = _concat_mask(M0, T, lens_j, causal)
        want = gqa_attention(q, k_all, v_all, mask)
        got = flash_cache_block_attention(
            q, kc, vc, kb, vb, lens_j, causal, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_head_dim_padding(self):
        """Non-128 head dims (SigLIP = 72) are zero-padded with correct scale."""
        S, T, M, H, Hk, D = 1, 64, 128, 4, 4, 72
        lens = np.asarray([50])
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.standard_normal((S, T, H, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((S, M, Hk, D)), jnp.float32)
        lens_j = jnp.asarray(lens, jnp.int32)
        # ViT-style: only kv < lens attended (block disabled via block_start=M)
        mask = jnp.arange(M)[None, None, :] < lens_j[:, None, None]
        mask = jnp.broadcast_to(mask, (S, T, M))
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, jnp.full_like(lens_j, M), False,
            block_q=64, block_k=64, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
        assert got.shape == (S, T, H, D)

    def test_unaligned_sizes(self):
        """T and M not multiples of the block sizes."""
        S, T, M, H, Hk, D = 2, 50, 130, 2, 1, 128
        lens = np.asarray([30, 11])
        q, k, v, lens_j = make_inputs(S, T, M, H, Hk, D, lens, seed=2)
        mask = _suffix_mask(M, T, lens_j, True)
        want = gqa_attention(q, k, v, mask)
        got = flash_block_attention(
            q, k, v, lens_j, lens_j, True, block_q=64, block_k=64, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

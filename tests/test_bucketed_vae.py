"""Shape-bucketed gen-mode VAE prefill parity: prefill_vae_bucketed (dynamic
<vision_end> row via gen_end_row MoT routing, trailing padding masked) must
leave the cache in exactly the state the exact-shape prefill_vae does, and
downstream decode/denoise must be unaffected."""

import numpy as np
import jax
import jax.numpy as jnp

from unimedvl_tpu.models import bagel
from unimedvl_tpu.models.qwen2_mot import KVCache

from tests.test_pipeline import TINY


def _setup():
    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    rng = np.random.default_rng(1)
    n = 9  # e.g. a 24x24 image at latent_downsample 8 -> 3x3 latents
    latents = rng.standard_normal((1, n, TINY.patch_latent_dim)).astype(np.float32)
    pos_ids = (np.arange(n) % TINY.max_latent_size**2).astype(np.int64)
    se = jnp.asarray([3, 4], jnp.int32)
    return params, n, latents, pos_ids, se


class TestBucketedVaePrefill:
    def test_cache_matches_exact(self):
        params, n, latents, pos_ids, se = _setup()
        cap = 64
        exact = KVCache.create(2, 1, cap, TINY.llm.num_key_value_heads,
                               TINY.llm.head_dim, jnp.float32)
        exact = bagel.prefill_vae(
            params, TINY, exact,
            jnp.asarray(latents), jnp.asarray(pos_ids)[None], se,
            jnp.asarray([2], jnp.int32), jnp.asarray(0.0, jnp.float32),
        )

        bucket = bagel.vit_token_bucket(n)
        assert bucket > n
        padded = np.zeros((1, bucket, TINY.patch_latent_dim), np.float32)
        padded[:, :n] = latents
        ppos = np.zeros(bucket, np.int64)
        ppos[:n] = pos_ids
        bucketed = KVCache.create(2, 1, cap, TINY.llm.num_key_value_heads,
                                  TINY.llm.head_dim, jnp.float32)
        bucketed = bagel.prefill_vae_bucketed(
            params, TINY, bucketed,
            jnp.asarray(padded), jnp.asarray(ppos)[None],
            jnp.asarray(n, jnp.int32), se,
            jnp.asarray([2], jnp.int32), jnp.asarray(0.0, jnp.float32),
        )

        assert int(exact.lens[0]) == n + 2
        assert int(bucketed.lens[0]) == n + 2
        valid = n + 2
        np.testing.assert_allclose(
            np.asarray(bucketed.k[:, :, :, :valid]),
            np.asarray(exact.k[:, :, :, :valid]),
            rtol=2e-4, atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(bucketed.v[:, :, :, :valid]),
            np.asarray(exact.v[:, :, :, :valid]),
            rtol=2e-4, atol=2e-5,
        )

    def test_downstream_decode_matches(self):
        params, n, latents, pos_ids, se = _setup()
        cap = 64

        def decode_after(prefill_fn):
            cache = KVCache.create(2, 1, cap, TINY.llm.num_key_value_heads,
                                   TINY.llm.head_dim, jnp.float32)
            cache = prefill_fn(cache)
            out, _ = bagel.generate_text(
                params, TINY, cache,
                jnp.asarray([5], jnp.int32), jnp.asarray([3], jnp.int32),
                6, jnp.asarray(1, jnp.int32),
            )
            return np.asarray(out)

        def exact_fn(cache):
            return bagel.prefill_vae(
                params, TINY, cache,
                jnp.asarray(latents), jnp.asarray(pos_ids)[None], se,
                jnp.asarray([2], jnp.int32), jnp.asarray(0.0, jnp.float32),
            )

        bucket = bagel.vit_token_bucket(n)
        padded = np.zeros((1, bucket, TINY.patch_latent_dim), np.float32)
        padded[:, :n] = latents
        ppos = np.zeros(bucket, np.int64)
        ppos[:n] = pos_ids

        def bucketed_fn(cache):
            return bagel.prefill_vae_bucketed(
                params, TINY, cache,
                jnp.asarray(padded), jnp.asarray(ppos)[None],
                jnp.asarray(n, jnp.int32), se,
                jnp.asarray([2], jnp.int32), jnp.asarray(0.0, jnp.float32),
            )

        np.testing.assert_array_equal(
            decode_after(bucketed_fn), decode_after(exact_fn)
        )

    def test_bucket_reuse_across_sizes(self):
        """Two different latent counts in the same bucket must hit the same
        compiled program (the whole point of bucketing)."""
        params, _, _, _, se = _setup()
        cap = 64
        sizes = [6, 9]  # both bucket to 16
        bucket = bagel.vit_token_bucket(max(sizes))
        assert all(bagel.vit_token_bucket(s) == bucket for s in sizes)
        rng = np.random.default_rng(2)
        size_before = bagel.prefill_vae_bucketed._cache_size()
        for n in sizes:
            padded = np.zeros((1, bucket, TINY.patch_latent_dim), np.float32)
            padded[:, :n] = rng.standard_normal((1, n, TINY.patch_latent_dim))
            ppos = np.zeros(bucket, np.int64)
            ppos[:n] = np.arange(n) % TINY.max_latent_size**2
            cache = KVCache.create(2, 1, cap, TINY.llm.num_key_value_heads,
                                   TINY.llm.head_dim, jnp.float32)
            cache = bagel.prefill_vae_bucketed(
                params, TINY, cache,
                jnp.asarray(padded), jnp.asarray(ppos)[None],
                jnp.asarray(n, jnp.int32), se,
                jnp.asarray([0], jnp.int32), jnp.asarray(0.0, jnp.float32),
            )
            assert int(cache.lens[0]) == n + 2
        # both sizes hit ONE compiled program
        assert bagel.prefill_vae_bucketed._cache_size() - size_before <= 1

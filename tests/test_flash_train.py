"""Differentiable training flash attention vs the dense-mask reference:
forward parity and gradient parity (custom VJP), interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unimedvl_tpu.ops.attention import gqa_attention
from unimedvl_tpu.ops.blockmask import dense_packed_mask, packed_segment_ids
from unimedvl_tpu.ops.flash_attention_train import packed_train_attention


def setup_case(seed=0):
    sample_lens = [96, 96]
    split_lens = [32, 32, 32, 16, 48, 32]
    attn_modes = ["causal", "full", "noise", "causal", "noise", "full"]
    doc, fn, nz = packed_segment_ids(sample_lens, split_lens, attn_modes)
    T = sum(sample_lens)
    H, Hk, D = 4, 2, 128
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((T, H, D)).astype(np.float32) * 0.3
    k = rng.standard_normal((T, Hk, D)).astype(np.float32) * 0.3
    v = rng.standard_normal((T, Hk, D)).astype(np.float32) * 0.3
    return (
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(doc), jnp.asarray(fn), jnp.asarray(nz),
    )


def dense_ref(q, k, v, doc, fn, nz):
    mask = dense_packed_mask(doc, fn, nz)
    return gqa_attention(q[None], k[None], v[None], mask[None])[0]


class TestTrainFlash:
    def test_forward_parity(self):
        q, k, v, doc, fn, nz = setup_case()
        want = dense_ref(q, k, v, doc, fn, nz)
        got = packed_train_attention(q, k, v, doc, fn, nz, 64, 64, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_gradient_parity(self):
        q, k, v, doc, fn, nz = setup_case(1)
        cot = jnp.asarray(
            np.random.default_rng(2).standard_normal(q.shape).astype(np.float32)
        )

        def loss_dense(q, k, v):
            return jnp.sum(dense_ref(q, k, v, doc, fn, nz) * cot)

        def loss_flash(q, k, v):
            return jnp.sum(packed_train_attention(q, k, v, doc, fn, nz, 64, 64, True) * cot)

        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gd, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_unaligned_length(self):
        sample_lens = [50, 37]
        split_lens = [20, 30, 37]
        attn_modes = ["causal", "noise", "causal"]
        doc, fn, nz = packed_segment_ids(sample_lens, split_lens, attn_modes)
        T = 87
        H, Hk, D = 2, 1, 128
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((T, Hk, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((T, Hk, D)).astype(np.float32))
        doc, fn, nz = jnp.asarray(doc), jnp.asarray(fn), jnp.asarray(nz)
        want = dense_ref(q, k, v, doc, fn, nz)
        got = packed_train_attention(q, k, v, doc, fn, nz, 64, 64, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

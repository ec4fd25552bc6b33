"""Unit tests for core ops against PyTorch oracles (inline, formula-level)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from unimedvl_tpu.ops import (
    rms_norm,
    layer_norm,
    group_norm,
    rope_cos_sin,
    apply_rope,
    get_2d_sincos_pos_embed,
    timestep_embedding,
    gelu_tanh,
)


def torch_rms_norm(x, w, eps=1e-6):
    x32 = x.to(torch.float32)
    var = x32.pow(2).mean(-1, keepdim=True)
    y = x32 * torch.rsqrt(var + eps)
    return w * y.to(x.dtype)


class TestRMSNorm:
    def test_fp32_parity(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((7, 128)).astype(np.float32)
        w = rng.standard_normal(128).astype(np.float32)
        got = rms_norm(jnp.asarray(x), jnp.asarray(w))
        want = torch_rms_norm(torch.from_numpy(x), torch.from_numpy(w)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)

    def test_bf16_dtype_behaviour(self):
        # Reference casts to input dtype BEFORE weight multiply.
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        xb = jnp.asarray(x, dtype=jnp.bfloat16)
        w = jnp.ones(64, dtype=jnp.bfloat16)
        got = rms_norm(xb, w)
        assert got.dtype == jnp.bfloat16
        xt = torch.from_numpy(x).to(torch.bfloat16)
        want = torch_rms_norm(xt, torch.ones(64, dtype=torch.bfloat16))
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32), want.to(torch.float32).numpy()
        )


class TestLayerNorm:
    def test_parity(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((5, 96)).astype(np.float32)
        w = rng.standard_normal(96).astype(np.float32)
        b = rng.standard_normal(96).astype(np.float32)
        got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (96,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


class TestGroupNorm:
    def test_parity_nhwc(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 6, 5, 64)).astype(np.float32)
        w = rng.standard_normal(64).astype(np.float32)
        b = rng.standard_normal(64).astype(np.float32)
        got = group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 32, 1e-6)
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW oracle
        want = torch.nn.functional.group_norm(
            xt, 32, torch.from_numpy(w), torch.from_numpy(b), 1e-6
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def torch_rope(q, k, cos, sin):
    def rotate_half(x):
        x1 = x[..., : x.shape[-1] // 2]
        x2 = x[..., x.shape[-1] // 2 :]
        return torch.cat((-x2, x1), dim=-1)

    cos = cos.unsqueeze(1)  # head dim at axis 1 in [T, H, D] layout
    sin = sin.unsqueeze(1)
    return q * cos + rotate_half(q) * sin, k * cos + rotate_half(k) * sin


class TestRope:
    def test_cos_sin_tables(self):
        pos = jnp.array([0, 1, 5, 100])
        cos, sin = rope_cos_sin(pos, 128, 1_000_000.0)
        inv = 1.0 / (1_000_000.0 ** (torch.arange(0, 128, 2).float() / 128))
        freqs = torch.tensor([0, 1, 5, 100]).float()[:, None] * inv[None]
        emb = torch.cat([freqs, freqs], dim=-1)
        # fp32 pow() precision differs slightly between XLA and torch; the
        # resulting angle error at pos=100 is ~1e-5 rad.
        np.testing.assert_allclose(np.asarray(cos), emb.cos().numpy(), atol=5e-4)
        np.testing.assert_allclose(np.asarray(sin), emb.sin().numpy(), atol=5e-4)

    def test_apply_rope_parity(self):
        rng = np.random.default_rng(4)
        T, H, Hk, D = 6, 4, 2, 32
        q = rng.standard_normal((T, H, D)).astype(np.float32)
        k = rng.standard_normal((T, Hk, D)).astype(np.float32)
        pos = jnp.arange(T)
        cos, sin = rope_cos_sin(pos, D, 10000.0)
        qj, kj = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)
        qt, kt = torch_rope(
            torch.from_numpy(q),
            torch.from_numpy(k),
            torch.from_numpy(np.asarray(cos)),
            torch.from_numpy(np.asarray(sin)),
        )
        np.testing.assert_allclose(np.asarray(qj), qt.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(kj), kt.numpy(), rtol=1e-5, atol=1e-6)


class TestSincos:
    def test_2d_pos_embed_against_reference_formula(self):
        # Independent oracle of modeling_utils.py:23-65.
        def oracle(embed_dim, grid_size):
            grid_h = np.arange(grid_size, dtype=np.float32)
            grid_w = np.arange(grid_size, dtype=np.float32)
            grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)
            grid = grid.reshape([2, 1, grid_size, grid_size])

            def one_d(dim, pos):
                omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
                omega = 1.0 / 10000**omega
                out = np.einsum("m,d->md", pos.reshape(-1), omega)
                return np.concatenate([np.sin(out), np.cos(out)], axis=1)

            emb_h = one_d(embed_dim // 2, grid[0])
            emb_w = one_d(embed_dim // 2, grid[1])
            return np.concatenate([emb_h, emb_w], axis=1)

        got = get_2d_sincos_pos_embed(64, 8)
        np.testing.assert_allclose(got, oracle(64, 8), rtol=1e-6, atol=1e-6)
        assert got.shape == (64, 64)

    def test_timestep_embedding_cos_first(self):
        # Reference modeling_utils.py:96-104: concat([cos, sin]).
        t = jnp.array([0.0, 0.5, 1.0])
        emb = timestep_embedding(t, 256)
        assert emb.shape == (3, 256)
        # t=0: cos(0)=1 for first half, sin(0)=0 for second half.
        np.testing.assert_allclose(np.asarray(emb[0, :128]), np.ones(128), atol=1e-7)
        np.testing.assert_allclose(np.asarray(emb[0, 128:]), np.zeros(128), atol=1e-7)

        half = 128
        freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
        args = 0.5 * freqs
        np.testing.assert_allclose(
            np.asarray(emb[1]),
            np.concatenate([np.cos(args), np.sin(args)]),
            rtol=1e-5, atol=1e-6,
        )


class TestActivations:
    def test_gelu_tanh_parity(self):
        x = np.linspace(-4, 4, 101).astype(np.float32)
        got = gelu_tanh(jnp.asarray(x))
        want = torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh")
        # jax rewrites the tanh-GELU internally; diff < 5e-5 abs in the tails.
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4)

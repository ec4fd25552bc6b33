"""SigLIP NaViT encoder tests: torch oracle parity + padding-mask invariance."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from unimedvl_tpu.config import ViTConfig
from unimedvl_tpu.models import siglip

CFG = ViTConfig(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_channels=3,
    image_size=16,
    patch_size=2,
    rope=False,
)


def torch_oracle(params, cfg, tokens, pos_ids):
    """Reference-semantics forward in torch (siglip_navit.py:145-371)."""

    def lin(x, p):
        return x @ torch.from_numpy(np.asarray(p["kernel"])) + torch.from_numpy(
            np.asarray(p["bias"])
        )

    def ln(x, p, eps):
        return torch.nn.functional.layer_norm(
            x,
            (x.shape[-1],),
            torch.from_numpy(np.asarray(p["scale"])),
            torch.from_numpy(np.asarray(p["bias"])),
            eps,
        )

    x = lin(torch.from_numpy(tokens), params["patch_embedding"])
    x = x + torch.from_numpy(np.asarray(params["position_embedding"]))[
        torch.from_numpy(pos_ids)
    ]
    T = x.shape[0]
    H, D = cfg.num_attention_heads, cfg.head_dim
    L = cfg.num_hidden_layers
    for i in range(L):
        lp = jax.tree.map(lambda a: np.asarray(a[i]), params["layers"])
        res = x
        h = ln(x, lp["layer_norm1"], cfg.layer_norm_eps)
        q = lin(h, lp["attn"]["q"]).view(T, H, D).transpose(0, 1)
        k = lin(h, lp["attn"]["k"]).view(T, H, D).transpose(0, 1)
        v = lin(h, lp["attn"]["v"]).view(T, H, D).transpose(0, 1)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(0, 1).reshape(T, -1)
        x = res + lin(o, lp["attn"]["out"])
        res = x
        h = ln(x, lp["layer_norm2"], cfg.layer_norm_eps)
        h = lin(
            torch.nn.functional.gelu(lin(h, lp["mlp"]["fc1"]), approximate="tanh"),
            lp["mlp"]["fc2"],
        )
        x = res + h
    return ln(x, params["post_layernorm"], cfg.layer_norm_eps).numpy()


class TestSiglip:
    def test_torch_parity_single_image(self):
        params = siglip.init_params(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(0)
        T = 8 * 8  # full 16x16 image at patch 2
        tokens = rng.standard_normal((T, 12)).astype(np.float32)
        pos_ids = np.arange(T, dtype=np.int64)
        got = siglip.forward(
            params, CFG, jnp.asarray(tokens)[None], jnp.asarray(pos_ids)[None]
        )[0]
        with torch.no_grad():
            want = torch_oracle(params, CFG, tokens, pos_ids)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_padding_invariance(self):
        """Padded batch of 2 different-sized images == each computed alone."""
        params = siglip.init_params(jax.random.PRNGKey(1), CFG)
        rng = np.random.default_rng(1)
        t1, t2, T = 64, 36, 64
        tok1 = rng.standard_normal((t1, 12)).astype(np.float32)
        tok2 = rng.standard_normal((t2, 12)).astype(np.float32)
        pos1 = np.arange(t1, dtype=np.int64)
        pos2 = np.arange(t2, dtype=np.int64)

        batch_tokens = np.zeros((2, T, 12), np.float32)
        batch_tokens[0, :t1] = tok1
        batch_tokens[1, :t2] = tok2
        batch_pos = np.zeros((2, T), np.int64)
        batch_pos[0, :t1] = pos1
        batch_pos[1, :t2] = pos2
        valid = np.zeros((2, T), bool)
        valid[0, :t1] = True
        valid[1, :t2] = True

        batched = siglip.forward(
            params, CFG, jnp.asarray(batch_tokens), jnp.asarray(batch_pos),
            jnp.asarray(valid),
        )
        solo1 = siglip.forward(params, CFG, jnp.asarray(tok1)[None], jnp.asarray(pos1)[None])[0]
        solo2 = siglip.forward(params, CFG, jnp.asarray(tok2)[None], jnp.asarray(pos2)[None])[0]
        np.testing.assert_allclose(
            np.asarray(batched[0, :t1]), np.asarray(solo1), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batched[1, :t2]), np.asarray(solo2), rtol=1e-5, atol=1e-5
        )

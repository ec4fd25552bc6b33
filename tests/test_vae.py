"""VAE parity tests against the reference torch implementation
(/root/reference/codes/modeling/autoencoder.py imports cleanly on CPU torch).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from unimedvl_tpu.config import VAEConfig
from unimedvl_tpu.models import vae as jvae
from unimedvl_tpu.weights.vae_loader import convert_vae_state_dict

sys.path.insert(0, "/root/reference/codes")

SMALL = VAEConfig(
    resolution=32,
    in_channels=3,
    downsample=4,
    ch=32,
    out_ch=3,
    ch_mult=(1, 2, 2),
    num_res_blocks=1,
    z_channels=4,
    scale_factor=0.3611,
    shift_factor=0.1159,
)


def _ref_autoencoder(cfg: VAEConfig):
    # The reference package __init__ imports flash_attn (CUDA-only); stub it
    # so the torch-only autoencoder module is importable as an oracle.
    import types

    if "flash_attn" not in sys.modules:
        import importlib.machinery

        stub = types.ModuleType("flash_attn")
        stub.flash_attn_varlen_func = None
        stub.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
        sys.modules["flash_attn"] = stub
    try:
        from modeling.autoencoder import AutoEncoder, AutoEncoderParams
    except Exception:
        pytest.skip("reference autoencoder not importable")
    params = AutoEncoderParams(
        resolution=cfg.resolution,
        in_channels=cfg.in_channels,
        downsample=cfg.downsample,
        ch=cfg.ch,
        out_ch=cfg.out_ch,
        ch_mult=list(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks,
        z_channels=cfg.z_channels,
        scale_factor=cfg.scale_factor,
        shift_factor=cfg.shift_factor,
    )
    torch.manual_seed(0)
    model = AutoEncoder(params)
    model.eval()
    return model


@pytest.fixture(scope="module")
def models():
    ref = _ref_autoencoder(SMALL)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_vae_state_dict(sd, SMALL, dtype=jnp.float32)
    return ref, params


class TestVAEParity:
    def test_encoder_moments(self, models):
        ref, params = models
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = ref.encoder(torch.from_numpy(x)).numpy()  # [N, 2z, h, w]
        got = jvae.encoder_forward(
            params["encoder"], SMALL, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_decoder(self, models):
        ref, params = models
        rng = np.random.default_rng(1)
        z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        with torch.no_grad():
            want = ref.decoder(torch.from_numpy(z)).numpy()
        got = jvae.decoder_forward(
            params["decoder"], SMALL, jnp.asarray(z.transpose(0, 2, 3, 1))
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)

    def test_encode_decode_roundtrip_scaling(self, models):
        ref, params = models
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        # deterministic (mean) encode path
        with torch.no_grad():
            moments = ref.encoder(torch.from_numpy(x))
            mean = torch.chunk(moments, 2, dim=1)[0]
            z_ref = SMALL.scale_factor * (mean - SMALL.shift_factor)
            out_ref = ref.decode(z_ref).numpy()
        z = jvae.encode(params, SMALL, jnp.asarray(x.transpose(0, 2, 3, 1)), rng=None)
        np.testing.assert_allclose(
            np.asarray(z).transpose(0, 3, 1, 2), z_ref.numpy(), rtol=1e-3, atol=2e-4
        )
        out = jvae.decode(params, SMALL, z)
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), out_ref, rtol=1e-3, atol=5e-4
        )

    def test_init_params_structure_matches_loader(self):
        init = jvae.init_params(jax.random.PRNGKey(0), SMALL)
        ref = _ref_autoencoder(SMALL)
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        loaded = convert_vae_state_dict(sd, SMALL, dtype=jnp.float32)
        t1 = jax.tree.structure(init)
        t2 = jax.tree.structure(loaded)
        assert t1 == t2
        for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(loaded)):
            assert a.shape == b.shape

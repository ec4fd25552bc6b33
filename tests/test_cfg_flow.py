"""Parity tests for the rectified-flow schedule and CFG combine math against
torch oracles implementing bagel.py:937-940 and 1173-1207 directly."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from unimedvl_tpu.models.bagel import _cfg_combine, flow_timesteps


class TestFlowSchedule:
    @pytest.mark.parametrize("T,shift", [(50, 3.0), (24, 1.0), (10, 4.0)])
    def test_matches_reference(self, T, shift):
        ts, dts = flow_timesteps(T, shift)
        t_ref = torch.linspace(1, 0, T)
        t_ref = shift * t_ref / (1 + (shift - 1) * t_ref)
        dts_ref = (t_ref[:-1] - t_ref[1:]).numpy()
        np.testing.assert_allclose(ts, t_ref[:-1].numpy(), rtol=1e-6)
        np.testing.assert_allclose(dts, dts_ref, rtol=1e-5, atol=1e-7)


def torch_cfg(v, v_text, v_img, ts, isc, renorm_min, renorm_type, use_img):
    """Reference combine (bagel.py:1173-1207)."""
    v = torch.from_numpy(v)
    cfg_text_v_t = torch.from_numpy(v_text)
    cfg_img_v_t = torch.from_numpy(v_img)
    if renorm_type == "text_channel":
        v_t_text_ = cfg_text_v_t + ts * (v - cfg_text_v_t)
        norm_v_t = torch.norm(v, dim=-1, keepdim=True)
        norm_v_t_text_ = torch.norm(v_t_text_, dim=-1, keepdim=True)
        scale = (norm_v_t / (norm_v_t_text_ + 1e-8)).clamp(min=renorm_min, max=1.0)
        v_t_text = v_t_text_ * scale
        if use_img and isc > 1.0:
            return (cfg_img_v_t + isc * (v_t_text - cfg_img_v_t)).numpy()
        return v_t_text.numpy()
    v_t_text_ = cfg_text_v_t + ts * (v - cfg_text_v_t)
    if use_img and isc > 1.0:
        v_t_ = cfg_img_v_t + isc * (v_t_text_ - cfg_img_v_t)
    else:
        v_t_ = v_t_text_
    if renorm_type == "global":
        norm_v_t = torch.norm(v)
        norm_v_t_ = torch.norm(v_t_)
    else:
        norm_v_t = torch.norm(v, dim=-1, keepdim=True)
        norm_v_t_ = torch.norm(v_t_, dim=-1, keepdim=True)
    scale = (norm_v_t / (norm_v_t_ + 1e-8)).clamp(min=renorm_min, max=1.0)
    return (v_t_ * scale).numpy()


class TestCFGCombine:
    @pytest.mark.parametrize("renorm", ["global", "channel", "text_channel"])
    @pytest.mark.parametrize("use_img", [False, True])
    def test_matches_reference(self, renorm, use_img):
        rng = np.random.default_rng(0)
        n = 16
        v = rng.standard_normal((n, 64)).astype(np.float32)
        vt = rng.standard_normal((n, 64)).astype(np.float32)
        vi = rng.standard_normal((n, 64)).astype(np.float32)
        ts, isc = 4.0, 1.5
        got = _cfg_combine(
            jnp.asarray(v), jnp.asarray(vt), jnp.asarray(vi),
            jnp.asarray(ts), jnp.asarray(isc),
            0.2, renorm, True, use_img,
        )
        want = torch_cfg(v, vt, vi, ts, isc, 0.2, renorm, use_img)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_scale_one_degenerates_to_main(self):
        """Outside cfg_interval the reference skips CFG; with scales 1.0 our
        batched combine must return exactly the main velocity (up to fp32)."""
        rng = np.random.default_rng(1)
        v = rng.standard_normal((8, 64)).astype(np.float32)
        vt = rng.standard_normal((8, 64)).astype(np.float32)
        vi = rng.standard_normal((8, 64)).astype(np.float32)
        for renorm in ["global", "channel", "text_channel"]:
            got = _cfg_combine(
                jnp.asarray(v), jnp.asarray(vt), jnp.asarray(vi),
                jnp.asarray(1.0), jnp.asarray(1.0),
                0.0, renorm, True, True,
            )
            np.testing.assert_allclose(np.asarray(got), v, rtol=1e-5, atol=1e-6)

    def test_no_cfg_passthrough(self):
        v = np.ones((4, 64), np.float32)
        got = _cfg_combine(
            jnp.asarray(v), jnp.asarray(v), jnp.asarray(v),
            jnp.asarray(3.0), jnp.asarray(1.5), 0.0, "global", False, False,
        )
        np.testing.assert_array_equal(np.asarray(got), v)

"""Tests for host-side image preprocessing, including parity against the
reference's torch implementations of patchify / position ids (data_utils.py
imports cleanly under CPU torch)."""

import sys

import numpy as np
import pytest
from PIL import Image

from unimedvl_tpu.config import TransformConfig
from unimedvl_tpu.data import (
    ImageTransform,
    compute_resize_shape,
    patchify,
    position_ids_extrapolate,
    position_ids_interpolate,
    pil_img2rgb,
)
from unimedvl_tpu.data.imaging import unpatchify_latent

sys.path.insert(0, "/root/reference/codes")


def _ref_data_utils():
    try:
        from data import data_utils  # noqa
        return data_utils
    except Exception:
        return None


class TestResize:
    def test_divisible_and_bounded(self):
        cfg = TransformConfig.vit_vqa()
        for w, h in [(512, 512), (1000, 333), (37, 4000), (4096, 4096), (14, 14)]:
            nw, nh = compute_resize_shape(
                w, h, cfg.max_size, cfg.min_size, cfg.stride, cfg.max_pixels
            )
            assert nw % cfg.stride == 0 and nh % cfg.stride == 0
            assert nw * nh <= cfg.max_pixels
            assert max(nw, nh) <= max(cfg.max_size, cfg.stride)

    def test_known_values(self):
        # 512x512 @ (980,378,14): scale=min(980/512,1)=1 -> min-side check:
        # 378/512<1 so scale stays 1 -> round(512/14)=37 -> 518x518.
        assert compute_resize_shape(512, 512, 980, 378, 14, 2_007_040) == (518, 518)
        # 2000x1000: scale=980/2000=0.49 -> 980x490 -> make divisible:
        # round(980/14)=70 -> 980; round(490/14)=35 -> 490.
        assert compute_resize_shape(2000, 1000, 980, 378, 14, 2_007_040) == (980, 490)

    def test_upscale_small_side(self):
        # 100x300 @ min_size 378: scale = 378/100 = 3.78 -> 378x1134, but the
        # max_size constraint is applied LAST (transforms.py:83-85), shrinking
        # to 980/1134 -> (322, 980). Reference semantics, verified by hand.
        assert compute_resize_shape(100, 300, 980, 378, 14, 2_007_040) == (322, 980)

    def test_image_transform_output(self):
        t = ImageTransform(980, 378, 14, 2_007_040)
        img = Image.new("RGB", (640, 480), color=(255, 0, 0))
        arr = t(img)
        assert arr.ndim == 3 and arr.shape[0] == 3
        assert arr.shape[1] % 14 == 0 and arr.shape[2] % 14 == 0
        # Red channel normalized to 1.0, others to -1.0.
        np.testing.assert_allclose(arr[0], 1.0, atol=1e-6)
        np.testing.assert_allclose(arr[1], -1.0, atol=1e-6)


class TestPatchify:
    @pytest.mark.parametrize("shape,p", [((3, 28, 42), 14), ((16, 8, 8), 2)])
    def test_against_reference(self, shape, p):
        du = _ref_data_utils()
        if du is None:
            pytest.skip("reference data_utils not importable")
        import torch

        rng = np.random.default_rng(0)
        img = rng.standard_normal(shape).astype(np.float32)
        got = patchify(img, p)
        want = du.patchify(torch.from_numpy(img), p).numpy()
        np.testing.assert_array_equal(got, want)

    def test_roundtrip_latent(self):
        rng = np.random.default_rng(1)
        c, h, w, p = 16, 8, 6, 2
        latent = rng.standard_normal((c, h * p, w * p)).astype(np.float32)
        tokens = patchify(latent, p)
        assert tokens.shape == (h * w, p * p * c)
        back = unpatchify_latent(tokens, h, w, p, c)
        np.testing.assert_array_equal(back, latent)


class TestPositionIds:
    def test_extrapolate_against_reference(self):
        du = _ref_data_utils()
        if du is None:
            pytest.skip("reference data_utils not importable")
        for img_h, img_w, p, m in [(518, 518, 14, 70), (980, 490, 14, 70), (64, 96, 16, 64)]:
            got = position_ids_extrapolate(img_h, img_w, p, m)
            want = du.get_flattened_position_ids_extrapolate(img_h, img_w, p, m).numpy()
            np.testing.assert_array_equal(got, want)

    def test_interpolate_against_reference(self):
        du = _ref_data_utils()
        if du is None:
            pytest.skip("reference data_utils not importable")
        for img_h, img_w, p, m in [(518, 518, 14, 70), (256, 512, 16, 64)]:
            got = position_ids_interpolate(img_h, img_w, p, m)
            want = du.get_flattened_position_ids_interpolate(img_h, img_w, p, m).numpy()
            np.testing.assert_array_equal(got, want)


class TestPilRgb:
    def test_rgba_flattens_to_white(self):
        img = Image.new("RGBA", (4, 4), (255, 0, 0, 0))  # fully transparent
        out = pil_img2rgb(img)
        assert out.mode == "RGB"
        assert out.getpixel((0, 0)) == (255, 255, 255)

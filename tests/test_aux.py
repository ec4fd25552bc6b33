"""Tests for auxiliary subsystems: degradations, profiling, snapshots, and the
VQA-reconstruction pipeline recipes."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from unimedvl_tpu.data import degradations as deg
from unimedvl_tpu.utils import PhaseTimer, device_memory_stats


def _img(w=32, h=24):
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


class TestDegradations:
    def test_decolorization(self):
        out = deg.decolorization(_img())
        arr = np.array(out)
        assert arr.shape == (24, 32, 3)
        np.testing.assert_array_equal(arr[..., 0], arr[..., 1])

    def test_downscale(self):
        out = deg.downscale(_img(), 0.5)
        assert out.size == (16, 12)

    def test_crop(self):
        out, box = deg.crop(_img(), (10, 12), rng=random.Random(0))
        assert out.size == (12, 10)
        (x0, y0), (x1, y1) = box
        assert x1 - x0 == 12 and y1 - y0 == 10

    def test_motion_blur(self):
        out = deg.motion_blur(_img(), kernel_size=5, angle=30)
        assert out.size == (32, 24)

    def test_shuffle_patch(self):
        out = deg.shuffle_patch(_img(), (2, 2), gap_size=2, rng=random.Random(0))
        assert out.size == (32 + 2, 24 + 2)

    def test_inpainting(self):
        out = deg.inpainting(_img(), (2, 2), blank_ratio=0.5, rng=random.Random(0))
        assert out.size == (32, 24)
        # some patch must be blanked to white
        assert (np.array(out) == 255).all(axis=-1).any()


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("decode"):
            pass
        with t.phase("decode", sync=lambda: jnp.ones(2)):
            pass
        s = t.summary()
        assert s["decode"]["count"] == 2
        assert s["decode"]["p50_s"] >= 0

    def test_memory_stats_callable(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestDebugging:
    def test_checked_catches_nan(self):
        from unimedvl_tpu.utils.debugging import checked

        f = checked(lambda x: jnp.log(x).sum())
        assert np.isfinite(float(f(jnp.ones(4))))
        with pytest.raises(Exception):
            f(jnp.zeros(4) - 1.0)  # log of negative -> nan

    def test_find_nonfinite(self):
        from unimedvl_tpu.utils.debugging import find_nonfinite

        tree = {"a": jnp.ones(3), "b": jnp.asarray([1.0, np.inf, np.nan])}
        bad = find_nonfinite(tree)
        assert len(bad) == 1 and list(bad.values()) == [2]


class TestSnapshot:
    def test_roundtrip(self, tmp_path):
        from unimedvl_tpu.weights.snapshot import save_snapshot, restore_snapshot

        tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": {"c": jnp.ones(4)}}
        path = str(tmp_path / "snap")
        save_snapshot(path, tree)
        restored = restore_snapshot(path, target=tree)
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
        np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))

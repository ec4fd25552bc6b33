"""Profiling: per-phase wall timers (ViT prefill / text prefill / decode /
denoise / VAE decode), jax.profiler trace helper, device memory stats.

Replaces the reference's ad-hoc time.time() + tqdm (SURVEY.md §5) with
metrics aligned to BASELINE.json (tokens/sec, sec/image, p50 TTFT).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


class PhaseTimer:
    """Accumulates wall times per named phase; computes percentile summaries.

    Note: on async backends call with a host sync (the context manager blocks
    on ``sync`` if provided).
    """

    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                np.asarray(sync() if callable(sync) else sync)
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": int(arr.size),
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
            }
        return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Per-device memory stats (replaces torch.cuda.memory_allocated dumps,
    interactive_vqa_inferencer.py:257-262)."""
    device = device or jax.local_devices()[0]
    stats = device.memory_stats()
    return dict(stats) if stats else {}

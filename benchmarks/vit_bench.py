#!/usr/bin/env python
"""ViT prefill benchmark: full SigLIP-SO400M/14 encode of a 980px image
(4900 tokens, 26 layers) — the TTFT-dominant stage of VQA (BASELINE configs
1-3). Run manually: python benchmarks/vit_bench.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()
    from unimedvl_tpu.config import ViTConfig
    from unimedvl_tpu.models import siglip

    vit = ViTConfig()
    params = siglip.init_params(jax.random.PRNGKey(0), vit, dtype=jnp.bfloat16)
    T = 70 * 70
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((1, T, 588)).astype(np.float32), jnp.bfloat16)
    pos = jnp.asarray((np.arange(T) % 4900).astype(np.int64))[None]

    f = jax.jit(lambda p, x: siglip.forward(p, vit, x, pos).astype(jnp.float32).sum())
    np.asarray(f(params, tokens))
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        np.asarray(f(params, tokens + rep * 0.001))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({
        "metric": "SigLIP 980px encode (26L, 4900 tokens)",
        "value": round(min(ts) * 1000, 2),
        "unit": "ms",
    }))


if __name__ == "__main__":
    main()

"""Fused silu·mul + dynamic per-token int8 activation quantization (Pallas).

The full-int8 MLP quantizes its down-projection input ``silu(gate) * up``
dynamically per token (quant.quantize_activations — reference formula the
int8 serving mode is built on; the reference itself runs bf16,
qwen2_navit.py MLP). XLA materialises that as TWO elementwise passes over
the [tokens, intermediate] product — one for the row absmax, one to
quantize — and each pass RECOMPUTES ``silu(gate) * up``, because
rematerialising beats an HBM round-trip of the product. At the bs256
prefill shape this costs 54 ms of the 488 ms chunk
(benchmarks/PREFILL_PROFILE.json fusion.155/156): the sigmoid
transcendental runs twice over 310M elements.

Here the product is computed ONCE per row block and held in VMEM: one
sigmoid pass, one read of gate/up, one s8 write. Numerics: the kernel
computes the product in straight f32 (one FEWER rounding than the XLA bf16
chain, whose exact bit pattern is a fusion-internal artifact that neither
interpret mode nor Mosaic can reproduce portably); the result differs from
the XLA act-quant path only at the int8 quantization LSB — the same
accuracy class as dynamic act-quant itself (a documented non-parity
serving mode, quant.quantized_linear_act). tests/test_act_quant.py pins
the kernel bit-exactly to its own f32 spec and bounds the LSB delta vs the
XLA path; benchmarks/silu_quant_sweep.py records timing and hardware
agreement per shape, and the production gate (`use_silu_quant_kernel`)
only turns on from that measurement record.
"""

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["silu_mul_quant", "use_silu_quant_kernel"]


def _silu_mul_quant_kernel(g_ref, u_ref, q_ref, s_ref):
    # f32 throughout. The XLA path's exact bit pattern is an artifact of its
    # fusion's internal rounding points (not reproducible portably, and bf16
    # logistic trips a Mosaic verifier bug); this kernel instead DEFINES the
    # product as the straight f32 formula — one fewer rounding than the bf16
    # chain, differing from the XLA path only at the quantization LSB
    # (bounded in tests/test_act_quant.py; per-shape agreement on real
    # hardware recorded by benchmarks/silu_quant_sweep.py).
    g = g_ref[...].astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    x32 = (g * jax.nn.sigmoid(g)) * u
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127)
    q_ref[...] = q.astype(jnp.int8)
    s_ref[...] = scale


def silu_mul_quant(
    g: jax.Array,
    u: jax.Array,
    block_rows: int = 32,
    interpret: Optional[bool] = None,
):
    """``quantize_activations(silu(g) * u)`` in one fused pass.

    g, u: [..., I] bf16 (same shape). Returns (q int8 [..., I],
    scale f32 [..., 1]) — drop-in for the down-projection's
    ``quantized_linear_act`` input via ``quant.quantized_linear_preq``.

    ``block_rows``: token rows per grid step. 32 keeps the working set
    (2 bf16 inputs double-buffered + f32 product + s8 out) ~8.5 MB of the
    16 MB VMEM at I=18944; rows are independent so any value is correct.
    """
    assert g.shape == u.shape, (g.shape, u.shape)
    I = g.shape[-1]
    lead = g.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    g2 = g.reshape(R, I)
    u2 = u.reshape(R, I)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    blk = min(block_rows, max(R, 8))
    grid = (pl.cdiv(R, blk),)
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, I), lambda i: (i, 0)),
            pl.BlockSpec((blk, I), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, I), lambda i: (i, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, I), jnp.int8),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g2, u2)
    return q.reshape(*lead, I), s.reshape(*lead, 1)


# -- data-driven production gate ---------------------------------------------
# benchmarks/silu_quant_sweep.py measures kernel vs XLA at the serving
# shapes on the real chip and records the winning row threshold; absent a
# measurement (or off-TPU) the XLA path runs. Same pattern as
# qwen2_mot.use_decode_kernel.
_UNSET = object()
_MIN_ROWS = _UNSET


def _load_min_rows():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "benchmarks", "KERNEL_THRESHOLD.json",
    )
    try:
        with open(path) as f:
            return json.load(f).get("silu_quant_min_rows")
    except (OSError, ValueError):
        return None


def use_silu_quant_kernel(rows: int) -> bool:
    """True when the fused Pallas silu·mul·quant beats the XLA two-pass at
    ``rows`` total token rows (measured record, TPU only)."""
    global _MIN_ROWS
    if _MIN_ROWS is _UNSET:
        _MIN_ROWS = _load_min_rows()
    if _MIN_ROWS is None or jax.default_backend() != "tpu":
        return False
    return rows >= _MIN_ROWS

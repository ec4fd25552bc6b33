"""Packed-int4 weight matmul (w4 / w4a8) — Pallas TPU kernel + XLA fallback.

Why packed bytes instead of the jnp.int4 dtype: on the axon TPU backend an
int4 array cannot cross a jit argument boundary (device_put relayout
recursion — CLAUDE.md / PARITY.md), so the int4-dtype weight mode was
CPU-only. Packing two int4 values per int8 byte sidesteps the backend
entirely AND gives the kernel explicit control of the unpack: nibbles are
widened in VMEM, so the weights stream from HBM at 0.5 bytes/value — decode
and serving are weight-streaming-bound below ~bs256 (CLAUDE.md perf notes),
where halving the weight bytes attacks the step floor directly.

Packing layout: along the CONTRACTION (in) dim. Byte r of ``wp[.., K/2, N]``
holds in-row ``2r`` in its LOW nibble and in-row ``2r+1`` in its HIGH nibble
(both signed, [-8, 7]). The matmul then needs no interleave at all:

    y = x[:, 0::2] @ lo(wp) + x[:, 1::2] @ hi(wp)

with ``lo(w) = (w << 4) >> 4`` and ``hi(w) = w >> 4`` (arithmetic shifts on
int8). Two half-K dots == one full-K dot in MXU work; the unpack is two VPU
shift ops per byte held in VMEM. Integer math is EXACTLY the int4-dtype
path's (same s8 x s8 -> s32 dots), so parity vs the unpacked reference
formula is bit-exact (tests/test_w4_matmul.py).

The XLA fallback materialises lo/hi (2.5x the packed HBM traffic — read
0.5B, write 1B, re-read 1B) and exists for correctness off-TPU and for
shapes the kernel doesn't tile; the kernel is the production path on TPU
(gate: a measured record can force it off — benchmarks/w4_matmul_sweep.py).

Reference being replaced: the reference serves bf16 torch matmuls
(qwen2_navit.py PackedAttentionMoT / MLP); w4 is a NON-PARITY serving mode
like int8 (quant.py).
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pack_int4",
    "unpack_int4",
    "w4_matmul",
    "use_w4_kernel",
]


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int8-stored int4 values [-8, 7] along the second-to-last dim:
    [.., K, N] -> [.., K/2, N] where byte r = (q[2r] & 0xF) | (q[2r+1] << 4).
    Works on jnp and numpy arrays (returns the same kind)."""
    assert q.shape[-2] % 2 == 0, q.shape
    lo = q[..., 0::2, :]
    hi = q[..., 1::2, :]
    return ((lo & 0x0F) | (hi << 4)).astype(q.dtype)


def _lo(wp):
    return (wp << 4) >> 4  # arithmetic shifts: signed low nibble


def _hi(wp):
    return wp >> 4  # signed high nibble


def _nibbles_mosaic(wp, widen=jnp.int32):
    """Signed (lo, hi) nibble planes via widened integer ops only.

    Mosaic cannot legalize arith.shli/shrsi on int8 vectors (measured on the
    real chip: "failed to legalize operation 'arith.shli'" on
    vector<8x128x4xi8>, /tmp/r4s4_queue.log round 4) — widen first, shift/
    mask there, and truncate back to i8. Same integer results as _lo/_hi
    (tests/test_w4_matmul.py covers kernel-vs-reference parity).

    The unpack is the kernel's bottleneck (round-5 sweep: at (3584, 37888)
    the kernel streams HALF the int8 bytes yet loses to the int8 matmul —
    VPU-bound on the widen+shift chain), so ``widen`` is tunable: i16 halves
    the widened register traffic vs i32 if Mosaic legalizes i16 shifts."""
    w = wp.astype(widen)
    hi = w >> 4  # arithmetic shift: signed high nibble
    lo = ((w & 15) ^ 8) - 8  # unsigned low nibble, sign-extended from bit 3
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def unpack_int4(wp: jax.Array) -> jax.Array:
    """Inverse of pack_int4: [.., K/2, N] int8 -> [.., K, N] int8 in [-8, 7]."""
    k2, n = wp.shape[-2], wp.shape[-1]
    w = jnp.stack([_lo(wp), _hi(wp)], axis=-2)  # [.., K/2, 2, N]
    return w.reshape(*wp.shape[:-2], 2 * k2, n)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

_TKP = 256  # packed-K rows per grid step (= 512 int8 contraction rows)
_TN = 512
_TM = 256


def _make_w4_kernel(grouped: bool, widen=jnp.int32):
    def _w4_kernel(xe_ref, xo_ref, xs_ref, ws_ref, wp_ref, out_ref, acc_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        wp = wp_ref[...]
        lo, hi = _nibbles_mosaic(wp, widen)
        dn = (((1,), (0,)), ((), ()))
        if xe_ref.dtype == jnp.int8:
            d = (
                jax.lax.dot_general(xe_ref[...], lo,
                                    dn, preferred_element_type=jnp.int32)
                + jax.lax.dot_general(xo_ref[...], hi,
                                      dn, preferred_element_type=jnp.int32)
            )
        else:  # weight-only w4: bf16 activations, widen nibbles to x dtype
            d = (
                jax.lax.dot_general(xe_ref[...], lo.astype(xe_ref.dtype),
                                    dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(xo_ref[...], hi.astype(xe_ref.dtype),
                                      dn, preferred_element_type=jnp.float32)
            )
        if grouped:
            # group-wise weight scale applied per k-step: one group spans
            # r k-steps, so ws_ref's block ([1, 1, TN]) is this step's group
            acc_ref[...] += d.astype(jnp.float32) * ws_ref[0]
        else:
            acc_ref[...] += d

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            y = acc_ref[...].astype(jnp.float32) * xs_ref[...]
            if not grouped:
                y = y * ws_ref[...]
            out_ref[...] = y.astype(out_ref.dtype)

    return _w4_kernel


def _kernel_fits(m: int, k2: int, n: int, n_groups: int = 0) -> bool:
    if k2 % _TKP or n % _TN:
        return False
    if n_groups:
        g2 = k2 // n_groups  # packed rows per group
        if g2 % _TKP:  # group boundary must align with the k-step
            return False
    return True


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret", "widen_bits"))
def _w4_matmul_kernel_call(xe, xo, xs, ws, wp, out_dtype, interpret,
                           widen_bits=32):
    m, k2p = xe.shape
    k2, n = wp.shape
    tm = min(_TM, m)
    grid = (pl.cdiv(m, tm), n // _TN, k2 // _TKP)
    widen = {16: jnp.int16, 32: jnp.int32}[widen_bits]
    grouped = ws.ndim == 2 and ws.shape[0] > 1
    if grouped:
        r = (k2 // ws.shape[0]) // _TKP  # k-steps per group
        # TPU lowering requires the last two block dims to divide (8, 128)
        # or equal the array dims — a (1, TN) block on [G, N] violates that
        # for the G dim, so the group axis gets its own leading dim
        ws = ws.reshape(ws.shape[0], 1, n)
        ws_spec = pl.BlockSpec((1, 1, _TN), lambda i, j, k: (k // r, 0, j))
        acc_dtype = jnp.float32
    else:
        ws2 = ws.reshape(1, n)
        ws_spec = pl.BlockSpec((1, _TN), lambda i, j, k: (0, j))
        acc_dtype = jnp.int32 if xe.dtype == jnp.int8 else jnp.float32
        ws = ws2
    return pl.pallas_call(
        _make_w4_kernel(grouped, widen),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, _TKP), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, _TKP), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0)),
            ws_spec,
            pl.BlockSpec((_TKP, _TN), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tm, _TN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            # accumulator persists across the k-minor grid dim
            pltpu.VMEM((tm, _TN), acc_dtype),
        ],
        interpret=interpret,
    )(xe, xo, xs, ws, wp)


def w4_matmul(
    x: jax.Array,
    x_scale: Optional[jax.Array],
    wp: jax.Array,
    w_scale: jax.Array,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    force_kernel: bool = False,
    force_fallback: bool = False,
    widen_bits: Optional[int] = None,
):
    """``y = (x @ unpack(wp)) * x_scale * w_scale`` without materialising the
    unpacked weights in HBM.

    x: [..., K] int8 (w4a8, with ``x_scale`` f32 [..., 1]) or bf16/f32
    (weight-only w4, ``x_scale=None``). wp: [K/2, N] packed int4 (pack_int4).
    w_scale: f32 [N] per-output-channel, or [G, N] group-wise
    (quant.quantize_weight(group_size=...)) — groups span K/G in-rows and
    must align with the kernel's 512-row k-step to ride it. Chooses the
    Pallas kernel on TPU (or under ``interpret``/``force_kernel`` for tests)
    when the shape tiles; XLA lo/hi fallback otherwise.
    """
    k2, n = wp.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, 2 * k2)
    grouped = w_scale.ndim == 2 and w_scale.shape[0] > 1
    n_groups = w_scale.shape[0] if grouped else 0
    if interpret is None:
        interpret = False
    on_tpu = jax.default_backend() == "tpu"
    use_kernel = (not force_fallback
                  and (force_kernel or interpret or
                       (on_tpu and use_w4_kernel(m)))
                  and _kernel_fits(m, k2, n, n_groups))
    xs2 = (jnp.ones((m, 1), jnp.float32) if x_scale is None
           else x_scale.reshape(m, 1).astype(jnp.float32))
    if use_kernel:
        xe = x2[:, 0::2]
        xo = x2[:, 1::2]
        ws = (w_scale if grouped else w_scale.reshape(1, n))
        if widen_bits is None:
            widen_bits = _gate_widen_bits()
        y = _w4_matmul_kernel_call(
            xe, xo, xs2, ws.astype(jnp.float32), wp, out_dtype, interpret,
            widen_bits=widen_bits)
        return y.reshape(*lead, n)
    # XLA fallback: half-K dots on materialised nibble planes
    lo, hi = _lo(wp), _hi(wp)
    dn = (((1,), (0,)), ((), ()))
    int_x = x2.dtype == jnp.int8
    pet = jnp.int32 if int_x else jnp.float32

    def dots(xe, xo, lo, hi):
        if not int_x:
            lo, hi = lo.astype(x2.dtype), hi.astype(x2.dtype)
        return (jax.lax.dot_general(xe, lo, dn, preferred_element_type=pet)
                + jax.lax.dot_general(xo, hi, dn, preferred_element_type=pet))

    if grouped:
        # accumulate group-by-group (a batched dot would materialise
        # [G, m, n]); fallback-only path, correctness over speed
        g2 = k2 // n_groups  # packed rows per group
        xeg = x2[:, 0::2].reshape(m, n_groups, g2).transpose(1, 0, 2)
        xog = x2[:, 1::2].reshape(m, n_groups, g2).transpose(1, 0, 2)
        log = lo.reshape(n_groups, g2, n)
        hig = hi.reshape(n_groups, g2, n)

        def body(acc, inp):
            xe_i, xo_i, lo_i, hi_i, s_i = inp
            d = dots(xe_i, xo_i, lo_i, hi_i)
            return acc + d.astype(jnp.float32) * s_i[None, :], None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((m, n), jnp.float32),
            (xeg, xog, log, hig, w_scale.astype(jnp.float32)))
        y = acc * xs2
        return y.astype(out_dtype).reshape(*lead, n)
    acc = dots(x2[:, 0::2], x2[:, 1::2], lo, hi)
    y = acc.astype(jnp.float32) * xs2 * w_scale.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, n)


# -- data-driven gate ---------------------------------------------------------
# Like every other kernel gate here (decode kernel, silu-quant), the w4
# kernel DEFAULTS OFF on TPU until benchmarks/w4_matmul_sweep.py has recorded
# a measured win on the real chip ("w4_kernel_on": true): round 4 shipped the
# gate defaulting ON while the kernel had never compiled on the target
# (Mosaic shli legalization crash — fixed by _nibbles_mosaic) — a kernel with
# no on-target record must not be the default production path. The record can
# also bound it to the weight-bound row counts ("w4_kernel_max_rows": N —
# above N, large-M prefill shapes are MXU-compute-bound).
_UNSET = object()
_GATE = _UNSET


def _load_gate():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "benchmarks", "KERNEL_THRESHOLD.json",
    )
    try:
        with open(path) as f:
            data = json.load(f)
        return (bool(data.get("w4_kernel_on", False)),
                data.get("w4_kernel_max_rows"),
                int(data.get("w4_widen_bits", 32)))
    except (OSError, ValueError):
        return (False, None, 32)


def use_w4_kernel(rows: int) -> bool:
    global _GATE
    if _GATE is _UNSET:
        _GATE = _load_gate()
    on, max_rows, _widen = _GATE
    return on and (max_rows is None or rows <= max_rows)


def _gate_widen_bits() -> int:
    global _GATE
    if _GATE is _UNSET:
        _GATE = _load_gate()
    return _GATE[2]

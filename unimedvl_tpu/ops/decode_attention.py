"""Pallas TPU decode attention: one query token per stream against the cache.

Reads the cache in its NATIVE head-major [S, Hk, M, D] layout — each
(stream, kv-head) pair streams contiguous [block_k, D] chunks straight from
HBM, widens int8 in VMEM, applies the per-key scales to logits / softmax
weights, and runs the lens-bounded online softmax in-register. (The previous
[S, M, Hk, D] cache layout forced per-kv-head strided slices in VMEM; that
version measured 60.5 ms/step at bs256 vs 29.0 for the jnp path. Head-major
removes the strides for BOTH this kernel and the jnp einsum fallback.)

MEASURED SLOWER than the jnp path at every serving shape even head-major
(benchmarks/KERNEL_THRESHOLD.json decode_sweep, real v5e: bs256 int8-kv
40.7 vs 28.7 ms/step, bs96 19.5 vs 14.7, bs48 13.6 vs 12.3): the per-(s,hk)
grid leaves the MXU with a [Hq/Hk=7, D] query tile per block, while XLA
batches the einsum over all streams into full-width matmuls. Kept as an
experimental path; the data-driven gate (_DECODE_KERNEL_MIN_SM=None) keeps
it off by default.

Mask semantics = the decode paths of qwen2_mot._attention_block:
  * scatter decode (serving): key visible iff kv_idx < lens[s] + 1 ... the
    appended token sits AT lens[s], so visibility is kv_idx <= lens[s]
    (pass band=(lens, lens) — the two-band mask degenerates correctly).
  * aligned-column decode (generate_text): kv_idx < lens[s] OR
    base <= kv_idx <= col.

Replaces the reference's per-token flash_attn_varlen_func decode hot loop
(qwen2_navit.py:585-614).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _kernel(
    lens_ref,  # [S] int32 scalar prefetch: context length per stream
    base_ref,  # [S] int32: decoded-band start
    col_ref,  # [S] int32: decoded-band end (inclusive)
    q_ref,  # [1, H, D]
    k_ref,  # [1, Hk, Mpad, D] head-major
    v_ref,  # [1, Hk, Mpad, D]
    *rest,  # (ks_ref [1, Hk, Mpad], vs_ref) when quantized, then o_ref
    hk: int,
    block_k: int,
    m_pad: int,
    scale: float,
    quantized: bool,
):
    s = pl.program_id(0)
    H, D = q_ref.shape[1], q_ref.shape[2]
    G = H // hk

    if quantized:
        ks_ref, vs_ref, o_ref = rest
    else:
        (o_ref,) = rest

    q = q_ref[0].astype(jnp.float32) * scale  # [H, D]
    ln = lens_ref[s]
    base = base_ref[s]
    col = col_ref[s]
    kv_hi = jnp.maximum(ln, col + 1)
    num_kb = jnp.minimum(pl.cdiv(kv_hi, block_k), m_pad // block_k)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        kv_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        allowed = (kv_idx < ln) | ((kv_idx >= base) & (kv_idx <= col))

        # contiguous per-(stream, head) chunks; static unroll over the few
        # kv heads (4 on the 14B checkpoint)
        logit_rows = []
        vs = []
        for h in range(hk):
            k = k_ref[0, h, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
            vs.append(
                v_ref[0, h, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
            )
            lg = jnp.dot(
                q[h * G : (h + 1) * G], k.T,
                preferred_element_type=jnp.float32,
            )  # [G, Bk]
            if quantized:
                ksc = ks_ref[0, h, pl.ds(kb * block_k, block_k)]  # [Bk]
                lg = lg * ksc[None, :]
            logit_rows.append(lg)
        logits = jnp.concatenate(logit_rows, axis=0)  # [H, Bk]
        logits = jnp.where(allowed, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

        outs = []
        for h in range(hk):
            pw = p[h * G : (h + 1) * G]
            if quantized:
                vsc = vs_ref[0, h, pl.ds(kb * block_k, block_k)]  # [Bk]
                pw = pw * vsc[None, :]
            outs.append(
                jnp.dot(pw, vs[h], preferred_element_type=jnp.float32)
            )
        acc = acc * alpha + jnp.concatenate(outs, axis=0)
        return acc, m_new, l_new

    acc0 = jnp.zeros((H, D), jnp.float32)
    m0 = jnp.full((H, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((H, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def decode_attention(
    q: jax.Array,  # [S, 1, H, D]
    k: jax.Array,  # [S, Hk, M, D] bf16 OR int8 (head-major cache layout)
    v: jax.Array,
    lens: jax.Array,  # [S] context lengths
    band: Tuple[jax.Array, jax.Array],  # (base, col) decoded band, inclusive
    k_scale: Optional[jax.Array] = None,  # [S, Hk, M] fp32 (int8 kv)
    v_scale: Optional[jax.Array] = None,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Single-token GQA decode attention over the native head-major cache.

    Returns [S, 1, H, D] in q.dtype. ``band`` scalars broadcast to [S].
    """
    S, T, H, D = q.shape
    assert T == 1, T
    Hk, M = k.shape[1], k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    quantized = k_scale is not None

    M_pad = _round_up(M, block_k)
    if M_pad != M:
        pad4 = ((0, 0), (0, 0), (0, M_pad - M), (0, 0))
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        if quantized:
            pad3 = ((0, 0), (0, 0), (0, M_pad - M))
            k_scale = jnp.pad(k_scale, pad3)
            v_scale = jnp.pad(v_scale, pad3)

    base, col = band
    base = jnp.broadcast_to(jnp.asarray(base, jnp.int32), (S,))
    col = jnp.broadcast_to(jnp.asarray(col, jnp.int32), (S,))

    extra_inputs = []
    extra_specs = []
    if quantized:
        extra_inputs = [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
        extra_specs = [
            pl.BlockSpec((1, Hk, M_pad), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec((1, Hk, M_pad), lambda s, *_: (s, 0, 0)),
        ]

    kernel = functools.partial(
        _kernel,
        hk=Hk,
        block_k=block_k,
        m_pad=M_pad,
        scale=D**-0.5,
        quantized=quantized,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda s, *_: (s, 0, 0)),
                pl.BlockSpec((1, Hk, M_pad, D), lambda s, *_: (s, 0, 0, 0)),
                pl.BlockSpec((1, Hk, M_pad, D), lambda s, *_: (s, 0, 0, 0)),
            ]
            + extra_specs,
            out_specs=pl.BlockSpec((1, H, D), lambda s, *_: (s, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((S, H, D), q.dtype),
        interpret=interpret,
    )(
        lens.astype(jnp.int32), base, col,
        q[:, 0], k, v, *extra_inputs,
    )
    return out[:, None]

"""Pallas TPU flash attention for packed cache+block layouts (inference).

Replaces the reference's CUDA ``flash_attn_varlen_func`` (SURVEY.md §2.3 N1)
for the large-query paths: ViT/VAE image prefill and the denoise forward
(~1k-4k queries). The jnp masked-softmax path materialises [H, T, M] fp32
logits in HBM; this kernel keeps the online softmax in VMEM.

Semantics == qwen2_mot attention: per stream s the kv tensor holds
``lens[s]`` valid context tokens in [0, lens) and the query block's own keys
at [block_start[s], block_start[s] + Tq); queries see all context plus the
block under block-causal or block-full visibility.

Layout: grid (S, Hk, num_q_blocks), q grouped per kv head so K/V blocks are
fetched once per (s, kv_head) and reused across the G=H/Hk grouped q heads
and all q blocks (qb innermost; Pallas skips re-fetch when the index map
output is unchanged).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _fused_q_preproc(
    q_block,  # [G, Bq, D] raw projected q (pre-norm, pre-rope)
    wu_ref,  # [1, D] fp32 und norm scale
    wg_ref,  # [1, D] fp32 gen norm scale
    cos_ref,  # [1, Bq, D] fp32
    ssin_ref,  # [1, Bq, D] fp32 PRE-SIGNED sin (see flash_rope_tables)
    end_row,  # int32 scalar: the <vision_end> text row
    qb,  # int32 q-block index
    eps: float,
    out_dtype,
):
    """In-kernel gen-mode fp32 island (qwen2_navit.py:568-583): MoT-routed
    per-head RMSNorm (und weights on text rows {0, end_row}, gen elsewhere)
    followed by RoPE, all in fp32, rounded to ``out_dtype`` at the end for
    bit-parity with the unfused XLA path.

    rotate_half on the lane dim is roll(q, D/2) * pre-signed sin: with the
    (freqs, freqs) table convention, rotate_half(x)[i] = -x[i+D/2] for
    i < D/2 and x[i-D/2] otherwise, and a half-length roll is symmetric.
    """
    G, Bq, D = q_block.shape
    q32 = q_block.astype(jnp.float32)
    var = jnp.mean(q32 * q32, axis=-1, keepdims=True)
    qn = q32 * jax.lax.rsqrt(var + eps)

    row = qb * Bq + jax.lax.broadcasted_iota(jnp.int32, (1, Bq, 1), 1)
    is_text = (row == 0) | (row == end_row)
    w = jnp.where(is_text, wu_ref[0][None, None, :], wg_ref[0][None, None, :])
    qn = qn * w  # [G, Bq, D] (w broadcasts over G)

    cos = cos_ref[0][None]  # [1, Bq, D]
    ssin = ssin_ref[0][None]
    q_rope = qn * cos + pltpu.roll(qn, D // 2, axis=2) * ssin
    return q_rope.astype(out_dtype)


def _kernel(
    lens_ref,  # [S] int32 (scalar prefetch)
    bstart_ref,  # [S] int32 (scalar prefetch)
    qvlen_ref,  # [S] int32 (scalar prefetch) valid query-block length
    endrow_ref,  # [S] int32 (scalar prefetch) text end row (fused preproc)
    q_ref,  # [1, 1, G, Bq, D]
    k_ref,  # [1, 1, Mpad, D]
    v_ref,  # [1, 1, Mpad, D]
    *rest,  # (wu, wg, cos, ssin) when preproc, then o_ref (+ lse_ref)
    causal: bool,
    block_q: int,
    block_k: int,
    m_pad: int,
    scale: float,
    preproc: bool = False,
    norm_eps: float = 1e-6,
    return_lse: bool = False,
):
    s = pl.program_id(0)
    qb = pl.program_id(2)
    G, Bq, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    rows = G * Bq

    rest = list(rest)
    lse_ref = rest.pop() if return_lse else None
    if preproc:
        wu_ref, wg_ref, cos_ref, ssin_ref, o_ref = rest
        qp = _fused_q_preproc(
            q_ref[0, 0], wu_ref, wg_ref, cos_ref, ssin_ref,
            endrow_ref[s], qb, norm_eps, o_ref.dtype,
        )
        q = qp.reshape(rows, D).astype(jnp.float32) * scale
    else:
        (o_ref,) = rest
        q = q_ref[0, 0].reshape(rows, D).astype(jnp.float32) * scale
    ln = lens_ref[s]
    bs = bstart_ref[s]
    qv = qvlen_ref[s]

    # per-row query index within the block (same for every grouped head)
    q_idx = qb * Bq + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % Bq

    # lens-bounded sweep: only context [0, lens) and the appended block
    # [bstart, bstart + qvlen) can be visible — at serving capacities
    # (e.g. 4096) with short contexts the full m_pad sweep is >90% masked.
    kv_hi = jnp.maximum(ln, bs + qv)
    num_kb = jnp.minimum(pl.cdiv(kv_hi, block_k), m_pad // block_k)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [rows, Bk]

        kv_idx = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1
        )
        in_ctx = kv_idx < ln
        off = kv_idx - bs
        in_block = (off >= 0) & (off < qv)
        if causal:
            in_block = in_block & (off <= q_idx)
        allowed = in_ctx | in_block
        logits = jnp.where(allowed, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((rows, D), jnp.float32)
    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(G, Bq, D).astype(o_ref.dtype)
    if return_lse:
        # scaled-logit logsumexp per query row; rows with nothing visible
        # (l == 0) report -inf so a partial-attention combine weights them 0
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
        lse_ref[0, 0] = lse.reshape(G, Bq)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def presign_sin(sin: jax.Array) -> jax.Array:
    """Fold rotate_half's sign into the sin table: -sin on the first half of
    the head dim, +sin on the second (see _fused_q_preproc)."""
    D = sin.shape[-1]
    idx = jnp.arange(D)
    return jnp.where(idx < D // 2, -sin, sin).astype(jnp.float32)


def _tables_compact(q_preproc) -> bool:
    """Row-constant rope tables: every gen-mode image block shares ONE rope
    position (bagel packing contract), so callers can pass cos/sin with a
    size-1 token dim ([S, 1, D]) — the kernel then keeps a single [1, D] row
    in VMEM instead of streaming a [T_pad, D] fp32 table per grid step
    (measured VMEM-pressure cliff at M0=1024, KERNEL_THRESHOLD.json)."""
    cos = q_preproc["cos"]
    return cos.ndim >= 2 and cos.shape[-2] == 1


def _prep_preproc_tables(q_preproc, S, T, T_pad, D_true, D_pad):
    """Pad/shape the fused-preproc operands for the kernel: norm scales to
    [1, D_pad] fp32, cos/pre-signed-sin to [S, T_pad, D_pad] fp32 (cos pads
    with 1, sin with 0 -> identity rotation on padded lanes). With compact
    (row-constant) tables, cos/sin stay [S, 1, D_pad]."""
    wu, wg, cos, sin, end_row = (
        q_preproc["w_und"], q_preproc["w_gen"], q_preproc["cos"],
        q_preproc["sin"], q_preproc["end_row"],
    )
    compact = _tables_compact(q_preproc)
    rows = 1 if compact else T
    wu = wu.astype(jnp.float32).reshape(1, D_true)
    wg = wg.astype(jnp.float32).reshape(1, D_true)
    cos = jnp.broadcast_to(cos.astype(jnp.float32), (S, rows, D_true))
    ssin = jnp.broadcast_to(presign_sin(sin), (S, rows, D_true))
    if D_pad != D_true:
        dp = D_pad - D_true
        wu = jnp.pad(wu, ((0, 0), (0, dp)))
        wg = jnp.pad(wg, ((0, 0), (0, dp)))
        cos = jnp.pad(cos, ((0, 0), (0, 0), (0, dp)), constant_values=1.0)
        ssin = jnp.pad(ssin, ((0, 0), (0, 0), (0, dp)))
    if not compact and T_pad != T:
        cos = jnp.pad(cos, ((0, 0), (0, T_pad - T), (0, 0)), constant_values=1.0)
        ssin = jnp.pad(ssin, ((0, 0), (0, T_pad - T), (0, 0)))
    if end_row is None:
        end_row = jnp.full((S,), T - 1, jnp.int32)
    else:
        end_row = jnp.broadcast_to(end_row, (S,))
    return wu, wg, cos, ssin, end_row.astype(jnp.int32)


def flash_block_attention(
    q: jax.Array,  # [S, T, H, D]
    k: jax.Array,  # [S, M, Hk, D] (context + appended block)
    v: jax.Array,  # [S, M, Hk, D]
    lens: jax.Array,  # [S] int32 valid context length
    block_start: jax.Array,  # [S] int32 where the query block's keys start
    causal: bool,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
    q_valid_len: Optional[jax.Array] = None,  # [S] valid block length (<= T)
    q_preproc: Optional[dict] = None,
    kv_head_major: bool = False,
    return_lse: bool = False,
) -> jax.Array:
    """Flash attention with cache+block visibility. Returns [S, T, H, D];
    with ``return_lse`` also the scaled-logit logsumexp [S, T, H] fp32, so a
    caller can combine PARTIAL attentions over disjoint kv sets with the
    online-softmax algebra (ops.attention.combine_attention_partials) — the
    sequence-parallel denoise path attends the local cache while the block
    k/v all-gather is still in flight.

    head_dim is zero-padded to a 128 multiple when needed (e.g. SigLIP's 72);
    the softmax scale uses the true head_dim. ``q_valid_len`` supports
    trailing-padded query blocks (shape-bucketed prefill): block keys at
    offsets >= q_valid_len[s] are masked.

    ``kv_head_major``: k/v arrive as [S, Hk, M, D] — the native KVCache
    layout, exactly what the kernel's BlockSpecs want, so the internal
    transpose copy is skipped entirely (cache-resident callers should always
    pass head-major).

    ``q_preproc``: fuse the gen-mode fp32 qk-norm + RoPE island
    (qwen2_navit.py:568-583) into the kernel for the QUERY side — pass RAW
    projected q and a dict with ``w_und``/``w_gen`` ([D] RMSNorm scales),
    ``cos``/``sin`` ([S, T, D] or broadcastable fp32 tables), ``end_row``
    ([S] int32 text end row, or None for the static T-1 contract) and
    optional ``eps``. Saves the fp32 HBM round-trip of the normed/roped q.
    """
    S, T, H, D = q.shape
    if kv_head_major:
        Hk, M = k.shape[1], k.shape[2]
    else:
        M, Hk = k.shape[1], k.shape[2]
    G = H // Hk
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # VMEM guard: the kernel's fp32 logits are [G*block_q, block_k]; clamp
    # block_q so grouped rows stay <= 2048 (bq512 at G=7 OOMs scoped VMEM
    # once M_pad grows past ~4k).
    while G * block_q > 2048 and block_q > 128:
        block_q //= 2

    scale = D**-0.5
    D_out = D
    D_pad = _round_up(D, 128)
    if D_pad != D:
        pad = [(0, 0)] * 3 + [(0, D_pad - D)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        D = D_pad

    T_pad = _round_up(T, block_q)
    M_pad = _round_up(M, block_k)
    # [S, T, H, D] -> [S, Hk, G, T_pad, D]
    qh = q.reshape(S, T, Hk, G, D).transpose(0, 2, 3, 1, 4)
    if T_pad != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, T_pad - T), (0, 0)))
    if not kv_head_major:
        # [S, M, Hk, D] -> [S, Hk, M_pad, D] (TPU blocks must keep the last
        # two dims aligned, so the head axis cannot sit second-to-last with
        # block 1); head-major callers skip this copy
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    if M_pad != M:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, M_pad - M), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, M_pad - M), (0, 0)))

    if q_valid_len is None:
        q_valid_len = jnp.full((S,), T, jnp.int32)

    extra_inputs = []
    extra_specs = []
    end_row = jnp.zeros((S,), jnp.int32)
    if q_preproc is not None:
        if D != D_out:
            raise ValueError(
                "fused q preproc requires an unpadded head_dim (RMSNorm would "
                f"average over {D} padded lanes instead of {D_out})"
            )
        wu, wg, cos, ssin, end_row = _prep_preproc_tables(
            q_preproc, S, T, T_pad, D_out, D
        )
        extra_inputs = [wu, wg, cos, ssin]
        if _tables_compact(q_preproc):
            tspec = pl.BlockSpec((1, 1, D), lambda s, hk, qb, *_: (s, 0, 0))
        else:
            tspec = pl.BlockSpec(
                (1, block_q, D), lambda s, hk, qb, *_: (s, qb, 0)
            )
        extra_specs = [
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            tspec,
            tspec,
        ]

    grid = (S, Hk, T_pad // block_q)
    kernel = functools.partial(
        _kernel,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        m_pad=M_pad,
        scale=scale,
        preproc=q_preproc is not None,
        norm_eps=(q_preproc or {}).get("eps", 1e-6),
        return_lse=return_lse,
    )
    out_shape = [jax.ShapeDtypeStruct((S, Hk, G, T_pad, D), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
        )
    ]
    if return_lse:
        out_shape.append(jax.ShapeDtypeStruct((S, Hk, G, T_pad), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, G, block_q), lambda s, hk, qb, *_: (s, hk, 0, qb))
        )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch refs as trailing args
                pl.BlockSpec(
                    (1, 1, G, block_q, D),
                    lambda s, hk, qb, *_: (s, hk, 0, qb, 0),
                ),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
            ]
            + extra_specs,
            out_specs=out_specs if return_lse else out_specs[0],
        ),
        out_shape=out_shape if return_lse else out_shape[0],
        interpret=interpret,
    )(
        lens.astype(jnp.int32),
        block_start.astype(jnp.int32),
        q_valid_len.astype(jnp.int32),
        end_row,
        qh,
        k,
        v,
        *extra_inputs,
    )

    if return_lse:
        out, lse = res
    else:
        out = res
    # [S, Hk, G, T_pad, D] -> [S, T, H, D]
    out = out.transpose(0, 3, 1, 2, 4).reshape(S, T_pad, H, D)
    out = out[:, :T, :, :D_out]
    if return_lse:
        # [S, Hk, G, T_pad] -> [S, T, H]
        lse = lse.transpose(0, 3, 1, 2).reshape(S, T_pad, H)[:, :T]
        return out, lse
    return out


# ---------------------------------------------------------------------------
# two-phase variant: separate cache and block kv inputs (no concat copy)
# ---------------------------------------------------------------------------

def _kernel2(
    lens_ref,  # [S] int32 (scalar prefetch)
    endrow_ref,  # [S] int32 (scalar prefetch) text end row of the QUERY block
    endrowk_ref,  # [S] int32 (scalar prefetch) text end row of the KV block
    q_ref,  # [1, 1, G, Bq, D]
    kc_ref,  # [1, 1, Mpad, D] cache keys
    vc_ref,  # [1, 1, Mpad, D]
    kb_ref,  # [1, 1, Tpad, D] block keys
    vb_ref,  # [1, 1, Tpad, D]
    *rest,  # (wu, wg, cos, ssin) when preproc, (wuk, wgk, cosk, ssink) when
    # k_preproc, then o_ref
    causal: bool,
    q_len: int,
    block_q: int,
    block_k: int,
    m_pad: int,
    t_pad: int,
    scale: float,
    preproc: bool = False,
    k_preproc: bool = False,
    k_compact: bool = False,
    norm_eps: float = 1e-6,
):
    s = pl.program_id(0)
    qb = pl.program_id(2)
    G, Bq, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    rows = G * Bq

    rest = list(rest)
    if preproc:
        wu_ref, wg_ref, cos_ref, ssin_ref = rest[:4]
        rest = rest[4:]
    if k_preproc:
        wuk_ref, wgk_ref, cosk_ref, ssink_ref = rest[:4]
        rest = rest[4:]
    (o_ref,) = rest

    if preproc:
        qp = _fused_q_preproc(
            q_ref[0, 0], wu_ref, wg_ref, cos_ref, ssin_ref,
            endrow_ref[s], qb, norm_eps, o_ref.dtype,
        )
        q = qp.reshape(rows, D).astype(jnp.float32) * scale
    else:
        q = q_ref[0, 0].reshape(rows, D).astype(jnp.float32) * scale
    ln = lens_ref[s]
    end_row_k = endrowk_ref[s]
    q_idx = qb * Bq + (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % Bq)

    def _proc_k_chunk(k32, kb_i):
        """Fused k-side gen-mode fp32 island (qwen2_navit.py:568-583) applied
        to one raw block-k chunk [Bk, D]: MoT-routed per-head RMSNorm (und on
        text rows {0, end_row_k}, gen elsewhere) + RoPE, rounded to the kv
        dtype for bit-parity with the unfused XLA path (which writes bf16 k)."""
        var = jnp.mean(k32 * k32, axis=-1, keepdims=True)
        kn = k32 * jax.lax.rsqrt(var + norm_eps)
        row = kb_i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        is_text = (row == 0) | (row == end_row_k)
        w = jnp.where(is_text, wuk_ref[0][None, :], wgk_ref[0][None, :])
        kn = kn * w
        if k_compact:  # row-constant tables: one [1, D] row broadcasts
            cos = cosk_ref[0, 0][None, :]
            ssin = ssink_ref[0, 0][None, :]
        else:
            cos = cosk_ref[0, pl.ds(kb_i * block_k, block_k), :]
            ssin = ssink_ref[0, pl.ds(kb_i * block_k, block_k), :]
        k_rope = kn * cos + pltpu.roll(kn, D // 2, axis=1) * ssin
        return k_rope.astype(kb_ref.dtype).astype(jnp.float32)

    def phase(kv_ref, vv_ref, n_pad, mask_fn, carry, n_valid=None, proc=False):
        def body(kb_i, carry):
            acc, m_prev, l_prev = carry
            k = kv_ref[0, 0, pl.ds(kb_i * block_k, block_k), :].astype(jnp.float32)
            if proc:
                k = _proc_k_chunk(k, kb_i)
            v = vv_ref[0, 0, pl.ds(kb_i * block_k, block_k), :].astype(jnp.float32)
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            kv_idx = kb_i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_k), 1
            )
            logits = jnp.where(mask_fn(kv_idx), logits, NEG_INF)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        nb = n_pad // block_k
        if n_valid is not None:
            # lens-bounded sweep over the cache phase (see _kernel)
            nb = jnp.minimum(pl.cdiv(n_valid, block_k), nb)
        return jax.lax.fori_loop(0, nb, body, carry)

    init = (
        jnp.zeros((rows, D), jnp.float32),
        jnp.full((rows, 1), NEG_INF, jnp.float32),
        jnp.zeros((rows, 1), jnp.float32),
    )
    carry = phase(kc_ref, vc_ref, m_pad, lambda kv: kv < ln, init, n_valid=ln)
    if causal:
        blk_mask = lambda kv: (kv < q_len) & (kv <= q_idx)
    else:
        blk_mask = lambda kv: kv < q_len
    acc, m, l = phase(kb_ref, vb_ref, t_pad, blk_mask, carry, proc=k_preproc)

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(G, Bq, D).astype(o_ref.dtype)


def flash_cache_block_attention(
    q: jax.Array,  # [S, T, H, D]
    k_cache: jax.Array,  # [S, M, Hk, D]
    v_cache: jax.Array,  # [S, M, Hk, D]
    k_block: jax.Array,  # [S, T, Hk, D] the query block's own keys
    v_block: jax.Array,  # [S, T, Hk, D]
    lens: jax.Array,  # [S] valid cache length
    causal: bool,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
    q_preproc: Optional[dict] = None,
    kv_preproc: Optional[dict] = None,
    block_len: Optional[int] = None,
    cache_head_major: bool = False,
) -> jax.Array:
    """Attention over virtual concat(cache, block) WITHOUT materialising the
    concat — the CFG denoise path calls this per layer with update_cache=False
    and would otherwise copy the whole cache. Returns [S, T, H, D].

    ``cache_head_major``: k_cache/v_cache arrive as [S, Hk, M, D] (native
    KVCache layout) — skips their transpose copy; the fresh block kv stays
    [S, T, Hk, D].

    ``q_preproc``: fused q-side qk-norm + RoPE, see flash_block_attention.
    ``kv_preproc``: fuse the K-side fp32 island too (requires ``q_preproc``
    for the shared eps; cos/sin/end_row default to q's): pass RAW projected
    block k and a dict with ``w_und``/``w_gen`` ([D] k-RMSNorm scales), plus
    optional ``cos``/``sin``/``end_row`` overrides when the kv block differs
    from the query block (sequence-parallel denoise: local queries, gathered
    keys). Legal exactly when the processed k is never written to the cache
    (update_cache=False denoise steps) — it exists only inside the kernel's
    VMEM.
    ``block_len``: static valid length of the kv block when it is NOT the
    query block (sequence parallelism gathers keys across shards, so
    k_block is [S, T_global, ...] while q is [S, T_local, ...]). Non-causal
    only — all valid block keys are visible to every query.
    """
    S, T, H, D = q.shape
    if cache_head_major:
        Hk, M = k_cache.shape[1], k_cache.shape[2]
    else:
        M, Hk = k_cache.shape[1], k_cache.shape[2]
    Tb = k_block.shape[1]
    if block_len is None and Tb != T:
        raise ValueError("k_block length != q length requires block_len")
    if causal and block_len is not None:
        raise ValueError("block_len (SP gathered keys) is non-causal only")
    blk_valid = Tb if block_len is None else block_len
    G = H // Hk
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # VMEM guard (see flash_block_attention)
    while G * block_q > 2048 and block_q > 128:
        block_q //= 2

    T_pad = _round_up(T, block_q)
    M_pad = _round_up(M, block_k)
    Tb_pad = _round_up(Tb, block_k)
    qh = q.reshape(S, T, Hk, G, D).transpose(0, 2, 3, 1, 4)
    if T_pad != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, T_pad - T), (0, 0)))

    def prep(x, n, n_pad, head_major=False):
        if not head_major:
            x = x.transpose(0, 2, 1, 3)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        return x

    kc = prep(k_cache, M, M_pad, cache_head_major)
    vc = prep(v_cache, M, M_pad, cache_head_major)
    kb = prep(k_block.astype(k_cache.dtype), Tb, Tb_pad)
    vb = prep(v_block.astype(v_cache.dtype), Tb, Tb_pad)

    extra_inputs = []
    extra_specs = []
    end_row = jnp.zeros((S,), jnp.int32)
    k_compact = False
    if q_preproc is not None:
        wu, wg, cos, ssin, end_row = _prep_preproc_tables(
            q_preproc, S, T, T_pad, D, D
        )
        extra_inputs = [wu, wg, cos, ssin]
        if _tables_compact(q_preproc):
            tspec = pl.BlockSpec((1, 1, D), lambda s, hk, qb, *_: (s, 0, 0))
        else:
            tspec = pl.BlockSpec(
                (1, block_q, D), lambda s, hk, qb, *_: (s, qb, 0)
            )
        extra_specs = [
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            tspec,
            tspec,
        ]
    end_row_k = end_row
    if kv_preproc is not None:
        if q_preproc is None:
            raise ValueError("kv_preproc requires q_preproc (shared tables)")
        # cos/sin/end_row default to q's, padded to the BLOCK-K sweep length;
        # SP gathered-keys callers override them for the global kv block
        kvp = dict(
            q_preproc,
            w_und=kv_preproc["w_und"], w_gen=kv_preproc["w_gen"],
            cos=kv_preproc.get("cos", q_preproc["cos"]),
            sin=kv_preproc.get("sin", q_preproc["sin"]),
            end_row=kv_preproc.get("end_row", q_preproc.get("end_row")),
        )
        k_compact = _tables_compact(kvp)
        wuk, wgk, cosk, ssink, end_row_k = _prep_preproc_tables(
            kvp, S, Tb, Tb_pad, D, D
        )
        extra_inputs += [wuk, wgk, cosk, ssink]
        if k_compact:
            ktspec = pl.BlockSpec((1, 1, D), lambda s, hk, qb, *_: (s, 0, 0))
        else:
            ktspec = pl.BlockSpec(
                (1, Tb_pad, D), lambda s, hk, qb, *_: (s, 0, 0)
            )
        extra_specs += [
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            pl.BlockSpec((1, D), lambda s, hk, qb, *_: (0, 0)),
            ktspec,
            ktspec,
        ]

    grid = (S, Hk, T_pad // block_q)
    kernel = functools.partial(
        _kernel2,
        causal=causal,
        q_len=blk_valid,
        block_q=block_q,
        block_k=block_k,
        m_pad=M_pad,
        t_pad=Tb_pad,
        scale=D**-0.5,
        preproc=q_preproc is not None,
        k_preproc=kv_preproc is not None,
        k_compact=k_compact,
        norm_eps=(q_preproc or {}).get("eps", 1e-6),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
                ),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, Tb_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, Tb_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
            ]
            + extra_specs,
            out_specs=pl.BlockSpec(
                (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hk, G, T_pad, D), q.dtype),
        interpret=interpret,
    )(
        lens.astype(jnp.int32), end_row, jnp.broadcast_to(end_row_k, (S,)),
        qh, kc, vc, kb, vb, *extra_inputs,
    )

    out = out.transpose(0, 3, 1, 2, 4).reshape(S, T_pad, H, D)
    return out[:, :T]

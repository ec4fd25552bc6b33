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


def _kernel(
    lens_ref,  # [S] int32 (scalar prefetch)
    bstart_ref,  # [S] int32 (scalar prefetch)
    qvlen_ref,  # [S] int32 (scalar prefetch) valid query-block length
    q_ref,  # [1, 1, G, Bq, D]
    k_ref,  # [1, 1, Mpad, D]
    v_ref,  # [1, 1, Mpad, D]
    o_ref,  # [1, 1, G, Bq, D]
    *,
    causal: bool,
    block_q: int,
    block_k: int,
    m_pad: int,
    scale: float,
):
    s = pl.program_id(0)
    qb = pl.program_id(2)
    G, Bq, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    rows = G * Bq

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
) -> jax.Array:
    """Flash attention with cache+block visibility. Returns [S, T, H, D].

    head_dim is zero-padded to a 128 multiple when needed (e.g. SigLIP's 72);
    the softmax scale uses the true head_dim. ``q_valid_len`` supports
    trailing-padded query blocks (shape-bucketed prefill): block keys at
    offsets >= q_valid_len[s] are masked.
    """
    S, T, H, D = q.shape
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
    # [S, M, Hk, D] -> [S, Hk, M_pad, D] (TPU blocks must keep the last two
    # dims aligned, so the head axis cannot sit second-to-last with block 1)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if M_pad != M:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, M_pad - M), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, M_pad - M), (0, 0)))

    if q_valid_len is None:
        q_valid_len = jnp.full((S,), T, jnp.int32)

    grid = (S, Hk, T_pad // block_q)
    kernel = functools.partial(
        _kernel,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        m_pad=M_pad,
        scale=scale,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                # index maps receive the scalar-prefetch refs as trailing args
                pl.BlockSpec(
                    (1, 1, G, block_q, D),
                    lambda s, hk, qb, *_: (s, hk, 0, qb, 0),
                ),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hk, G, T_pad, D), q.dtype),
        interpret=interpret,
    )(
        lens.astype(jnp.int32),
        block_start.astype(jnp.int32),
        q_valid_len.astype(jnp.int32),
        qh,
        k,
        v,
    )

    # [S, Hk, G, T_pad, D] -> [S, T, H, D]
    out = out.transpose(0, 3, 1, 2, 4).reshape(S, T_pad, H, D)
    return out[:, :T, :, :D_out]


# ---------------------------------------------------------------------------
# two-phase variant: separate cache and block kv inputs (no concat copy)
# ---------------------------------------------------------------------------

def _kernel2(
    lens_ref,  # [S] int32 (scalar prefetch)
    q_ref,  # [1, 1, G, Bq, D]
    kc_ref,  # [1, 1, Mpad, D] cache keys
    vc_ref,  # [1, 1, Mpad, D]
    kb_ref,  # [1, 1, Tpad, D] block keys
    vb_ref,  # [1, 1, Tpad, D]
    o_ref,  # [1, 1, G, Bq, D]
    *,
    causal: bool,
    q_len: int,
    block_q: int,
    block_k: int,
    m_pad: int,
    t_pad: int,
    scale: float,
):
    s = pl.program_id(0)
    qb = pl.program_id(2)
    G, Bq, D = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    rows = G * Bq

    q = q_ref[0, 0].reshape(rows, D).astype(jnp.float32) * scale
    ln = lens_ref[s]
    q_idx = qb * Bq + (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % Bq)

    def phase(kv_ref, vv_ref, n_pad, mask_fn, carry, n_valid=None):
        def body(kb_i, carry):
            acc, m_prev, l_prev = carry
            k = kv_ref[0, 0, pl.ds(kb_i * block_k, block_k), :].astype(jnp.float32)
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
    acc, m, l = phase(kb_ref, vb_ref, t_pad, blk_mask, carry)

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
) -> jax.Array:
    """Attention over virtual concat(cache, block) WITHOUT materialising the
    concat — the CFG denoise path calls this per layer with update_cache=False
    and would otherwise copy the whole cache. Returns [S, T, H, D]."""
    S, T, H, D = q.shape
    M, Hk = k_cache.shape[1], k_cache.shape[2]
    G = H // Hk
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    T_pad = _round_up(T, block_q)
    M_pad = _round_up(M, block_k)
    Tb_pad = _round_up(T, block_k)
    qh = q.reshape(S, T, Hk, G, D).transpose(0, 2, 3, 1, 4)
    if T_pad != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, 0), (0, T_pad - T), (0, 0)))

    def prep(x, n, n_pad):
        x = x.transpose(0, 2, 1, 3)
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
        return x

    kc = prep(k_cache, M, M_pad)
    vc = prep(v_cache, M, M_pad)
    kb = prep(k_block.astype(k_cache.dtype), T, Tb_pad)
    vb = prep(v_block.astype(v_cache.dtype), T, Tb_pad)

    grid = (S, Hk, T_pad // block_q)
    kernel = functools.partial(
        _kernel2,
        causal=causal,
        q_len=T,
        block_q=block_q,
        block_k=block_k,
        m_pad=M_pad,
        t_pad=Tb_pad,
        scale=D**-0.5,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
                ),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, M_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, Tb_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
                pl.BlockSpec((1, 1, Tb_pad, D), lambda s, hk, qb, *_: (s, hk, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, G, block_q, D), lambda s, hk, qb, *_: (s, hk, 0, qb, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((S, Hk, G, T_pad, D), q.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), qh, kc, vc, kb, vb)

    out = out.transpose(0, 3, 1, 2, 4).reshape(S, T_pad, H, D)
    return out[:, :T]

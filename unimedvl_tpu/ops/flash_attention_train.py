"""Differentiable Pallas flash attention for the packed TRAINING forward with
the reference's composable mask semantics (data_utils.py:13-40) evaluated
inside the kernel from segment-id arrays — completing SURVEY.md §2.3 N2
(the reference relies on Triton flex_attention block masks).

allowed(q, k) = (q >= k  OR  (fn[q] == fn[k] AND fn[q] >= 0))
                AND NOT (noise[k] >= 0 AND noise[q] != noise[k])
                AND doc[q] == doc[k]

The dense-mask jnp path (ops/blockmask.dense_packed_mask + gqa_attention)
materialises [H, T, T] fp32 logits; this kernel keeps the online softmax in
VMEM and runs fwd + bwd (custom VJP with saved logsumexp, flash2-style).
Blocks whose mask is entirely false skip both matmuls.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = float(np.finfo(np.float32).min)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _block_mask(doc_ref, fn_ref, nz_ref, q_start, k_start, bq, bk):
    """bool [bq, bk] mask for a (q block, kv block) pair from segment refs
    (each [1, T_pad] int32 in VMEM)."""
    dq = doc_ref[0, pl.ds(q_start, bq)][:, None]
    dk = doc_ref[0, pl.ds(k_start, bk)][None, :]
    fq = fn_ref[0, pl.ds(q_start, bq)][:, None]
    fk = fn_ref[0, pl.ds(k_start, bk)][None, :]
    nq = nz_ref[0, pl.ds(q_start, bq)][:, None]
    nk = nz_ref[0, pl.ds(k_start, bk)][None, :]
    q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    k_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    causal = q_idx >= k_idx
    fn_ok = (fq == fk) & (fq >= 0)
    keep = ~((nk >= 0) & (nq != nk))
    doc_ok = dq == dk
    return (causal | fn_ok) & keep & doc_ok


def _expand_rows(mask, g):
    """[Bq, Bk] -> [G*Bq, Bk] by tiling over grouped q heads (row-major
    [G, Bq] flattening)."""
    bq, bk = mask.shape
    return jnp.broadcast_to(mask[None], (g, bq, bk)).reshape(g * bq, bk)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    doc_ref, fn_ref, nz_ref,  # [1, T_pad] int32
    q_ref,  # [1, G, Bq, D]
    k_ref,  # [1, T_pad, D]
    v_ref,  # [1, T_pad, D]
    o_ref,  # [1, G, Bq, D]
    lse_ref,  # [1, G, Bq]
    *,
    block_q: int,
    block_k: int,
    t_pad: int,
    scale: float,
):
    qb = pl.program_id(1)
    G, Bq, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    rows = G * Bq
    q = q_ref[0].reshape(rows, D).astype(jnp.float32) * scale
    q_start = qb * Bq

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_start = kb * block_k
        mask = _block_mask(doc_ref, fn_ref, nz_ref, q_start, k_start, Bq, block_k)

        def live(carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
            v = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            logits = jnp.where(_expand_rows(mask, G), logits, NEG_INF)
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        return jax.lax.cond(jnp.any(mask), live, lambda c: c, carry)

    acc0 = jnp.zeros((rows, D), jnp.float32)
    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, t_pad // block_k, body, (acc0, m0, l0))

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).reshape(G, Bq, D).astype(o_ref.dtype)
    lse = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)
    lse_ref[0] = lse.reshape(G, Bq)


def _fwd(q, k, v, doc, fn, nz, block_q, block_k, interpret):
    T, H, D = q.shape
    Hk = k.shape[1]
    G = H // Hk
    T_pad = _round_up(T, max(block_q, block_k))
    scale = D**-0.5

    qh = q.reshape(T, Hk, G, D).transpose(1, 2, 0, 3)  # [Hk, G, T, D]
    kh = k.transpose(1, 0, 2)  # [Hk, T, D]
    vh = v.transpose(1, 0, 2)
    if T_pad != T:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, T_pad - T), (0, 0)))
        kh = jnp.pad(kh, ((0, 0), (0, T_pad - T), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, T_pad - T), (0, 0)))

    def seg(x, fill):
        x = x.astype(jnp.int32)
        if T_pad != T:
            x = jnp.pad(x, (0, T_pad - T), constant_values=fill)
        return x[None]  # [1, T_pad]

    # padding: doc -1 matches nothing real (real docs start at 1)
    doc2, fn2, nz2 = seg(doc, -1), seg(fn, -1), seg(nz, -1)

    grid = (Hk, T_pad // block_q)
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k, t_pad=T_pad, scale=scale
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, G, block_q, D), lambda hk, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, T_pad, D), lambda hk, qb: (hk, 0, 0)),
            pl.BlockSpec((1, T_pad, D), lambda hk, qb: (hk, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, G, block_q, D), lambda hk, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, G, block_q), lambda hk, qb: (hk, 0, qb)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hk, G, T_pad, D), q.dtype),
            jax.ShapeDtypeStruct((Hk, G, T_pad), jnp.float32),
        ],
        interpret=interpret,
    )(doc2, fn2, nz2, qh, kh, vh)
    return o, lse, (qh, kh, vh, doc2, fn2, nz2, T_pad)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    doc_ref, fn_ref, nz_ref,
    q_ref,  # [1, G, Bq, D]
    k_ref,  # [1, T_pad, D]
    v_ref,  # [1, T_pad, D]
    do_ref,  # [1, G, Bq, D]
    lse_ref,  # [1, G, Bq, 8] lane-replicated (Mosaic cannot cast lanes to
    dsum_ref,  # [1, G, Bq, 8]  sublanes, so per-row stats ride a small lane dim)
    dq_ref,  # [1, G, Bq, D]
    *,
    block_q: int,
    block_k: int,
    t_pad: int,
    scale: float,
):
    qb = pl.program_id(1)
    G, Bq, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    rows = G * Bq
    q = q_ref[0].reshape(rows, D).astype(jnp.float32) * scale
    do = do_ref[0].reshape(rows, D).astype(jnp.float32)
    lse = lse_ref[0].reshape(rows, 8)[:, :1]
    dsum = dsum_ref[0].reshape(rows, 8)[:, :1]
    q_start = qb * Bq

    def body(kb, dq):
        k_start = kb * block_k
        mask = _block_mask(doc_ref, fn_ref, nz_ref, q_start, k_start, Bq, block_k)

        def live(dq):
            k = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
            v = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            p = jnp.exp(s - lse)
            p = jnp.where(_expand_rows(mask, G), p, 0.0)
            dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
            ds = p * (dp - dsum)
            return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

        return jax.lax.cond(jnp.any(mask), live, lambda d: d, dq)

    dq = jax.lax.fori_loop(0, t_pad // block_k, body, jnp.zeros((rows, D), jnp.float32))
    dq_ref[0] = (dq * scale).reshape(G, Bq, D).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    doc_ref, fn_ref, nz_ref,
    q_ref,  # [1, G, Bq, D]    (q-blocked: qb is the innermost grid dim)
    k_ref,  # [1, Bk, D]
    v_ref,  # [1, Bk, D]
    do_ref,  # [1, G, Bq, D]
    lse_ref,  # [1, G, Bq, 8] lane-replicated
    dsum_ref,  # [1, G, Bq, 8]
    dk_ref,  # [1, Bk, D]  — revisited across qb steps; accumulated in VMEM
    dv_ref,  # [1, Bk, D]
    *,
    block_q: int,
    block_k: int,
    scale: float,
):
    kb = pl.program_id(1)
    qb = pl.program_id(2)
    G, Bq, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    Bk = k_ref.shape[1]
    k_start = kb * Bk
    q_start = qb * Bq

    @pl.when(qb == 0)
    def _():
        dk_ref[0] = jnp.zeros((Bk, D), dk_ref.dtype)
        dv_ref[0] = jnp.zeros((Bk, D), dv_ref.dtype)

    mask = _block_mask(doc_ref, fn_ref, nz_ref, q_start, k_start, Bq, Bk)

    @pl.when(jnp.any(mask))
    def _():
        rows = G * Bq
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        q = q_ref[0].reshape(rows, D).astype(jnp.float32) * scale
        do = do_ref[0].reshape(rows, D).astype(jnp.float32)
        lse = lse_ref[0].reshape(rows, 8)[:, :1]
        dsum = dsum_ref[0].reshape(rows, 8)[:, :1]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        p = jnp.where(_expand_rows(mask, G), p, 0.0)
        dv_ref[0] += jnp.dot(p.T, do, preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum)
        dk_ref[0] += jnp.dot(ds.T, q, preferred_element_type=jnp.float32).astype(dk_ref.dtype)


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def packed_train_attention(
    q: jax.Array,  # [T, H, D]
    k: jax.Array,  # [T, Hk, D]
    v: jax.Array,  # [T, Hk, D]
    doc_id: jax.Array,  # [T] int32
    fn_id: jax.Array,  # [T]
    noise_id: jax.Array,  # [T]
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    out, _ = _packed_train_attention_fwd(
        q, k, v, doc_id, fn_id, noise_id, block_q, block_k, interpret
    )
    return out


def _resolve_interpret(interpret):
    return jax.default_backend() == "cpu" if interpret is None else interpret


def _packed_train_attention_fwd(q, k, v, doc, fn, nz, block_q, block_k, interpret):
    interpret = _resolve_interpret(interpret)
    T, H, D = q.shape
    Hk = k.shape[1]
    G = H // Hk
    o, lse, (qh, kh, vh, doc2, fn2, nz2, T_pad) = _fwd(
        q, k, v, doc, fn, nz, block_q, block_k, interpret
    )
    out = o.transpose(2, 0, 1, 3).reshape(T_pad, H, D)[:T]
    return out, (qh, kh, vh, doc2, fn2, nz2, o, lse)


def _packed_train_attention_bwd(block_q, block_k, interpret, res, g):
    interpret = _resolve_interpret(interpret)
    qh, kh, vh, doc2, fn2, nz2, o, lse = res
    qdt, kdt = qh.dtype, kh.dtype
    T = g.shape[0]  # static: cotangent has the primal output shape
    Hk, G, T_pad, D = qh.shape
    H = Hk * G
    scale = D**-0.5

    gh = g.astype(jnp.float32)
    if T_pad != T:
        gh = jnp.pad(gh, ((0, T_pad - T), (0, 0), (0, 0)))
    gh = gh.reshape(T_pad, Hk, G, D).transpose(1, 2, 0, 3)  # [Hk, G, T_pad, D]
    dsum = jnp.sum(gh * o.astype(jnp.float32), axis=-1)  # [Hk, G, T_pad]
    # lane-replicate the per-row stats (see kernel comments)
    lse_r = jnp.broadcast_to(lse[..., None], (*lse.shape, 8))
    dsum_r = jnp.broadcast_to(dsum[..., None], (*dsum.shape, 8))

    grid_q = (Hk, T_pad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_q=block_q, block_k=block_k, t_pad=T_pad, scale=scale
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, qb: (0, 0)),
            pl.BlockSpec((1, G, block_q, D), lambda hk, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, T_pad, D), lambda hk, qb: (hk, 0, 0)),
            pl.BlockSpec((1, T_pad, D), lambda hk, qb: (hk, 0, 0)),
            pl.BlockSpec((1, G, block_q, D), lambda hk, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, G, block_q, 8), lambda hk, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, G, block_q, 8), lambda hk, qb: (hk, 0, qb, 0)),
        ],
        out_specs=pl.BlockSpec((1, G, block_q, D), lambda hk, qb: (hk, 0, qb, 0)),
        out_shape=jax.ShapeDtypeStruct((Hk, G, T_pad, D), jnp.float32),
        interpret=interpret,
    )(doc2, fn2, nz2, qh, kh, vh, gh.astype(qh.dtype), lse_r, dsum_r)

    # qb innermost: k/v and the dk/dv output blocks stay resident in VMEM
    # across the qb sweep (accumulation via output revisiting).
    grid_k = (Hk, T_pad // block_k, T_pad // block_q)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, block_k=block_k, scale=scale
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, T_pad), lambda hk, kb, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, kb, qb: (0, 0)),
            pl.BlockSpec((1, T_pad), lambda hk, kb, qb: (0, 0)),
            pl.BlockSpec((1, G, block_q, D), lambda hk, kb, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, block_k, D), lambda hk, kb, qb: (hk, kb, 0)),
            pl.BlockSpec((1, block_k, D), lambda hk, kb, qb: (hk, kb, 0)),
            pl.BlockSpec((1, G, block_q, D), lambda hk, kb, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, G, block_q, 8), lambda hk, kb, qb: (hk, 0, qb, 0)),
            pl.BlockSpec((1, G, block_q, 8), lambda hk, kb, qb: (hk, 0, qb, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, D), lambda hk, kb, qb: (hk, kb, 0)),
            pl.BlockSpec((1, block_k, D), lambda hk, kb, qb: (hk, kb, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hk, T_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((Hk, T_pad, D), jnp.float32),
        ],
        interpret=interpret,
    )(doc2, fn2, nz2, qh, kh, vh, gh.astype(qh.dtype), lse_r, dsum_r)

    dq_out = dq.transpose(2, 0, 1, 3).reshape(T_pad, H, D)[:T].astype(qdt)
    dk_out = dk.transpose(1, 0, 2)[:T].astype(kdt)
    dv_out = dv.transpose(1, 0, 2)[:T].astype(kdt)
    return dq_out, dk_out, dv_out, None, None, None


packed_train_attention.defvjp(_packed_train_attention_fwd, _packed_train_attention_bwd)

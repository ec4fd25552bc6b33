"""Attention primitives for batched padded sequences with explicit masks.

TPU-first replacement for the reference's CUDA ``flash_attn_varlen_func`` over
packed flat sequences (qwen2_navit.py:369-378, 605-614; siglip_navit.py:232-241):
instead of cu_seqlens varlen packing we batch samples padded to a bucketed
length and mask. Rectangular shapes tile cleanly onto the MXU and XLA fuses
the mask/softmax chain; a Pallas flash kernel (ops/flash_attention.py) covers
the long-KV decode path.

All functions are pure; softmax runs in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _dot_dtype(x: jax.Array) -> jax.Array:
    """CPU XLA's DotThunk can't run bf16 x bf16 = f32 for the head-major
    batched-dot einsum forms; upcast the operands there (bit-identical result
    — the f32 accumulation is unchanged). On TPU bf16 feeds the MXU natively."""
    if x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        return x.astype(jnp.float32)
    return x


def gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: Optional[float] = None,
) -> jax.Array:
    """Grouped-query attention.

    q: [B, Tq, H, D]; k/v: [B, Tk, Hk, D] with H % Hk == 0.
    mask: bool [B, Tq, Tk] (True = attend) or None.
    Returns [B, Tq, H, D] in q.dtype.
    """
    B, Tq, H, D = q.shape
    Hk = k.shape[2]
    G = H // Hk
    scale = D**-0.5 if scale is None else scale

    qg = q.reshape(B, Tq, Hk, G, D)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def gqa_attention_quant(
    q: jax.Array,
    k_q: jax.Array,  # [B, Tk, Hk, D] int8
    k_scale: jax.Array,  # [B, Tk, Hk] fp32
    v_q: jax.Array,
    v_scale: jax.Array,
    mask: Optional[jax.Array],
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA over an int8 KV cache WITHOUT materialising the dequantized kv.

    The per-key scales factor out of both dots:
      logits[..., m]  = (q . k_int8[m]) * k_scale[m]
      out             = sum_m probs[m] * v_scale[m] * v_int8[m]
                      = (probs * v_scale) . v_int8
    so only the [B, H, Tq, Tk] logits/probs (tiny at decode Tq=1) touch the
    scales; the int8 values feed the MXU dots through a plain convert that
    XLA fuses into the operand load. Naive dequant-then-attend materialises
    the whole bf16 cache per layer — measured +32 ms/step at bs256
    (benchmarks: bs256 int8-kv 47.8 ms vs the ~16 ms expectation).
    """
    B, Tq, H, D = q.shape
    Hk = k_q.shape[2]
    G = H // Hk
    scale = D**-0.5 if scale is None else scale

    qg = q.reshape(B, Tq, Hk, G, D)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    # [B, Tk, Hk] -> [B, Hk, 1, 1, Tk]
    ks = k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    logits = logits * (ks * scale)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    vs = v_scale.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", (probs * vs).astype(q.dtype), v_q.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def gqa_attention_hm(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: Optional[float] = None,
) -> jax.Array:
    """GQA over HEAD-MAJOR kv (the native KVCache layout [B, Hk, Tk, D]).

    The einsum batches over (stream, kv-head) with the contraction on the
    minor D axis — layout-native on TPU, no kv transpose copy (the [Tk, Hk, D]
    layout forced XLA to re-materialise the whole cache per layer to make the
    head axis major; measured as the bulk of the bs256 decode roofline gap).
    q: [B, Tq, H, D]; k/v: [B, Hk, Tk, D]; mask: bool [B, Tq, Tk] or None.
    """
    B, Tq, H, D = q.shape
    Hk = k.shape[1]
    G = H // Hk
    scale = D**-0.5 if scale is None else scale

    qg = _dot_dtype(q.reshape(B, Tq, Hk, G, D))
    logits = jnp.einsum(
        "bqhgd,bhkd->bhgqk", qg, _dot_dtype(k),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bhkd->bqhgd", _dot_dtype(probs.astype(v.dtype)), _dot_dtype(v),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def gqa_attention_hm_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: Optional[float] = None,
):
    """:func:`gqa_attention_hm` that ALSO returns the scaled-logit logsumexp
    [B, Tq, H] fp32, for combining partial attentions over disjoint kv sets
    (see :func:`combine_attention_partials`). Rows with no visible kv report
    lse = -inf and a zero output."""
    B, Tq, H, D = q.shape
    Hk = k.shape[1]
    G = H // Hk
    scale = D**-0.5 if scale is None else scale

    qg = _dot_dtype(q.reshape(B, Tq, Hk, G, D))
    logits = jnp.einsum(
        "bqhgd,bhkd->bhgqk", qg, _dot_dtype(k),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    # all-masked rows: pivot at 0 so every exp(NEG_INF - 0) underflows to 0
    # (pivoting at m = NEG_INF would make exp(logits - m) = 1 instead)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    p = jnp.exp(logits - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhgqk,bhkd->bqhgd",
        _dot_dtype((p / jnp.maximum(l, 1e-30)).astype(v.dtype)), _dot_dtype(v),
        preferred_element_type=jnp.float32,
    )
    lse = jnp.where(
        l > 0, m_safe + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF
    )  # [B, Hk, G, Tq, 1]
    lse = lse[..., 0].transpose(0, 3, 1, 2).reshape(B, Tq, H)
    return out.reshape(B, Tq, H, D).astype(q.dtype), lse


def combine_attention_partials(parts):
    """Merge partial attention outputs over DISJOINT kv sets with the
    online-softmax algebra: given [(o_i [B, T, H, D], lse_i [B, T, H]), ...]
    (each o_i already softmax-normalised over its own kv subset), the exact
    full-set attention is sum_i w_i o_i / sum_i w_i with w_i =
    exp(lse_i - max_j lse_j). Lets a sequence-parallel caller attend the
    local cache while a gathered-block partial's collective is in flight."""
    lses = jnp.stack([lse for _, lse in parts])  # [P, B, T, H]
    m = jnp.max(lses, axis=0)
    ws = jnp.exp(lses - m[None])  # [P, B, T, H]
    den = jnp.maximum(jnp.sum(ws, axis=0), 1e-30)
    out = sum(
        o.astype(jnp.float32) * (ws[i] / den)[..., None]
        for i, (o, _) in enumerate(parts)
    )
    return out.astype(parts[0][0].dtype)


def gqa_attention_quant_hm(
    q: jax.Array,
    k_q: jax.Array,  # [B, Hk, Tk, D] int8 (head-major cache layout)
    k_scale: jax.Array,  # [B, Hk, Tk] fp32
    v_q: jax.Array,
    v_scale: jax.Array,
    mask: Optional[jax.Array],
    scale: Optional[float] = None,
) -> jax.Array:
    """Head-major twin of :func:`gqa_attention_quant`: int8 kv feeds the MXU
    dots directly (per-key scales factor into logits / softmax weights) and
    the head-major layout needs no scale transpose either."""
    B, Tq, H, D = q.shape
    Hk = k_q.shape[1]
    G = H // Hk
    scale = D**-0.5 if scale is None else scale

    qg = _dot_dtype(q.reshape(B, Tq, Hk, G, D))
    logits = jnp.einsum(
        "bqhgd,bhkd->bhgqk", qg, _dot_dtype(k_q.astype(q.dtype)),
        preferred_element_type=jnp.float32,
    )
    logits = logits * (k_scale[:, :, None, None, :] * scale)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bhkd->bqhgd",
        _dot_dtype((probs * v_scale[:, :, None, None, :]).astype(q.dtype)),
        _dot_dtype(v_q.astype(q.dtype)),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def padding_mask(valid_q: jax.Array, valid_kv: jax.Array) -> jax.Array:
    """[B, Tq] x [B, Tk] -> [B, Tq, Tk] bool."""
    return valid_q[:, :, None] & valid_kv[:, None, :]


def causal_suffix_mask(
    kv_total: int,
    q_len: int,
    kv_lens: jax.Array,
    causal: bool,
) -> jax.Array:
    """Mask for a query block appended at the tail of per-sample caches.

    The caches hold ``kv_lens[b]`` valid tokens in slots [0, kv_lens[b]); the
    q block occupies slots [kv_lens[b], kv_lens[b] + q_len). This mirrors the
    reference's merged-KV layout where new keys always land at the contiguous
    tail of each sample's segment (SURVEY.md §7 hard-part 1).

    Returns bool [B, q_len, kv_total]. kv_total is the padded cache length
    (already including the appended block).
    """
    B = kv_lens.shape[0]
    kv_idx = jnp.arange(kv_total)[None, None, :]  # [1, 1, Tk]
    q_idx = jnp.arange(q_len)[None, :, None]  # [1, Tq, 1]
    lens = kv_lens[:, None, None]  # [B, 1, 1]
    # context tokens: kv_idx < lens; own block: lens <= kv_idx < lens + q_len
    in_context = kv_idx < lens
    in_block = (kv_idx >= lens) & (kv_idx < lens + q_len)
    if causal:
        # within the block, only keys at block offset <= query offset
        block_ok = in_block & (kv_idx - lens <= q_idx)
    else:
        block_ok = in_block
    mask = in_context | block_ok
    return jnp.broadcast_to(mask, (B, q_len, kv_total))

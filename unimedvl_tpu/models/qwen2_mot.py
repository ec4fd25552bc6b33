"""Qwen2 Mixture-of-Transformers decoder, TPU-native.

Reference: qwen2_navit.py (PackedAttentionMoT / Qwen2MoTDecoderLayer /
Qwen2Model.forward_inference). Key departures (design, not translation):

  * KV cache is a static-shape, preallocated pytree ``KVCache`` of
    HEAD-MAJOR [L, S, Hk, M, Dh] arrays with per-stream lengths, appended to
    with dynamic_update_slice. The reference instead rebuilds a merged flat
    cache with two scatter writes per layer per token (qwen2_navit.py:585-600)
    — the single biggest inefficiency it has. Because new KV always lands at
    the contiguous tail of each sample's segment, append-only semantics are
    exactly equivalent (SURVEY.md §7 hard-part 1). Head-major (Hk before M)
    makes every cache read layout-native: the decode einsum batches over
    (stream, kv-head) with no transpose copy, and the Pallas kernels read
    contiguous [block_k, D] chunks per head (the previous [.., M, Hk, D]
    layout cost a cache-sized transpose+widen per layer per decode step —
    the bulk of the 28.8-vs-13.5 ms bs256 roofline gap).
  * Streams are batched [S, T, C] with padding masks instead of flat varlen
    packing — rectangular shapes tile onto the MXU.
  * Layers are stacked into leading-dim parameter pytrees and scanned.
  * MoT routing in gen mode exploits the fixed packing contract
    [<vision_start>, vae_tokens..., <vision_end>]: the understanding expert
    runs on exactly rows {0, T-1}, statically sliced — no boolean scatter
    (SURVEY.md §2.3 N6).

Numerics parity:
  * qk-norm (per-head RMSNorm) before RoPE (qwen2_navit.py:540-545).
  * gen mode computes qk-norm + RoPE in fp32 (qwen2_navit.py:568-583).
  * attention softmax in fp32; everything else bf16.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unimedvl_tpu.config import LLMConfig
from unimedvl_tpu.ops.attention import gqa_attention, gqa_attention_hm
from unimedvl_tpu.ops.norms import rms_norm
from unimedvl_tpu.ops.rope import rope_cos_sin, apply_rope, apply_rope_one
from unimedvl_tpu.ops.activations import ACT2FN

Params = Dict


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

@struct.dataclass
class KVCache:
    """Append-only per-stream KV cache (head-major).

    k, v: [L, S, Hk, M, Dh] (M = static capacity); lens: [S] int32 valid
    lengths. Functional forks for CFG are free (immutability replaces the
    reference's NaiveCache deepcopy, inferencer.py:261,600-607).

    Opt-in int8 serving mode (``create(..., quantized=True)``): k/v are
    stored int8 with per-(stream, position, head) fp32 absmax scales —
    halves the cache HBM traffic of the weight-streaming-bound decode and
    doubles the batch that fits. Writes quantize in ``_scatter_block``;
    reads dequantize via ``dequant_slice`` (XLA fuses the widen+scale into
    the attention dot, same pattern as quant.quantized_linear).

    ``kv_bits=4``: int4 values (XLA packs 2/byte; Dh is the minor dim so
    128-wide rows pack evenly) — quarters the cache read/footprint. A
    further accuracy step beyond int8 kv; validate on the target checkpoint.
    The quantize/dequant sites derive the width from the array dtype, so
    the two modes share every code path.
    """

    k: jax.Array
    v: jax.Array
    lens: jax.Array
    k_scale: Optional[jax.Array] = None  # [L, S, Hk, M] fp32 (int8 mode)
    v_scale: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def num_streams(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(
        cls,
        num_layers: int,
        num_streams: int,
        capacity: int,
        num_kv_heads: int,
        head_dim: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
        kv_bits: int = 8,
    ) -> "KVCache":
        shape = (num_layers, num_streams, num_kv_heads, capacity, head_dim)
        if quantized:
            assert kv_bits in (8, 4), kv_bits
            if kv_bits == 4 and jax.default_backend() == "tpu":
                import warnings

                warnings.warn(
                    "int4 arrays currently cannot cross a jit argument "
                    "boundary on this TPU backend (device_put relayout "
                    "recursion — see CLAUDE.md / PARITY.md); expect a "
                    "RecursionError at the first jitted call taking this "
                    "cache. kv_bits=8 is the working quantized mode.",
                    stacklevel=2,
                )
            qdtype = jnp.int8 if kv_bits == 8 else jnp.int4
            sshape = shape[:-1]
            return cls(
                k=jnp.zeros(shape, qdtype),
                v=jnp.zeros(shape, qdtype),
                lens=jnp.zeros((num_streams,), jnp.int32),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lens=jnp.zeros((num_streams,), jnp.int32),
        )


def _quantize_kv_block(block: jax.Array, qdtype=jnp.int8):
    """[..., Dh] -> (intN values, fp32 per-row scales over the last dim).
    ``qdtype`` (int8 or int4) comes from the destination cache's dtype."""
    qmax = 127.0 if qdtype == jnp.int8 else 7.0
    b32 = block.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(b32), axis=-1)
    scale = jnp.maximum(absmax, 1e-8) / qmax
    q = jnp.clip(jnp.round(b32 / scale[..., None]), -qmax, qmax).astype(qdtype)
    return q, scale


def dequant_slice(vals: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    """int8 [..., Dh] x fp32 [...] -> dtype; XLA fuses this into the consumer
    dot, so the HBM read stays int8."""
    return (vals.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _scatter_block(
    cache_all: jax.Array, layer_idx: jax.Array, block: jax.Array, lens: jax.Array
) -> jax.Array:
    """Write a [S, T, Hk, Dh] block into the FULL stacked head-major cache
    [L, S, Hk, M, Dh] at (layer_idx, s, h, lens[s] + t) — the append-only
    cache write.

    The stacked cache rides the layer scan as a CARRY (not xs/ys): XLA keeps
    the buffer in place across iterations and this scatter touches only
    S*T*Hk*Dh bytes. The previous xs/ys design re-materialised every layer's
    whole [S, M, Hk, Dh] slice per step — profiled at ~6 ms/step of pure HBM
    copy traffic on the bs48 28L int8 decode (benchmarks/DECODE_PROFILE.json:
    3.3 ms `copy` + 1.6 ms update-slice + part of 1.5 ms dynamic-slice).

    The scatter flavor is chosen by the (static) block length — both measured
    on the v5e bs48 28L int8 serving shape:
      * T == 1 (decode): per-ROW element scatter ([S] index rows) — the
        windowed variant costs +7.7 ms/step here (20.5 vs 12.9 ms).
      * T > 1 (prefill): ONE windowed scatter of S [T, Hk, Dh] windows at row
        starts (layer_idx, s, lens[s]) — the element variant's [S*T] index
        rows cost +0.2 s on the 256-token prefill (TTFT 1.27 vs 1.06 s).
    Single-stream keeps the plain dus (a vmapped dynamic_update_slice lowers
    to a sequential per-stream loop).

    Capacity contract: lens[s] + T <= M for every stream (the pipeline's
    _ensure_capacity / serving's slot sizing guarantee it); a window that
    would overflow is dropped whole (FILL_OR_DROP), matching the element
    variant's drop semantics under the contract.
    """
    S, T = block.shape[:2]
    block = block.astype(cache_all.dtype)
    block_hm = block.transpose(0, 2, 1, 3)  # [S, Hk, T, Dh]
    if S == 1:
        return jax.lax.dynamic_update_slice(
            cache_all, block_hm[None], (layer_idx, 0, 0, lens[0], 0)
        )
    if T == 1:
        rows = jnp.arange(S)  # [S]
        # advanced indices (layer, row, len) with the sliced Hk dim between
        # them: result slots are [S, Hk, Dh] with the advanced dims in front
        return cache_all.at[layer_idx, rows, :, lens].set(
            block[:, 0], mode="drop"
        )
    idx = jnp.stack(
        [
            jnp.full((S,), layer_idx, jnp.int32),
            jnp.arange(S, dtype=jnp.int32),
            lens.astype(jnp.int32),
        ],
        axis=1,
    )  # [S, 3] -> (layer, stream, column)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3),  # (Hk, T, Dh) windows in the update
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 3),
    )
    return jax.lax.scatter(
        cache_all, idx, block_hm, dnums,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _scatter_scale(
    scale_all: jax.Array, layer_idx: jax.Array, sblock: jax.Array, lens: jax.Array
) -> jax.Array:
    """Scale twin of _scatter_block: [S, T, Hk] into [L, S, Hk, M]."""
    S, T = sblock.shape[:2]
    sblock_hm = sblock.transpose(0, 2, 1).astype(scale_all.dtype)  # [S, Hk, T]
    if S == 1:
        return jax.lax.dynamic_update_slice(
            scale_all, sblock_hm[None], (layer_idx, 0, 0, lens[0])
        )
    if T == 1:
        rows = jnp.arange(S)
        return scale_all.at[layer_idx, rows, :, lens].set(
            sblock[:, 0].astype(scale_all.dtype), mode="drop"
        )
    idx = jnp.stack(
        [
            jnp.full((S,), layer_idx, jnp.int32),
            jnp.arange(S, dtype=jnp.int32),
            lens.astype(jnp.int32),
        ],
        axis=1,
    )
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),  # (Hk, T) windows in the update
        inserted_window_dims=(0, 1),
        scatter_dims_to_operand_dims=(0, 1, 3),
    )
    return jax.lax.scatter(
        scale_all, idx, sblock_hm, dnums,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _scatter_kv(cache_all, scale_all, layer_idx, block, lens):
    """Append one processed kv block; int8/int4 caches quantize at the write."""
    if scale_all is None:
        return _scatter_block(cache_all, layer_idx, block, lens), None
    qblock, sblock = _quantize_kv_block(block, cache_all.dtype)
    return (
        _scatter_block(cache_all, layer_idx, qblock, lens),
        _scatter_scale(scale_all, layer_idx, sblock, lens),
    )


def _update_kv_col(cache_all, scale_all, layer_idx, block, col, scales_cm=False):
    """Write a [S, 1, Hk, Dh] token at the SAME column for every stream —
    one contiguous dynamic_update_slice instead of a ragged scatter.

    The per-row scatter serialises on TPU: measured 0.84 ms PER scatter at
    S=256 (x56 per 28L decode step = the entire 37-vs-13 ms roofline gap at
    bs256). generate_text aligns all streams to a common decode column
    (base = max(lens)) so every step's write is dense; the holes
    [lens[s], base) are never attended (see the decode mask in
    _attention_block) and the post-decode cache is discarded by every
    generate_text caller.

    ``scales_cm``: scale_all is carried COLUMN-MAJOR [L, Hk, M, S] (streams
    minor) for the decode loop. The [L, S, Hk, M] layout puts every stream's
    step-d scale in a different 8x128 f32 tile — the column write was a
    read-modify-write of S*Hk tiles, profiled at 0.82 ms/step at bs256
    (benchmarks/DECODE_PROFILE_BS256_ACT.json). Column-major makes it one
    dense [1, Hk, 1, S] minor-dim dus; the read side transposes the tiny
    per-layer [Hk, M, S] slice instead (fused into the logits multiply)."""
    if scale_all is None:
        blk = block.astype(cache_all.dtype).transpose(0, 2, 1, 3)[None]
        return jax.lax.dynamic_update_slice(  # blk: [1, S, Hk, 1, D]
            cache_all, blk, (layer_idx, 0, 0, col, 0)
        ), None
    qblock, sblock = _quantize_kv_block(block, cache_all.dtype)
    vals = jax.lax.dynamic_update_slice(
        cache_all, qblock.transpose(0, 2, 1, 3)[None], (layer_idx, 0, 0, col, 0)
    )
    if scales_cm:
        scales = jax.lax.dynamic_update_slice(
            scale_all, sblock.transpose(2, 1, 0)[None].astype(scale_all.dtype),
            (layer_idx, 0, col, 0),
        )  # update [1, Hk, 1, S]: contiguous along the minor stream axis
    else:
        scales = jax.lax.dynamic_update_slice(
            scale_all, sblock.transpose(0, 2, 1)[None].astype(scale_all.dtype),
            (layer_idx, 0, 0, col),
        )
    return vals, scales


def _suffix_mask(
    capacity: int,
    q_len: int,
    lens: jax.Array,
    causal: bool,
    q_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Mask over an in-cache kv layout where the query block was appended at
    per-stream offsets [lens, lens+T). Returns bool [S, q_len, capacity]."""
    S = lens.shape[0]
    kv_idx = jnp.arange(capacity)[None, :]  # [1, M]
    lens_b = lens[:, None]  # [S, 1]
    in_ctx = (kv_idx < lens_b)[:, None, :]  # [S, 1, M]
    off = kv_idx - lens_b  # [S, M]
    in_block = (off >= 0) & (off < q_len)
    if q_valid is not None:
        off_c = jnp.clip(off, 0, q_len - 1)
        in_block = in_block & jnp.take_along_axis(q_valid, off_c, axis=1)
    if causal:
        q_idx = jnp.arange(q_len)[None, :, None]  # [1, T, 1]
        block_ok = in_block[:, None, :] & (off[:, None, :] <= q_idx)
    else:
        block_ok = in_block[:, None, :]
    return jnp.broadcast_to(in_ctx | block_ok, (S, q_len, capacity))


def _concat_mask(
    capacity: int, q_len: int, lens: jax.Array, causal: bool
) -> jax.Array:
    """Mask over concat(cache[0:M], block[0:T]) kv layout.

    Cache slots valid where kv_idx < lens; block slots (at M + offset) follow
    block-causal or block-full visibility. Returns bool [S, q_len, M + q_len].
    """
    S = lens.shape[0]
    kv_idx = jnp.arange(capacity + q_len)[None, None, :]
    q_idx = jnp.arange(q_len)[None, :, None]
    lens_b = lens[:, None, None]
    in_cache = kv_idx < jnp.minimum(lens_b, capacity)
    block_off = kv_idx - capacity
    in_block = block_off >= 0
    if causal:
        block_ok = in_block & (block_off <= q_idx)
    else:
        block_ok = in_block
    return jnp.broadcast_to(in_cache | block_ok, (S, q_len, capacity + q_len))


# ---------------------------------------------------------------------------
# layer primitives
# ---------------------------------------------------------------------------

def _linear(x, p):
    if "kernel_qa" in p or "kernel_p4a" in p:
        # full-int8 / w4a8 matmul (act+weight quant, unimedvl_tpu.quant)
        from unimedvl_tpu.quant import quantized_linear_act

        y = quantized_linear_act(x, p)
    elif "kernel_q" in p or "kernel_p4" in p:
        # opt-in int8 / packed-int4 weight serving modes (unimedvl_tpu.quant)
        from unimedvl_tpu.quant import quantized_linear

        y = quantized_linear(x, p)
    else:
        y = x @ p["kernel"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
    if "lora_a" in p:  # low-rank adapter (unimedvl_tpu.training.lora):
        # y += (x @ a) @ b * s. With an int8 base this is the QLoRA shape —
        # the frozen base streams quantized, only the adapters are bf16.
        s = jax.lax.stop_gradient(p["lora_s"]).astype(y.dtype)
        y = y + ((x @ p["lora_a"].astype(x.dtype))
                 @ p["lora_b"].astype(x.dtype)) * s
    return y


def fused_key(p, base: str):
    """Find a fused projection leaf: ``base`` ("qkv", "qkv_gen", "gate_up")
    or its tp-interleaved variant "{base}_tp{N}" (quant.fuse_serving_
    projections(tp=N)). Returns (key, tp) or (None, 1)."""
    if base in p:
        return base, 1
    pre = base + "_tp"
    for kk in p:
        if kk.startswith(pre) and not kk[len(pre):].startswith("gen"):
            return kk, int(kk[len(pre):])
    return None, 1


def _deinterleave(y: jax.Array, tp: int, widths):
    """Recover the plain concat parts from a tp-block-interleaved fused
    output. Block s holds every part's s-th column shard IN ORDER, so a
    reshape + per-part slice + flatten reproduces each part's ORIGINAL
    column order exactly (and under a 'model'-sharded fused dim the slices
    are shard-local)."""
    loc = y.shape[-1] // tp
    r = y.reshape(y.shape[:-1] + (tp, loc))
    parts, off = [], 0
    for w in widths:
        wl = w // tp
        parts.append(
            r[..., off : off + wl].reshape(y.shape[:-1] + (w,))
        )
        off += wl
    return parts


def _mlp(x, p, act):
    key, tp = fused_key(p, "gate_up")
    if key is not None:  # serving fusion (quant.fuse_serving_projections)
        gu = _linear(x, p[key])
        if tp == 1:
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g, u = _deinterleave(gu, tp, (gu.shape[-1] // 2,) * 2)
    else:
        g, u = _linear(x, p["gate"]), _linear(x, p["up"])
    down = p["down"]
    if (("kernel_qa" in down or "kernel_p4a" in down) and "lora_a" not in down
            and getattr(act, "is_silu", False)):
        # full-int8 down proj: XLA's dynamic act-quant runs the silu·mul
        # product TWICE (absmax pass + quantize pass) — the fused Pallas
        # kernel does it once per VMEM row block. Data-driven gate, same
        # pattern as use_decode_kernel (off unless the TPU sweep measured a
        # win at this row count — benchmarks/silu_quant_sweep.py).
        from unimedvl_tpu.ops.act_quant import (
            silu_mul_quant, use_silu_quant_kernel,
        )

        rows = 1
        for d in g.shape[:-1]:
            rows *= d
        if use_silu_quant_kernel(rows) or _FORCE_SILU_QUANT:
            from unimedvl_tpu.quant import quantized_linear_preq

            xq, xs = silu_mul_quant(g, u)
            return quantized_linear_preq(xq, xs, down, x.dtype)
    return _linear(act(g) * u, down)


# test hook: force the Pallas flash path (interpret-mode on CPU) so the
# fused-q and kernel branches can be exercised off-TPU
_FORCE_FLASH = False

# test hook: force the fused silu·mul·quant kernel (ops/act_quant.py)
# regardless of the measured-threshold gate. Env-settable so end-to-end
# A/B runs (bench.py rung with/without) can gate-check the kernel at real
# decode shapes — the isolated sweep cannot resolve ops this small under
# the ~25 ms tunnel dispatch floor.
_FORCE_SILU_QUANT = bool(os.environ.get("UNIMEDVL_FORCE_SILU_QUANT"))

# Pallas decode-kernel gate (see use_decode_kernel). _UNSET -> lazily loaded
# from the TPU sweep's measurement record (benchmarks/KERNEL_THRESHOLD.json
# "decode_kernel_min_sm", written by benchmarks/decode_kernel_sweep.py);
# assign None/int explicitly to force the jnp path / a threshold.
_UNSET = object()
_DECODE_KERNEL_MIN_SM = _UNSET


def _load_decode_kernel_min_sm(path: Optional[str] = None):
    """Measured decode-kernel threshold from the sweep record, or None (jnp
    path) when the record is absent or the kernel never won."""
    import json
    import os

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "benchmarks", "KERNEL_THRESHOLD.json",
        )
    try:
        with open(path) as f:
            return json.load(f).get("decode_kernel_min_sm")
    except (OSError, ValueError):
        return None


def use_decode_kernel(num_streams: int, capacity: int) -> bool:
    """Data-driven path selection for single-token decode attention: the
    head-major Pallas kernel vs the jnp einsum path, gated on the measured
    crossover in total cache rows (benchmarks/KERNEL_THRESHOLD.json,
    maintained by benchmarks/decode_kernel_sweep.py on the real chip)."""
    global _DECODE_KERNEL_MIN_SM
    if _DECODE_KERNEL_MIN_SM is _UNSET:
        _DECODE_KERNEL_MIN_SM = _load_decode_kernel_min_sm()
    if _DECODE_KERNEL_MIN_SM is None or jax.default_backend() != "tpu":
        return False
    return num_streams * capacity >= _DECODE_KERNEL_MIN_SM


def _mot_rows(
    x: jax.Array, und_fn, gen_fn, gen_mode: bool,
    end_row: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply gen_fn everywhere and und_fn on the text rows {0, end}, which
    overwrite via .at / dynamic updates (gen packing contract
    [start, vae..., end]). Measured faster than slice+concat on v5e: XLA
    fuses the two tiny overwrites into the big matmul's epilogue, while
    concat forces a fresh layout copy. x: [S, T, C].

    ``end_row``: traced int32 scalar row of the <vision_end> token for
    shape-BUCKETED gen prefill (padding rows trail it); None = static T-1
    (exact-shape contract).
    """
    if not gen_mode:
        return und_fn(x)
    y = gen_fn(x)
    if end_row is None:
        text = jnp.concatenate([x[:, :1], x[:, -1:]], axis=1)  # [S, 2, C]
        text_y = und_fn(text)
        y = y.at[:, :1].set(text_y[:, :1].astype(y.dtype))
        y = y.at[:, -1:].set(text_y[:, 1:].astype(y.dtype))
        return y
    end = jax.lax.dynamic_slice_in_dim(x, end_row, 1, axis=1)  # [S, 1, ...]
    text = jnp.concatenate([x[:, :1], end], axis=1)
    text_y = und_fn(text)
    y = y.at[:, :1].set(text_y[:, :1].astype(y.dtype))
    return jax.lax.dynamic_update_slice_in_dim(
        y, text_y[:, 1:].astype(y.dtype), end_row, axis=1
    )


@dataclasses.dataclass(frozen=True)
class ForwardSpec:
    """Static switches for one jitted forward variant.

    ``rope_const``: every row of the block shares ONE rope position (the
    image packing contract, bagel.py:501-504) — fused kernels then keep a
    single [1, D] cos/sin row in VMEM instead of streaming [T_pad, D] fp32
    tables (measured VMEM-pressure cliff, KERNEL_THRESHOLD.json)."""

    mode: str = "und"  # "und" | "gen"
    is_causal: bool = True
    update_cache: bool = True
    rope_const: bool = False


def _attention_block(
    x: jax.Array,
    lp: Params,
    cfg: LLMConfig,
    cos: jax.Array,
    sin: jax.Array,
    k_all: jax.Array,  # FULL stacked head-major cache [L, S, Hk, M, Dh] (scan carry)
    v_all: jax.Array,
    ks_all: Optional[jax.Array],  # [L, S, Hk, M] fp32 scales (int8 cache)
    vs_all: Optional[jax.Array],
    layer_idx: jax.Array,  # [] int32
    lens: jax.Array,
    spec: ForwardSpec,
    q_valid: Optional[jax.Array],
    end_row: Optional[jax.Array] = None,
    decode_cols: Optional[Tuple[jax.Array, jax.Array]] = None,
    scales_cm: bool = False,
):
    """Returns (attn_out [S,T,C], k_all, v_all, ks_all, vs_all) — on update
    paths the new block is scattered into the carried stacked cache
    (quantizing first on int8 caches, see _scatter_kv).

    ``decode_cols``: (base, col) traced scalars for the aligned-column
    decode write (T == 1): the token is written at column ``col`` for every
    stream via one dense dus (see _update_kv_col) and the mask admits
    context [0, lens[s]) plus the decoded band [base, col].

    ``scales_cm``: ks_all/vs_all are column-major [L, Hk, M, S] (only valid
    with ``decode_cols``; see _update_kv_col)."""
    assert not scales_cm or decode_cols is not None
    S, T, C = x.shape
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    gen = spec.mode == "gen" and cfg.mot_attention
    ap = lp["attn"]

    def proj(p_und, p_gen):
        return _mot_rows(
            x,
            lambda t: _linear(t, ap[p_und]),
            lambda t: _linear(t, ap[p_gen]),
            gen,
            end_row,
        )

    fkey, ftp = fused_key(ap, "qkv")
    if fkey is not None:  # serving fusion: one projection matmul, not three
        gkey = fkey.replace("qkv", "qkv_gen", 1)
        qkv = proj(fkey, gkey) if gen else _linear(x, ap[fkey])
        if ftp == 1:
            q, k, v = jnp.split(qkv, [H * D, (H + Hk) * D], axis=-1)
        else:  # tp-interleaved layout: shard-aligned exact de-interleave
            q, k, v = _deinterleave(qkv, ftp, (H * D, Hk * D, Hk * D))
        q = q.reshape(S, T, H, D)
        k = k.reshape(S, T, Hk, D)
        v = v.reshape(S, T, Hk, D)
    elif gen:
        q = proj("q", "q_gen").reshape(S, T, H, D)
        k = proj("k", "k_gen").reshape(S, T, Hk, D)
        v = proj("v", "v_gen").reshape(S, T, Hk, D)
    else:
        q = _linear(x, ap["q"]).reshape(S, T, H, D)
        k = _linear(x, ap["k"]).reshape(S, T, Hk, D)
        v = _linear(x, ap["v"]).reshape(S, T, Hk, D)

    # Large query blocks (image prefill, denoise) use the Pallas flash kernel;
    # small blocks (decode T=1, short text) use the fused jnp path. Trailing
    # query padding (shape-bucketed prefill) is handled via q_valid_len.
    use_flash = T >= 64 and (jax.default_backend() == "tpu" or _FORCE_FLASH)
    # N7 fusion: in gen mode the q-side fp32 qk-norm + RoPE island
    # (qwen2_navit.py:568-583) moves INTO the flash kernel — raw projected q
    # goes in, the kernel norms/ropes it in fp32 in VMEM, saving the HBM
    # round-trip of the processed q. The k side stays outside (its processed
    # form is written to the cache on update paths).
    q_preproc = None
    fuse_q = gen and cfg.qk_norm and use_flash and D % 128 == 0
    # N7 k-side note: an in-kernel k fp32 island exists too
    # (flash_cache_block_attention kv_preproc) but MEASURED SLOWER than the
    # XLA island + concat at every denoise cache size
    # (benchmarks/KERNEL_THRESHOLD.json fused_k_sweep) — the XLA island stays
    # the production path.

    if cfg.qk_norm:
        if gen:
            # fp32 island incl. RoPE (qwen2_navit.py:568-583)
            k = k.astype(jnp.float32)
            k = _mot_rows(
                k,
                lambda t: rms_norm(t, ap["k_norm"]["scale"], cfg.rms_norm_eps),
                lambda t: rms_norm(t, ap["k_norm_gen"]["scale"], cfg.rms_norm_eps),
                True,
                end_row,
            )
            if fuse_q:
                q_preproc = dict(
                    w_und=ap["q_norm"]["scale"],
                    w_gen=ap["q_norm_gen"]["scale"],
                    cos=cos[:, :1] if spec.rope_const else cos,
                    sin=sin[:, :1] if spec.rope_const else sin,
                    end_row=end_row,
                    eps=cfg.rms_norm_eps,
                )
            else:
                q = q.astype(jnp.float32)
                q = _mot_rows(
                    q,
                    lambda t: rms_norm(t, ap["q_norm"]["scale"], cfg.rms_norm_eps),
                    lambda t: rms_norm(t, ap["q_norm_gen"]["scale"], cfg.rms_norm_eps),
                    True,
                    end_row,
                )
        else:
            q = rms_norm(q, ap["q_norm"]["scale"], cfg.rms_norm_eps)
            k = rms_norm(k, ap["k_norm"]["scale"], cfg.rms_norm_eps)

    if q_preproc is None:
        q, k = apply_rope(q, k, cos, sin)
        q = q.astype(x.dtype)
        k = k.astype(x.dtype)
    else:
        k = apply_rope_one(k, cos, sin).astype(x.dtype)
    qv_len = None
    if q_valid is not None:
        qv_len = jnp.sum(q_valid.astype(jnp.int32), axis=1)

    if spec.update_cache and decode_cols is not None:
        # Aligned-column decode (see _update_kv_col): dense write + two-band
        # mask; lens stay fixed (context) while [base, col] grows.
        base, col = decode_cols
        k_all, ks_all = _update_kv_col(k_all, ks_all, layer_idx, k, col, scales_cm)
        v_all, vs_all = _update_kv_col(v_all, vs_all, layer_idx, v, col, scales_cm)
        k_slice = jax.lax.dynamic_index_in_dim(k_all, layer_idx, 0, keepdims=False)
        v_slice = jax.lax.dynamic_index_in_dim(v_all, layer_idx, 0, keepdims=False)
        ksc = vsc = None
        if ks_all is not None:
            ksc = jax.lax.dynamic_index_in_dim(ks_all, layer_idx, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_all, layer_idx, 0, keepdims=False)
            if scales_cm:
                # [Hk, M, S] -> [S, Hk, M]: the small per-layer slice
                # transposes at the READ (fused into the logits multiply)
                # so the per-step column WRITE stays minor-dim dense.
                ksc = ksc.transpose(2, 0, 1)
                vsc = vsc.transpose(2, 0, 1)
        if (use_decode_kernel(S, k_all.shape[3]) or _FORCE_FLASH) and (
            k_all.dtype != jnp.int4  # experimental kernel: int8/bf16 only
        ):
            # Pallas decode kernel (ops/decode_attention.py): head-major
            # contiguous per-(stream, head) reads, int8 widened in VMEM.
            from unimedvl_tpu.ops.decode_attention import decode_attention

            o = decode_attention(
                q, k_slice, v_slice, lens, (base, col),
                k_scale=ksc, v_scale=vsc,
            ).reshape(S, T, H * D)
        else:
            kv_idx = jnp.arange(k_all.shape[3])[None, None, :]  # [1, 1, M]
            mask = (kv_idx < lens[:, None, None]) | (
                (kv_idx >= base) & (kv_idx <= col)
            )
            mask = jnp.broadcast_to(mask, (S, T, k_all.shape[3]))
            if ksc is not None:
                from unimedvl_tpu.ops.attention import gqa_attention_quant_hm

                o = gqa_attention_quant_hm(
                    q, k_slice, ksc, v_slice, vsc, mask
                ).reshape(S, T, H * D)
            else:
                o = gqa_attention_hm(q, k_slice, v_slice, mask).reshape(S, T, H * D)
    elif spec.update_cache:
        # Scatter-then-attend: the new block is written into the carried
        # stacked cache at (layer_idx, s, lens[s]+t) — only block-sized HBM
        # traffic — then the layer's slice is read back for attention. (The
        # reference instead rebuilds a merged flat cache with scatter writes
        # every layer, qwen2_navit.py:585-600.)
        k_all, ks_all = _scatter_kv(k_all, ks_all, layer_idx, k, lens)
        v_all, vs_all = _scatter_kv(v_all, vs_all, layer_idx, v, lens)
        k_slice = jax.lax.dynamic_index_in_dim(k_all, layer_idx, 0, keepdims=False)
        v_slice = jax.lax.dynamic_index_in_dim(v_all, layer_idx, 0, keepdims=False)
        ksc = vsc = None
        if ks_all is not None:
            ksc = jax.lax.dynamic_index_in_dim(ks_all, layer_idx, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_all, layer_idx, 0, keepdims=False)
        if use_flash:
            from unimedvl_tpu.ops.flash_attention import flash_block_attention

            if ksc is not None:
                # int8 cache before the Pallas kernel: materialise once
                # (prefill is MXU-bound — the copy is noise there)
                k_slice = dequant_slice(k_slice, ksc, x.dtype)
                v_slice = dequant_slice(v_slice, vsc, x.dtype)
            o = flash_block_attention(
                q, k_slice, v_slice, lens, lens, spec.is_causal,
                block_q=256, block_k=256, q_valid_len=qv_len,
                q_preproc=q_preproc, kv_head_major=True,
            ).reshape(S, T, H * D)
        elif (
            T == 1
            and (use_decode_kernel(S, k_all.shape[3]) or _FORCE_FLASH)
            and k_all.dtype != jnp.int4  # experimental kernel: int8/bf16 only
        ):
            # serving decode via the experimental kernel (see above); the
            # appended token sits AT lens — band (lens, lens) reproduces
            # kv <= lens
            from unimedvl_tpu.ops.decode_attention import decode_attention

            o = decode_attention(
                q, k_slice, v_slice, lens, (lens, lens),
                k_scale=ksc, v_scale=vsc,
            ).reshape(S, T, H * D)
        else:
            mask = _suffix_mask(k_all.shape[3], T, lens, spec.is_causal, q_valid)
            if ksc is not None:
                # decode: scales factor into logits/probs — the int8 values
                # feed the dots directly (ops/attention.py::gqa_attention_quant_hm)
                from unimedvl_tpu.ops.attention import gqa_attention_quant_hm

                o = gqa_attention_quant_hm(
                    q, k_slice, ksc, v_slice, vsc, mask
                ).reshape(S, T, H * D)
            else:
                o = gqa_attention_hm(q, k_slice, v_slice, mask).reshape(S, T, H * D)
    else:
        # Attention over cache + block without cache update (the CFG denoise
        # path runs 1-3 of these per step). The Pallas two-phase kernel avoids
        # materialising concat(cache, block) entirely.
        k_cache = jax.lax.dynamic_index_in_dim(k_all, layer_idx, 0, keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_all, layer_idx, 0, keepdims=False)
        if ks_all is not None:
            ksc = jax.lax.dynamic_index_in_dim(ks_all, layer_idx, 0, keepdims=False)
            vsc = jax.lax.dynamic_index_in_dim(vs_all, layer_idx, 0, keepdims=False)
            k_cache = dequant_slice(k_cache, ksc, x.dtype)
            v_cache = dequant_slice(v_cache, vsc, x.dtype)
        M0 = k_cache.shape[2]
        # block kv to head-major for the concat with the cache slice
        k_hm = k.astype(k_cache.dtype).transpose(0, 2, 1, 3)  # [S, Hk, T, D]
        v_hm = v.astype(v_cache.dtype).transpose(0, 2, 1, 3)
        k_cat = jnp.concatenate([k_cache, k_hm], axis=2)
        v_cat = jnp.concatenate([v_cache, v_hm], axis=2)
        if use_flash:
            # concat + single-loop kernel: measured fastest at EVERY denoise
            # cache size (32..4096) — the concat copy is cheaper than the
            # two-phase kernel's second loop phase
            # (benchmarks/KERNEL_THRESHOLD.json cache_sweep + fused_k_sweep).
            from unimedvl_tpu.ops.flash_attention import flash_block_attention

            bstart = jnp.full_like(lens, M0)
            o = flash_block_attention(
                q, k_cat, v_cat, lens, bstart, spec.is_causal,
                block_q=256, block_k=256, q_valid_len=qv_len,
                q_preproc=q_preproc, kv_head_major=True,
            ).reshape(S, T, H * D)
        else:
            mask = _concat_mask(M0, T, lens, spec.is_causal)
            if q_valid is not None:
                # Padded keys must never be attended. Padded queries still
                # attend the valid set (their finite garbage output is ignored).
                kv_valid = jnp.concatenate(
                    [jnp.ones((S, M0), bool), q_valid], axis=1
                )
                mask = mask & kv_valid[:, None, :]
            o = gqa_attention_hm(q, k_cat, v_cat, mask).reshape(S, T, H * D)

    o = _mot_rows(
        o,
        lambda t: _linear(t, ap["o"]),
        lambda t: _linear(t, ap["o_gen"]),
        gen,
        end_row,
    )
    return o, k_all, v_all, ks_all, vs_all


def decoder_layer(
    x: jax.Array,
    lp: Params,
    cfg: LLMConfig,
    cos: jax.Array,
    sin: jax.Array,
    k_all: jax.Array,
    v_all: jax.Array,
    ks_all: Optional[jax.Array],
    vs_all: Optional[jax.Array],
    layer_idx: jax.Array,
    lens: jax.Array,
    spec: ForwardSpec,
    q_valid: Optional[jax.Array],
    end_row: Optional[jax.Array] = None,
    decode_cols=None,
    scales_cm: bool = False,
):
    # MoT layers (qwen2_navit.py:713-731) have dual input/post norms; the MoE
    # variant (:905-915) shares single norms and only duplicates the MLP.
    gen_mot = spec.mode == "gen" and cfg.mot_attention
    gen_moe = spec.mode == "gen" and cfg.use_moe
    act = ACT2FN[cfg.hidden_act]

    residual = x
    h = _mot_rows(
        x,
        lambda t: rms_norm(t, lp["input_layernorm"]["scale"], cfg.rms_norm_eps),
        lambda t: rms_norm(t, lp["input_layernorm_moe_gen"]["scale"], cfg.rms_norm_eps),
        gen_mot,
        end_row,
    )
    attn_out, k_all, v_all, ks_all, vs_all = _attention_block(
        h, lp, cfg, cos, sin, k_all, v_all, ks_all, vs_all, layer_idx, lens,
        spec, q_valid, end_row, decode_cols, scales_cm,
    )
    x = residual + attn_out

    residual = x
    if cfg.mot_attention:
        h = _mot_rows(
            x,
            lambda t: _mlp(
                rms_norm(t, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps),
                lp["mlp"],
                act,
            ),
            lambda t: _mlp(
                rms_norm(t, lp["post_attention_layernorm_moe_gen"]["scale"], cfg.rms_norm_eps),
                lp["mlp_moe_gen"],
                act,
            ),
            gen_moe,
            end_row,
        )
    else:
        xn = rms_norm(x, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
        h = _mot_rows(
            xn,
            lambda t: _mlp(t, lp["mlp"], act),
            lambda t: _mlp(t, lp["mlp_moe_gen"], act),
            gen_moe,
            end_row,
        )
    return residual + h, k_all, v_all, ks_all, vs_all


# ---------------------------------------------------------------------------
# model forward
# ---------------------------------------------------------------------------

def forward(
    params: Params,
    cfg: LLMConfig,
    x: jax.Array,
    positions: jax.Array,
    cache: KVCache,
    spec: ForwardSpec,
    q_valid: Optional[jax.Array] = None,
    gen_end_row: Optional[jax.Array] = None,
    decode_cols: "Optional[Tuple[jax.Array, jax.Array]]" = None,
    scales_cm: bool = False,
) -> Tuple[jax.Array, KVCache]:
    """Run all decoder layers over a query block against the cache.

    x: [S, T, C] embedded inputs; positions: [S, T] rope position ids;
    q_valid: bool [S, T] padding mask (None = all valid).
    Returns (normed hidden [S, T, C], updated cache).
    Gen mode requires the packing contract [start_tok, vae..., end_tok];
    for shape-bucketed gen prefill pass ``gen_end_row`` (traced int32 row of
    <vision_end>; padding rows trail it and must be masked via q_valid).

    ``decode_cols=(base, col)``: aligned-column decode write (T == 1, see
    _update_kv_col) — lens do NOT advance; the caller owns the decoded-band
    bookkeeping and the post-decode cache holds holes in [lens[s], base)
    that must never be treated as valid context afterwards.

    ``scales_cm``: cache.k_scale/v_scale arrive column-major [L, Hk, M, S]
    (generate_text's decode-loop carry layout; only with decode_cols). The
    returned cache keeps that layout — callers discard it per the
    aligned-column contract.
    """
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    L = cache.k.shape[0]

    # The stacked cache rides the scan as a CARRY: updates are in-place
    # block-sized scatters instead of whole-slice ys re-materialisation
    # (see _scatter_block; ~6 ms/step saved on the bs48 28L decode).
    def body(carry, layer_inputs):
        h, k_all, v_all, ks_all, vs_all = carry
        lp, l = layer_inputs
        h, k_all, v_all, ks_all, vs_all = decoder_layer(
            h, lp, cfg, cos, sin, k_all, v_all, ks_all, vs_all, l, cache.lens,
            spec, q_valid, gen_end_row, decode_cols, scales_cm,
        )
        return (h, k_all, v_all, ks_all, vs_all), None

    (h, new_ks, new_vs, new_kss, new_vss), _ = jax.lax.scan(
        body, (x, cache.k, cache.v, cache.k_scale, cache.v_scale),
        (params["layers"], jnp.arange(L, dtype=jnp.int32)),
    )

    gen = spec.mode == "gen" and cfg.use_moe
    h = _mot_rows(
        h,
        lambda t: rms_norm(t, params["norm"]["scale"], cfg.rms_norm_eps),
        lambda t: rms_norm(t, params["norm_moe_gen"]["scale"], cfg.rms_norm_eps),
        gen,
        gen_end_row,
    )

    if spec.update_cache:
        T = x.shape[1]
        if decode_cols is not None:
            new_lens = cache.lens  # aligned decode: caller tracks the band
        elif q_valid is None:
            new_lens = cache.lens + T
        else:
            new_lens = cache.lens + jnp.sum(q_valid.astype(jnp.int32), axis=1)
        new_cache = KVCache(k=new_ks, v=new_vs, lens=new_lens,
                            k_scale=new_kss, v_scale=new_vss)
    else:
        new_cache = cache
    return h, new_cache


def embed_tokens(params: Params, token_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][token_ids]


def lm_head(params: Params, hidden: jax.Array) -> jax.Array:
    """Logits in fp32 via bf16 MXU matmul with fp32 accumulation (casting the
    [C, V] weight to fp32 would double its HBM read every decode step)."""
    w = params["lm_head"]
    if isinstance(w, dict) and "kernel_qa" in w:  # full-int8 matmul mode
        from unimedvl_tpu.quant import quantize_activations

        hq, hs = quantize_activations(hidden)
        logits = jax.lax.dot_general(
            hq, w["kernel_qa"],
            (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return logits.astype(jnp.float32) * (hs * w["scale"])
    if isinstance(w, dict):  # int8 serving mode
        logits = jax.lax.dot_general(
            hidden,
            w["kernel_q"].astype(hidden.dtype),
            (((hidden.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return logits * w["scale"]
    return jax.lax.dot_general(
        hidden,
        w.astype(hidden.dtype),
        (((hidden.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# training forward (packed flat sequence, index-routed MoT)
# ---------------------------------------------------------------------------

def _route(
    x: jax.Array,
    und_idx: jax.Array,
    gen_idx: jax.Array,
    und_fn,
    gen_fn,
    out_shape_tail: Tuple[int, ...],
    freeze_und: bool = False,
) -> jax.Array:
    """Index-routed dual-expert application over a packed [T, ...] sequence.

    Mirrors the reference's boolean-index writes (qwen2_navit.py:435-446,
    820-835) with static-shape gathers/scatters: index arrays are padded with
    T (out of range), gathered with fill-0 and scattered with drop — exact
    FLOPs, no dynamic shapes (SURVEY.md §2.3 N6).
    """
    T = x.shape[0]
    xu = jnp.take(x, und_idx, axis=0, mode="fill", fill_value=0)
    xg = jnp.take(x, gen_idx, axis=0, mode="fill", fill_value=0)
    yu = und_fn(xu)
    if freeze_und:
        yu = jax.lax.stop_gradient(yu)
    yg = gen_fn(xg)
    out = jnp.zeros((T, *out_shape_tail), dtype=yg.dtype)
    out = out.at[und_idx].set(yu.astype(yg.dtype), mode="drop")
    out = out.at[gen_idx].set(yg, mode="drop")
    return out


def make_train_layer_body(
    cfg: LLMConfig,
    position_ids: jax.Array,  # [T]
    mask: jax.Array,  # [T, T] bool
    und_idx: jax.Array,
    gen_idx: jax.Array,
    segments=None,
    tap: bool = False,
):
    """Build the per-layer training body ``body(x, lp) -> (out, tapped)``
    closed over one packed sequence's routing/mask state. Shared by
    forward_train's lax.scan and the pipeline-parallel schedule
    (parallel/pp_train.py), which rebuilds it per microbatch stage-side."""
    T = position_ids.shape[0]
    C = cfg.hidden_size
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    act = ACT2FN[cfg.hidden_act]
    fz = cfg.freeze_und
    cos, sin = rope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta)

    def route(x, und_fn, gen_fn, tail, freeze=False):
        return _route(x, und_idx, gen_idx, und_fn, gen_fn, tail, freeze)

    mot_attn = cfg.mot_attention
    moe = cfg.use_moe
    use_train_flash = (
        segments is not None and T >= 256 and jax.default_backend() == "tpu"
    )

    def body(x, lp):
        ap = lp["attn"]
        residual = x
        if mot_attn:
            h = route(
                x,
                lambda t: rms_norm(t, lp["input_layernorm"]["scale"], cfg.rms_norm_eps),
                lambda t: rms_norm(t, lp["input_layernorm_moe_gen"]["scale"], cfg.rms_norm_eps),
                (C,),
            )
            q = route(h, lambda t: _linear(t, ap["q"]), lambda t: _linear(t, ap["q_gen"]), (H * D,))
            k = route(h, lambda t: _linear(t, ap["k"]), lambda t: _linear(t, ap["k_gen"]), (Hk * D,))
            v = route(h, lambda t: _linear(t, ap["v"]), lambda t: _linear(t, ap["v_gen"]), (Hk * D,), freeze=fz)
        else:
            h = rms_norm(x, lp["input_layernorm"]["scale"], cfg.rms_norm_eps)
            q = _linear(h, ap["q"])
            k = _linear(h, ap["k"])
            v = _linear(h, ap["v"])
        q = q.reshape(T, H, D)
        k = k.reshape(T, Hk, D)
        v = v.reshape(T, Hk, D)
        if cfg.qk_norm:
            if mot_attn:
                q = route(
                    q,
                    lambda t: rms_norm(t, ap["q_norm"]["scale"], cfg.rms_norm_eps),
                    lambda t: rms_norm(t, ap["q_norm_gen"]["scale"], cfg.rms_norm_eps),
                    (H, D),
                    freeze=fz,
                )
                k = route(
                    k,
                    lambda t: rms_norm(t, ap["k_norm"]["scale"], cfg.rms_norm_eps),
                    lambda t: rms_norm(t, ap["k_norm_gen"]["scale"], cfg.rms_norm_eps),
                    (Hk, D),
                    freeze=fz,
                )
            else:
                q = rms_norm(q, ap["q_norm"]["scale"], cfg.rms_norm_eps)
                k = rms_norm(k, ap["k_norm"]["scale"], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, cos, sin)
        if use_train_flash:
            from unimedvl_tpu.ops.flash_attention_train import packed_train_attention

            doc_id, fn_id, noise_id = segments
            o = packed_train_attention(q, k, v, doc_id, fn_id, noise_id).reshape(T, H * D)
        else:
            o = gqa_attention(q[None], k[None], v[None], mask[None])[0].reshape(T, H * D)
        if mot_attn:
            o = route(o, lambda t: _linear(t, ap["o"]), lambda t: _linear(t, ap["o_gen"]), (C,), freeze=fz)
        else:
            o = _linear(o, ap["o"])
        x = residual + o

        residual = x
        if mot_attn:
            h = route(
                x,
                lambda t: _mlp(
                    rms_norm(t, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps),
                    lp["mlp"],
                    act,
                ),
                lambda t: _mlp(
                    rms_norm(t, lp["post_attention_layernorm_moe_gen"]["scale"], cfg.rms_norm_eps),
                    lp["mlp_moe_gen"],
                    act,
                ),
                (C,),
                freeze=fz,
            )
        elif moe:
            # MoE layer: single post norm, routed MLP (qwen2_navit.py:946-955)
            xn = rms_norm(x, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
            h = route(
                xn,
                lambda t: _mlp(t, lp["mlp"], act),
                lambda t: _mlp(t, lp["mlp_moe_gen"], act),
                (C,),
                freeze=fz,
            )
        else:
            h = _mlp(
                rms_norm(x, lp["post_attention_layernorm"]["scale"], cfg.rms_norm_eps),
                lp["mlp"],
                act,
            )
        out = residual + h
        return out, (out if tap else None)
    return body


def forward_train(
    params: Params,
    cfg: LLMConfig,
    packed_x: jax.Array,  # [T, C] embedded packed sequence
    position_ids: jax.Array,  # [T]
    mask: jax.Array,  # [T, T] bool (ops.blockmask.dense_packed_mask)
    und_idx: jax.Array,  # [Nu] padded with T
    gen_idx: jax.Array,  # [Ng] padded with T
    segments=None,  # optional (doc_id, fn_id, noise_id) [T] arrays
    feature_layer: Optional[int] = None,
):
    """Packed training forward (reference Qwen2Model.forward_train,
    qwen2_navit.py:1051-1113). Returns final dual-normed hidden [T, C]; with
    ``feature_layer`` set, returns (hidden, features-after-that-layer) — the
    diffusion_feature_layer tap used for REPA-style alignment
    (qwen2_navit.py:1083-1097).

    When ``segments`` is given and running on TPU, attention uses the
    differentiable block-sparse Pallas kernel (mask evaluated in-kernel);
    otherwise the dense-mask jnp path.
    """
    body = make_train_layer_body(
        cfg, position_ids, mask, und_idx, gen_idx, segments=segments,
        tap=feature_layer is not None,
    )
    if cfg.freeze_und:
        packed_x = packed_x.at[und_idx].set(
            jax.lax.stop_gradient(
                jnp.take(packed_x, und_idx, axis=0, mode="fill", fill_value=0)
            ),
            mode="drop",
        )

    if cfg.remat:
        # per-layer rematerialisation: the backward pass recomputes each
        # layer's activations instead of holding all L layers live — the
        # standard TPU memory/FLOP trade for 14B-class training on 16 GB
        # chips (saves only matmul outputs, which XLA can't cheaply rebuild)
        body = jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    h, per_layer = jax.lax.scan(body, packed_x, params["layers"])
    features = per_layer[feature_layer] if feature_layer is not None else None
    h = final_norm(params, cfg, h, und_idx, gen_idx)
    if feature_layer is not None:
        return h, features
    return h


def final_norm(
    params: Params, cfg: LLMConfig, h: jax.Array, und_idx, gen_idx
) -> jax.Array:
    """Final (dual-expert under use_moe) RMS norm after the layer stack
    (reference qwen2_navit.py:1106-1113). Shared by forward_train and the
    pipeline-parallel trainer's replicated epilogue."""
    C = h.shape[-1]
    if cfg.use_moe:
        return _route(
            h,
            und_idx,
            gen_idx,
            lambda t: rms_norm(t, params["norm"]["scale"], cfg.rms_norm_eps),
            lambda t: rms_norm(t, params["norm_moe_gen"]["scale"], cfg.rms_norm_eps),
            (C,),
            freeze_und=cfg.freeze_und,
        )
    return rms_norm(h, params["norm"]["scale"], cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# initialisation (tests / random models)
# ---------------------------------------------------------------------------

def _init_linear(key, cin, cout, dtype, bias=True):
    bound = 1.0 / np.sqrt(cin)
    p = {"kernel": jax.random.uniform(key, (cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def init_params(key: jax.Array, cfg: LLMConfig, dtype=jnp.float32) -> Params:
    C, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, Hk, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(key, 4)

    def init_layer(k):
        ks = jax.random.split(k, 16)
        attn = {
            "q": _init_linear(ks[0], C, H * D, dtype, bias=True),
            "k": _init_linear(ks[1], C, Hk * D, dtype, bias=True),
            "v": _init_linear(ks[2], C, Hk * D, dtype, bias=True),
            "o": _init_linear(ks[3], H * D, C, dtype, bias=False),
            "q_norm": {"scale": jnp.ones((D,), dtype)},
            "k_norm": {"scale": jnp.ones((D,), dtype)},
        }
        if cfg.mot_attention:
            attn.update(
                q_gen=_init_linear(ks[4], C, H * D, dtype, bias=True),
                k_gen=_init_linear(ks[5], C, Hk * D, dtype, bias=True),
                v_gen=_init_linear(ks[6], C, Hk * D, dtype, bias=True),
                o_gen=_init_linear(ks[7], H * D, C, dtype, bias=False),
                q_norm_gen={"scale": jnp.ones((D,), dtype)},
                k_norm_gen={"scale": jnp.ones((D,), dtype)},
            )
        layer = {
            "attn": attn,
            "input_layernorm": {"scale": jnp.ones((C,), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((C,), dtype)},
            "mlp": {
                "gate": _init_linear(ks[8], C, I, dtype, bias=False),
                "up": _init_linear(ks[9], C, I, dtype, bias=False),
                "down": _init_linear(ks[10], I, C, dtype, bias=False),
            },
        }
        if cfg.mot_attention:
            # dual norms exist only on the MoT layer (qwen2_navit.py:728-731)
            layer["input_layernorm_moe_gen"] = {"scale": jnp.ones((C,), dtype)}
            layer["post_attention_layernorm_moe_gen"] = {"scale": jnp.ones((C,), dtype)}
        if cfg.use_moe:
            layer["mlp_moe_gen"] = {
                "gate": _init_linear(ks[11], C, I, dtype, bias=False),
                "up": _init_linear(ks[12], C, I, dtype, bias=False),
                "down": _init_linear(ks[13], I, C, dtype, bias=False),
            }
        return layer

    layer_keys = jax.random.split(keys[0], cfg.num_hidden_layers)
    layers = jax.vmap(init_layer)(layer_keys)

    params = {
        "embed_tokens": jax.random.normal(keys[1], (V, C), dtype) * 0.02,
        "layers": layers,
        "norm": {"scale": jnp.ones((C,), dtype)},
        "lm_head": jax.random.normal(keys[2], (C, V), dtype) * 0.02,
    }
    if cfg.use_moe:
        params["norm_moe_gen"] = {"scale": jnp.ones((C,), dtype)}
    return params

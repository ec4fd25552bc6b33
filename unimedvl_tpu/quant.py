"""Opt-in int8 weight quantization for memory-bound decode serving.

Decode throughput is HBM-bound on the weight reads (CLAUDE.md perf notes);
storing the big LLM matmul weights as int8 with per-output-channel scales
halves that traffic. The matmul still runs bf16 on the MXU (weights are
widened on-chip); `y = (x @ W_q) * scale` with symmetric per-column scales is
exact up to the quantization error.

This is a NON-PARITY serving mode (the reference is bf16); the default
pipeline stays bf16. Apply with::

    params["llm"] = quantize_llm_params(params["llm"])

All matmul entry points (`qwen2_mot._linear`, `lm_head`) transparently accept
quantized leaves of the form {"kernel_q": int8 [.., in, out],
"scale": [.., out], ("bias": ...)}.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

# weights quantized inside each layer pytree (biases/norms stay bf16)
_QUANT_KEYS = ("q", "k", "v", "o", "q_gen", "k_gen", "v_gen", "o_gen",
               "gate", "up", "down")


def quantize_weight(
    kernel, via_host: bool = False, bits: int = 8,
    group_size: int = 0,
) -> Dict[str, jax.Array]:
    """Symmetric per-output-channel intN quantization of [.., in, out] kernels.

    ``via_host=True`` converts through numpy layer-by-layer — REQUIRED for
    full-size models (the fp32 intermediates of an on-device conversion of a
    14B-class pytree exhaust HBM).

    ``bits=4``: PACKED int4 storage — two nibbles per int8 byte along the
    contraction dim ({"kernel_p4": int8 [.., in/2, out], "scale"}) — decode
    is weight-streaming-bound, so halving the weight bytes again attacks the
    13.5 ms bs256 HBM roofline directly. Packed bytes (not the jnp.int4
    dtype, which cannot cross a jit argument boundary on the axon TPU
    backend) stream from HBM at 0.5 bytes/value and widen in VMEM inside the
    Pallas kernel (ops/w4_matmul.py). Per-CHANNEL int4 loses more accuracy
    than per-group schemes; it is a further NON-PARITY step — validate on
    the target checkpoint before serving with it.

    ``group_size`` (bits=4 only): GROUP-WISE scales — one scale per
    (group_size in-rows, out-column) block instead of per column, the
    standard w4 accuracy fix (AWQ/GPTQ-style; scale shape [.., K/g, N]).
    512 matches the Pallas kernel's k-step so grouping costs nothing there
    (ops/w4_matmul.py); other multiples of 512 also ride the kernel."""
    assert bits in (8, 4), bits
    assert group_size == 0 or bits == 4, "group_size is a w4 feature"
    if group_size:
        assert kernel.shape[-2] % group_size == 0, (
            kernel.shape, group_size)
    qmax = 127.0 if bits == 8 else 7.0
    if via_host:
        import numpy as np

        k32 = np.asarray(kernel, dtype=np.float32)
        if group_size:
            gshape = k32.shape[:-2] + (
                k32.shape[-2] // group_size, group_size, k32.shape[-1])
            kg = k32.reshape(gshape)
            absmax = np.max(np.abs(kg), axis=-2, keepdims=True)
            scale = np.maximum(absmax, 1e-8) / qmax  # [.., G, 1, N]
            q = np.clip(np.round(kg / scale), -qmax, qmax).astype(np.int8)
            q = q.reshape(k32.shape)
            scale = scale.squeeze(-2).astype(np.float32)  # [.., G, N]
        else:
            absmax = np.max(np.abs(k32), axis=-2, keepdims=True)
            scale = np.maximum(absmax, 1e-8) / qmax
            q = np.clip(np.round(k32 / scale), -qmax, qmax).astype(np.int8)
            scale = scale.squeeze(-2).astype(np.float32)
        if bits == 4:
            from unimedvl_tpu.ops.w4_matmul import pack_int4

            return {
                "kernel_p4": jnp.asarray(pack_int4(q)),
                "scale": jnp.asarray(scale),
            }
        return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(scale)}
    k32 = kernel.astype(jnp.float32)
    if group_size:
        gshape = k32.shape[:-2] + (
            k32.shape[-2] // group_size, group_size, k32.shape[-1])
        kg = k32.reshape(gshape)
        absmax = jnp.max(jnp.abs(kg), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / qmax
        q = jnp.clip(jnp.round(kg / scale), -qmax, qmax).astype(jnp.int8)
        q = q.reshape(k32.shape)
        scale = scale.squeeze(-2).astype(jnp.float32)  # [.., G, N]
    else:
        absmax = jnp.max(jnp.abs(k32), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / qmax
        q = jnp.clip(jnp.round(k32 / scale), -qmax, qmax).astype(jnp.int8)
        scale = scale.squeeze(-2).astype(jnp.float32)
    if bits == 4:
        from unimedvl_tpu.ops.w4_matmul import pack_int4

        return {"kernel_p4": pack_int4(q), "scale": scale}
    return {"kernel_q": q, "scale": scale}


def dequantize_weight(p: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    q = _any_qkernel(p)
    scale = p["scale"]
    if _is_packed(p):
        from unimedvl_tpu.ops.w4_matmul import unpack_int4

        q = unpack_int4(q)
    if scale.ndim == q.ndim:  # group-wise w4 scales [.., K/g, N]
        g = q.shape[-2] // scale.shape[-2]
        scale = jnp.repeat(scale, g, axis=-2)
        return (q.astype(jnp.float32) * scale).astype(dtype)
    return (q.astype(jnp.float32) * scale[..., None, :]).astype(dtype)


def _any_qkernel(p):
    for k in ("kernel_q", "kernel_qa", "kernel_p4", "kernel_p4a"):
        if k in p:
            return p[k]
    raise KeyError(f"no quantized kernel leaf in {sorted(p)}")


def _is_packed(p) -> bool:
    return "kernel_p4" in p or "kernel_p4a" in p


def quantized_linear(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """y = (x @ W_q) * scale (+ bias). Int8 weights stream from HBM; the
    widen-to-bf16 happens on-chip, fused into the dot by XLA. Packed-int4
    leaves ("kernel_p4", weight-only w4) route through ops/w4_matmul.py."""
    if "kernel_p4" in p:
        from unimedvl_tpu.ops.w4_matmul import w4_matmul

        y = w4_matmul(x, None, p["kernel_p4"], p["scale"], out_dtype=x.dtype)
    else:
        w = p["kernel_q"].astype(x.dtype)
        y = jax.lax.dot_general(
            x, w,
            (((x.ndim - 1,), (w.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = (y * p["scale"].astype(jnp.float32)).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def quantize_activations(x: jax.Array):
    """Dynamic symmetric per-token int8: returns (x_q int8, x_scale f32
    [..., 1]). absmax over the contraction (feature) axis."""
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantized_linear_act(x: jax.Array, p: Dict[str, jax.Array]) -> jax.Array:
    """FULL-int8 matmul: dynamic per-token activation quantization feeds the
    int8 MXU path (s8 x s8 -> s32), rescaled by (x_scale * w_scale) in fp32.

    Why: at large decode batch the step is MXU-COMPUTE-bound, not
    weight-streaming-bound — the bs256 profile (DECODE_PROFILE_BS256.json)
    shows the dequant-to-bf16 matmuls at ~90% of bf16 peak. Measured on v5e:
    0.096 ms vs 0.423 ms per [256,3584]x[3584,18944] matmul (the int8 dot
    lands back on the weight-read roofline). Accuracy: per-token symmetric
    int8 activations on top of per-channel int8 weights — a further
    NON-PARITY step beyond weight-only int8; outlier-heavy checkpoints may
    need the weight-only mode (kernel_q), which stays available."""
    xq, xs = quantize_activations(x)
    return quantized_linear_preq(xq, xs, p, x.dtype)


def quantized_linear_preq(
    xq: jax.Array, xs: jax.Array, p: Dict[str, jax.Array], out_dtype
) -> jax.Array:
    """``quantized_linear_act`` with the activation quantization already
    done — (xq int8, xs f32 [..., 1]) as produced by
    ``quantize_activations`` or the fused Pallas silu·mul·quant kernel
    (ops/act_quant.py)."""
    if "kernel_p4a" in p:  # w4a8: packed nibbles unpack in VMEM (w4_matmul)
        from unimedvl_tpu.ops.w4_matmul import w4_matmul

        y = w4_matmul(xq, xs, p["kernel_p4a"], p["scale"], out_dtype=out_dtype)
        if "bias" in p:
            y = y + p["bias"].astype(out_dtype)
        return y
    w = p["kernel_qa"]
    y = jax.lax.dot_general(
        xq, w,
        (((xq.ndim - 1,), (w.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (y.astype(jnp.float32) * (xs * p["scale"].astype(jnp.float32)))
    y = y.astype(out_dtype)
    if "bias" in p:
        y = y + p["bias"].astype(out_dtype)
    return y


def _is_linear_leaf(v) -> bool:
    return isinstance(v, dict) and "kernel" in v


# ---------------------------------------------------------------------------
# serving-mode projection fusion (fewer kernel launches on the T=1 decode)
# ---------------------------------------------------------------------------

def _cat(arrs, tp: int):
    """Concatenate along the OUTPUT (last) dim. With tp > 1 the output is
    laid out as tp contiguous shard blocks, each the concat of every part's
    s-th output shard ([q_0|k_0|v_0|q_1|k_1|v_1|...]) — so an even
    PartitionSpec over the fused dim hands chip s exactly its Megatron
    column shard of every part, and the in-shard split by LOCAL widths
    recovers q/k/v (parallel/sp_denoise.py fused path)."""
    if tp == 1:
        return jnp.concatenate(arrs, axis=-1)
    blocks = []
    for a in arrs:
        assert a.shape[-1] % tp == 0, (a.shape, tp)
        blocks.append(a.reshape(a.shape[:-1] + (tp, a.shape[-1] // tp)))
    out = jnp.concatenate(blocks, axis=-1)
    return out.reshape(arrs[0].shape[:-1] + (-1,))


def _concat_linears(parts, tp: int = 1):
    """Concatenate linear leaves along the OUTPUT dim. Works for bf16
    ({"kernel"}) and int8 ({"kernel_q","scale"}) leaves; biases concat (a
    missing bias contributes zeros so the fused add stays exact). ``tp``
    interleaves per-shard blocks for manual tensor parallelism (_cat)."""
    keys = set(parts[0].keys())
    out = {}
    qk = next(
        (k for k in ("kernel_qa", "kernel_q", "kernel_p4", "kernel_p4a")
         if k in keys),
        None,
    )
    if qk is not None:
        # packed-int4 leaves pack along the IN dim, so the out-dim concat is
        # layout-identical to int8
        out[qk] = _cat([p[qk] for p in parts], tp)
        out["scale"] = _cat([p["scale"] for p in parts], tp)
        width = lambda p: p[qk].shape[-1]
    else:
        out["kernel"] = _cat([p["kernel"] for p in parts], tp)
        width = lambda p: p["kernel"].shape[-1]
    if any("bias" in p for p in parts):
        biases = []
        for p in parts:
            if "bias" in p:
                biases.append(p["bias"])
            else:
                ref = next(q for q in parts if "bias" in q)["bias"]
                shape = ref.shape[:-1] + (width(p),)
                biases.append(jnp.zeros(shape, ref.dtype))
        out["bias"] = _cat(biases, tp)
    return out


def fuse_serving_projections(llm_params: Dict, tp: int = 1) -> Dict:
    """Opt-in serving transform: fuse q/k/v (per expert) into one "qkv" leaf
    and mlp gate/up into one "gate_up" leaf. Halves the matmul kernel count
    of a decode layer (6 -> 3 projections + o/down), which is pure fixed-cost
    at T=1 where every matmul is HBM-bound on its weights — and shrinks the
    per-layer-call fixed-overhead class that dominates small-shard denoise
    steps (docs/MULTICHIP_DENOISE.md).

    qwen2_mot._attention_block / _mlp transparently use the fused leaves when
    present. Composes with int8 quantization (apply after
    quantize_llm_params). NON-PARITY layout (like int8): the default pipeline
    keeps the checkpoint layout.

    ``tp`` > 1 lays the fused output dim out as tp contiguous shard blocks
    (each [q_s|k_s|v_s] / [gate_s|up_s]) and RENAMES the leaves with a
    ``_tp{N}`` suffix ("qkv_tp2", "qkv_gen_tp2", "gate_up_tp2") — the static
    marker consumers need to de-interleave. An even split of the fused dim
    over "model" then gives every chip a correct Megatron column shard
    (parallel/sp_denoise.py splits by LOCAL widths in-shard), and the
    global-view qwen2_mot paths recover the EXACT plain q/k/v | gate/up by
    a shard-aligned reshape+slice (block order preserves the original
    head/channel order), so one tp-fused tree serves prefill/decode AND the
    manual-TP denoise. The tp degree must equal the mesh's "model" axis."""
    leaves = jax.tree_util.tree_flatten_with_path(llm_params)[0]
    if any(getattr(p[-1], "key", None) == "lora_a" for p, _ in leaves):
        # the fused leaves bypass the per-projection dicts, so unmerged
        # adapters would be silently ignored in the fused forward
        raise ValueError(
            "fuse_serving_projections on a LoRA tree: training.lora."
            "merge_lora(params) first")
    sfx = f"_tp{tp}" if tp > 1 else ""

    def fuse_layer(tree):
        out = {}
        for name, v in tree.items():
            if name == "attn":
                attn = dict(v)
                attn["qkv" + sfx] = _concat_linears([v["q"], v["k"], v["v"]], tp)
                for k2 in ("q", "k", "v"):
                    del attn[k2]
                if "q_gen" in v:
                    attn["qkv_gen" + sfx] = _concat_linears(
                        [v["q_gen"], v["k_gen"], v["v_gen"]], tp
                    )
                    for k2 in ("q_gen", "k_gen", "v_gen"):
                        del attn[k2]
                out[name] = attn
            elif name in ("mlp", "mlp_moe_gen"):
                mlp = dict(v)
                mlp["gate_up" + sfx] = _concat_linears([v["gate"], v["up"]], tp)
                del mlp["gate"], mlp["up"]
                out[name] = mlp
            else:
                out[name] = v
        return out

    out = dict(llm_params)
    out["layers"] = fuse_layer(llm_params["layers"])
    return out


def quantize_llm_params(
    llm_params: Dict, via_host: bool = False, act_quant: bool = False,
    bits: int = 8, group_size: int = 0,
) -> Dict:
    """Quantize the per-layer attention + MLP kernels and the lm_head of a
    qwen2_mot params pytree. Embedding, norms, and biases stay as-is.
    Use via_host=True for full-size checkpoints.

    ``act_quant=True``: mark the leaves for FULL-int8 matmuls (dynamic
    per-token activation quantization, s8 x s8 on the MXU — see
    quantized_linear_act). Same stored bytes; only the key name changes
    ("kernel_qa") so the dispatch in qwen2_mot._linear is branch-free.

    ``bits=4``: packed-int4 weight storage (see quantize_weight) — composes
    with act_quant (w4a8: nibbles widen to int8 in VMEM, int8 MXU dots).
    ``group_size``: group-wise w4 scales (512 rides the Pallas kernel's
    k-step for free — the standard accuracy fix over per-channel int4)."""
    def requant(q):
        if act_quant:  # rename kernel_q -> kernel_qa / kernel_p4 -> kernel_p4a
            k = "kernel_p4" if "kernel_p4" in q else "kernel_q"
            return {k + "a": q.pop(k), **q}
        return q

    def convert(tree, inside_layer: bool):
        out = {}
        for name, v in tree.items():
            if isinstance(v, dict):
                if inside_layer and name in ("attn", "mlp", "mlp_moe_gen"):
                    sub = {}
                    for k2, v2 in v.items():
                        if _is_linear_leaf(v2) and k2 in _QUANT_KEYS:
                            q = requant(
                                quantize_weight(v2["kernel"], via_host, bits,
                                                group_size=group_size)
                            )
                            for keep in ("bias", "lora_a", "lora_b", "lora_s"):
                                if keep in v2:  # adapters ride along (QLoRA)
                                    q[keep] = v2[keep]
                            sub[k2] = q
                        else:
                            sub[k2] = v2
                    out[name] = sub
                else:
                    out[name] = convert(v, inside_layer)
            else:
                out[name] = v
        return out

    out = dict(llm_params)
    out["layers"] = convert(llm_params["layers"], inside_layer=True)
    # lm_head is a bare kernel array [C, V]
    lm = llm_params["lm_head"]
    # lm_head stays int8 even at bits=4: the [C, V] logits matmul is the
    # decode step's accuracy-critical tail and its read is ~4% of the weights
    out["lm_head"] = requant(quantize_weight(lm, via_host, bits=8))
    return out

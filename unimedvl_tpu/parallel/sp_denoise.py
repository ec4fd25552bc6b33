"""Sequence-parallel × tensor-parallel denoise — the TP2×SP4 product layout.

docs/MULTICHIP_DENOISE.md measured TP2×SP4 as the best v5e-8 layout for the
50-step dual-CFG 512px denoise (≈3.1 s bf16 / ≈2.8 s int8 per image, vs 4.16 s
for pure TP8); this module turns that layout into an executable program.
Reference workload being parallelised: the sequential single-GPU denoise loop
at /root/reference/codes/modeling/unimedvl/bagel.py:901-1211.

Design (shard_map over a ("model", "seq") mesh, manual collectives):

  * Megatron TP over "model": attention heads and MLP intermediate of BOTH
    MoT experts narrow per chip; 2 psums/layer on the [S, nloc+2, C] local
    activations (4x smaller than pure-TP all-reduces at SP4).
  * The n vae latent tokens shard over "seq". The 2 text rows
    (<vision_start>, <vision_end>) are REPLICATED on every seq shard, so each
    local block keeps the [start, vae_chunk, end] packing contract and
    qwen2_mot's static MoT row routing works unchanged; the redundant compute
    is 2 rows per shard.
  * ONE all-gather/layer of the raw block k/v vae rows over "seq"
    ([S, n, Hk/tp, D] bf16). Queries shard cleanly — vae latents attend
    block-full + full cache, so no attention-score exchange is needed
    (contrast Ring/Ulysses attention for causal LLMs).
  * With the Pallas kernels, BOTH fp32 qk-norm+RoPE islands ride in-kernel
    (N7): local q via q_preproc, the gathered raw k via kv_preproc with the
    global text end row n+1 and block_len=n+2.
  * The KV cache (text/vit context) shards over kv heads on "model" and is
    replicated over "seq".

The full denoise scan runs inside ONE jitted shard_map, so XLA overlaps the
per-layer collectives with compute where the schedule allows.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
def shard_map(f, *, mesh, in_specs, out_specs):
    """jax.shard_map across the 0.8 rename (check_vma <- check_rep), with
    replication checking off — the Pallas kernels inside have no registered
    replication rules."""
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    from jax.experimental.shard_map import shard_map as _sm  # pragma: no cover

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)

from unimedvl_tpu.config import BagelConfig
from unimedvl_tpu.models import qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import KVCache, _mot_rows, _linear
from unimedvl_tpu.ops.norms import rms_norm
from unimedvl_tpu.ops.rope import rope_cos_sin, apply_rope_one
from unimedvl_tpu.ops.activations import ACT2FN
from unimedvl_tpu.ops.attention import (
    combine_attention_partials,
    gqa_attention_hm,
    gqa_attention_hm_lse,
)

Params = Dict

# column-parallel (output dim over "model") vs row-parallel (input dim) leaves.
# The fused leaves (quant.fuse_serving_projections(tp=...), named
# "qkv_tp{N}" etc.) are col-parallel: their tp-interleaved block layout
# makes the even "model" split hand each chip its [q_s|k_s|v_s] /
# [gate_s|up_s] shard.
_COL = frozenset({"q", "k", "v", "q_gen", "k_gen", "v_gen", "gate", "up"})
_ROW = frozenset({"o", "o_gen", "down"})
_COL_PREFIX = ("qkv", "gate_up")  # fused names, incl. _tp{N} variants


def _layer_specs(tree: Dict) -> Dict:
    """PartitionSpec tree for the stacked [L, ...] layer pytree, TP over
    "model". Handles bf16 ({"kernel": ...}), int8 serving
    ({"kernel_q": ..., "scale": ...}) and full-int8 ({"kernel_qa": ...})
    leaves; norms replicate."""
    out = {}
    for name, v in tree.items():
        if not isinstance(v, dict):
            out[name] = P()
            continue
        if name in _COL or name in _ROW or name.startswith(_COL_PREFIX):
            col = name not in _ROW
            sub = {}
            for k2 in v:
                if k2 in ("kernel", "kernel_q", "kernel_qa",
                          "kernel_p4", "kernel_p4a"):
                    # packed-int4 kernels split their packed in-dim: the
                    # row-parallel shard boundary lands on even in-rows
                    sub[k2] = P(None, None, "model") if col else P(None, "model", None)
                elif k2 == "scale" and getattr(v[k2], "ndim", 2) == 3:
                    # group-wise w4 scales [L, K/g, N]
                    sub[k2] = (P(None, None, "model") if col
                               else P(None, "model", None))
                elif k2 in ("scale", "bias"):
                    # per-OUTPUT-column vectors: sharded for col-parallel,
                    # replicated for row-parallel
                    sub[k2] = P(None, "model") if col else P()
                else:
                    sub[k2] = P()
            out[name] = sub
        else:
            out[name] = _layer_specs(v)
    return out


def _replicated_like(tree) -> Dict:
    return jax.tree.map(lambda _: P(), tree)


def _sp_attention(
    x: jax.Array,  # [S, lT, C] local block [start, vae_chunk, end]
    lp: Params,
    cfg,
    cos_q, sin_q,  # [S, 1, D] (single shared rope position per stream)
    k_cache, v_cache,  # [S, Hk/tp, M, D] local kv-head slice (head-major)
    lens: jax.Array,
    n_global: int,  # total vae tokens across shards
    use_flash: bool,
    overlap_gather: bool = False,
) -> jax.Array:
    """Gen-mode MoT attention over cache + seq-gathered block (no update).

    ``overlap_gather``: split the attention into a CACHE partial (purely
    local — needs no collective) and a BLOCK partial (needs the seq
    all-gather of k/v), issuing both gathers FIRST so the latency-hiding
    scheduler runs the cache partial's compute while they ride the ICI; the
    partials merge exactly via the online-softmax algebra
    (combine_attention_partials). Single-chain attention otherwise."""
    S, lT, C = x.shape
    D = cfg.head_dim
    ap = lp["attn"]

    def proj(p_und, p_gen):
        return _mot_rows(
            x, lambda t: _linear(t, ap[p_und]), lambda t: _linear(t, ap[p_gen]),
            True, None,
        )

    fkey, _ftp = mot.fused_key(ap, "qkv")
    if fkey is not None:
        # fused serving layout (quant.fuse_serving_projections(tp=...)):
        # ONE projection matmul per expert; the local columns are this
        # chip's [q_s|k_s|v_s] block, split by LOCAL head counts (derived
        # from the LOCAL fused width — inside the manual region the shard
        # degree equals the mesh's "model" axis regardless of the name)
        fused = proj(fkey, fkey.replace("qkv", "qkv_gen", 1))
        heads_tot = cfg.num_attention_heads + 2 * cfg.num_key_value_heads
        tp_deg = (heads_tot * D) // fused.shape[-1]
        Hl = cfg.num_attention_heads // tp_deg
        Hkl = cfg.num_key_value_heads // tp_deg
        q, k, v = jnp.split(fused, [Hl * D, (Hl + Hkl) * D], axis=-1)
    else:
        q = proj("q", "q_gen")
        k = proj("k", "k_gen")
        v = proj("v", "v_gen")
        Hl = q.shape[-1] // D
        Hkl = k.shape[-1] // D
    q = q.reshape(S, lT, Hl, D)
    k = k.reshape(S, lT, Hkl, D)
    v = v.reshape(S, lT, Hkl, D)

    def gather_block(t):
        # [S, lT, Hkl, D] -> [S, n+2, Hkl, D]: all-gather the vae rows, keep
        # the (identical-on-every-shard) text rows local
        mid = jax.lax.all_gather(t[:, 1:-1], "seq", axis=1, tiled=True)
        return jnp.concatenate([t[:, :1], mid, t[:, -1:]], axis=1)

    if overlap_gather and cfg.qk_norm:
        # k island + RoPE on the LOCAL shard, then issue BOTH gathers before
        # any attention compute: the cache partial below depends only on
        # local q + cache, so its kernels overlap the in-flight collectives
        k32 = k.astype(jnp.float32)
        k32 = _mot_rows(
            k32,
            lambda t: rms_norm(t, ap["k_norm"]["scale"], cfg.rms_norm_eps),
            lambda t: rms_norm(t, ap["k_norm_gen"]["scale"], cfg.rms_norm_eps),
            True, None,
        )
        kp = apply_rope_one(k32, cos_q, sin_q).astype(x.dtype)
        k_full = gather_block(kp)  # async-start here …
        v_full = gather_block(v)
        kb = k_full.astype(k_cache.dtype).transpose(0, 2, 1, 3)
        vb = v_full.astype(v_cache.dtype).transpose(0, 2, 1, 3)
        Tblk = n_global + 2
        if use_flash and D % 128 == 0:
            from unimedvl_tpu.ops.flash_attention import flash_block_attention

            q_pre = dict(
                w_und=ap["q_norm"]["scale"], w_gen=ap["q_norm_gen"]["scale"],
                cos=cos_q, sin=sin_q, end_row=None, eps=cfg.rms_norm_eps,
            )
            zeros = jnp.zeros_like(lens)
            # cache partial: context rows [0, lens) only, no block keys
            o_c, lse_c = flash_block_attention(
                q, k_cache, v_cache, lens, lens, False,
                block_q=256, block_k=256, q_valid_len=zeros,
                q_preproc=q_pre, kv_head_major=True, return_lse=True,
            )
            # block partial: the gathered rows, all visible ("context" rows)
            o_b, lse_b = flash_block_attention(
                q, kb, vb, jnp.full_like(lens, Tblk),
                jnp.full_like(lens, Tblk), False,
                block_q=256, block_k=256, q_valid_len=zeros,
                q_preproc=q_pre, kv_head_major=True, return_lse=True,
            )
        else:
            qp = q.astype(jnp.float32)
            qp = _mot_rows(
                qp,
                lambda t: rms_norm(t, ap["q_norm"]["scale"], cfg.rms_norm_eps),
                lambda t: rms_norm(t, ap["q_norm_gen"]["scale"], cfg.rms_norm_eps),
                True, None,
            )
            qp = apply_rope_one(qp, cos_q, sin_q).astype(x.dtype)
            M0 = k_cache.shape[2]
            kv_idx = jnp.arange(M0)[None, None, :]
            cmask = jnp.broadcast_to(kv_idx < lens[:, None, None], (S, lT, M0))
            o_c, lse_c = gqa_attention_hm_lse(qp, k_cache, v_cache, cmask)
            o_b, lse_b = gqa_attention_hm_lse(qp, kb, vb, None)
        o = combine_attention_partials([(o_c, lse_c), (o_b, lse_b)])
        return o.reshape(S, lT, Hl * D)

    v_full = gather_block(v)

    if use_flash and D % 128 == 0 and cfg.qk_norm:
        # q-side fp32 island fused in-kernel (compact rope_const tables); the
        # k island runs in XLA on the LOCAL shard BEFORE the gather — its
        # cost shrinks with the SP degree, and the measured-fastest attention
        # at every denoise cache size is concat + the single-loop kernel
        # (KERNEL_THRESHOLD.json; in-kernel k fusion measured slower).
        from unimedvl_tpu.ops.flash_attention import flash_block_attention

        k32 = k.astype(jnp.float32)
        k32 = _mot_rows(
            k32,
            lambda t: rms_norm(t, ap["k_norm"]["scale"], cfg.rms_norm_eps),
            lambda t: rms_norm(t, ap["k_norm_gen"]["scale"], cfg.rms_norm_eps),
            True, None,
        )
        kp = apply_rope_one(k32, cos_q, sin_q).astype(x.dtype)
        k_full = gather_block(kp)
        q_pre = dict(
            w_und=ap["q_norm"]["scale"], w_gen=ap["q_norm_gen"]["scale"],
            cos=cos_q, sin=sin_q, end_row=None, eps=cfg.rms_norm_eps,
        )
        M0 = k_cache.shape[2]
        k_cat = jnp.concatenate(
            [k_cache, k_full.astype(k_cache.dtype).transpose(0, 2, 1, 3)], axis=2
        )
        v_cat = jnp.concatenate(
            [v_cache, v_full.astype(v_cache.dtype).transpose(0, 2, 1, 3)], axis=2
        )
        o = flash_block_attention(
            q, k_cat, v_cat, lens, jnp.full_like(lens, M0), False,
            block_q=256, block_k=256,
            q_valid_len=jnp.full((S,), n_global + 2, jnp.int32),
            q_preproc=q_pre, kv_head_major=True,
        ).reshape(S, lT, Hl * D)
    else:
        # XLA path: fp32 islands locally (local text rows are the real text
        # rows on every shard), then gather the processed k
        if cfg.qk_norm:
            q = q.astype(jnp.float32)
            k = k.astype(jnp.float32)
            q = _mot_rows(
                q,
                lambda t: rms_norm(t, ap["q_norm"]["scale"], cfg.rms_norm_eps),
                lambda t: rms_norm(t, ap["q_norm_gen"]["scale"], cfg.rms_norm_eps),
                True, None,
            )
            k = _mot_rows(
                k,
                lambda t: rms_norm(t, ap["k_norm"]["scale"], cfg.rms_norm_eps),
                lambda t: rms_norm(t, ap["k_norm_gen"]["scale"], cfg.rms_norm_eps),
                True, None,
            )
        q = apply_rope_one(q, cos_q, sin_q).astype(x.dtype)
        k = apply_rope_one(k, cos_q, sin_q).astype(x.dtype)
        k_full = gather_block(k)
        M0 = k_cache.shape[2]
        k_all = jnp.concatenate(
            [k_cache, k_full.astype(k_cache.dtype).transpose(0, 2, 1, 3)], axis=2
        )
        v_all = jnp.concatenate(
            [v_cache, v_full.astype(v_cache.dtype).transpose(0, 2, 1, 3)], axis=2
        )
        kv_idx = jnp.arange(M0 + n_global + 2)[None, None, :]
        mask = (kv_idx < lens[:, None, None]) | (kv_idx >= M0)
        mask = jnp.broadcast_to(mask, (S, lT, M0 + n_global + 2))
        o = gqa_attention_hm(q, k_all, v_all, mask).reshape(S, lT, Hl * D)

    return o  # pre-o-proj attention context [S, lT, Hl*D]


def _owned_text(und_fn, text: jax.Array, layer_idx: jax.Array) -> jax.Array:
    """Compute the und-expert update of the (seq-replicated) text rows on
    ONE seq rank per layer and broadcast it.

    The 2 latent-delimiter text rows are identical on every seq shard, yet
    each shard's und_fn streams the full und-expert MLP shard (~100 MB
    int8/layer at TP2) for them — measured as the largest SP-invariant
    piece of the per-layer fixed class (DENOISE_SHARD_PROFILE.json).
    Rotating ownership over layers (owner = layer_idx % sp) amortizes that
    stream to 1/sp of layers per rank; the lax.cond skips the matmuls (and
    their weight reads) at runtime on non-owners, and one tiny [S, rows, C]
    psum over "seq" broadcasts the owner's LOCAL model-shard value (the
    caller's existing psum over "model" then completes the Megatron
    reduction). Exact: the owner computes bitwise the same value every rank
    computed before."""
    sp = jax.lax.psum(1, "seq")
    owner = jax.lax.axis_index("seq") == (layer_idx % sp)
    ty = jax.lax.cond(
        owner,
        lambda t: und_fn(t).astype(text.dtype),
        jnp.zeros_like,
        text,
    )
    return jax.lax.psum(ty, "seq")


def _mot_one_text_row(x, und_fn, gen_fn, gen_mode: bool, text_row):
    """_mot_rows for a ROW-CHUNK of the gen block that contains exactly one
    text row: ``text_row`` 0 (the <vision_start> chunk), -1 (the
    <vision_end> chunk), or None (interior chunk, pure gen rows)."""
    if not gen_mode:
        return und_fn(x)
    y = gen_fn(x)
    if text_row is None:
        return y
    sl = slice(0, 1) if text_row == 0 else slice(-1, None)
    ty = und_fn(x[:, sl])
    return y.at[:, sl].set(ty.astype(y.dtype))


def _sp_decoder_layer(
    x, lp, cfg, cos_q, sin_q, k_cache, v_cache, lens, n_global, use_flash,
    overlap_chunks: int = 1,
    overlap_gather: bool = False,
    layer_idx: Optional[jax.Array] = None,
    dedup_text_mlp: bool = False,
):
    dedup = dedup_text_mlp and cfg.use_moe and layer_idx is not None
    act = ACT2FN[cfg.hidden_act]
    ap = lp["attn"]
    residual = x
    h = _mot_rows(
        x,
        lambda t: rms_norm(t, lp["input_layernorm"]["scale"], cfg.rms_norm_eps),
        lambda t: rms_norm(t, lp["input_layernorm_moe_gen"]["scale"], cfg.rms_norm_eps),
        cfg.mot_attention, None,
    )
    attn_ctx = _sp_attention(
        h, lp, cfg, cos_q, sin_q, k_cache, v_cache, lens, n_global, use_flash,
        overlap_gather=overlap_gather,
    )

    def o_proj(ctx, text_row):
        o = _mot_one_text_row(
            ctx, lambda t: _linear(t, ap["o"]),
            lambda t: _linear(t, ap["o_gen"]), True, text_row,
        )
        # Megatron row-parallel reduction over the model axis
        return jax.lax.psum(o, "model")

    def mlp(norm_key, mlp_key):
        def f(t):
            tn = rms_norm(t, lp[norm_key]["scale"], cfg.rms_norm_eps)
            gukey, _gtp = mot.fused_key(lp[mlp_key], "gate_up")
            if gukey is not None:  # fused serving layout (local halves)
                g, u = jnp.split(_linear(tn, lp[mlp_key][gukey]), 2, axis=-1)
                return _linear(act(g) * u, lp[mlp_key]["down"])
            return _linear(
                act(_linear(tn, lp[mlp_key]["gate"])) * _linear(tn, lp[mlp_key]["up"]),
                lp[mlp_key]["down"],
            )

        return f

    def mlp_block(xc, text_row):
        und_f = mlp("post_attention_layernorm", "mlp")
        gen_f = mlp("post_attention_layernorm_moe_gen", "mlp_moe_gen")
        if dedup:
            h = gen_f(xc)
            sl = slice(0, 1) if text_row == 0 else slice(-1, None)
            ty = _owned_text(und_f, xc[:, sl], layer_idx)
            h = h.at[:, sl].set(ty.astype(h.dtype))
        else:
            h = _mot_one_text_row(xc, und_f, gen_f, cfg.use_moe, text_row)
        return jax.lax.psum(h, "model")

    lT = x.shape[1]
    if overlap_chunks <= 1 or lT < 4:
        o = _mot_rows(
            attn_ctx, lambda t: _linear(t, ap["o"]),
            lambda t: _linear(t, ap["o_gen"]), True, None,
        )
        x = residual + jax.lax.psum(o, "model")
        und_f = mlp("post_attention_layernorm", "mlp")
        gen_f = mlp("post_attention_layernorm_moe_gen", "mlp_moe_gen")
        if dedup:
            h = gen_f(x)
            text = jnp.concatenate([x[:, :1], x[:, -1:]], axis=1)
            ty = _owned_text(und_f, text, layer_idx)
            h = h.at[:, :1].set(ty[:, :1].astype(h.dtype))
            h = h.at[:, -1:].set(ty[:, 1:].astype(h.dtype))
        else:
            h = _mot_rows(x, und_f, gen_f, cfg.use_moe, None)
        return x + jax.lax.psum(h, "model")

    # Collective/compute overlap: after the attention the layer is row-wise
    # independent, so split the local rows into two chains — each contains
    # exactly one text row ([start, vae..., end] packing) — and let XLA's
    # latency-hiding scheduler run chunk B's matmuls while chunk A's psums
    # ride the ICI (the per-layer Megatron reductions are otherwise fully
    # exposed: every downstream op depends on them).
    half = lT // 2
    outs = []
    for sl, text_row in ((slice(0, half), 0), (slice(half, None), -1)):
        xc = residual[:, sl] + o_proj(attn_ctx[:, sl], text_row)
        outs.append(xc + mlp_block(xc, text_row))
    return jnp.concatenate(outs, axis=1)


def _denoise_body(
    dp: Params,
    se: jax.Array,  # [2, C] start/end token embeddings
    pos_emb: jax.Array,  # [nloc, C] local latent pos embeddings
    caches: KVCache,  # local slices [L, S, Hk/tp, M, D]
    positions: jax.Array,  # [S]
    noise: jax.Array,  # [nloc, 64]
    schedule: Tuple[np.ndarray, ...],  # host arrays (ts, dts, tscales, iscales, runs)
    cfg: BagelConfig,
    n_global: int,
    statics: Dict,
    overlap_chunks: int = 1,
    overlap_gather: bool = False,
    dedup_text_mlp: bool = False,
):
    """Per-device body of the TP×SP denoise loop (runs under shard_map)."""
    from unimedvl_tpu.models.bagel import _cfg_combine, time_embed

    llm = cfg.llm
    S = caches.k.shape[1]
    nloc = noise.shape[0]
    lT = nloc + 2
    use_flash = lT >= 64 and (
        jax.default_backend() == "tpu" or mot._FORCE_FLASH
    )
    ts, dts, text_scales, img_scales, runs = schedule
    use_text_cfg = statics["use_text_cfg"]
    use_img_cfg = statics["use_img_cfg"]

    def make_step(n_streams: int, cfg_on: bool):
        step_caches = (
            caches
            if n_streams == S
            else caches.replace(
                k=caches.k[:, :1], v=caches.v[:, :1], lens=caches.lens[:1],
                k_scale=None if caches.k_scale is None else caches.k_scale[:, :1],
                v_scale=None if caches.v_scale is None else caches.v_scale[:, :1],
            )
        )
        cos_q, sin_q = rope_cos_sin(
            positions[:n_streams, None], llm.head_dim, llm.rope_theta
        )  # [ns, 1, D]

        def step(x_t, inputs):
            t, dt, tscale, iscale = inputs
            t_emb = time_embed(dp["time_embedder"], t[None])  # [1, C]
            x_lat = _linear(x_t, dp["vae2llm"]) + t_emb + pos_emb  # [nloc, C]
            x_lat = x_lat.astype(se.dtype)
            block = jnp.concatenate([se[:1], x_lat, se[1:]], axis=0)  # [lT, C]
            h = jnp.broadcast_to(block[None], (n_streams, lT, block.shape[-1]))

            def body(carry, layer_inputs):
                lp, k_c, v_c, li = layer_inputs
                out = _sp_decoder_layer(
                    carry, lp, llm, cos_q, sin_q, k_c, v_c,
                    step_caches.lens, n_global, use_flash,
                    overlap_chunks=overlap_chunks,
                    overlap_gather=overlap_gather,
                    layer_idx=li, dedup_text_mlp=dedup_text_mlp,
                )
                return out, None

            n_layers = step_caches.k.shape[0]
            h, _ = jax.lax.scan(
                body, h,
                (dp["layers"], step_caches.k, step_caches.v,
                 jnp.arange(n_layers, dtype=jnp.int32)),
            )
            h = _mot_rows(
                h,
                lambda t_: rms_norm(t_, dp["norm"]["scale"], llm.rms_norm_eps),
                lambda t_: rms_norm(t_, dp["norm_moe_gen"]["scale"], llm.rms_norm_eps),
                llm.use_moe, None,
            )
            v_all = _linear(h[:, 1 : nloc + 1, :], dp["llm2vae"])  # [ns, nloc, 64]
            v = v_all[0]
            if cfg_on:
                v_text = v_all[1] if use_text_cfg else v
                v_img = v_all[1 + int(use_text_cfg)] if use_img_cfg else v
                v = _cfg_combine(
                    v, v_text, v_img, tscale, iscale,
                    statics["cfg_renorm_min"], statics["cfg_renorm_type"],
                    use_text_cfg, use_img_cfg, seq_axis="seq",
                )
            x_t = x_t - v.astype(x_t.dtype) * dt
            return x_t, None

        return step

    x_t = noise
    for run_start, run_end, cfg_on in runs:
        n_streams = S if (cfg_on and S > 1) else 1
        sl = slice(run_start, run_end)
        xs = (
            jnp.asarray(ts[sl]), jnp.asarray(dts[sl]),
            jnp.asarray(text_scales[sl]), jnp.asarray(img_scales[sl]),
        )
        x_t, _ = jax.lax.scan(make_step(n_streams, cfg_on and S > 1), x_t, xs)
    return x_t


# Compiled shard_map programs keyed by (cfg, mesh, shapes, CFG knobs). Bounded
# LRU: schedule scalars are baked into the key, so sweep/benchmark callers
# varying timesteps or scales would otherwise pin a compiled executable per
# distinct value for the process lifetime.
_PROGRAM_CACHE: "OrderedDict" = OrderedDict()
_PROGRAM_CACHE_MAX = 32


def generate_latents_tp_sp(
    params: Params,
    cfg: BagelConfig,
    caches: KVCache,  # [L, S_cfg, Hk, M, D]
    positions: jax.Array,  # [S_cfg]
    latent_pos_ids: jax.Array,  # [n]
    init_noise: jax.Array,  # [n, 64]
    start_end_ids: jax.Array,  # [2]
    mesh: Mesh,
    num_timesteps: int = 50,
    timestep_shift: float = 3.0,
    cfg_text_scale: float = 1.0,
    cfg_img_scale: float = 1.0,
    cfg_interval: Tuple[float, float] = (0.0, 1.0),
    cfg_renorm_min: float = 0.0,
    cfg_renorm_type: str = "global",
    use_text_cfg: bool = False,
    use_img_cfg: bool = False,
    overlap_chunks: int = 2,
    overlap_gather: bool = True,
    dedup_text_mlp: bool = True,
) -> jax.Array:
    """TP×SP rectified-flow denoise over a ("model", "seq") mesh.

    Semantics == models.bagel.generate_latents (parity-tested); layout ==
    docs/MULTICHIP_DENOISE.md TP2×SP4 (any (tp, sp) with
    num_kv_heads % tp == 0 and n % sp == 0 works). Returns x_0 [n, 64].

    ``overlap_chunks``: 2 (default) splits each layer's post-attention chain
    into two row-independent chunks so the per-layer Megatron psums overlap
    the other chunk's compute (see _sp_decoder_layer); 1 = single-chain.
    ``overlap_gather``: split each layer's attention into local-cache and
    gathered-block partials (online-softmax combine) so the per-layer seq
    all-gather overlaps the cache partial's compute (see _sp_attention).
    ``dedup_text_mlp``: rotate the und-expert MLP of the 2 seq-replicated
    text rows over seq ranks (owner = layer % sp; one tiny psum broadcasts)
    instead of every rank streaming the und MLP shard for them — the
    largest SP-invariant piece of the per-layer fixed class
    (DENOISE_SHARD_PROFILE.json). Exact; default on.
    """
    from unimedvl_tpu.models.bagel import flow_timesteps

    assert mesh.axis_names == ("model", "seq"), mesh.axis_names
    assert caches.k_scale is None, (
        "int8 KV caches are a serving-decode feature; the SP denoise path "
        "reads the (small) context cache in bf16"
    )
    tp = mesh.shape["model"]
    sp = mesh.shape["seq"]
    n = init_noise.shape[0]
    llm = cfg.llm
    assert n % sp == 0, (n, sp)
    assert llm.num_key_value_heads % tp == 0, (llm.num_key_value_heads, tp)
    assert llm.num_attention_heads % tp == 0
    fkey, ftp = mot.fused_key(params["llm"]["layers"].get("attn", {}), "qkv")
    if fkey is not None:
        # a tp-interleaved fused tree's shard blocks must align with the
        # manual "model" split — a mismatch would silently mis-split the
        # in-shard [q_s|k_s|v_s] columns
        assert ftp == tp, (
            f"fused projection layout tp={ftp} != mesh model axis {tp}; "
            f"re-fuse with quant.fuse_serving_projections(tp={tp})"
        )

    # host-side schedule (identical to generate_latents)
    ts, dts = flow_timesteps(num_timesteps, timestep_shift)
    lo, hi = cfg_interval
    in_interval = (ts > lo) & (ts <= hi)
    text_scales = np.where(in_interval, cfg_text_scale, 1.0).astype(np.float32)
    img_scales = np.where(in_interval, cfg_img_scale, 1.0).astype(np.float32)
    runs = []
    start = 0
    for i in range(1, len(ts) + 1):
        if i == len(ts) or bool(in_interval[i]) != bool(in_interval[start]):
            runs.append((start, i, bool(in_interval[start])))
            start = i
    runs = tuple(runs)

    # reduced param tree crossing into shard_map (embed/lm_head/vit/vae stay out)
    dp = {
        "layers": params["llm"]["layers"],
        "norm": params["llm"]["norm"],
        "vae2llm": params["vae2llm"],
        "llm2vae": params["llm2vae"],
        "time_embedder": params["time_embedder"],
    }
    if "norm_moe_gen" in params["llm"]:
        dp["norm_moe_gen"] = params["llm"]["norm_moe_gen"]
    se = mot.embed_tokens(params["llm"], start_end_ids)  # [2, C]
    pos_emb = params["latent_pos_embed"][latent_pos_ids]  # [n, C]

    statics = dict(
        cfg_renorm_min=cfg_renorm_min, cfg_renorm_type=cfg_renorm_type,
        use_text_cfg=use_text_cfg, use_img_cfg=use_img_cfg,
    )
    schedule = (ts, dts, text_scales, img_scales, runs)

    dp_specs = {
        "layers": _layer_specs(jax.tree.map(lambda x: x, dp["layers"])),
        "norm": _replicated_like(dp["norm"]),
        "vae2llm": _replicated_like(dp["vae2llm"]),
        "llm2vae": _replicated_like(dp["llm2vae"]),
        "time_embedder": _replicated_like(dp["time_embedder"]),
    }
    if "norm_moe_gen" in dp:
        dp_specs["norm_moe_gen"] = _replicated_like(dp["norm_moe_gen"])
    cache_specs = KVCache(
        k=P(None, None, "model", None, None),
        v=P(None, None, "model", None, None),
        lens=P(),
    )

    key = (
        cfg, mesh, n, int(caches.k.shape[1]), num_timesteps, timestep_shift,
        cfg_text_scale, cfg_img_scale, cfg_interval, cfg_renorm_min,
        cfg_renorm_type, use_text_cfg, use_img_cfg, overlap_chunks,
        overlap_gather, dedup_text_mlp, jax.tree_util.tree_structure(dp),
    )
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        _PROGRAM_CACHE.move_to_end(key)
    else:
        body = functools.partial(
            _denoise_body, cfg=cfg, n_global=n, statics=statics,
            schedule=schedule, overlap_chunks=overlap_chunks,
            overlap_gather=overlap_gather, dedup_text_mlp=dedup_text_mlp,
        )
        mapped = shard_map(
            body,
            mesh=mesh,
            in_specs=(
                dp_specs, P(), P("seq", None), cache_specs, P(), P("seq", None),
            ),
            out_specs=P("seq", None),
        )
        fn = jax.jit(mapped)
        _PROGRAM_CACHE[key] = fn
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)

    return fn(dp, se, pos_emb, caches, positions, init_noise)


def generate_latents_dp_tp_sp(
    params: Params,
    cfg: BagelConfig,
    group_caches,  # list[G] of KVCache [L, S_cfg, Hk, M, D] (same shapes)
    group_positions,  # list[G] of [S_cfg]
    group_latent_pos_ids,  # list[G] of [n]
    group_init_noise,  # list[G] of [n, 64]
    start_end_ids: jax.Array,  # [2]
    mesh: Mesh,  # ("data", "model", "seq")
    **kwargs,
) -> jax.Array:
    """Multi-image throughput grouping (docs/MULTICHIP_DENOISE.md lever 3):
    G = mesh.shape["data"] INDEPENDENT images denoise concurrently, each on
    its own ("model", "seq") submesh — e.g. v5e-8 as DP2×TP2×SP2 runs two
    512px images at once, amortising the per-step fixed-overhead class that
    dominates small SP shards. Groups share the schedule/CFG knobs and must
    have identical geometry (same n, S_cfg, cache capacity).

    Returns x_0 stacked [G, n, 64]. Semantics per group ==
    generate_latents_tp_sp (which is parity-tested vs the single-device
    loop); the data axis carries no collectives, so groups are exactly the
    TP×SP program replicated."""
    from unimedvl_tpu.models.bagel import flow_timesteps

    assert mesh.axis_names == ("data", "model", "seq"), mesh.axis_names
    G = mesh.shape["data"]
    assert len(group_caches) == G, (len(group_caches), G)
    for c in group_caches:
        assert c.k_scale is None, "int8 KV unsupported in the SP denoise path"
    tp = mesh.shape["model"]
    sp = mesh.shape["seq"]
    n = group_init_noise[0].shape[0]
    llm = cfg.llm
    assert n % sp == 0, (n, sp)
    assert llm.num_key_value_heads % tp == 0
    fkey, ftp = mot.fused_key(params["llm"]["layers"].get("attn", {}), "qkv")
    if fkey is not None:
        assert ftp == tp, (
            f"fused projection layout tp={ftp} != mesh model axis {tp}; "
            f"re-fuse with quant.fuse_serving_projections(tp={tp})"
        )
    num_timesteps = kwargs.get("num_timesteps", 50)
    timestep_shift = kwargs.get("timestep_shift", 3.0)
    cfg_text_scale = kwargs.get("cfg_text_scale", 1.0)
    cfg_img_scale = kwargs.get("cfg_img_scale", 1.0)
    cfg_interval = kwargs.get("cfg_interval", (0.0, 1.0))
    cfg_renorm_min = kwargs.get("cfg_renorm_min", 0.0)
    cfg_renorm_type = kwargs.get("cfg_renorm_type", "global")
    use_text_cfg = kwargs.get("use_text_cfg", False)
    use_img_cfg = kwargs.get("use_img_cfg", False)
    overlap_chunks = kwargs.get("overlap_chunks", 2)
    overlap_gather = kwargs.get("overlap_gather", True)
    dedup_text_mlp = kwargs.get("dedup_text_mlp", True)

    ts, dts = flow_timesteps(num_timesteps, timestep_shift)
    lo, hi = cfg_interval
    in_interval = (ts > lo) & (ts <= hi)
    text_scales = np.where(in_interval, cfg_text_scale, 1.0).astype(np.float32)
    img_scales = np.where(in_interval, cfg_img_scale, 1.0).astype(np.float32)
    runs = []
    start = 0
    for i in range(1, len(ts) + 1):
        if i == len(ts) or bool(in_interval[i]) != bool(in_interval[start]):
            runs.append((start, i, bool(in_interval[start])))
            start = i
    runs = tuple(runs)
    schedule = (ts, dts, text_scales, img_scales, runs)
    statics = dict(
        cfg_renorm_min=cfg_renorm_min, cfg_renorm_type=cfg_renorm_type,
        use_text_cfg=use_text_cfg, use_img_cfg=use_img_cfg,
    )

    dp = {
        "layers": params["llm"]["layers"],
        "norm": params["llm"]["norm"],
        "vae2llm": params["vae2llm"],
        "llm2vae": params["llm2vae"],
        "time_embedder": params["time_embedder"],
    }
    if "norm_moe_gen" in params["llm"]:
        dp["norm_moe_gen"] = params["llm"]["norm_moe_gen"]
    se = mot.embed_tokens(params["llm"], start_end_ids)  # [2, C]
    pos_emb = jnp.stack(
        [params["latent_pos_embed"][ids] for ids in group_latent_pos_ids]
    )  # [G, n, C]

    stacked_caches = KVCache(
        k=jnp.stack([c.k for c in group_caches]),
        v=jnp.stack([c.v for c in group_caches]),
        lens=jnp.stack([c.lens for c in group_caches]),
    )
    positions = jnp.stack(group_positions)  # [G, S_cfg]
    noise = jnp.stack(group_init_noise)  # [G, n, 64]

    # TP specs with norms/scalars replicated (same as the ungrouped path)
    dp_specs = {
        "layers": _layer_specs(jax.tree.map(lambda x: x, dp["layers"])),
        "norm": _replicated_like(dp["norm"]),
        "vae2llm": _replicated_like(dp["vae2llm"]),
        "llm2vae": _replicated_like(dp["llm2vae"]),
        "time_embedder": _replicated_like(dp["time_embedder"]),
    }
    if "norm_moe_gen" in dp:
        dp_specs["norm_moe_gen"] = _replicated_like(dp["norm_moe_gen"])
    cache_specs = KVCache(
        k=P("data", None, None, "model", None, None),
        v=P("data", None, None, "model", None, None),
        lens=P("data"),
    )

    def grouped_body(dp_, se_, pos_emb_, caches_, positions_, noise_):
        # local slices carry a leading group axis of size 1 — squeeze it
        return _denoise_body(
            dp_, se_, pos_emb_[0],
            caches_.replace(k=caches_.k[0], v=caches_.v[0],
                            lens=caches_.lens[0]),
            positions_[0], noise_[0],
            schedule=schedule, cfg=cfg, n_global=n, statics=statics,
            overlap_chunks=overlap_chunks, overlap_gather=overlap_gather,
            dedup_text_mlp=dedup_text_mlp,
        )[None]

    key = (
        "grouped", cfg, mesh, n, int(stacked_caches.k.shape[2]),
        num_timesteps, timestep_shift, cfg_text_scale, cfg_img_scale,
        cfg_interval, cfg_renorm_min, cfg_renorm_type, use_text_cfg,
        use_img_cfg, overlap_chunks, overlap_gather, dedup_text_mlp,
        jax.tree_util.tree_structure(dp),
    )
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        _PROGRAM_CACHE.move_to_end(key)
    else:
        mapped = shard_map(
            grouped_body,
            mesh=mesh,
            in_specs=(
                dp_specs, P(), P("data", "seq", None), cache_specs,
                P("data", None), P("data", "seq", None),
            ),
            out_specs=P("data", "seq", None),
        )
        fn = jax.jit(mapped)
        _PROGRAM_CACHE[key] = fn
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)

    return fn(dp, se, pos_emb, stacked_caches, positions, noise)

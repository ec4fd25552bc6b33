"""Bagel unified model: ties the Qwen2 MoT LLM, SigLIP ViT, and FLUX VAE with
the auxiliary embedders, and provides the three jitted device programs of the
inference engine (SURVEY.md §7):

  * ``prefill_text`` / ``prefill_vit`` / ``prefill_vae`` — context updates
    (reference: bagel.py forward_cache_update_{text,vit,vae}:412,523,697)
  * ``generate_text`` — whole greedy/sampling decode loop as ONE jitted
    lax.while_loop (reference drives one forward per token from Python,
    bagel.py:1236-1317)
  * ``generate_latents`` — the whole rectified-flow denoise loop as ONE jitted
    lax.scan, with the up-to-3 CFG contexts batched into the stream axis of a
    single forward (the reference runs them sequentially, bagel.py:1120-1171)

Packing contracts (device side):
  * text blocks: [S, T] token ids, trailing padding, causal.
  * image blocks: S=1 per call, exact shape [n_tokens + 2] laid out as
    [<vision_start>, tokens..., <vision_end>], all sharing ONE rope position
    (bagel.py:501-504) — rope advances by 1 afterwards (host bookkeeping).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unimedvl_tpu.config import BagelConfig
from unimedvl_tpu.models import qwen2_mot as mot
from unimedvl_tpu.models import siglip
from unimedvl_tpu.models import vae as vae_mod
from unimedvl_tpu.models.qwen2_mot import KVCache, ForwardSpec
from unimedvl_tpu.ops.activations import ACT2FN, silu
from unimedvl_tpu.ops.sincos import get_2d_sincos_pos_embed, timestep_embedding

Params = Dict


# ---------------------------------------------------------------------------
# auxiliary modules (modeling_utils.py)
# ---------------------------------------------------------------------------

def _linear(x, p):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def time_embed(params: Params, t: jax.Array, freq_dim: int = 256) -> jax.Array:
    """TimestepEmbedder (modeling_utils.py:73-109). t: [N] -> [N, C] fp32."""
    h = timestep_embedding(t, freq_dim)
    return _linear(silu(_linear(h, params["fc1"])), params["fc2"])


def connector(params: Params, x: jax.Array, act_name: str) -> jax.Array:
    """MLPconnector (modeling_utils.py:112-123)."""
    act = ACT2FN[act_name]
    return _linear(act(_linear(x, params["fc1"])), params["fc2"])


# ---------------------------------------------------------------------------
# prefill programs
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def prefill_text(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    token_ids: jax.Array,  # [S, T] with trailing padding
    positions: jax.Array,  # [S, T]
    valid: jax.Array,  # [S, T] bool
) -> KVCache:
    """Causal text prefill (bagel.py:412-458)."""
    x = mot.embed_tokens(params["llm"], token_ids)
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("und", True, True), q_valid=valid,
    )
    return cache


@partial(jax.jit, static_argnames=("cfg",))
def encode_vit_tokens(
    params: Params,
    cfg: BagelConfig,
    patch_tokens: jax.Array,  # [N, Tv, p*p*3]
    vit_pos_ids: jax.Array,  # [N, Tv]
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """ViT encode + connector + frozen 2D pos add (bagel.py:584-592).
    Returns LLM-space embeddings [N, Tv, C]."""
    h = siglip.forward(params["vit"], cfg.vit, patch_tokens, vit_pos_ids, valid)
    h = connector(params["connector"], h, cfg.connector_act)
    pos = params["vit_pos_embed"].astype(h.dtype)[vit_pos_ids]
    return h + pos


@partial(jax.jit, static_argnames=("cfg",))
def preprocess_vit_image(cfg: BagelConfig, image_u8: jax.Array) -> jax.Array:
    """Fused device-side preprocessing: uint8 [H, W, 3] -> normalized patch
    tokens [1, Tv, p*p*3] (north-star fusion: the host only resizes and ships
    uint8 — 4x less transfer than fp32 patch tokens).

    Matches ImageTransform normalize (mean=std=0.5) and data_utils.patchify's
    chpwq->hwpqc token ordering exactly.
    """
    x = image_u8.astype(jnp.float32) / 255.0
    x = (x - 0.5) / 0.5
    H, W, C = x.shape
    p = cfg.vit.patch_size
    x = x.reshape(H // p, p, W // p, p, C)
    x = x.transpose(0, 2, 1, 3, 4)  # (h, w, i, j, c)
    return x.reshape(1, (H // p) * (W // p), p * p * C)


@partial(jax.jit, static_argnames=("cfg",))
def preprocess_vae_image(cfg: BagelConfig, image_u8: jax.Array) -> jax.Array:
    """uint8 [H, W, 3] -> normalized [1, H, W, 3] fp32 for the VAE encoder."""
    x = image_u8.astype(jnp.float32) / 255.0
    return ((x - 0.5) / 0.5)[None]


@partial(jax.jit, static_argnames=("cfg",))
def prefill_vit(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    patch_tokens: jax.Array,  # [1, Tv, p*p*3] exact shape
    vit_pos_ids: jax.Array,  # [1, Tv]
    start_end_ids: jax.Array,  # [2] (<vision_start>, <vision_end>)
    rope_pos: jax.Array,  # [1] shared position id
) -> KVCache:
    """ViT image prefill, non-causal block (bagel.py:523-615)."""
    vit_embed = encode_vit_tokens(params, cfg, patch_tokens, vit_pos_ids)
    se = mot.embed_tokens(params["llm"], start_end_ids).astype(vit_embed.dtype)
    x = jnp.concatenate([se[None, :1], vit_embed, se[None, 1:]], axis=1)
    T = x.shape[1]
    positions = jnp.broadcast_to(rope_pos[:, None], (1, T))
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("und", False, True),
    )
    return cache


def vit_token_bucket(n: int) -> int:
    """Token-count bucket ladder for shape-bucketed image prefill: fine
    granularity for small images, 512-steps beyond."""
    for b in (16, 32, 64, 128, 256):
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


@partial(jax.jit, static_argnames=("cfg",))
def prefill_vit_bucketed(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    patch_tokens: jax.Array,  # [1, Tb, p*p*3] padded to a bucket
    vit_pos_ids: jax.Array,  # [1, Tb]
    n_tokens: jax.Array,  # [] int32 actual patch count (<= Tb)
    start_end_ids: jax.Array,  # [2]
    rope_pos: jax.Array,  # [1]
) -> KVCache:
    """ViT image prefill over shape BUCKETS: NaViT sizes vary per image, and
    each exact shape would compile a fresh program (SURVEY.md §7 hard-part 2).
    Pads patch tokens to the bucket, places <vision_end> dynamically at row
    n+1, and masks rows >= n+2 (their cache slots are overwritten by the next
    append)."""
    Tb = patch_tokens.shape[1]
    T = Tb + 2
    vit_valid = (jnp.arange(Tb) < n_tokens)[None]
    vit_embed = encode_vit_tokens(params, cfg, patch_tokens, vit_pos_ids, vit_valid)
    se = mot.embed_tokens(params["llm"], start_end_ids).astype(vit_embed.dtype)
    C = vit_embed.shape[-1]
    x = jnp.zeros((1, T, C), vit_embed.dtype)
    x = jax.lax.dynamic_update_slice(x, se[None, :1], (0, 0, 0))
    x = jax.lax.dynamic_update_slice(x, vit_embed, (0, 1, 0))
    x = jax.lax.dynamic_update_slice(x, se[None, 1:], (0, n_tokens + 1, 0))
    q_valid = (jnp.arange(T) < n_tokens + 2)[None]
    positions = jnp.broadcast_to(rope_pos[:, None], (1, T))
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("und", False, True), q_valid=q_valid,
    )
    return cache


@partial(jax.jit, static_argnames=("cfg", "kv_dtype", "quantized", "capacity",
                                   "kv_bits"))
def prefill_vit_group(
    params: Params,
    cfg: BagelConfig,
    patch_tokens: jax.Array,  # [P, Tb, p*p*3] padded to one shared bucket
    vit_pos_ids: jax.Array,  # [P, Tb]
    n_tokens: jax.Array,  # [P] int32 actual patch counts; 0 = inactive row
    start_end_ids: jax.Array,  # [2]
    rope_pos: jax.Array,  # [P]
    kv_dtype=jnp.bfloat16,
    quantized: bool = False,
    capacity: Optional[int] = None,
    kv_bits: int = 8,
) -> KVCache:
    """GROUP-BATCHED ViT image prefill: P same-bucket images in ONE dispatch.

    ``capacity`` (>= Tb+2) leaves headroom in the returned block cache so the
    caller can append the requests' TEXT prefill into the SAME compact block
    (serving admission: one [P, T] text forward + one pool scatter instead of
    a full-slot-pool forward per admission round).

    Returns a fresh P-stream KVCache of capacity Tb+2 holding each image's
    [<vision_start>, vit..., <vision_end>] kv block (lens[i] = n_i + 2, or 0
    for inactive rows) — the caller scatters the block into its slot pool
    (serving.group_store). Replaces per-slot prefill dispatches: the serving
    engine admitted images one slot at a time (a full 28-layer forward at
    batch 1 per image, reference-style bagel.py:523-615 per-sample semantics),
    which dominated end-to-end serving time; batching P images amortises both
    the dispatch and the MXU-starved small matmuls.
    """
    P, Tb = patch_tokens.shape[:2]
    T = Tb + 2
    active = n_tokens > 0
    vit_valid = (jnp.arange(Tb)[None] < n_tokens[:, None]) & active[:, None]
    vit_embed = encode_vit_tokens(params, cfg, patch_tokens, vit_pos_ids, vit_valid)
    se = mot.embed_tokens(params["llm"], start_end_ids).astype(vit_embed.dtype)
    # rows: 0 = start, 1..Tb = vit (garbage past n_i, masked), n_i+1 = end
    x = jnp.pad(vit_embed, ((0, 0), (1, 1), (0, 0)))
    x = x.at[:, 0].set(se[0])
    row = jnp.arange(T)[None, :, None]
    is_end = row == (n_tokens[:, None, None] + 1)
    x = jnp.where(is_end, se[1].astype(x.dtype), x)
    q_valid = (jnp.arange(T)[None] < n_tokens[:, None] + 2) & active[:, None]
    positions = jnp.broadcast_to(rope_pos[:, None], (P, T))
    cache = KVCache.create(
        cfg.llm.num_hidden_layers, P, capacity if capacity is not None else T,
        cfg.llm.num_key_value_heads, cfg.llm.head_dim, kv_dtype,
        quantized=quantized, kv_bits=kv_bits,
    )
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("und", False, True), q_valid=q_valid,
    )
    return cache


@partial(jax.jit, static_argnames=("cfg",))
def encode_vae_latent_tokens(
    params: Params,
    cfg: BagelConfig,
    image_nhwc: jax.Array,  # [1, H, W, 3]
    rng: Optional[jax.Array],
) -> jax.Array:
    """VAE-encode an image and patchify the latent into [1, h*w, 64] tokens
    (bagel.py:757-776). Sampling matches DiagonalGaussian(sample=True) when
    rng is given; rng=None uses the posterior mean."""
    z = vae_mod.encode(params["vae"], cfg.vae, image_nhwc, rng)  # [1,h,w,zc]
    p = cfg.latent_patch_size
    n, h, w, c = z.shape
    hp, wp = h // p, w // p
    z = z.reshape(n, hp, p, wp, p, c)
    z = jnp.einsum("nhpwqc->nhwpqc", z)
    return z.reshape(n, hp * wp, p * p * c)


@partial(jax.jit, static_argnames=("cfg",))
def prefill_vae(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    latent_tokens: jax.Array,  # [1, n, 64]
    latent_pos_ids: jax.Array,  # [1, n]
    start_end_ids: jax.Array,  # [2]
    rope_pos: jax.Array,  # [1]
    timestep: jax.Array,  # [] scalar, 0 for clean conditioning images
) -> KVCache:
    """VAE image prefill through the gen expert (bagel.py:697-806)."""
    x_lat = _linear(latent_tokens, params["vae2llm"])
    t_emb = time_embed(params["time_embedder"], timestep[None])  # [1, C]
    pos_emb = params["latent_pos_embed"][latent_pos_ids]
    x_lat = (x_lat + t_emb[:, None, :] + pos_emb).astype(x_lat.dtype)
    se = mot.embed_tokens(params["llm"], start_end_ids).astype(x_lat.dtype)
    x = jnp.concatenate([se[None, :1], x_lat, se[None, 1:]], axis=1)
    T = x.shape[1]
    positions = jnp.broadcast_to(rope_pos[:, None], (1, T))
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("gen", False, True, rope_const=True),
    )
    return cache


@partial(jax.jit, static_argnames=("cfg",))
def prefill_vae_bucketed(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    latent_tokens: jax.Array,  # [1, Nb, 64] padded to a bucket
    latent_pos_ids: jax.Array,  # [1, Nb]
    n_tokens: jax.Array,  # [] int32 actual latent count (<= Nb)
    start_end_ids: jax.Array,  # [2]
    rope_pos: jax.Array,  # [1]
    timestep: jax.Array,  # []
) -> KVCache:
    """VAE image prefill over shape BUCKETS (bagel.py:697-806 semantics).

    Editing sessions feed arbitrary NaViT-resized images; the exact-shape
    ``prefill_vae`` compiles a fresh 28-layer program per latent count. Here
    the latent block is padded to a bucket, <vision_end> is placed dynamically
    at row n+1 (``gen_end_row`` routing in qwen2_mot._mot_rows), and rows
    >= n+2 are masked — their cache slots get overwritten by the next append.
    """
    Nb = latent_tokens.shape[1]
    T = Nb + 2
    x_lat = _linear(latent_tokens, params["vae2llm"])
    t_emb = time_embed(params["time_embedder"], timestep[None])  # [1, C]
    pos_emb = params["latent_pos_embed"][latent_pos_ids]
    x_lat = (x_lat + t_emb[:, None, :] + pos_emb).astype(x_lat.dtype)
    se = mot.embed_tokens(params["llm"], start_end_ids).astype(x_lat.dtype)
    C = x_lat.shape[-1]
    x = jnp.zeros((1, T, C), x_lat.dtype)
    x = jax.lax.dynamic_update_slice(x, se[None, :1], (0, 0, 0))
    x = jax.lax.dynamic_update_slice(x, x_lat, (0, 1, 0))
    x = jax.lax.dynamic_update_slice(x, se[None, 1:], (0, n_tokens + 1, 0))
    q_valid = (jnp.arange(T) < n_tokens + 2)[None]
    positions = jnp.broadcast_to(rope_pos[:, None], (1, T))
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, positions, cache,
        ForwardSpec("gen", False, True, rope_const=True), q_valid=q_valid,
        gen_end_row=n_tokens + 1,
    )
    return cache


# ---------------------------------------------------------------------------
# text decoding — one jitted while_loop
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "do_sample"),
)
def generate_text(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    start_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S] rope position of the start token
    max_length: int,
    eos_id: jax.Array,  # [] int
    do_sample: bool = False,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Autoregressive decode (reference hot loop bagel.py:1259-1314) as one
    compiled while_loop.

    Returns (tokens [S, max_length] int32 — starting with the start token and
    excluding eos, padded with -1; lengths [S]).
    """
    S = start_tokens.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    out = jnp.full((S, max_length), -1, dtype=jnp.int32)
    # Aligned-column decode: every stream writes step d's kv at column
    # base + d (one dense dus per layer instead of a per-row scatter, which
    # serialises on TPU — 0.84 ms/scatter at S=256). The holes
    # [lens[s], base) are never attended, and the post-decode cache is
    # discarded by every caller (the chat flow re-prefills emitted text).
    decode_base = jnp.max(cache.lens)
    # int8 caches: carry the scales column-major [L, Hk, M, S] so the
    # per-step column write is a dense minor-dim dus instead of an S*Hk-tile
    # read-modify-write (0.82 ms/step at bs256 — see mot._update_kv_col).
    # The cache never escapes this function, so no transpose back.
    scales_cm = cache.quantized
    if scales_cm:
        cache = KVCache(
            k=cache.k, v=cache.v, lens=cache.lens,
            k_scale=jnp.transpose(cache.k_scale, (0, 2, 3, 1)),
            v_scale=jnp.transpose(cache.v_scale, (0, 2, 3, 1)),
        )

    def cond(state):
        step, done, *_ = state
        return (step < max_length) & ~jnp.all(done)

    def body(state):
        step, done, cur, pos, cache, out, rng = state
        out = out.at[:, step].set(jnp.where(done, -1, cur))
        x = mot.embed_tokens(params["llm"], cur)[:, None, :]  # [S, 1, C]
        h, cache = mot.forward(
            params["llm"], cfg.llm, x, pos[:, None], cache,
            ForwardSpec("und", True, True),
            decode_cols=(decode_base, decode_base + step),
            scales_cm=scales_cm,
        )
        logits = mot.lm_head(params["llm"], h[:, 0])  # [S, V] fp32
        rng, sub = jax.random.split(rng)
        if do_sample:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        done = done | (nxt == eos_id)
        return (step + 1, done, nxt, pos + 1, cache, out, rng)

    state = (
        jnp.array(0),
        jnp.zeros((S,), bool),
        start_tokens.astype(jnp.int32),
        positions.astype(jnp.int32),
        cache,
        out,
        rng,
    )
    step, done, cur, pos, cache, out, rng = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum(out >= 0, axis=1)
    return out, lengths


@partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "do_sample"),
)
def generate_text_ctx(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    start_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    max_length: int,
    eos_id: jax.Array,  # [] int
    do_sample: bool = False,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """CONTIGUOUS-cache decode: like :func:`generate_text` but each stream
    appends kv at its own ``lens[s]`` (per-row element scatter) and the
    updated cache is RETURNED with lens advanced per stream — so interactive
    multi-turn chat keeps its context instead of re-prefilling every emitted
    answer (O(turns^2) prefill). The element scatter serialises at large S
    (0.84 ms/scatter at S=256 — why generate_text uses aligned columns), but
    is free at the S<=8 interactive sizes this variant targets.

    Matches the reference's cache-keeping generate_text (bagel.py:1259-1314):
    the cache afterwards holds the start token plus every emitted non-eos
    token (eos is never forwarded). Finished streams stop advancing lens via
    q_valid masking.

    Returns (tokens [S, max_length] padded with -1, lengths [S], cache).
    """
    S = start_tokens.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    out = jnp.full((S, max_length), -1, dtype=jnp.int32)

    def cond(state):
        step, done, *_ = state
        return (step < max_length) & ~jnp.all(done)

    def body(state):
        step, done, cur, pos, cache, out, rng = state
        out = out.at[:, step].set(jnp.where(done, -1, cur))
        x = mot.embed_tokens(params["llm"], cur)[:, None, :]  # [S, 1, C]
        h, cache = mot.forward(
            params["llm"], cfg.llm, x, pos[:, None], cache,
            ForwardSpec("und", True, True), q_valid=~done[:, None],
        )
        logits = mot.lm_head(params["llm"], h[:, 0])  # [S, V] fp32
        rng, sub = jax.random.split(rng)
        if do_sample:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        done = done | (nxt == eos_id)
        return (step + 1, done, nxt, pos + 1, cache, out, rng)

    state = (
        jnp.array(0),
        jnp.zeros((S,), bool),
        start_tokens.astype(jnp.int32),
        positions.astype(jnp.int32),
        cache,
        out,
        rng,
    )
    _, _, _, _, cache, out, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum(out >= 0, axis=1)
    return out, lengths, cache


def propose_drafts(hist: jax.Array, hlen: jax.Array, ngram: int, K: int):
    """Prompt-lookup draft proposal: the K ids that followed the most recent
    PRIOR occurrence of each stream's trailing ``ngram`` ids in ``hist``
    [S, HL] (valid region [0, hlen)). Arbitrary ids when no match — drafts
    only cost speed, never correctness (acceptance == equality with the
    greedy argmax)."""
    HL = hist.shape[1]
    B = HL - ngram + 1
    tail_pos = hlen[:, None] - ngram + jnp.arange(ngram)[None, :]
    tail = jnp.take_along_axis(hist, jnp.maximum(tail_pos, 0), axis=1)
    windows = jnp.stack(
        [hist[:, i : B + i] for i in range(ngram)], axis=-1
    )  # [S, B, ngram]
    match = jnp.all(windows == tail[:, None, :], axis=-1)
    match &= jnp.arange(B)[None, :] < (hlen[:, None] - ngram)
    b_star = jnp.max(
        jnp.where(match, jnp.arange(B, dtype=jnp.int32)[None, :], -1), axis=1
    )  # [S], -1 = no match
    dstart = jnp.where(b_star >= 0, b_star + ngram, 0)
    dpos = jnp.clip(dstart[:, None] + jnp.arange(K)[None, :], 0, HL - 1)
    return jnp.take_along_axis(hist, dpos, axis=1)  # [S, K]


def _scatter_row_window(buf: jax.Array, vals: jax.Array, starts: jax.Array):
    """Write a [S, W] window into [S, L] at per-stream column ``starts``.
    Callers pad L by W so FILL_OR_DROP never drops a straddling window."""
    S, W = vals.shape
    if S == 1:
        return jax.lax.dynamic_update_slice(buf, vals, (jnp.int32(0), starts[0]))
    idx = jnp.stack(
        [jnp.arange(S, dtype=jnp.int32), starts.astype(jnp.int32)], axis=1
    )
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )
    return jax.lax.scatter(
        buf, idx, vals, dnums,
        indices_are_sorted=True, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "max_length", "k_draft", "ngram"),
)
def generate_text_spec(
    params: Params,
    cfg: BagelConfig,
    cache: KVCache,
    start_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    max_length: int,
    eos_id: jax.Array,  # [] int
    hist_ids: jax.Array,  # [S, HL] prompt ids, LAST valid id == start token
    hist_lens: jax.Array,  # [S]
    k_draft: int = 7,
    ngram: int = 3,
) -> Tuple[jax.Array, jax.Array, KVCache, jax.Array]:
    """Prompt-lookup speculative decode: GREEDY-EXACT vs
    :func:`generate_text_ctx` (same tokens, lengths, and final cache) but
    each iteration verifies ``k_draft`` draft tokens in ONE forward, so the
    per-token cost of the weight-streaming-bound small-batch decode drops by
    the acceptance factor. Training-free: drafts come from the most recent
    prior occurrence of the last ``ngram`` ids in (prompt + emitted) history
    — highly effective on templated clinical report text. Exactness does not
    depend on draft quality: a draft is accepted only when it EQUALS the
    greedy argmax at its position, so arbitrary drafts cost speed, never
    correctness (reference greedy loop being accelerated:
    /root/reference/codes/modeling/unimedvl/bagel.py:1259-1314).

    ``hist_ids`` must contain each stream's prompt ids left-aligned with the
    start token as the last valid id; HL (static) must be >=
    max(hist_lens) + max_length + k_draft. Cache capacity must admit
    lens + max_length + k_draft + 1 writes.

    Returns (tokens [S, max_length] incl. start token / excl. eos, padded
    -1; lengths [S]; updated contiguous cache; n_forwards [] — the loop
    iteration count, vs emitted-token count for plain decode).
    """
    S = start_tokens.shape[0]
    HL = hist_ids.shape[1]
    K = k_draft
    L_pad = max_length + K + 1

    out = jnp.full((S, L_pad), -1, dtype=jnp.int32)
    out = out.at[:, 0].set(start_tokens.astype(jnp.int32))

    def propose(hist, hlen):
        return propose_drafts(hist, hlen, ngram, K)

    def cond(state):
        cursor, done, *_ = state
        return jnp.any((cursor < max_length) & ~done)

    def body(state):
        cursor, done, cur, pos, lens, pending, cache, out, hist, hlen, it = state
        draft = propose(hist, hlen)  # [S, K]
        block = jnp.concatenate([cur[:, None], draft], axis=1)  # [S, K+1]
        x = mot.embed_tokens(params["llm"], block)
        block_pos = pos[:, None] + jnp.arange(K + 1)[None, :]
        cache = cache.replace(lens=lens)
        h, cache = mot.forward(
            params["llm"], cfg.llm, x, block_pos, cache,
            ForwardSpec("und", True, True),
            q_valid=jnp.broadcast_to(~done[:, None], (S, K + 1)),
        )
        logits = mot.lm_head(params["llm"], h.reshape(S * (K + 1), -1))
        g = jnp.argmax(logits, axis=-1).reshape(S, K + 1).astype(jnp.int32)

        # per-stream acceptance: c = 1 + longest draft==greedy prefix; first
        # valid eos truncates; streams that are done OR full FREEZE (E=0, no
        # lens/cur/pos advance — spec streams drain at different rates,
        # unlike the lockstep plain loop)
        active = ~done & (cursor < max_length)
        matched = draft == g[:, :-1]  # d_{i+1} vs g_i
        c = 1 + jnp.sum(jnp.cumprod(matched.astype(jnp.int32), axis=1), axis=1)
        idxs = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        is_eos = (g == eos_id) & (idxs < c[:, None])
        e = jnp.min(jnp.where(is_eos, idxs, K + 1), axis=1)  # first valid eos
        E = jnp.where(
            active, jnp.minimum(jnp.minimum(c, e), max_length - cursor), 0
        )
        done_new = done | (active & (e < c) & (e <= E))

        emit = jnp.where(idxs < E[:, None], g, -1)  # [S, K+1]
        out = _scatter_row_window(out, emit, cursor)
        hist = _scatter_row_window(
            hist, jnp.where(idxs < E[:, None], g, 0), hlen
        )
        # active & E==0 is the immediate-eos case: cur's kv was written and
        # consumed (lens +1), nothing new pending
        lens_new = lens + jnp.where(active, jnp.maximum(E, 1), 0)
        cur_new = jnp.where(
            E >= 1, jnp.take_along_axis(g, jnp.maximum(E - 1, 0)[:, None], 1)[:, 0],
            cur,
        )
        pending_new = jnp.where(active, E >= 1, pending)
        return (
            cursor + E, done_new, cur_new, pos + E, lens_new, pending_new,
            cache, out, hist, hlen + E, it + 1,
        )

    state = (
        jnp.ones((S,), jnp.int32),  # cursor: slot 0 holds the start token
        jnp.zeros((S,), bool),
        start_tokens.astype(jnp.int32),
        positions.astype(jnp.int32),
        cache.lens,
        jnp.ones((S,), bool),  # start token is emitted but not yet forwarded
        cache,
        out,
        hist_ids.astype(jnp.int32),
        hist_lens.astype(jnp.int32),
        jnp.int32(0),
    )
    (cursor, done, cur, pos, lens, pending, cache, out, _, _, it) = (
        jax.lax.while_loop(cond, body, state)
    )

    # Fixup: every emitted token must have kv in the returned cache (parity
    # with generate_text_ctx, which forwards each token as it consumes it);
    # the newest accepted token per stream is still pending.
    cache = cache.replace(lens=lens)
    x = mot.embed_tokens(params["llm"], cur)[:, None, :]
    _, cache = mot.forward(
        params["llm"], cfg.llm, x, pos[:, None], cache,
        ForwardSpec("und", True, True), q_valid=pending[:, None],
    )
    cache = cache.replace(lens=lens + pending.astype(jnp.int32))

    out = out[:, :max_length]
    lengths = jnp.sum(out >= 0, axis=1)
    return out, lengths, cache, it


# ---------------------------------------------------------------------------
# image generation — one jitted scan over denoise steps, CFG batched
# ---------------------------------------------------------------------------

def _cfg_combine(
    v: jax.Array,  # [n, 64] main velocity
    v_text: jax.Array,  # [n, 64] text-dropped context velocity
    v_img: jax.Array,  # [n, 64] image-dropped context velocity
    text_scale: jax.Array,  # [] dynamic (1.0 outside cfg_interval)
    img_scale: jax.Array,  # []
    renorm_min: float,
    renorm_type: str,
    use_text_cfg: bool,
    use_img_cfg: bool,
    seq_axis: Optional[str] = None,
) -> jax.Array:
    """CFG combination with renorm clamping (bagel.py:1173-1207). With scales
    == 1.0 every formula degenerates to the main velocity, so gating the
    cfg_interval dynamically is exact.

    ``seq_axis``: mesh axis name when the token dim is sequence-parallel
    (parallel/sp_denoise.py) — the "global" renorm's Frobenius norm then
    psums squared sums across shards; channel/text_channel renorms are
    per-token and need no communication."""
    if not use_text_cfg:
        return v
    v32 = v.astype(jnp.float32)
    vt32 = v_text.astype(jnp.float32)
    if renorm_type == "text_channel":
        v_ = vt32 + text_scale * (v32 - vt32)
        norm_v = jnp.linalg.norm(v32, axis=-1, keepdims=True)
        norm_v_ = jnp.linalg.norm(v_, axis=-1, keepdims=True)
        scale = jnp.clip(norm_v / (norm_v_ + 1e-8), renorm_min, 1.0)
        v_text_r = v_ * scale
        if use_img_cfg:
            vi32 = v_img.astype(jnp.float32)
            return (vi32 + img_scale * (v_text_r - vi32)).astype(v.dtype)
        return v_text_r.astype(v.dtype)
    else:
        v_ = vt32 + text_scale * (v32 - vt32)
        if use_img_cfg:
            vi32 = v_img.astype(jnp.float32)
            v_ = vi32 + img_scale * (v_ - vi32)
        if renorm_type == "global":
            if seq_axis is not None:
                norm_v = jnp.sqrt(jax.lax.psum(jnp.sum(v32 * v32), seq_axis))
                norm_v_ = jnp.sqrt(jax.lax.psum(jnp.sum(v_ * v_), seq_axis))
            else:
                norm_v = jnp.linalg.norm(v32)
                norm_v_ = jnp.linalg.norm(v_)
        elif renorm_type == "channel":
            norm_v = jnp.linalg.norm(v32, axis=-1, keepdims=True)
            norm_v_ = jnp.linalg.norm(v_, axis=-1, keepdims=True)
        else:
            raise NotImplementedError(renorm_type)
        scale = jnp.clip(norm_v / (norm_v_ + 1e-8), renorm_min, 1.0)
        return (v_ * scale).astype(v.dtype)


def flow_timesteps(num_timesteps: int, timestep_shift: float):
    """(timesteps [T-1], dts [T-1]) — bagel.py:937-940."""
    ts = np.linspace(1.0, 0.0, num_timesteps, dtype=np.float32)
    ts = timestep_shift * ts / (1 + (timestep_shift - 1) * ts)
    dts = ts[:-1] - ts[1:]
    return ts[:-1], dts


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_timesteps", "timestep_shift", "cfg_renorm_type",
        "cfg_renorm_min", "use_text_cfg", "use_img_cfg",
        "cfg_interval", "cfg_text_scale", "cfg_img_scale", "step_range",
    ),
)
def generate_latents(
    params: Params,
    cfg: BagelConfig,
    caches: KVCache,  # stacked streams: [L, S_cfg, Hk, M, D], S_cfg in {1,2,3}
    positions: jax.Array,  # [S_cfg] rope position per context
    latent_pos_ids: jax.Array,  # [n]
    init_noise: jax.Array,  # [n, 64]
    start_end_ids: jax.Array,  # [2]
    num_timesteps: int = 50,
    timestep_shift: float = 3.0,
    cfg_text_scale: float = 1.0,
    cfg_img_scale: float = 1.0,
    cfg_interval: Tuple[float, float] = (0.0, 1.0),
    cfg_renorm_min: float = 0.0,
    cfg_renorm_type: str = "global",
    use_text_cfg: bool = False,
    use_img_cfg: bool = False,
    step_range: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Full rectified-flow loop (bagel.py:901-1211) as one scan.

    The S_cfg cache streams are [main, cfg_text?, cfg_img?]; each step runs a
    single batched gen-mode forward over all streams (the reference runs up to
    3 sequential forwards per step — batching them is the big TPU win,
    SURVEY.md §7 hard-part 3).
    Returns final x_0 latent tokens [n, 64].

    ``step_range=(lo, hi)``: run only scan steps [lo, hi) of the static
    schedule, treating ``init_noise`` as x_t at step lo (chunked denoise for
    the serving engine — a t2i request advances a few steps between decode
    chunks instead of monopolising the chip for the whole loop). Splitting
    the schedule at any boundary composes to exactly the full run: the
    per-step math is identical, only the scan partitioning changes.
    """
    S = caches.k.shape[1]
    n = init_noise.shape[0]
    ts, dts = flow_timesteps(num_timesteps, timestep_shift)
    lo, hi = cfg_interval
    in_interval = (ts > lo) & (ts <= hi)
    text_scales = np.where(in_interval, cfg_text_scale, 1.0).astype(np.float32)
    img_scales = np.where(in_interval, cfg_img_scale, 1.0).astype(np.float32)

    se = mot.embed_tokens(params["llm"], start_end_ids)
    pos_emb = params["latent_pos_embed"][latent_pos_ids]  # [n, C]
    T = n + 2

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
        block_positions = jnp.broadcast_to(
            positions[:n_streams, None], (n_streams, T)
        )

        def step(x_t, inputs):
            t, dt, tscale, iscale = inputs
            t_emb = time_embed(params["time_embedder"], t[None])  # [1, C]
            x_lat = _linear(x_t, params["vae2llm"]) + t_emb + pos_emb  # [n, C]
            x_lat = x_lat.astype(se.dtype)
            block = jnp.concatenate([se[:1], x_lat, se[1:]], axis=0)  # [T, C]
            x = jnp.broadcast_to(block[None], (n_streams, T, block.shape[-1]))
            h, _ = mot.forward(
                params["llm"], cfg.llm, x, block_positions, step_caches,
                ForwardSpec("gen", False, False, rope_const=True),
            )
            v_all = _linear(h[:, 1 : n + 1, :], params["llm2vae"])
            v = v_all[0]
            if cfg_on:
                v_text = v_all[1] if use_text_cfg else v
                v_img = v_all[1 + int(use_text_cfg)] if use_img_cfg else v
                v = _cfg_combine(
                    v, v_text, v_img, tscale, iscale,
                    cfg_renorm_min, cfg_renorm_type, use_text_cfg, use_img_cfg,
                )
            x_t = x_t - v.astype(x_t.dtype) * dt
            return x_t, None

        return step

    # The schedule is static, so steps outside cfg_interval run a SINGLE
    # stream (the reference also skips the CFG forwards there,
    # bagel.py:945-950) — split the scan into contiguous same-mode runs.
    runs = []
    start = 0
    for i in range(1, len(ts) + 1):
        if i == len(ts) or bool(in_interval[i]) != bool(in_interval[start]):
            runs.append((start, i, bool(in_interval[start])))
            start = i

    lo_s, hi_s = step_range if step_range is not None else (0, len(ts))
    x_t = init_noise
    for run_start, run_end, cfg_on in runs:
        run_start = max(run_start, lo_s)
        run_end = min(run_end, hi_s)
        if run_start >= run_end:
            continue
        n_streams = S if (cfg_on and S > 1) else 1
        sl = slice(run_start, run_end)
        xs = (
            jnp.asarray(ts[sl]), jnp.asarray(dts[sl]),
            jnp.asarray(text_scales[sl]), jnp.asarray(img_scales[sl]),
        )
        x_t, _ = jax.lax.scan(make_step(n_streams, cfg_on and S > 1), x_t, xs)
    return x_t


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "num_timesteps", "timestep_shift", "cfg_renorm_type",
        "cfg_renorm_min", "use_text_cfg", "use_img_cfg",
        "cfg_interval", "cfg_text_scale", "cfg_img_scale", "step_range",
    ),
)
def generate_latents_group(
    params: Params,
    cfg: BagelConfig,
    caches: KVCache,  # [L, G*S1, Hk, M, D]: G images' stream blocks, g-major
    positions: jax.Array,  # [G*S1] rope position per context stream
    latent_pos_ids: jax.Array,  # [n] (same image geometry for every member)
    init_noise: jax.Array,  # [G, n, 64]
    start_end_ids: jax.Array,  # [2]
    num_timesteps: int = 50,
    timestep_shift: float = 3.0,
    cfg_text_scale: float = 1.0,
    cfg_img_scale: float = 1.0,
    cfg_interval: Tuple[float, float] = (0.0, 1.0),
    cfg_renorm_min: float = 0.0,
    cfg_renorm_type: str = "global",
    use_text_cfg: bool = False,
    use_img_cfg: bool = False,
    step_range: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """:func:`generate_latents` over G independent images IN ONE forward.

    Why: a 256px denoise step runs each MoT layer on only ~(S1*258) rows —
    small enough that the per-layer fixed overhead class (dispatch, norms,
    rope, cache concat; 1.1-1.6 ms/layer-call, docs/MULTICHIP_DENOISE.md)
    rivals the matmul time. Serving pays it once per in-flight image per
    step. Batching the G concurrent jobs' streams into one [G*S1, T] forward
    pays it ONCE per step total — the single-chip analogue of
    gen_images_grouped's "data" mesh axis (which needs G devices).

    Stream layout is g-major: [g0_main, g0_text?, g0_img?, g1_main, ...] —
    exactly G stacked copies of generate_latents' per-image layout, so
    ``caches`` is the axis-1 concat of the members' caches. Every member
    shares the schedule and CFG knobs (the serving engine only groups
    requests whose knobs and geometry match). Per-image math is untouched:
    attention streams are independent, norms/CFG renorms reduce per image
    (vmapped _cfg_combine), so the result equals running each member through
    generate_latents separately (tests/test_serving.py group parity).

    Returns final latents [G, n, 64].
    """
    G, n = init_noise.shape[:2]
    S_all = caches.k.shape[1]
    assert S_all % G == 0, (S_all, G)
    S1 = S_all // G
    ts, dts = flow_timesteps(num_timesteps, timestep_shift)
    lo, hi = cfg_interval
    in_interval = (ts > lo) & (ts <= hi)
    text_scales = np.where(in_interval, cfg_text_scale, 1.0).astype(np.float32)
    img_scales = np.where(in_interval, cfg_img_scale, 1.0).astype(np.float32)

    se = mot.embed_tokens(params["llm"], start_end_ids)
    pos_emb = params["latent_pos_embed"][latent_pos_ids]  # [n, C]
    T = n + 2

    def make_step(active: int, cfg_on: bool):
        # active streams per image: S1 inside the cfg interval, else only
        # each image's main stream (rows 0, S1, 2*S1, ... of the stack)
        if active == S1:
            step_caches = caches
            pos_act = positions
        else:
            sl = lambda x: x[:, 0::S1]
            step_caches = caches.replace(
                k=sl(caches.k), v=sl(caches.v), lens=caches.lens[0::S1],
                k_scale=None if caches.k_scale is None else sl(caches.k_scale),
                v_scale=None if caches.v_scale is None else sl(caches.v_scale),
            )
            pos_act = positions[0::S1]
        block_positions = jnp.broadcast_to(pos_act[:, None], (G * active, T))

        def step(x_t, inputs):
            t, dt, tscale, iscale = inputs
            t_emb = time_embed(params["time_embedder"], t[None])  # [1, C]
            x_lat = _linear(x_t, params["vae2llm"]) + t_emb + pos_emb  # [G,n,C]
            x_lat = x_lat.astype(se.dtype)
            se_b = jnp.broadcast_to(se[None], (G,) + se.shape)
            block = jnp.concatenate(
                [se_b[:, :1], x_lat, se_b[:, 1:]], axis=1)  # [G, T, C]
            # each image's block repeats across its `active` streams, g-major
            x = jnp.repeat(block, active, axis=0)  # [G*active, T, C]
            h, _ = mot.forward(
                params["llm"], cfg.llm, x, block_positions, step_caches,
                ForwardSpec("gen", False, False, rope_const=True),
            )
            v_all = _linear(h[:, 1 : n + 1, :], params["llm2vae"])
            v_all = v_all.reshape(G, active, n, -1)
            v = v_all[:, 0]
            if cfg_on:
                v_text = v_all[:, 1] if use_text_cfg else v
                v_img = v_all[:, 1 + int(use_text_cfg)] if use_img_cfg else v
                v = jax.vmap(
                    lambda a, b, c: _cfg_combine(
                        a, b, c, tscale, iscale, cfg_renorm_min,
                        cfg_renorm_type, use_text_cfg, use_img_cfg,
                    )
                )(v, v_text, v_img)
            x_t = x_t - v.astype(x_t.dtype) * dt
            return x_t, None

        return step

    runs = []
    start = 0
    for i in range(1, len(ts) + 1):
        if i == len(ts) or bool(in_interval[i]) != bool(in_interval[start]):
            runs.append((start, i, bool(in_interval[start])))
            start = i

    lo_s, hi_s = step_range if step_range is not None else (0, len(ts))
    x_t = init_noise
    for run_start, run_end, cfg_on in runs:
        run_start = max(run_start, lo_s)
        run_end = min(run_end, hi_s)
        if run_start >= run_end:
            continue
        active = S1 if (cfg_on and S1 > 1) else 1
        sl = slice(run_start, run_end)
        xs = (
            jnp.asarray(ts[sl]), jnp.asarray(dts[sl]),
            jnp.asarray(text_scales[sl]), jnp.asarray(img_scales[sl]),
        )
        x_t, _ = jax.lax.scan(make_step(active, cfg_on and S1 > 1), x_t, xs)
    return x_t


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "window", "num_timesteps", "timestep_shift",
        "cfg_renorm_type", "cfg_renorm_min", "use_text_cfg", "use_img_cfg",
        "cfg_interval", "cfg_text_scale", "cfg_img_scale",
    ),
)
def generate_latents_group_window(
    params: Params,
    cfg: BagelConfig,
    caches: KVCache,  # [L, G*S1, Hk, M, D] g-major (G=1 for a single job)
    positions: jax.Array,  # [G*S1]
    latent_pos_ids: jax.Array,  # [n]
    x_t: jax.Array,  # [G, n, 64] — the state at scan step ``lo``
    start_end_ids: jax.Array,  # [2]
    lo: jax.Array,  # [] int32 TRACED window start (scan-step index)
    window: int = 10,
    num_timesteps: int = 50,
    timestep_shift: float = 3.0,
    cfg_text_scale: float = 1.0,
    cfg_img_scale: float = 1.0,
    cfg_interval: Tuple[float, float] = (0.0, 1.0),
    cfg_renorm_min: float = 0.0,
    cfg_renorm_type: str = "global",
    use_text_cfg: bool = False,
    use_img_cfg: bool = False,
) -> jax.Array:
    """Dynamic-window flavor of the chunked denoise: ONE compiled program
    per (geometry, G, window) regardless of where the window sits in the
    schedule.

    Why: `generate_latents(step_range=(lo, hi))` treats the window bounds as
    STATIC, so serving's chunked denoise compiles ceil(total/steps) distinct
    programs per geometry — measured ~20 tunnel compiles (~50 min cold) for
    the unified bench's two-geometry warm-up. Here ``lo`` is a traced
    scalar: the schedule arrays are baked in (static num_timesteps/shift),
    the window's slice is a dynamic_slice, and steps past the schedule end
    are masked out, so every segment AND the tail reuse one program.

    Cost/parity contract vs the static-split path:
      * every step runs ALL S1 streams (the static path drops to 1 stream
        outside cfg_interval — the reference's own skip, bagel.py:945-950);
        the CFG combine is gated per step by the baked in-interval flag, so
        outside the interval the main stream's velocity is used UNCHANGED
        (bitwise — jnp.where selects v, not a degenerate combine). The
        extra streams cost ~(S1-1)/S1 of the single-phase steps' compute
        (9 of 50 default steps) in exchange for the 10x compile-count cut.
      * steps with lo+k >= num_timesteps-1 leave x_t untouched (masked).
    Composes to the same final latents as generate_latents /
    generate_latents_group over any window split
    (tests/test_serving.py::test_dynamic_window_matches_static).
    """
    G, n = x_t.shape[:2]
    S_all = caches.k.shape[1]
    assert S_all % G == 0, (S_all, G)
    S1 = S_all // G
    total = num_timesteps - 1
    ts, dts = flow_timesteps(num_timesteps, timestep_shift)
    ilo, ihi = cfg_interval
    in_interval = (ts > ilo) & (ts <= ihi)
    text_scales = np.where(in_interval, cfg_text_scale, 1.0).astype(np.float32)
    img_scales = np.where(in_interval, cfg_img_scale, 1.0).astype(np.float32)
    pad = window  # dynamic_slice clamps; padding keeps the tail well-defined
    ts_p = jnp.asarray(np.concatenate([ts, np.zeros(pad, np.float32)]))
    dts_p = jnp.asarray(np.concatenate([dts, np.zeros(pad, np.float32)]))
    tsc_p = jnp.asarray(
        np.concatenate([text_scales, np.ones(pad, np.float32)]))
    isc_p = jnp.asarray(np.concatenate([img_scales, np.ones(pad, np.float32)]))
    cfg_p = jnp.asarray(
        np.concatenate([in_interval, np.zeros(pad, bool)]))

    lo = jnp.asarray(lo, jnp.int32)
    sl = lambda a: jax.lax.dynamic_slice(a, (lo,), (window,))
    valid = (lo + jnp.arange(window, dtype=jnp.int32)) < total
    xs = (sl(ts_p), sl(dts_p), sl(tsc_p), sl(isc_p), sl(cfg_p), valid)

    cfg_possible = use_text_cfg and S1 > 1
    se = mot.embed_tokens(params["llm"], start_end_ids)
    pos_emb = params["latent_pos_embed"][latent_pos_ids]  # [n, C]
    T = n + 2
    block_positions = jnp.broadcast_to(positions[:, None], (G * S1, T))

    def step(x_t, inputs):
        t, dt, tscale, iscale, cfg_on, ok = inputs
        t_emb = time_embed(params["time_embedder"], t[None])  # [1, C]
        x_lat = _linear(x_t, params["vae2llm"]) + t_emb + pos_emb  # [G, n, C]
        x_lat = x_lat.astype(se.dtype)
        se_b = jnp.broadcast_to(se[None], (G,) + se.shape)
        block = jnp.concatenate(
            [se_b[:, :1], x_lat, se_b[:, 1:]], axis=1)  # [G, T, C]
        x = jnp.repeat(block, S1, axis=0)  # [G*S1, T, C]
        h, _ = mot.forward(
            params["llm"], cfg.llm, x, block_positions, caches,
            ForwardSpec("gen", False, False, rope_const=True),
        )
        v_all = _linear(h[:, 1 : n + 1, :], params["llm2vae"])
        v_all = v_all.reshape(G, S1, n, -1)
        v = v_all[:, 0]
        if cfg_possible:
            v_text = v_all[:, 1] if use_text_cfg else v
            v_img = v_all[:, 1 + int(use_text_cfg)] if use_img_cfg else v
            combined = jax.vmap(
                lambda a, b, c: _cfg_combine(
                    a, b, c, tscale, iscale, cfg_renorm_min,
                    cfg_renorm_type, use_text_cfg, use_img_cfg,
                )
            )(v, v_text, v_img)
            v = jnp.where(cfg_on, combined, v)
        nxt = x_t - v.astype(x_t.dtype) * dt
        return jnp.where(ok, nxt, x_t), None

    x_t, _ = jax.lax.scan(step, x_t, xs)
    return x_t


@partial(jax.jit, static_argnames=("cfg", "latent_h", "latent_w"))
def decode_latent_to_image(
    params: Params,
    cfg: BagelConfig,
    latent_tokens: jax.Array,  # [n, 64]
    latent_h: int,
    latent_w: int,
) -> jax.Array:
    """Unpatchify + VAE decode + denorm to uint8 HWC (inferencer.py:234-256)."""
    p = cfg.latent_patch_size
    c = cfg.latent_channel
    z = latent_tokens.reshape(latent_h, latent_w, p, p, c)
    z = jnp.einsum("hwpqc->hpwqc", z).reshape(1, latent_h * p, latent_w * p, c)
    img = vae_mod.decode(params["vae"], cfg.vae, z)  # [1, H, W, 3] in [-1,1]
    img = jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)[0] * 255.0
    return img.astype(jnp.uint8)


# ---------------------------------------------------------------------------
# training forward (reference Bagel.forward, bagel.py:202-374)
# ---------------------------------------------------------------------------

def train_forward(
    params: Params,
    cfg: BagelConfig,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    diffusion_feature_layer: "int | None" = None,
    bn_state=None,
) -> Dict[str, jax.Array]:
    """Packed multimodal training forward with CE + rectified-flow MSE losses.

    ``batch`` is one packed sequence (see data/packing.pack_training_batch):
      packed_text_ids/indexes, packed_position_ids [T],
      mask segment arrays (document/fn/noise ids [T]),
      und_idx/gen_idx (padded with T),
      vit_* (optional batched padded images + scatter indexes),
      vae_* (optional clean latent tokens + raw timesteps + scatter indexes),
      ce_idx/ce_labels/ce_weight, mse_weight.
    Returns dict(ce=..., mse=..., loss=...) of scalars (weighted means).
    """
    from unimedvl_tpu.ops.blockmask import dense_packed_mask

    if diffusion_feature_layer is None and cfg.e2e is not None:
        diffusion_feature_layer = cfg.e2e.diffusion_feature_layer

    x, stash = train_embed(params, cfg, batch, rng, bn_state=bn_state)

    mask = dense_packed_mask(
        batch["mask_document_id"], batch["mask_fn_id"], batch["mask_noise_id"]
    )
    result = mot.forward_train(
        params["llm"], cfg.llm, x, batch["packed_position_ids"], mask,
        batch["und_idx"], batch["gen_idx"],
        segments=(
            batch["mask_document_id"], batch["mask_fn_id"], batch["mask_noise_id"]
        ),
        feature_layer=diffusion_feature_layer,
    )
    if diffusion_feature_layer is not None:
        h, features = result
    else:
        h, features = result, None
    return train_losses(params, cfg, batch, h, stash, features=features)


def train_embed(
    params: Params,
    cfg: BagelConfig,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    bn_state=None,
):
    """Prologue of train_forward: assemble the packed [T, C] input embedding
    (text + ViT + noised VAE-latent scatters, reference bagel.py:229-287).
    Returns (x, stash) where stash carries what the loss epilogue needs
    (noise/clean/t_shifted/new bn_state). Split out so the pipeline-parallel
    trainer (parallel/pp_train.py) can run it per microbatch outside the
    layer pipeline."""
    T = batch["packed_position_ids"].shape[0]
    C = cfg.llm.hidden_size

    text_embed = mot.embed_tokens(params["llm"], batch["packed_text_ids"])
    x = jnp.zeros((T, C), dtype=text_embed.dtype)
    x = x.at[batch["packed_text_indexes"]].set(text_embed, mode="drop")

    # visual understanding branch (bagel.py:248-261)
    if "vit_patch_tokens" in batch:
        vit_embed = encode_vit_tokens(
            params, cfg, batch["vit_patch_tokens"], batch["vit_pos_ids"],
            batch.get("vit_valid"),
        )
        flat = vit_embed.reshape(-1, C)
        x = x.at[batch["vit_scatter_idx"]].set(flat.astype(x.dtype), mode="drop")

    # visual generation branch (bagel.py:263-287)
    noise = None
    t_shifted = None
    new_bn_state = None
    if "vae_clean_tokens" in batch:
        clean = batch["vae_clean_tokens"]  # [Nv, 64]
        if cfg.e2e is not None and cfg.e2e.enable_batch_norm and bn_state is not None:
            # latent batch-norm on the clean latents (bagel.py:230-231)
            from unimedvl_tpu.training.e2e_vae import latent_batch_norm

            clean, new_bn_state = latent_batch_norm(
                clean, bn_state, cfg.vae.z_channels, training=True,
                momentum=cfg.e2e.bn_momentum, eps=cfg.e2e.bn_eps,
            )
        t_raw = batch["vae_timesteps_raw"]  # [Nv]
        t = jax.nn.sigmoid(t_raw)
        t_shifted = cfg.timestep_shift * t / (1 + (cfg.timestep_shift - 1) * t)
        noise = jax.random.normal(rng, clean.shape, dtype=jnp.float32).astype(clean.dtype)
        x_t = (1 - t_shifted[:, None]) * clean + t_shifted[:, None] * noise
        t_emb = time_embed(params["time_embedder"], t_shifted)  # [Nv, C]
        pos_emb = params["latent_pos_embed"][batch["vae_latent_pos_ids"]]
        lat = _linear(x_t, params["vae2llm"]) + t_emb + pos_emb
        x = x.at[batch["vae_scatter_idx"]].set(lat.astype(x.dtype), mode="drop")

    stash = {
        "noise": noise,
        "t_shifted": t_shifted,
        "bn_state": new_bn_state,
        "clean": clean if "vae_clean_tokens" in batch else None,
    }
    return x, stash


def train_losses(
    params: Params,
    cfg: BagelConfig,
    batch: Dict[str, jax.Array],
    h: jax.Array,  # [T, C] post-final-norm hidden from forward_train
    stash: Dict,
    features=None,  # optional diffusion_feature_layer tap [T, C]
) -> Dict[str, jax.Array]:
    """Epilogue of train_forward: CE + rectified-flow MSE + REPA terms
    (reference bagel.py:309-374). Split out for the pipeline-parallel
    trainer; see train_embed."""
    noise = stash["noise"]
    t_shifted = stash["t_shifted"]
    new_bn_state = stash["bn_state"]
    clean = stash["clean"]

    out: Dict[str, jax.Array] = {}
    if features is not None and "vae_scatter_idx" in batch:
        # diffusion features for REPA-style alignment (bagel.py:309-331)
        out["diffusion_features"] = jnp.take(
            features, batch["vae_scatter_idx"], axis=0, mode="fill", fill_value=0
        )
    loss = jnp.asarray(0.0, jnp.float32)

    if "vae_clean_tokens" in batch:
        h_vae = jnp.take(h, batch["vae_scatter_idx"], axis=0, mode="fill", fill_value=0)
        pred = _linear(h_vae, params["llm2vae"]).astype(jnp.float32)
        # `clean` is the (optionally batch-normed) latent the noising used —
        # the flow target must match it (reference bagel.py:359-362 derives
        # the target from the same post-BN packed_latent_clean).
        target = (noise - clean).astype(jnp.float32)
        per_tok = jnp.mean(jnp.square(pred - target), axis=-1)
        w = batch["mse_weight"].astype(jnp.float32) * (t_shifted > 0)
        mse = jnp.sum(per_tok * w) / jnp.maximum(jnp.sum(w), 1.0)
        out["mse"] = mse
        loss = loss + mse

    if (
        cfg.e2e is not None
        and "repa_teacher_features" in batch
        and "diffusion_features" in out
        and "repa_proj" in params
    ):
        # REPA-style alignment of mid-layer diffusion features vs the frozen
        # teacher (coefficients from the reference's e2e config, bagel.py:63-83)
        from unimedvl_tpu.training.e2e_vae import repa_alignment_loss

        align = repa_alignment_loss(
            out["diffusion_features"],
            batch["repa_teacher_features"],
            params["repa_proj"],
            weight=batch.get("mse_weight"),
            alignment_type=cfg.e2e.repa_alignment_type,
        )
        out["repa_align"] = align
        loss = loss + cfg.e2e.repa_diffusion_coeff * align

    if (
        cfg.e2e is not None
        and "repa_teacher_features" in batch
        and "vae_clean_tokens" in batch
        and "repa_vae_proj" in params
    ):
        # VAE-side alignment (REPA-E style, consuming the reference's
        # repa_vae_coeff knob, bagel.py:69): align the latent representation
        # itself with the teacher. `clean` is post-BN, so this matches what
        # the flow path sees; the gradient flows into the latents, reaching
        # the VAE encoder whenever they are traced through it.
        from unimedvl_tpu.training.e2e_vae import repa_alignment_loss

        vae_align = repa_alignment_loss(
            clean,
            batch["repa_teacher_features"],
            params["repa_vae_proj"],
            weight=batch.get("mse_weight"),
            alignment_type=cfg.e2e.repa_alignment_type,
        )
        out["repa_vae_align"] = vae_align
        loss = loss + cfg.e2e.repa_vae_coeff * vae_align

    if new_bn_state is not None:
        out["bn_state"] = new_bn_state

    if "ce_idx" in batch:
        h_ce = jnp.take(h, batch["ce_idx"], axis=0, mode="fill", fill_value=0)
        logits = mot.lm_head(params["llm"], h_ce)  # fp32 [Nc, V]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch["ce_labels"][:, None], axis=-1)[:, 0]
        w = batch["ce_weight"].astype(jnp.float32)
        ce = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
        out["ce"] = ce
        loss = loss + ce

    out["loss"] = loss
    return out


# ---------------------------------------------------------------------------
# initialisation
# ---------------------------------------------------------------------------

def init_params(
    key: jax.Array, cfg: BagelConfig, dtype=jnp.float32, llm2vae_zero: bool = True
) -> Params:
    keys = jax.random.split(key, 10)
    C = cfg.llm.hidden_size
    params: Params = {"llm": mot.init_params(keys[0], cfg.llm, dtype)}

    if cfg.visual_und and cfg.vit is not None:
        params["vit"] = siglip.init_params(keys[1], cfg.vit, dtype)
        vh = cfg.vit.hidden_size
        params["connector"] = {
            "fc1": mot._init_linear(keys[2], vh, C, dtype, bias=True),
            "fc2": mot._init_linear(keys[3], C, C, dtype, bias=True),
        }
        params["vit_pos_embed"] = jnp.asarray(
            get_2d_sincos_pos_embed(C, cfg.vit_max_num_patch_per_side), dtype
        )

    if cfg.visual_gen and cfg.vae is not None:
        params["vae"] = vae_mod.init_params(keys[4], cfg.vae, dtype)
        pd = cfg.patch_latent_dim
        params["vae2llm"] = mot._init_linear(keys[5], pd, C, dtype, bias=True)
        llm2vae = mot._init_linear(keys[6], C, pd, dtype, bias=True)
        if llm2vae_zero:  # bagel.py:156-159
            llm2vae = jax.tree.map(jnp.zeros_like, llm2vae)
        params["llm2vae"] = llm2vae
        params["time_embedder"] = {
            "fc1": mot._init_linear(keys[7], 256, C, dtype, bias=True),
            "fc2": mot._init_linear(keys[8], C, C, dtype, bias=True),
        }
        params["latent_pos_embed"] = jnp.asarray(
            get_2d_sincos_pos_embed(C, cfg.max_latent_size), dtype
        )

    if cfg.e2e is not None:
        from unimedvl_tpu.training.e2e_vae import init_repa_params

        k_d, k_v = jax.random.split(keys[9])
        params["repa_proj"] = init_repa_params(k_d, C, cfg.e2e, dtype)
        if cfg.visual_gen and cfg.vae is not None:
            # VAE-side alignment projection: latent tokens -> teacher dim
            params["repa_vae_proj"] = init_repa_params(
                k_v, cfg.patch_latent_dim, cfg.e2e, dtype
            )
    return params

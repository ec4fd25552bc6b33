"""Continuous-batching decode engine for batched VQA / report-generation
serving (BASELINE config 3). The reference has nothing comparable — it decodes
one request per Python loop (bagel.py:1259-1314).

Design: a fixed pool of S slots over one multi-stream KVCache. Requests are
admitted into free slots (per-slot prefill via slot views), and decoding runs
in jitted CHUNKS of K steps between host syncs — the per-step host roundtrip
would otherwise dominate on a remote TPU. Requests finishing mid-chunk waste
at most K-1 steps; their slots are recycled with lens reset (stale cache
contents are overwritten and never attended).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from unimedvl_tpu.config import BagelConfig
from unimedvl_tpu.data.imaging import (
    ImageTransform,
    compute_resize_shape,
    pil_img2rgb,
    position_ids_extrapolate,
)
from unimedvl_tpu.models import bagel, qwen2_mot as mot
from unimedvl_tpu.models.qwen2_mot import ForwardSpec, KVCache


@partial(jax.jit, donate_argnums=(0,))
def group_store(cache: KVCache, block: KVCache, slots: jax.Array) -> KVCache:
    """Scatter a P-stream prefill block (small capacity Tc, column 0) into the
    slot pool in ONE dispatch. ``slots[i] >= num_slots`` drops row i (padding
    rows of a partially filled group)."""
    Tc = block.k.shape[3]

    def up(x, y):
        return x.at[:, slots, :, :Tc].set(y.astype(x.dtype), mode="drop")

    return KVCache(
        k=up(cache.k, block.k),
        v=up(cache.v, block.v),
        lens=cache.lens.at[slots].set(block.lens, mode="drop"),
        k_scale=None if cache.k_scale is None else up(cache.k_scale, block.k_scale),
        v_scale=None if cache.v_scale is None else up(cache.v_scale, block.v_scale),
    )


@jax.jit
def repack_pool(cache: KVCache, perm: jax.Array) -> KVCache:
    """Gather slot rows into a (possibly different-sized) pool: new slot i
    takes old slot ``perm[i]``; ``perm[i] < 0`` yields a fresh row (lens 0,
    values left stale — never attended). One compiled program per
    (old_S, new_S) shape pair; the pool ladder visits only a handful.

    This is the drain-tail rightsizing move: decode cost per step has a
    per-slot component (cache reads + activation rows), so once most
    requests have finished, chunking over the full pool wastes it on dead
    slots. Compact the live rows to a prefix and shrink the pool to the
    next ladder rung instead."""
    src = jnp.maximum(perm, 0)

    def take(a):
        return jnp.take(a, src, axis=1)

    lens = jnp.where(perm >= 0, jnp.take(cache.lens, src), 0)
    return KVCache(
        k=take(cache.k),
        v=take(cache.v),
        lens=lens.astype(cache.lens.dtype),
        k_scale=None if cache.k_scale is None else take(cache.k_scale),
        v_scale=None if cache.v_scale is None else take(cache.v_scale),
    )


@jax.jit
def seed_prefix_block(block: KVCache, prefix: KVCache, tp) -> KVCache:
    """Broadcast a 1-stream prefix KV cache into the leading columns of
    every row of a fresh admission block — ONE device op per admission
    group (the shared-preamble alternative to re-prefilling the preamble
    for every request). ``tp`` (traced int32): valid prefix length; columns
    beyond it hold the prefix block's padding and are overwritten by the
    suffix prefill / decode appends before they can ever be attended."""
    P = block.k.shape[1]

    def put(b, p):
        rep = jnp.broadcast_to(p, p.shape[:1] + (P,) + p.shape[2:])
        return jax.lax.dynamic_update_slice(
            b, rep.astype(b.dtype), (0,) * b.ndim
        )

    return KVCache(
        k=put(block.k, prefix.k),
        v=put(block.v, prefix.v),
        lens=jnp.full((P,), tp, jnp.int32),
        k_scale=None if block.k_scale is None
        else put(block.k_scale, prefix.k_scale),
        v_scale=None if block.v_scale is None
        else put(block.v_scale, prefix.v_scale),
    )


@partial(jax.jit, static_argnames=("cfg", "num_steps"), donate_argnums=(2,))
def decode_chunk(
    params,
    cfg: BagelConfig,
    cache: KVCache,
    cur_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    active: jax.Array,  # [S] bool
    num_steps: int,
    rng: jax.Array,
    do_sample: bool = False,
    temperature: float = 1.0,
    eos: Optional[jax.Array] = None,  # [] int32; enables early chunk exit
) -> Tuple[jax.Array, jax.Array, jax.Array, KVCache]:
    """Run UP TO K decode steps for all slots. Inactive slots are masked out
    of cache-length accounting via q_valid. When ``eos`` is given the chunk
    exits early once EVERY active slot has emitted it (a chunk whose requests
    all finish at step 1 costs 1 step, not K — the convoy only persists while
    some slot still runs). Returns (tokens [S, K], last [S], positions [S],
    cache); steps after the exit stay zero-filled and are never read by the
    host (it stops at each slot's eos)."""

    S = cur_tokens.shape[0]

    def step_body(carry):
        i, cur, pos, cache, rng, fin, buf = carry
        x = mot.embed_tokens(params["llm"], cur)[:, None, :]
        h, cache = mot.forward(
            params["llm"], cfg.llm, x, pos[:, None], cache,
            ForwardSpec("und", True, True), q_valid=active[:, None],
        )
        logits = mot.lm_head(params["llm"], h[:, 0])
        rng, sub = jax.random.split(rng)
        if do_sample:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        pos = jnp.where(active, pos + 1, pos)
        if eos is not None:
            fin = fin | (nxt == eos)
        buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, i, axis=0)
        return i + 1, nxt, pos, cache, rng, fin, buf

    def cond(carry):
        i, _, _, _, _, fin, _ = carry
        more = i < num_steps
        if eos is not None:
            more = more & ~jnp.all(fin | ~active)
        return more

    buf0 = jnp.zeros((num_steps, S), jnp.int32)
    fin0 = jnp.zeros((S,), bool)
    _, last, pos, cache, _, _, tokens = jax.lax.while_loop(
        cond, step_body,
        (jnp.asarray(0, jnp.int32), cur_tokens, positions, cache, rng, fin0, buf0),
    )
    return tokens.T, last, pos, cache  # [S, K]


def _compact_band(
    orig: KVCache,
    wk: KVCache,
    base: jax.Array,
    k_static: int,
    lens0: jax.Array,
    active: jax.Array,
    n_steps: jax.Array,
) -> KVCache:
    """Move the aligned decode band [base, base+k) back to each stream's
    contiguous position [lens0[s], lens0[s]+k) with ONE windowed scatter per
    array — the chunk-level amortization of the per-step element scatter
    (0.84 ms/scatter at S=256, x2 arrays x28 layers x k steps per chunk).

    ``wk`` holds the post-loop arrays (band written; scales column-major
    [L, Hk, M, S] — see mot._update_kv_col); ``orig`` provides the row-major
    scale arrays whose context region the loop never touched. Inactive
    streams scatter to an out-of-range column and are dropped whole
    (FILL_OR_DROP). Garbage beyond lens0[s] + n_steps lands inside the
    window when the chunk exits early, but an early exit means every active
    stream finished (slots recycled; stale cache is never attended)."""
    S = lens0.shape[0]
    M = orig.capacity
    col = jnp.where(active, lens0, M + 1).astype(jnp.int32)
    idx = jnp.stack([jnp.arange(S, dtype=jnp.int32), col], axis=1)

    def move_vals(arr):
        band = jax.lax.dynamic_slice_in_dim(arr, base, k_static, axis=3)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3, 4),  # (L, Hk, k, D) windows
            inserted_window_dims=(1,),
            scatter_dims_to_operand_dims=(1, 3),
        )
        return jax.lax.scatter(
            arr, idx, band.transpose(1, 0, 2, 3, 4), dnums,
            indices_are_sorted=True, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )

    def move_scales(row_major, cm):
        band = jax.lax.dynamic_slice_in_dim(cm, base, k_static, axis=2)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2, 3),  # (L, Hk, k) windows
            inserted_window_dims=(1,),
            scatter_dims_to_operand_dims=(1, 3),
        )
        return jax.lax.scatter(
            row_major, idx, band.transpose(3, 0, 1, 2), dnums,
            indices_are_sorted=True, unique_indices=True,
            mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
        )

    new_lens = jnp.where(active, lens0 + n_steps, lens0)
    return KVCache(
        k=move_vals(wk.k),
        v=move_vals(wk.v),
        lens=new_lens.astype(lens0.dtype),
        k_scale=None if orig.k_scale is None
        else move_scales(orig.k_scale, wk.k_scale),
        v_scale=None if orig.v_scale is None
        else move_scales(orig.v_scale, wk.v_scale),
    )


@partial(jax.jit, static_argnames=("cfg", "num_steps"), donate_argnums=(2,))
def decode_chunk_aligned(
    params,
    cfg: BagelConfig,
    cache: KVCache,
    cur_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    active: jax.Array,  # [S] bool
    num_steps: int,
    rng: jax.Array,
    do_sample: bool = False,
    temperature: float = 1.0,
    eos: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, KVCache]:
    """:func:`decode_chunk` with the aligned-column write inside the chunk:
    every stream writes step d's kv at column base+d (base = max active
    lens; one dense dus per layer — bagel.generate_text's trick), then ONE
    windowed scatter per array moves the band to each stream's contiguous
    tail (:func:`_compact_band`), so the returned cache keeps decode_chunk's
    contiguous-cache contract and chunks of either flavor interleave freely.

    Replaces k x 2 x L per-row element scatters per chunk (the serving
    engine's decode tax — 0.84 ms each at S=256) with 2 x L dense column
    writes per step plus 4 windowed scatters per chunk. int8 caches carry
    their scales column-major during the loop (mot._update_kv_col RMW fix).

    CONTRACT: max(lens[active]) + num_steps <= capacity — the band must fit
    above every stream (ContinuousBatcher gates on its host-side kv extent
    and falls back to :func:`decode_chunk` near capacity). Column order
    within the softmax reduction differs from decode_chunk (band vs in-place
    columns), so logits can differ by float-rounding ULPs; greedy tokens
    agree except on exact argmax ties."""
    S = cur_tokens.shape[0]
    lens0 = cache.lens
    base = jnp.max(jnp.where(active, lens0, 0)).astype(jnp.int32)
    scales_cm = cache.quantized
    wk = cache
    if scales_cm:
        wk = KVCache(
            k=cache.k, v=cache.v, lens=lens0,
            k_scale=jnp.transpose(cache.k_scale, (0, 2, 3, 1)),
            v_scale=jnp.transpose(cache.v_scale, (0, 2, 3, 1)),
        )

    def step_body(carry):
        i, cur, pos, wk, rng, fin, buf = carry
        x = mot.embed_tokens(params["llm"], cur)[:, None, :]
        h, wk = mot.forward(
            params["llm"], cfg.llm, x, pos[:, None], wk,
            ForwardSpec("und", True, True),
            decode_cols=(base, base + i), scales_cm=scales_cm,
        )
        logits = mot.lm_head(params["llm"], h[:, 0])
        rng, sub = jax.random.split(rng)
        if do_sample:
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        pos = jnp.where(active, pos + 1, pos)
        if eos is not None:
            fin = fin | (nxt == eos)
        buf = jax.lax.dynamic_update_index_in_dim(buf, nxt, i, axis=0)
        return i + 1, nxt, pos, wk, rng, fin, buf

    def cond(carry):
        i, _, _, _, _, fin, _ = carry
        more = i < num_steps
        if eos is not None:
            more = more & ~jnp.all(fin | ~active)
        return more

    buf0 = jnp.zeros((num_steps, S), jnp.int32)
    fin0 = jnp.zeros((S,), bool)
    n_steps, last, pos, wk, _, _, tokens = jax.lax.while_loop(
        cond, step_body,
        (jnp.asarray(0, jnp.int32), cur_tokens, positions, wk, rng, fin0, buf0),
    )
    new_cache = _compact_band(cache, wk, base, num_steps, lens0, active, n_steps)
    return tokens.T, last, pos, new_cache  # [S, K]


@partial(
    jax.jit,
    static_argnames=("cfg", "num_iters", "k_draft", "ngram"),
    donate_argnums=(2,),
)
def decode_chunk_spec(
    params,
    cfg: BagelConfig,
    cache: KVCache,
    cur_tokens: jax.Array,  # [S]
    positions: jax.Array,  # [S]
    active: jax.Array,  # [S] bool
    budget: jax.Array,  # [S] int32: max tokens this chunk (slot remaining cap)
    hist: jax.Array,  # [S, HL] int32 id history (prompt + emitted)
    hlen: jax.Array,  # [S]
    num_iters: int,
    eos: jax.Array,  # [] int32
    k_draft: int = 7,
    ngram: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array,
           KVCache, jax.Array, jax.Array]:
    """Speculative decode chunk: up to ``num_iters`` prompt-lookup verify
    forwards ([S, k_draft+1] each), emitting 1..k_draft+1 GREEDY-exact tokens
    per active slot per iteration (speculative continuous batching; same
    acceptance algebra as bagel.generate_text_spec). Keeps decode_chunk's
    pending-token contract — the returned ``last`` token's kv is NOT yet in
    the cache; the next chunk (spec or plain) forwards it — so chunks need no
    fixup forward and the two chunk flavors interleave freely.

    Slots freeze (no lens/pos advance) once they emit ``budget`` tokens or
    eos (``fin``); the chunk exits early when none is live. Returns
    (tokens [S, num_iters*(k+1)], counts [S], fin [S], last [S],
    positions [S], cache, hist, hlen) — tokens[:counts] contain NO eos,
    ``fin`` tells the host the stop reason.
    """
    S = cur_tokens.shape[0]
    K = k_draft
    W = num_iters * (K + 1)

    out0 = jnp.zeros((S, W + K + 1), jnp.int32)  # windowed-write margin

    def cond(state):
        it, fin, cursor, *_ = state
        live = active & ~fin & (cursor < budget)
        return (it < num_iters) & jnp.any(live)

    def body(state):
        it, fin, cursor, cur, pos, cache, out, hist, hlen = state
        live = active & ~fin & (cursor < budget)
        draft = bagel.propose_drafts(hist, hlen, ngram, K)
        block = jnp.concatenate([cur[:, None], draft], axis=1)
        x = mot.embed_tokens(params["llm"], block)
        block_pos = pos[:, None] + jnp.arange(K + 1)[None, :]
        lens = cache.lens
        h, cache = mot.forward(
            params["llm"], cfg.llm, x, block_pos, cache,
            ForwardSpec("und", True, True),
            q_valid=jnp.broadcast_to(live[:, None], (S, K + 1)),
        )
        logits = mot.lm_head(params["llm"], h.reshape(S * (K + 1), -1))
        g = jnp.argmax(logits, axis=-1).reshape(S, K + 1).astype(jnp.int32)

        matched = draft == g[:, :-1]
        c = 1 + jnp.sum(jnp.cumprod(matched.astype(jnp.int32), axis=1), axis=1)
        idxs = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        is_eos = (g == eos) & (idxs < c[:, None])
        e = jnp.min(jnp.where(is_eos, idxs, K + 1), axis=1)
        E = jnp.where(live, jnp.minimum(jnp.minimum(c, e), budget - cursor), 0)
        fin = fin | (live & (e < c) & (e <= E))

        emit = jnp.where(idxs < E[:, None], g, -1)
        out = bagel._scatter_row_window(out, emit, cursor)
        hist = bagel._scatter_row_window(
            hist, jnp.where(idxs < E[:, None], g, 0), hlen
        )
        # live & E==0 is the immediate-eos case (e == 0): the pending cur's
        # kv was written and consumed even though nothing was emitted
        new_lens = lens + jnp.where(live, jnp.maximum(E, 1), 0)
        cache = cache.replace(lens=new_lens)
        cur = jnp.where(
            E >= 1,
            jnp.take_along_axis(g, jnp.maximum(E - 1, 0)[:, None], 1)[:, 0],
            cur,
        )
        return (it + 1, fin, cursor + E, cur, pos + E, cache, out,
                hist, hlen + E)

    fin0 = jnp.zeros((S,), bool)
    cursor0 = jnp.zeros((S,), jnp.int32)
    (_, fin, counts, last, pos, cache, out, hist, hlen) = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), fin0, cursor0,
         cur_tokens.astype(jnp.int32), positions.astype(jnp.int32),
         cache, out0, hist, hlen),
    )
    return out[:, :W], counts, fin, last, pos, cache, hist, hlen


@dataclasses.dataclass
class _Slot:
    request_id: Optional[int] = None
    cur_token: int = 0
    position: int = 0
    remaining: int = 0
    out_ids: List[int] = dataclasses.field(default_factory=list)
    #: host mirror of the slot's device cache lens (kv extent): set to the
    #: planned kv_len at admission, advanced by the chunk length while the
    #: slot survives a chunk. Gates decode_chunk_aligned (which needs
    #: max(live kv_len) + chunk <= capacity).
    kv_len: int = 0


@dataclasses.dataclass
class Request:
    prompt: str
    image: Optional[Image.Image] = None
    max_new_tokens: int = 128
    #: t2i request: generate an (H, W) image from ``prompt`` instead of text.
    #: Needs ContinuousBatcher(pipeline=...); the result value is a PIL Image.
    image_size: Optional[Tuple[int, int]] = None
    #: optional knob overrides for the denoise (cfg_text_scale, num_timesteps,
    #: ... — anything start_gen_job accepts)
    gen_params: Optional[Dict] = None
    #: shared-preamble KV reuse: id from ContinuousBatcher.register_prefix.
    #: Admission seeds the slot cache with the precomputed prefix KV and
    #: prefills ONLY [encode(prompt) + eos] at positions after it. Text-only
    #: requests (no image / image_size) for now.
    prefix_id: Optional[int] = None


class ContinuousBatcher:
    def __init__(
        self,
        params,
        cfg: BagelConfig,
        tokenizer,
        new_token_ids: Dict[str, int],
        num_slots: int = 8,
        capacity: int = 4096,
        chunk: int = 16,
        vit_transform: Optional[ImageTransform] = None,
        seed: int = 0,
        mesh=None,
        kv_quantized: bool = False,
        kv_bits: int = 8,
        spec_decode: bool = False,
        spec_k: int = 7,
        spec_ngram: int = 3,
        pipeline=None,
        gen_chunk: int = 10,
        gen_group: int = 4,
        pool_ladder: bool = False,
        min_pool: int = 32,
    ):
        """``mesh``: optional jax.sharding.Mesh with ("data", "model") axes —
        the same product wiring as InterleaveInferencer(mesh=...): params are
        placed under their TP NamedShardings, the slot-pool KV cache is
        sharded (slots over "data" when divisible, kv heads over "model" when
        divisible), and every device program runs under the mesh. Replaces the
        reference's accelerate device_map placement
        (interactive_vqa_inferencer.py:163-189) for the batched-eval path.

        ``spec_decode``: speculative continuous batching — decode chunks run
        ``decode_chunk_spec`` (prompt-lookup drafts, ``spec_k`` verified per
        forward, GREEDY-exact per slot). Report-style outputs that echo
        prompt/context n-grams decode several tokens per weight pass.

        ``pipeline``: an InterleaveInferencer over the SAME param tree —
        enables UNIFIED serving: Request(image_size=(H, W)) requests denoise
        in ``gen_chunk``-step segments interleaved with the text decode
        chunks (pipeline.GenImageJob), so one engine serves both report
        generation and image generation fairly. The reference runs these as
        separate one-at-a-time scripts (interactive_vqa_inferencer.py /
        interactive_image_generator.py).

        ``pool_ladder``: drain-tail pool rightsizing — when occupancy +
        backlog fit a smaller power-of-two rung (halvings of ``num_slots``
        down to ``min_pool``), live slots are compacted to a prefix and the
        cache pool physically shrinks (:func:`repack_pool`), so the tail of
        a batch decodes over a pool sized to the work left instead of
        ``num_slots`` dead rows; it grows back a rung ahead of admission.
        Each rung compiles its own chunk program — warm every rung you will
        serve (the bench does a full-pool warm-up pass). Not yet composed
        with ``mesh``/``spec_decode``."""
        self.mesh = mesh
        if mesh is not None:
            from unimedvl_tpu.weights.bagel_loader import place_params

            params = place_params(params, cfg, mesh)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.new_token_ids = new_token_ids
        self.num_slots = num_slots
        self.chunk = chunk
        #: max images per batched prefill dispatch (and per-round admission
        #: cap while decode is in flight — prefill/decode alternation)
        self._img_group = 8
        #: text-only admission block rows (FIXED P per _admit_text_block).
        #: Bigger than _img_group: a [32, T_max] text prefill still costs
        #: ~a decode step, and the cold 128-slot admission drops from 16 to
        #: 4 tunnel dispatches (admit_s was 0.84 s of a 4.4 s serving run).
        self._txt_group = 32
        self.vit_transform = vit_transform
        dtype = params["llm"]["norm"]["scale"].dtype
        # kv_quantized: int8 slot-pool cache (halves decode cache traffic and
        # memory; pairs with int8 weights + fused projections for serving).
        # kv_bits=4: int4 values (quarter traffic, further accuracy step).
        self.cache = self._place_cache(KVCache.create(
            cfg.llm.num_hidden_layers, num_slots, capacity,
            cfg.llm.num_key_value_heads, cfg.llm.head_dim, dtype,
            quantized=kv_quantized, kv_bits=kv_bits,
        ))
        self.capacity = capacity
        self.spec_decode = spec_decode
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        if spec_decode:
            # per-slot id history (prompt + emitted) for prompt-lookup
            # drafts; rows rewritten at admission, appended on device
            self._hist = jnp.zeros((num_slots, capacity), jnp.int32)
            self._hlen = jnp.zeros((num_slots,), jnp.int32)
        self.slots = [_Slot() for _ in range(num_slots)]
        #: registered shared-preamble KV blocks: [(KVCache S=1, Tp, ids)]
        self._prefixes: List[Tuple[KVCache, int, List[int]]] = []
        self.pool_ladder = pool_ladder
        if pool_ladder:
            assert mesh is None, "pool_ladder + sharded cache not composed yet"
            assert not spec_decode, "pool_ladder + spec_decode not composed yet"
        #: current physical pool size (slot axis of self.cache); only slots
        #: [0, pool) are admissible. Without the ladder it stays num_slots.
        self.pool = num_slots
        rungs = {num_slots}
        if pool_ladder:
            r = num_slots
            while r // 2 >= max(1, min_pool):
                r //= 2
                rungs.add(r)
        self._rungs = sorted(rungs)
        self._rng = jax.random.PRNGKey(seed)
        self._next_id = 0
        self._pending: List[Tuple[int, Request]] = []
        self.pipeline = pipeline
        self.gen_chunk = gen_chunk
        self._gen_pending: List[Tuple[int, Request]] = []
        self._gen_ready: List[Tuple[int, object]] = []  # started, ungrouped
        self._gen_job = None  # (List[rid], GenImageJob) in flight
        self.gen_group = gen_group
        self._done: Dict[int, object] = {}  # str (text) or PIL Image (t2i)
        #: per-request failures (rejections, prefill errors) — a failed
        #: request never kills the batch; run() raises only for engine bugs
        self.errors: Dict[int, str] = {}
        #: run() phase breakdown (seconds / counts), reset per run(): where
        #: does the engine tax go — admission prefills, decode chunks, or
        #: host syncs? (SERVING_BENCH diagnostics)
        self.stats: Dict[str, float] = {}

    # -- mesh -----------------------------------------------------------------
    def _mesh_ctx(self):
        from contextlib import nullcontext

        return jax.set_mesh(self.mesh) if self.mesh is not None else nullcontext()

    def _place_cache(self, cache: KVCache) -> KVCache:
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        ds = "data" if self.num_slots % self.mesh.shape["data"] == 0 else None
        ms = (
            "model"
            if self.cfg.llm.num_key_value_heads % self.mesh.shape["model"] == 0
            else None
        )
        spec = KVCache(
            k=P(None, ds, ms, None, None), v=P(None, ds, ms, None, None),
            lens=P(ds),
            k_scale=None if cache.k_scale is None else P(None, ds, ms, None),
            v_scale=None if cache.v_scale is None else P(None, ds, ms, None),
        )
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), cache, spec
        )

    # -- pool ladder ----------------------------------------------------------
    def _rung(self, want: int) -> int:
        """Smallest ladder rung that fits ``want`` live slots (num_slots cap)."""
        for r in self._rungs:
            if r >= want:
                return r
        return self.num_slots

    def _repack(self, target: int) -> None:
        """Compact live slots to a prefix and resize the pool to ``target``
        (ONE device gather, :func:`repack_pool`). Host slot state moves with
        its row; freed rows become fresh slots."""
        import time as _time

        t0 = _time.perf_counter()
        actives = [
            i for i in range(self.pool) if self.slots[i].request_id is not None
        ]
        assert len(actives) <= target, (len(actives), target)
        perm = np.full((target,), -1, np.int32)
        perm[: len(actives)] = actives
        with self._mesh_ctx():
            self.cache = repack_pool(self.cache, jnp.asarray(perm))
        new_slots = [self.slots[i] for i in actives]
        new_slots += [_Slot() for _ in range(self.num_slots - len(new_slots))]
        self.slots = new_slots
        self.pool = target
        if self.stats:
            self.stats["repacks"] = self.stats.get("repacks", 0) + 1
            self.stats["repack_s"] = (
                self.stats.get("repack_s", 0.0) + _time.perf_counter() - t0)

    def register_prefix(self, text: str) -> int:
        """Precompute the KV cache of a shared prompt PREAMBLE once (system
        prompt, report template, few-shot header); requests carrying the
        returned id (``Request(prefix_id=...)``) prefill only their own
        suffix, with the preamble KV seeded into their admission block by
        ONE broadcast (:func:`seed_prefix_block`) per group — the serving
        analogue of the pipeline's kept contexts (pipeline.py context ops).

        Token semantics: a prefixed request decodes over
        ``[bos] + encode(prefix) + encode(prompt) + [eos]``. Byte-level BPE
        may tokenize the CONCATENATION differently across the join, so end
        the prefix at a natural boundary (whitespace / newline / special
        token) if byte parity with an unsplit prompt matters; prefixed and
        unprefixed runs of the same token split are byte-identical
        (tests/test_serving.py::TestPrefixCache)."""
        ids = ([self.new_token_ids["bos_token_id"]]
               + self.tokenizer.encode(text))
        Tp = len(ids)
        Tp_pad = max(32, ((Tp + 31) // 32) * 32)
        llm = self.cfg.llm
        dtype, quantized = self._block_dtype_quant()
        pad_ids = np.zeros((1, Tp_pad), np.int32)
        pad_ids[0, :Tp] = ids
        pos = np.broadcast_to(np.arange(Tp_pad, dtype=np.int32), (1, Tp_pad))
        valid = np.zeros((1, Tp_pad), bool)
        valid[0, :Tp] = True
        with self._mesh_ctx():
            block = KVCache.create(
                llm.num_hidden_layers, 1, Tp_pad, llm.num_key_value_heads,
                llm.head_dim, dtype, quantized=quantized,
                kv_bits=self._kv_bits,
            )
            block = bagel.prefill_text(
                self.params, self.cfg, block, jnp.asarray(pad_ids),
                jnp.asarray(pos), jnp.asarray(valid),
            )
        self._prefixes.append((block, Tp, ids))
        return len(self._prefixes) - 1

    def submit(self, request: Request) -> int:
        rid = self._next_id
        self._next_id += 1
        if request.image_size is not None:
            if self.pipeline is None:
                self.errors[rid] = (
                    "t2i request needs ContinuousBatcher(pipeline=...) "
                    "(rejected before any device work)"
                )
            else:
                self._gen_pending.append((rid, request))
        else:
            self._pending.append((rid, request))
        return rid

    def cancel(self, rid: int) -> bool:
        """Cancel a submitted request (single-threaded engine API — from the
        HTTP daemon use ServingDaemon.cancel, which routes through the loop
        thread). Pending requests are dropped before any device work; an
        in-flight text slot is freed at the next chunk boundary (tokens its
        current chunk already produced are discarded); an in-flight t2i job
        is aborted mid-schedule. The rid lands in ``errors`` as cancelled.
        Returns False if the request already finished (result stays)."""
        for queue in (self._pending, self._gen_pending):
            for i, (r, _req) in enumerate(queue):
                if r == rid:
                    del queue[i]
                    self.errors[rid] = "cancelled before start"
                    return True
        for slot in self.slots:
            if slot.request_id == rid:
                slot.request_id = None  # slot pool lens are rewritten on reuse
                self.errors[rid] = "cancelled mid-decode"
                return True
        for i, (r, _job) in enumerate(self._gen_ready):
            if r == rid:
                del self._gen_ready[i]
                self.errors[rid] = "cancelled before denoise"
                return True
        if self._gen_job is not None and rid in self._gen_job[0]:
            rids, job = self._gen_job
            live = [r for r in rids if r is not None and r != rid]
            if live:
                # grouped job: the denoise keeps running for the other
                # members; this member's image is dropped at finish
                self._gen_job = ([None if r == rid else r for r in rids], job)
            else:
                self._gen_job = None
            self.errors[rid] = "cancelled mid-denoise"
            return True
        return False

    # -- t2i ------------------------------------------------------------------
    def _start_gen(self, request: Request):
        """Context recipe = InterleaveInferencer.interleave_inference for a
        text->image request (cfg_text stream forks BEFORE the prompt, cfg_img
        stream carries the prompt)."""
        pipe = self.pipeline
        gen_context = pipe.init_gen_context()
        cfg_img_context = gen_context.fork()
        cfg_text_context = gen_context.fork()
        gen_context = pipe.update_context_text(request.prompt, gen_context)
        cfg_img_context = pipe.update_context_text(request.prompt, cfg_img_context)
        kw = dict(cfg_text_scale=3.0)  # interleave_inference defaults
        kw.update(request.gen_params or {})
        return pipe.start_gen_job(
            request.image_size, gen_context,
            cfg_text_precontext=cfg_text_context,
            cfg_img_precontext=cfg_img_context, **kw,
        )

    def _group_compatible(self, a, b) -> bool:
        """merge_gen_jobs' preconditions as a predicate (serving groups only
        requests whose geometry, knobs, and context-cache shape line up)."""
        return (a.image_shape == b.image_shape and a.kw == b.kw
                and a.step == b.step and a.total_steps == b.total_steps
                and a.caches.k.shape == b.caches.k.shape)

    def _advance_gen(self):
        """Advance the in-flight t2i work by one gen_chunk segment; finalise
        with the VAE decode when the schedule completes. Per-request failures
        land in ``errors``.

        Up to ``gen_group`` pending jobs with matching geometry/knobs fuse
        into ONE grouped job (pipeline.merge_gen_jobs): a 256px denoise step
        is fixed-overhead-bound per layer call, so G concurrent images in one
        forward cost far less than G sequential schedules
        (bagel.generate_latents_group). Started-but-incompatible jobs wait in
        ``_gen_ready`` and form their own group next."""
        if self._gen_job is None and (self._gen_ready or self._gen_pending):
            # start pending requests (prefill) until a group's worth is ready
            while self._gen_pending and len(self._gen_ready) < self.gen_group:
                rid, req = self._gen_pending.pop(0)
                try:
                    self._gen_ready.append((rid, self._start_gen(req)))
                except Exception as e:
                    self.errors[rid] = f"t2i prefill failed: {e}"
            if self._gen_ready:
                lead_rid, lead = self._gen_ready.pop(0)
                rids, jobs = [lead_rid], [lead]
                rest = []
                for rid, job in self._gen_ready:
                    if (len(jobs) < self.gen_group
                            and self._group_compatible(lead, job)):
                        rids.append(rid)
                        jobs.append(job)
                    else:
                        rest.append((rid, job))
                self._gen_ready = rest
                merged = (self.pipeline.merge_gen_jobs(jobs)
                          if len(jobs) > 1 else lead)
                self._gen_job = (rids, merged)
        if self._gen_job is None:
            return
        rids, job = self._gen_job
        try:
            job = self.pipeline.advance_gen_job(job, self.gen_chunk)
            if job.done:
                if len(rids) > 1 or job.x_t.ndim == 3:
                    images = self.pipeline.finish_gen_job_group(job)
                    for rid, img in zip(rids, images):
                        if rid is not None:  # None = cancelled mid-denoise
                            self._done[rid] = img
                else:
                    self._done[rids[0]] = self.pipeline.finish_gen_job(job)
                self._gen_job = None
            else:
                self._gen_job = (rids, job)
        except Exception as e:
            for rid in rids:
                if rid is not None:
                    self.errors[rid] = f"t2i denoise failed: {e}"
            self._gen_job = None

    # -- internals -----------------------------------------------------------
    def _plan_request(self, request: Request):
        """Host-side shape math BEFORE any device work: token ids, image
        geometry, and the maximum cache extent the request will ever touch
        (image bucket write, padded text write, decode appends)."""
        pfx_len = 0
        pfx_pad = 0
        if request.prefix_id is not None:
            if request.image is not None or request.image_size is not None:
                raise ValueError("prefix_id supports text-only requests")
            pfx_block, pfx_len, _pids = self._prefixes[request.prefix_id]
            pfx_pad = pfx_block.capacity
            ids = (self.tokenizer.encode(request.prompt)
                   + [self.new_token_ids["eos_token_id"]])
        else:
            ids = (
                [self.new_token_ids["bos_token_id"]]
                + self.tokenizer.encode(request.prompt)
                + [self.new_token_ids["eos_token_id"]]
            )
        T = len(ids)
        T_pad = max(32, ((T + 31) // 32) * 32)
        img_meta = None
        kv_img = 0
        extent = pfx_pad + T_pad if pfx_len else 0
        if request.image is not None:
            img = pil_img2rgb(request.image)
            rt = self.vit_transform.resize_transform
            w0, h0 = img.size
            new_w, new_h = compute_resize_shape(
                w0, h0, rt.max_size, rt.min_size, rt.stride, rt.max_pixels
            )
            p = self.cfg.vit.patch_size
            n = (new_h // p) * (new_w // p)
            bucket = bagel.vit_token_bucket(n)
            img_meta = (img, n, bucket)
            kv_img = n + 2
            extent = max(extent, bucket + 2)
        kv_len = kv_img + pfx_len + T
        extent = max(extent, kv_img + T_pad, kv_len + request.max_new_tokens + 1)
        return ids, T_pad, img_meta, kv_len, extent

    def _image_host_prep(self, img_meta):
        """Host-side resize + patchify + pos-ids for one image. Returns
        (tokens [1, bucket, d] device, pos_ids [bucket] np, n, bucket)."""
        img, n, bucket = img_meta
        resized = self.vit_transform.resize_transform(img)
        u8 = np.asarray(resized, dtype=np.uint8)
        H, W = u8.shape[:2]
        p = self.cfg.vit.patch_size
        pos_ids = position_ids_extrapolate(H, W, p, self.cfg.vit_max_num_patch_per_side)
        tokens = bagel.preprocess_vit_image(self.cfg, jnp.asarray(u8))
        tokens = jnp.pad(tokens, ((0, 0), (0, bucket - n), (0, 0)))
        padded_pos = np.zeros(bucket, dtype=pos_ids.dtype)
        padded_pos[:n] = pos_ids
        return tokens, padded_pos, n, bucket

    def _prefill_image_group(self, group) -> None:
        """ONE dispatch for a group of same-bucket image prefills: batched ViT
        encode + batched und-mode LLM forward into a fresh small cache block,
        scattered into the slot pool (group_store). Group rows are padded to a
        power of two (compile once per (bucket, P)); padding rows carry
        n_tokens=0 and slot index num_slots (dropped by the store).

        Replaces the per-slot prefill loop — at 48 slots each admission round
        used to cost one full 28-layer batch-1 forward PER image (the 5.4x
        serving-vs-pure-decode engine tax, SERVING_BENCH.json)."""
        bucket = group[0][2][3]
        P = 1
        while P < len(group):
            P *= 2
        rows = [prep[0] for _, _, prep in group]
        if len(rows) < P:
            rows.append(jnp.zeros(
                (P - len(rows),) + rows[0].shape[1:], rows[0].dtype
            ))
        toks = jnp.concatenate(rows, axis=0)
        pos = np.zeros((P, bucket), np.int64)
        ns = np.zeros((P,), np.int32)
        slots = np.full((P,), self.num_slots, np.int32)  # padding rows drop
        for j, (slot_idx, rid, (tok, ppos, n, _b)) in enumerate(group):
            pos[j] = ppos
            ns[j] = n
            slots[j] = slot_idx
        se = jnp.asarray(
            [self.new_token_ids["start_of_image"], self.new_token_ids["end_of_image"]],
            jnp.int32,
        )
        with self._mesh_ctx():
            dtype, quantized = self._block_dtype_quant()
            block = bagel.prefill_vit_group(
                self.params, self.cfg, toks, jnp.asarray(pos),
                jnp.asarray(ns), se, jnp.zeros((P,), jnp.int32),
                kv_dtype=dtype, quantized=quantized, kv_bits=self._kv_bits,
            )
            self.cache = group_store(self.cache, block, jnp.asarray(slots))

    def _block_dtype_quant(self):
        quantized = self.cache.k_scale is not None
        dtype = jnp.bfloat16 if quantized else self.cache.k.dtype
        return dtype, quantized

    @property
    def _kv_bits(self) -> int:
        return 4 if self.cache.k.dtype == jnp.int4 else 8

    def _admit_image_text_block(self, members) -> None:
        """Image + text prefill for a same-bucket group in a COMPACT block:
        one grouped ViT prefill with text headroom (prefill_vit_group
        capacity=Tb+2+T_max), one [P, T_max] text append into the block, one
        group_store scatter. members: [(slot_idx, rid, prep, admit)]."""
        bucket = members[0][2][3]
        T_max = max(a[4] for *_x, a in members)
        P = 1
        while P < len(members):
            P *= 2
        rows = [prep[0] for _i, _r, prep, _a in members]
        if len(rows) < P:
            rows.append(jnp.zeros(
                (P - len(rows),) + rows[0].shape[1:], rows[0].dtype
            ))
        toks = jnp.concatenate(rows, axis=0)
        vpos = np.zeros((P, bucket), np.int64)
        ns = np.zeros((P,), np.int32)
        slots = np.full((P,), self.num_slots, np.int32)
        batch_ids = np.zeros((P, T_max), np.int32)
        batch_pos = np.zeros((P, T_max), np.int32)
        batch_valid = np.zeros((P, T_max), bool)
        for j, (slot_idx, rid, (tok, ppos, n, _b), admit) in enumerate(members):
            ids = admit[3]
            T = len(ids)
            vpos[j] = ppos
            ns[j] = n
            slots[j] = slot_idx
            batch_ids[j, :T] = ids
            batch_pos[j, :T] = np.arange(1, 1 + T)  # rope0=1 after the image
            batch_valid[j, :T] = True
        se = jnp.asarray(
            [self.new_token_ids["start_of_image"], self.new_token_ids["end_of_image"]],
            jnp.int32,
        )
        dtype, quantized = self._block_dtype_quant()
        with self._mesh_ctx():
            block = bagel.prefill_vit_group(
                self.params, self.cfg, toks, jnp.asarray(vpos),
                jnp.asarray(ns), se, jnp.zeros((P,), jnp.int32),
                kv_dtype=dtype, quantized=quantized,
                capacity=bucket + 2 + T_max, kv_bits=self._kv_bits,
            )
            block = bagel.prefill_text(
                self.params, self.cfg, block,
                jnp.asarray(batch_ids), jnp.asarray(batch_pos),
                jnp.asarray(batch_valid),
            )
            self.cache = group_store(self.cache, block, jnp.asarray(slots))

    def _admit_text_block(self, group, prefix_id: Optional[int] = None) -> None:
        """Text-only admission in a COMPACT [P, T_max] block cache: one small
        batched prefill + one group_store scatter, instead of a forward over
        the full slot pool with q_valid-masked rows. group: [admit].

        P is FIXED at _txt_group (padding rows are dropped by the store):
        a varying P would compile one tunnel program per (P, T_max) pair
        mid-run — the padded forward costs ~a decode step, a compile costs
        minutes on the tunnel.

        ``prefix_id``: all members share this registered preamble — the
        block grows to [P, Tp_pad + T_max], its leading columns are seeded
        with the precomputed prefix KV (ONE broadcast), and only the
        suffixes are prefilled at positions Tp.."""
        T_max = max(a[4] for a in group)
        P = max(self._txt_group, len(group))
        pos0 = 0
        M_blk = T_max
        if prefix_id is not None:
            pfx_block, pos0, _pids = self._prefixes[prefix_id]
            M_blk = pfx_block.capacity + T_max
        batch_ids = np.zeros((P, T_max), np.int32)
        batch_pos = np.zeros((P, T_max), np.int32)
        batch_valid = np.zeros((P, T_max), bool)
        slots = np.full((P,), self.num_slots, np.int32)
        for j, (i, rid, req, ids, T_pad, img_meta, kv_len) in enumerate(group):
            T = len(ids)
            batch_ids[j, :T] = ids
            batch_pos[j, :T] = np.arange(pos0, pos0 + T)
            batch_valid[j, :T] = True
            slots[j] = i
        dtype, quantized = self._block_dtype_quant()
        llm = self.cfg.llm
        with self._mesh_ctx():
            block = KVCache.create(
                llm.num_hidden_layers, P, M_blk, llm.num_key_value_heads,
                llm.head_dim, dtype, quantized=quantized,
                kv_bits=self._kv_bits,
            )
            if prefix_id is not None:
                block = seed_prefix_block(
                    block, pfx_block, jnp.asarray(pos0, jnp.int32))
            block = bagel.prefill_text(
                self.params, self.cfg, block,
                jnp.asarray(batch_ids), jnp.asarray(batch_pos),
                jnp.asarray(batch_valid),
            )
            self.cache = group_store(self.cache, block, jnp.asarray(slots))

    def _admit(self, throttle: bool = False):
        """Admit pending requests into free slots.

        Over-capacity requests are rejected up-front (recorded in
        ``self.errors``) — no prefill work is wasted and the batch keeps
        running. Image prefills are batched by bucket into group dispatches
        (``_prefill_image_group``); the TEXT prefill then runs as batched
        calls over the full multi-stream cache with inactive slots masked out
        via q_valid, split into groups whose shared padded length fits every
        member's remaining capacity (a near-capacity image request co-admitted
        with a longer prompt would otherwise lose its whole windowed text
        write — FILL_OR_DROP drops overflowing windows WHOLE).

        ``throttle``: cap the admission work of this round (one image group)
        so in-flight decode slots aren't stalled behind a long prefill burst —
        the run loop alternates prefill and decode chunks.
        """
        admits = []  # (slot_idx, rid, req, ids, T_pad, img_meta, kv_len)
        # Throttled rounds cap the admission work so in-flight decode isn't
        # stalled long: up to ONE image group (_img_group ViT prefills) but a
        # full text block (_txt_group — a [32, T_max] text prefill costs ~a
        # decode step). FIFO order is preserved: hitting the image cap stops
        # the round (later text must not overtake an earlier image request).
        max_admits = self._txt_group if throttle else self.num_slots
        max_img = self._img_group if throttle else self.num_slots
        n_img = 0
        stop = False
        for i, slot in enumerate(self.slots[: self.pool]):
            if slot.request_id is not None:
                continue
            if stop or len(admits) >= max_admits:
                break
            while self._pending:
                rid, req = self._pending.pop(0)
                try:
                    ids, T_pad, img_meta, kv_len, extent = self._plan_request(req)
                except Exception as e:  # bad image/tokenizer input
                    self.errors[rid] = f"prefill planning failed: {e}"
                    continue
                if extent > self.capacity:
                    self.errors[rid] = (
                        f"request needs cache extent {extent} > capacity "
                        f"{self.capacity} (rejected before prefill)"
                    )
                    continue
                if img_meta is not None:
                    if n_img >= max_img:  # image budget spent: requeue, stop
                        self._pending.insert(0, (rid, req))
                        stop = True
                        break
                    n_img += 1
                admits.append((i, rid, req, ids, T_pad, img_meta, kv_len))
                break
        if not admits:
            return

        # COMPACT-BLOCK admission: image+text prefill lands in a small P-row
        # block cache (image block with text headroom, or a fresh text-only
        # block) and is scattered into the slot pool in ONE group_store — no
        # full-slot-pool forward and no lens-reset dispatch per round (the
        # store writes lens). Only an image whose (bucket+2+T_pad) exceeds
        # pool capacity (text must window-append into the pool after the
        # image kv, reference bagel.py:412-458 append semantics) takes the
        # legacy pool path.
        img_groups: Dict[int, list] = {}  # bucket -> [(i, rid, prep, admit)]
        txt_groups: Dict[Optional[int], list] = {}  # prefix_id -> [admit]
        legacy: list = []  # [(i, rid, prep, admit)]
        ok_admits = []
        for admit in admits:
            i, rid, req, ids, T_pad, img_meta, kv_len = admit
            if img_meta is not None:
                try:
                    prep = self._image_host_prep(img_meta)
                except Exception as e:
                    self.errors[rid] = f"image prefill failed: {e}"
                    continue
                bucket = prep[3]
                if bucket + 2 + T_pad <= self.capacity:
                    img_groups.setdefault(bucket, []).append((i, rid, prep, admit))
                else:
                    legacy.append((i, rid, prep, admit))
            else:
                txt_groups.setdefault(req.prefix_id, []).append(admit)
            ok_admits.append(admit)
        for bucket, members in sorted(img_groups.items()):
            for lo in range(0, len(members), self._img_group):
                self._admit_image_text_block(members[lo : lo + self._img_group])
        for pid in sorted(txt_groups, key=lambda k: (k is not None, k or 0)):
            grp = txt_groups[pid]
            for lo in range(0, len(grp), self._txt_group):
                self._admit_text_block(grp[lo : lo + self._txt_group],
                                       prefix_id=pid)
        if legacy:
            for lo in range(0, len(legacy), self._img_group):
                self._prefill_image_group(
                    [(i, rid, prep) for i, rid, prep, _a in
                     legacy[lo : lo + self._img_group]]
                )
            # pool text append after the image kv, grouped so every member's
            # window [kv_img, kv_img + group_T_max) fits capacity (the
            # max-T_pad member always fits its own group -> terminates)
            remaining = [a for _i, _r, _p, a in legacy]
            while remaining:
                T_max = max(a[4] for a in remaining)
                fit = [a for a in remaining
                       if (a[6] - len(a[3])) + T_max <= self.capacity]
                remaining = [a for a in remaining
                             if (a[6] - len(a[3])) + T_max > self.capacity]
                self._prefill_text_group(fit, T_max)
        if not ok_admits:
            return

        for i, rid, req, ids, T_pad, img_meta, kv_len in ok_admits:
            slot = self.slots[i]
            rope0 = 1 if img_meta is not None else 0
            if req.prefix_id is not None:  # suffix ropes continue at Tp
                rope0 = self._prefixes[req.prefix_id][1]
            slot.request_id = rid
            slot.cur_token = self.new_token_ids["bos_token_id"]
            slot.kv_len = kv_len
            slot.position = rope0 + len(ids)
            # max_new_tokens counts the start token, like the reference's
            # max_length (bagel.py:1259-1263 appends bos first).
            slot.remaining = req.max_new_tokens - 1
            slot.out_ids = [slot.cur_token]

        if self.spec_decode and ok_admits:
            # rewrite admitted slots' id history rows (prompt + start token)
            idx = np.asarray([a[0] for a in ok_admits], np.int32)
            rows = np.zeros((len(ok_admits), self.capacity), np.int32)
            hlens = np.zeros((len(ok_admits),), np.int32)
            for j, (i, rid, req, ids, *_rest) in enumerate(ok_admits):
                seq = list(ids) + [self.new_token_ids["bos_token_id"]]
                if req.prefix_id is not None:  # draft from the preamble too
                    seq = list(self._prefixes[req.prefix_id][2]) + seq
                seq = seq[-self.capacity:]
                rows[j, : len(seq)] = seq
                hlens[j] = len(seq)
            self._hist = self._hist.at[jnp.asarray(idx)].set(jnp.asarray(rows))
            self._hlen = self._hlen.at[jnp.asarray(idx)].set(jnp.asarray(hlens))

    def _prefill_text_group(self, group, T_max: int) -> None:
        S = self.pool
        batch_ids = np.zeros((S, T_max), np.int32)
        batch_pos = np.zeros((S, T_max), np.int32)
        batch_valid = np.zeros((S, T_max), bool)
        for i, rid, req, ids, T_pad, img_meta, kv_len in group:
            T = len(ids)
            rope0 = 1 if img_meta is not None else 0
            batch_ids[i, :T] = ids
            batch_pos[i, :T] = np.arange(rope0, rope0 + T)
            batch_valid[i, :T] = True
        with self._mesh_ctx():
            self.cache = bagel.prefill_text(
                self.params, self.cfg, self.cache,
                jnp.asarray(batch_ids), jnp.asarray(batch_pos),
                jnp.asarray(batch_valid),
            )

    def _finish(self, slot: _Slot):
        text = self.tokenizer.decode(slot.out_ids)
        text = text.split("<|im_end|>")[0]
        if "<|im_start|>" in text:
            text = text.split("<|im_start|>")[1]
        self._done[slot.request_id] = text
        slot.request_id = None

    def partials(self) -> Dict[int, str]:
        """Snapshot of IN-FLIGHT outputs: rid -> text decoded so far, with a
        one-token holdback (the last token may begin a multi-token byte
        sequence — same detokenization discipline as
        pipeline.gen_text_stream). Host-only; no device work."""
        out = {}
        for slot in self.slots:
            if slot.request_id is None or len(slot.out_ids) <= 2:
                continue
            text = self.tokenizer.decode(slot.out_ids[:-1])
            text = text.split("<|im_end|>")[0]
            if "<|im_start|>" in text:
                text = text.split("<|im_start|>")[1]
            out[slot.request_id] = text
        return out

    def has_work(self) -> bool:
        """True while any submitted request is unfinished (the HTTP daemon
        polls this between rounds)."""
        return bool(
            self._pending or self._gen_pending or self._gen_ready
            or self._gen_job is not None
            or any(s.request_id is not None for s in self.slots)
        )

    def _reset_stats(self) -> Dict[str, float]:
        self.stats = {
            "rounds": 0, "admit_s": 0.0, "decode_s": 0.0, "host_s": 0.0,
            "gen_s": 0.0, "admitted": 0, "emitted_tokens": 0, "gen_images": 0,
            "repacks": 0, "repack_s": 0.0, "round_s": 0.0,
        }
        return self.stats

    def run(self) -> Dict[int, str]:
        """Process all submitted requests to completion."""
        st = self._reset_stats()
        eos = self.new_token_ids["eos_token_id"]
        while self.has_work():
            self._round(st, eos)
        return dict(self._done)

    def _round(self, st: Dict[str, float], eos: int) -> None:
        """ONE engine round: throttled admission, one t2i denoise segment,
        one decode chunk + host bookkeeping. run() and the HTTP daemon's
        serve loop both drive rounds through here.

        ``round_s`` accumulates the WHOLE round's wall time so
        ``round_s - (admit_s + gen_s + decode_s + host_s + repack_s)`` is the
        engine's unattributed overhead — the round-4 serving record left
        ~40% of wall unexplained (VERDICT r4 #4), which this exposes."""
        import time as _time

        t_round = _time.perf_counter()
        try:
            self._round_inner(st, eos)
        finally:
            st["round_s"] = (st.get("round_s", 0.0)
                             + _time.perf_counter() - t_round)

    def _round_inner(self, st: Dict[str, float], eos: int) -> None:
        import time as _time

        st["rounds"] += 1
        # throttle admission while other slots are mid-decode so a free
        # slot's prefill burst doesn't stall their progress for long
        running = any(s.request_id is not None for s in self.slots)
        if self.pool_ladder and self._pending:
            # grow a rung ahead of admission (backlog-aware)
            n_active = sum(s.request_id is not None for s in self.slots)
            target = self._rung(n_active + len(self._pending))
            if target > self.pool:
                self._repack(target)
        t0 = _time.perf_counter()
        n_before = sum(s.request_id is not None for s in self.slots)
        self._admit(throttle=running)
        st["admitted"] += sum(
            s.request_id is not None for s in self.slots
        ) - n_before
        if os.environ.get("UNIMEDVL_SERVING_PROFILE"):
            np.asarray(self.cache.lens)  # fence: attribute prefill here
        st["admit_s"] += _time.perf_counter() - t0
        # one t2i denoise segment per round, interleaved with the decode
        # chunk below (fair-share between report and image generation)
        if (self._gen_job is not None or self._gen_pending
                or self._gen_ready):
            t0 = _time.perf_counter()
            n_done = len(self._done)
            self._advance_gen()
            st["gen_images"] += len(self._done) - n_done
            st["gen_s"] += _time.perf_counter() - t0
        if not any(s.request_id is not None for s in self.slots):
            return  # pure-t2i round: no decode chunk to run
        t0 = _time.perf_counter()
        pool_slots = self.slots[: self.pool]
        active_np = np.asarray([s.request_id is not None for s in pool_slots])
        cur = np.asarray(
            [s.cur_token if s.request_id is not None else 0 for s in pool_slots],
            np.int32,
        )
        pos = np.asarray([s.position for s in pool_slots], np.int32)
        self._rng, sub = jax.random.split(self._rng)
        # fixed chunk length: variable lengths would trigger a recompile
        # per distinct value; overshoot is discarded on the host
        k = self.chunk
        if self.spec_decode:
            budget = np.asarray(
                [max(s.remaining, 0) if s.request_id is not None else 0
                 for s in pool_slots], np.int32,
            )
            with self._mesh_ctx():
                (tokens, counts, fin, last, new_pos, self.cache,
                 self._hist, self._hlen) = decode_chunk_spec(
                    self.params, self.cfg, self.cache,
                    jnp.asarray(cur), jnp.asarray(pos),
                    jnp.asarray(active_np), jnp.asarray(budget),
                    self._hist, self._hlen, k,
                    jnp.asarray(eos, jnp.int32),
                    k_draft=self.spec_k, ngram=self.spec_ngram,
                )
            tokens = np.asarray(tokens)  # host sync point
            counts = np.asarray(counts)
            fin = np.asarray(fin)
            last = np.asarray(last)
            new_pos = np.asarray(new_pos)
            st["decode_s"] += _time.perf_counter() - t0
            t0 = _time.perf_counter()
            for i, slot in enumerate(pool_slots):
                if slot.request_id is None:
                    continue
                n = int(counts[i])
                slot.out_ids.extend(int(t) for t in tokens[i, :n])
                st["emitted_tokens"] += n
                slot.remaining -= n
                slot.position = int(new_pos[i])
                slot.cur_token = int(last[i])
                if bool(fin[i]) or slot.remaining <= 0:
                    self._finish(slot)
            st["host_s"] += _time.perf_counter() - t0
            return
        # Aligned-band chunk whenever the band fits above every live stream
        # (max live kv extent + chunk <= capacity); the element-scatter chunk
        # remains the near-capacity fallback. kv_len mirrors device lens: the
        # chunk advances every ACTIVE slot's lens by the steps run, and a
        # surviving (unfinished) slot always runs the full chunk — an early
        # exit requires every active slot to have finished.
        base_est = max(
            (s.kv_len for s in self.slots if s.request_id is not None), default=0
        )
        chunk_fn = (
            decode_chunk_aligned if base_est + k <= self.capacity else decode_chunk
        )
        with self._mesh_ctx():
            tokens, last, new_pos, self.cache = chunk_fn(
                self.params, self.cfg, self.cache,
                jnp.asarray(cur), jnp.asarray(pos), jnp.asarray(active_np),
                k, sub, eos=jnp.asarray(eos, jnp.int32),
            )
        tokens = np.asarray(tokens)  # [S, k] — host sync point
        new_pos = np.asarray(new_pos)
        st["decode_s"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        for i, slot in enumerate(pool_slots):
            if slot.request_id is None:
                continue
            slot.kv_len += k
            seq = tokens[i]
            # max_new_tokens=1 means just the start token: the budget is
            # already exhausted before any chunk token lands (the spec
            # path's budget=0 freeze agrees)
            finished = slot.remaining <= 0
            used = 0
            for t in seq:
                if finished:
                    break
                used += 1
                if int(t) == eos:
                    finished = True
                    break
                slot.out_ids.append(int(t))
                slot.remaining -= 1
                if slot.remaining <= 0:
                    finished = True
                    break
            slot.position = int(pos[i]) + used
            slot.cur_token = int(seq[used - 1])
            st["emitted_tokens"] += used
            if finished:
                self._finish(slot)
        st["host_s"] += _time.perf_counter() - t0
        if self.pool_ladder:
            # drain-tail shrink: next round's chunk runs at the rung that
            # fits the remaining live slots + backlog
            n_active = sum(s.request_id is not None for s in self.slots)
            target = self._rung(max(1, n_active + len(self._pending)))
            if target < self.pool:
                self._repack(target)

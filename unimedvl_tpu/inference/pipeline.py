"""Host-side inference orchestrator — the public API of the framework,
mirroring the reference's ``InterleaveInferencer`` (codes/inferencer.py) for
drop-in familiarity while the device work runs through the three jitted
programs in models/bagel.py.

Differences by design:
  * contexts are immutable pytrees — forking for CFG is free (the reference
    deepcopies the whole KV cache, inferencer.py:261,600-607);
  * the decode loop and the denoise loop are single jitted programs;
  * the up-to-3 CFG contexts are batched into one forward per denoise step.
"""

from __future__ import annotations

import dataclasses
from contextlib import nullcontext
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from jax.sharding import NamedSharding, PartitionSpec as P

from unimedvl_tpu.config import BagelConfig, TransformConfig
from unimedvl_tpu.data.imaging import (
    ImageTransform,
    pil_img2rgb,
    position_ids_extrapolate,
    position_ids_interpolate,
)
from unimedvl_tpu.models import bagel
from unimedvl_tpu.models.qwen2_mot import KVCache

# System prompts for think mode (inferencer.py:23-28).
VLM_THINK_SYSTEM_PROMPT = """You should first think about the reasoning process in the mind and then provide the user with the answer.
The reasoning process is enclosed within <think> </think> tags, i.e. <think> reasoning process here </think> answer here"""

GEN_THINK_SYSTEM_PROMPT = """You should first think about the planning process in your mind, and then generate the image.
The planning process is enclosed within <think> </think> tags; that is, <think> planning process here </think> image here.
"""

_CAPACITY_BUCKET = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class GenContext:
    """One conversation context: cache + host bookkeeping (kv length and next
    rope position — inferencer.py:73-80). ``hist`` (optional, host tuple of
    int) is the running TEXT id history — prompt + emitted — consumed by the
    prompt-lookup speculative decode (spec_decode=True); image blocks are not
    recorded (a cross-image n-gram match only costs draft quality, never
    correctness)."""

    cache: KVCache
    kv_len: int = 0
    rope: int = 0
    hist: Tuple[int, ...] = ()

    def fork(self) -> "GenContext":
        """Free (immutable arrays)."""
        return GenContext(cache=self.cache, kv_len=self.kv_len, rope=self.rope,
                          hist=self.hist)


@dataclasses.dataclass
class GenImageJob:
    """Resumable chunked t2i denoise state (serving: a t2i request advances a
    few flow steps between decode chunks instead of monopolising the chip for
    the full loop). Produced by :meth:`InterleaveInferencer.start_gen_job`;
    advanced by :meth:`advance_gen_job`; finalised (VAE decode) by
    :meth:`finish_gen_job`. Chunking composes to exactly the one-shot
    :meth:`gen_image` result — same schedule, same per-step math, same rng
    consumption."""

    image_shape: Tuple[int, int]
    caches: KVCache  # stacked [main, cfg_text?, cfg_img?] context streams
    positions: jax.Array
    pos_ids: jax.Array
    x_t: jax.Array
    step: int  # scan steps completed so far
    total_steps: int  # = num_timesteps - 1
    kw: Dict[str, Any]

    @property
    def done(self) -> bool:
        return self.step >= self.total_steps


class InterleaveInferencer:
    def __init__(
        self,
        params,
        cfg: BagelConfig,
        tokenizer,
        new_token_ids: Dict[str, int],
        vae_transform: Optional[ImageTransform] = None,
        vit_transform: Optional[ImageTransform] = None,
        seed: int = 0,
        mesh=None,
        sp_mesh=None,
        kv_quantized: bool = False,
        kv_bits: int = 8,
        spec_decode: bool = False,
        spec_k: int = 7,
        spec_ngram: int = 3,
        gen_window_dynamic: bool = False,
    ):
        """``mesh``: optional jax.sharding.Mesh with ("data", "model") axes.
        When given, params are placed under their TP NamedShardings (both MoT
        experts sharded over "model") and every KV cache is sharded — kv heads
        over "model", CFG/batch streams over "data" when divisible. All device
        programs then run under the mesh, making multi-chip t2i/decode a
        product feature rather than a test fixture. For CFG-stream parallelism
        in t2i, use a data axis of 3 (e.g. a (3, 2) mesh on 6 chips).

        ``sp_mesh``: optional jax.sharding.Mesh with ("model", "seq") axes —
        the measured-best v5e-8 denoise layout (docs/MULTICHIP_DENOISE.md
        TP2×SP4). When given, the denoise loop routes through
        parallel/sp_denoise.generate_latents_tp_sp (vae latents sequence-
        sharded, one block-kv all-gather per layer) whenever the latent count
        divides the "seq" axis; prefill/decode keep using ``mesh``.

        ``kv_quantized``: int8 KV caches for every context (halves cache HBM
        traffic and memory — the same serving-side win as
        ContinuousBatcher(kv_quantized=True), now available to the cache-heavy
        editing / vqa-recon recipes whose VAE latent conditioning dominates
        the context). Scales are preserved through capacity growth and CFG
        stacking. Incompatible with ``sp_mesh`` (the SP denoise path reads the
        small context cache in bf16). ``kv_bits=4``: int4 cache values
        (quarter traffic; a further accuracy step — validate per checkpoint).

        ``spec_decode``: prompt-lookup speculative decoding for greedy text
        generation (models/bagel.py::generate_text_spec) — verifies
        ``spec_k`` draft tokens per forward, drafts proposed from the most
        recent prior occurrence of the trailing ``spec_ngram`` ids in the
        conversation's text history. GREEDY-EXACT: emitted text is identical
        to the plain decode; on the weight-streaming-bound interactive decode
        the speedup is the acceptance rate (highest on templated clinical
        report text). Sampling requests fall back to the plain decode."""
        self.mesh = mesh
        self.sp_mesh = sp_mesh
        self.kv_quantized = kv_quantized
        self.kv_bits = kv_bits
        self.spec_decode = spec_decode
        self.spec_k = spec_k
        self.spec_ngram = spec_ngram
        self.gen_window_dynamic = gen_window_dynamic
        if kv_quantized and sp_mesh is not None:
            raise ValueError(
                "kv_quantized=True is not supported with sp_mesh "
                "(parallel/sp_denoise.py reads the context cache in bf16)"
            )
        if mesh is not None and sp_mesh is not None:
            # params placed under mesh's TP shardings feed the jitted
            # shard_map over sp_mesh — a different device order would silently
            # reshard the whole param tree every gen_image call (and error
            # outright for disjoint device sets)
            if [d.id for d in mesh.devices.flat] != [
                d.id for d in sp_mesh.devices.flat
            ]:
                raise ValueError(
                    "mesh and sp_mesh must enumerate the same devices in the "
                    "same order (scripts/interactive_image_generator.py "
                    "treats them as mutually exclusive)"
                )
        if mesh is not None:
            from unimedvl_tpu.weights.bagel_loader import place_params

            params = place_params(params, cfg, mesh)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.new_token_ids = new_token_ids
        tv = TransformConfig.vae_interactive()
        ti = TransformConfig.vit_interactive()
        self.vae_transform = vae_transform or ImageTransform(
            tv.max_size, tv.min_size, tv.stride, tv.max_pixels
        )
        self.vit_transform = vit_transform or ImageTransform(
            ti.max_size, ti.min_size, ti.stride, ti.max_pixels
        )
        self._rng = jax.random.PRNGKey(seed)
        if cfg.interpolate_pos:
            self._position_ids = position_ids_interpolate
        else:
            self._position_ids = position_ids_extrapolate

    # -- rng ---------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- mesh --------------------------------------------------------------
    def _mesh_ctx(self):
        return jax.set_mesh(self.mesh) if self.mesh is not None else nullcontext()

    def _cache_spec(self, n_streams: int) -> KVCache:
        """Cache sharding for the current mesh: kv heads over "model" (when
        divisible), streams over "data" (when divisible — e.g. the 3 CFG
        streams on a data=3 mesh: zero-comms stream parallelism)."""
        ds = "data" if n_streams % self.mesh.shape["data"] == 0 else None
        ms = (
            "model"
            if self.cfg.llm.num_key_value_heads % self.mesh.shape["model"] == 0
            else None
        )
        return KVCache(
            k=P(None, ds, ms, None, None),
            v=P(None, ds, ms, None, None),
            lens=P(ds),
            k_scale=P(None, ds, ms, None),
            v_scale=P(None, ds, ms, None),
        )

    def _place_cache(self, cache: KVCache) -> KVCache:
        if self.mesh is None:
            return cache
        spec = self._cache_spec(cache.k.shape[1])
        if cache.k_scale is None:
            spec = spec.replace(k_scale=None, v_scale=None)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)), cache, spec
        )

    # -- context management --------------------------------------------------
    def init_gen_context(self, capacity: int = _CAPACITY_BUCKET) -> GenContext:
        cache = KVCache.create(
            self.cfg.llm.num_hidden_layers,
            1,
            capacity,
            self.cfg.llm.num_key_value_heads,
            self.cfg.llm.head_dim,
            dtype=self.params["llm"]["norm"]["scale"].dtype,
            quantized=self.kv_quantized, kv_bits=self.kv_bits,
        )
        return GenContext(cache=self._place_cache(cache))

    def _ensure_capacity(self, ctx: GenContext, additional: int) -> GenContext:
        needed = ctx.kv_len + additional
        cap = ctx.cache.capacity
        if needed <= cap:
            return ctx
        new_cap = _round_up(needed, _CAPACITY_BUCKET)
        pad = new_cap - cap
        c = ctx.cache
        cache = KVCache(
            k=jnp.pad(c.k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
            v=jnp.pad(c.v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
            lens=c.lens,
            k_scale=None if c.k_scale is None else jnp.pad(
                c.k_scale, ((0, 0), (0, 0), (0, 0), (0, pad))
            ),
            v_scale=None if c.v_scale is None else jnp.pad(
                c.v_scale, ((0, 0), (0, 0), (0, 0), (0, pad))
            ),
        )
        return GenContext(
            cache=self._place_cache(cache), kv_len=ctx.kv_len, rope=ctx.rope,
            hist=ctx.hist,
        )

    # -- text --------------------------------------------------------------
    def _encode_prompt(self, text: str) -> List[int]:
        ids = self.tokenizer.encode(text)
        return [self.new_token_ids["bos_token_id"]] + ids + [self.new_token_ids["eos_token_id"]]

    def update_context_text(self, text: str, ctx: GenContext) -> GenContext:
        """Causal text append (inferencer.py:83-128, bagel.py:377-458).

        Token ids are padded to a small set of length buckets so arbitrary
        prompt lengths reuse a handful of compiled prefill programs.
        """
        ids = self._encode_prompt(text)
        T = len(ids)
        T_pad = max(32, _round_up(T, 32))
        ctx = self._ensure_capacity(ctx, T_pad)
        padded = np.zeros(T_pad, np.int32)
        padded[:T] = ids
        token_ids = jnp.asarray(padded)[None]
        positions = np.zeros(T_pad, np.int32)
        positions[:T] = np.arange(ctx.rope, ctx.rope + T)
        valid = np.zeros(T_pad, bool)
        valid[:T] = True
        with self._mesh_ctx():
            cache = bagel.prefill_text(
                self.params, self.cfg, ctx.cache, token_ids,
                jnp.asarray(positions)[None], jnp.asarray(valid)[None],
            )
        return GenContext(cache=cache, kv_len=ctx.kv_len + T, rope=ctx.rope + T,
                          hist=ctx.hist + tuple(ids))

    # -- images --------------------------------------------------------------
    def _start_end(self) -> jax.Array:
        return jnp.asarray(
            [self.new_token_ids["start_of_image"], self.new_token_ids["end_of_image"]],
            dtype=jnp.int32,
        )

    def update_context_image(
        self,
        image: Image.Image,
        ctx: GenContext,
        vae: bool = True,
        vit: bool = True,
    ) -> GenContext:
        """Image append: VAE (gen expert) and/or ViT (und expert) paths
        (inferencer.py:131-162)."""
        assert vae or vit
        if vae:
            resized = self.vae_transform.resize_transform(image)
            u8 = np.asarray(resized, dtype=np.uint8)  # HWC on host
            H, W = u8.shape[:2]
            ld = self.cfg.latent_downsample
            h, w = H // ld, W // ld
            n = h * w
            pos_ids = self._position_ids(H, W, ld, self.cfg.max_latent_size)
            # The 28-layer LLM prefill is shape-bucketed (compiles per latent
            # BUCKET, not per exact image size); only the small VAE conv
            # encode still compiles per (H, W).
            bucket = bagel.vit_token_bucket(n)
            ctx = self._ensure_capacity(ctx, bucket + 2)
            padded_pos = np.zeros(bucket, dtype=pos_ids.dtype)
            padded_pos[:n] = pos_ids
            with self._mesh_ctx():
                img = bagel.preprocess_vae_image(self.cfg, jnp.asarray(u8))
                latent_tokens = bagel.encode_vae_latent_tokens(
                    self.params, self.cfg, img, self._next_rng()
                )
                latent_tokens = jnp.pad(
                    latent_tokens, ((0, 0), (0, bucket - n), (0, 0))
                )
                cache = bagel.prefill_vae_bucketed(
                    self.params,
                    self.cfg,
                    ctx.cache,
                    latent_tokens,
                    jnp.asarray(padded_pos)[None],
                    jnp.asarray(n, jnp.int32),
                    self._start_end(),
                    jnp.asarray([ctx.rope], jnp.int32),
                    jnp.asarray(0.0, jnp.float32),
                )
            ctx = GenContext(cache=cache, kv_len=ctx.kv_len + n + 2,
                             rope=ctx.rope + 1, hist=ctx.hist)

        if vit:
            resized = self.vit_transform.resize_transform(image)
            u8 = np.asarray(resized, dtype=np.uint8)  # HWC on host
            H, W = u8.shape[:2]
            p = self.cfg.vit.patch_size
            n = (H // p) * (W // p)
            pos_ids = self._position_ids(H, W, p, self.cfg.vit_max_num_patch_per_side)
            with self._mesh_ctx():
                tokens = bagel.preprocess_vit_image(self.cfg, jnp.asarray(u8))
            # shape-bucketed prefill: NaViT sizes vary per image; padding to
            # token buckets keeps the number of compiled programs small
            # (SURVEY.md §7 hard-part 2)
            bucket = bagel.vit_token_bucket(n)
            # the whole padded block is appended before being masked/overwritten
            ctx = self._ensure_capacity(ctx, bucket + 2)
            tokens = jnp.pad(tokens, ((0, 0), (0, bucket - n), (0, 0)))
            padded_pos = np.zeros(bucket, dtype=pos_ids.dtype)
            padded_pos[:n] = pos_ids
            with self._mesh_ctx():
                cache = bagel.prefill_vit_bucketed(
                    self.params,
                    self.cfg,
                    ctx.cache,
                    tokens,
                    jnp.asarray(padded_pos)[None],
                    jnp.asarray(n, jnp.int32),
                    self._start_end(),
                    jnp.asarray([ctx.rope], jnp.int32),
                )
            ctx = GenContext(cache=cache, kv_len=ctx.kv_len + n + 2,
                             rope=ctx.rope + 1, hist=ctx.hist)

        return ctx

    # -- text generation -----------------------------------------------------
    def gen_text(
        self,
        ctx: GenContext,
        max_length: int = 500,
        do_sample: bool = False,
        temperature: float = 1.0,
        return_ctx: bool = False,
    ) -> Union[str, Tuple[str, GenContext]]:
        """Decode an answer (inferencer.py:259-279; bagel.py:1236-1317). The
        caller's context is unaffected (functional cache).

        ``return_ctx=True``: ALSO return the post-decode context — the cache
        keeps the start token plus every emitted token, exactly like the
        reference's generate_text keeps its NaiveCache (bagel.py:1259-1314) —
        so a multi-turn chat only prefills each turn's NEW text instead of
        re-prefilling the whole transcript (O(turns^2)). Uses the
        contiguous-cache decode variant (per-stream element appends — free at
        interactive batch sizes; the aligned-column fast path stays the
        default for the large-batch no-context case)."""
        use_spec = self.spec_decode and not do_sample
        extra = (self.spec_k + 1) if use_spec else 1
        ctx = self._ensure_capacity(ctx, max_length + extra)
        start = jnp.asarray([self.new_token_ids["bos_token_id"]], jnp.int32)
        positions = jnp.asarray([ctx.rope], jnp.int32)
        with self._mesh_ctx():
            if use_spec:
                # hist (prompt ids + prior emissions) ends with the start
                # token; HL bucketed to bound compiled program count
                hist_list = list(ctx.hist) + [
                    self.new_token_ids["bos_token_id"]
                ]
                HL = _round_up(
                    len(hist_list) + max_length + self.spec_k, 256
                )
                hist = np.zeros((1, HL), np.int32)
                hist[0, : len(hist_list)] = hist_list
                out, lengths, cache, _ = bagel.generate_text_spec(
                    self.params, self.cfg, ctx.cache, start, positions,
                    max_length,
                    jnp.asarray(self.new_token_ids["eos_token_id"], jnp.int32),
                    jnp.asarray(hist),
                    jnp.asarray([len(hist_list)], jnp.int32),
                    k_draft=self.spec_k, ngram=self.spec_ngram,
                )
            elif return_ctx:
                out, lengths, cache = bagel.generate_text_ctx(
                    self.params, self.cfg, ctx.cache, start, positions,
                    max_length,
                    jnp.asarray(self.new_token_ids["eos_token_id"], jnp.int32),
                    do_sample, temperature, self._next_rng(),
                )
            else:
                out, lengths = bagel.generate_text(
                    self.params, self.cfg, ctx.cache, start, positions,
                    max_length,
                    jnp.asarray(self.new_token_ids["eos_token_id"], jnp.int32),
                    do_sample, temperature, self._next_rng(),
                )
        ids = np.asarray(out[0])
        ids = ids[ids >= 0].tolist()
        text = self.tokenizer.decode(ids)
        # reference parsing (bagel.py:1389-1391)
        text = text.split("<|im_end|>")[0]
        if "<|im_start|>" in text:
            text = text.split("<|im_start|>")[1]
        if return_ctx:
            n = int(lengths[0])
            new_ctx = GenContext(
                cache=cache, kv_len=ctx.kv_len + n, rope=ctx.rope + n,
                hist=ctx.hist + tuple(ids),
            )
            return text, new_ctx
        return text

    def gen_text_stream(
        self,
        ctx: GenContext,
        max_length: int = 500,
        chunk: int = 8,
        result: Optional[dict] = None,
    ):
        """STREAMING greedy decode: a generator yielding text increments as
        they decode (the interactive REPL prints tokens live instead of
        waiting for the whole answer). Same tokens as ``gen_text`` greedy —
        the device loop runs in jitted chunks (inference/serving.py
        decode_chunk at S=1) with one host sync per ``chunk`` steps. With
        ``spec_decode=True`` the chunks run decode_chunk_spec (prompt-lookup
        drafts), so a templated answer streams several tokens per weight
        pass — same text either way.

        The yielded chunks CONCATENATE to exactly ``gen_text``'s answer:
        each yield re-decodes the id prefix with a one-token holdback (plus
        trailing U+FFFD trim) so multi-byte/multi-token characters never
        render split. Stops at eos / <|im_end|> / max_length. The caller's
        context is unaffected (functional cache).

        ``result``: optional dict filled on completion with {"text": full
        answer, "ctx": the post-decode kept context} — the streaming
        equivalent of gen_text(return_ctx=True) for multi-turn chat (the
        returned cache holds the start token plus every emitted token)."""
        from unimedvl_tpu.inference.serving import decode_chunk, decode_chunk_spec

        use_spec = self.spec_decode
        extra = (self.spec_k + 1) if use_spec else 1
        ctx = self._ensure_capacity(ctx, max_length + extra)
        eos = self.new_token_ids["eos_token_id"]
        # the chunk kernels DONATE their cache argument — work on a copy so
        # the caller's context stays valid (the functional-cache contract)
        cache = jax.tree.map(jnp.array, ctx.cache)
        base_lens = np.asarray(ctx.cache.lens).copy()
        cur = self.new_token_ids["bos_token_id"]
        pos = ctx.rope
        ids = [cur]
        emitted = ""
        stop = False
        pending = True  # the newest emitted token's kv is not yet written
        plain_forwards = 0  # plain path: device steps run so far

        if use_spec:
            hist_list = list(ctx.hist) + [cur]
            HL = _round_up(len(hist_list) + max_length + self.spec_k, 256)
            hist = np.zeros((1, HL), np.int32)
            hist[0, : len(hist_list)] = hist_list
            hist = jnp.asarray(hist)
            hlen = jnp.asarray([len(hist_list)], jnp.int32)

        def render(id_list):
            text = self.tokenizer.decode(id_list)
            done = "<|im_end|>" in text
            text = text.split("<|im_end|>")[0]
            if "<|im_start|>" in text:
                text = text.split("<|im_start|>")[1]
            return text, done

        while len(ids) < max_length and not stop:
            if use_spec:
                with self._mesh_ctx():
                    (tokens, counts, fin, last, new_pos, cache, hist,
                     hlen) = decode_chunk_spec(
                        self.params, self.cfg, cache,
                        jnp.asarray([cur], jnp.int32),
                        jnp.asarray([pos], jnp.int32),
                        jnp.ones((1,), bool),
                        jnp.asarray([max_length - len(ids)], jnp.int32),
                        hist, hlen, chunk, jnp.asarray(eos, jnp.int32),
                        k_draft=self.spec_k, ngram=self.spec_ngram,
                    )
                n = int(np.asarray(counts)[0])
                ids.extend(int(t) for t in np.asarray(tokens)[0, :n])
                pos = int(np.asarray(new_pos)[0])
                cur = int(np.asarray(last)[0])
                if bool(np.asarray(fin)[0]):
                    stop = True
                    if n == 0:
                        # immediate eos: the pending token was consumed
                        pending = False
                if len(ids) >= max_length:
                    stop = True
            else:
                with self._mesh_ctx():
                    tokens, _last, _pos, cache = decode_chunk(
                        self.params, self.cfg, cache,
                        jnp.asarray([cur], jnp.int32), jnp.asarray([pos], jnp.int32),
                        jnp.ones((1,), bool), chunk, self._next_rng(),
                        eos=jnp.asarray(eos, jnp.int32),
                    )
                seq = np.asarray(tokens)[0]
                used = 0
                hit_eos = False
                for t in seq:
                    used += 1
                    if int(t) == eos:
                        stop = True
                        hit_eos = True
                        break
                    ids.append(int(t))
                    if len(ids) >= max_length:
                        stop = True
                        break
                pos = int(pos) + used
                cur = int(seq[used - 1])
                # device steps actually run: up to the eos step, else the
                # whole chunk (the while_loop only early-exits on eos). The
                # newest emitted token's kv exists iff it was some step's
                # INPUT — i.e. total forwards cover len(ids).
                plain_forwards += used if hit_eos else len(seq)
                pending = plain_forwards < len(ids)
            # one-token holdback: the final token's rendering may merge with
            # the next; emit only the stable prefix
            text, done = render(ids if stop else ids[:-1])
            stop = stop or done
            text = text.rstrip("�") if not stop else text
            if text.startswith(emitted) and len(text) > len(emitted):
                yield text[len(emitted):]
                emitted = text

        final, _ = render(ids)
        if final.startswith(emitted) and len(final) > len(emitted):
            yield final[len(emitted):]

        if result is not None:
            if pending:
                # spec chunks leave the newest token's kv pending; complete
                # the kept-cache contract with one T=1 forward
                from unimedvl_tpu.models import qwen2_mot as mot_
                from unimedvl_tpu.models.qwen2_mot import ForwardSpec

                with self._mesh_ctx():
                    x = mot_.embed_tokens(self.params["llm"],
                                          jnp.asarray([cur], jnp.int32))
                    _, cache = mot_.forward(
                        self.params["llm"], self.cfg.llm, x[:, None, :],
                        jnp.asarray([[pos]], jnp.int32), cache,
                        ForwardSpec("und", True, True),
                    )
            n = len(ids)
            cache = cache.replace(
                lens=jnp.asarray(base_lens + n, jnp.int32)
            )
            result["text"] = final
            result["ctx"] = GenContext(
                cache=cache, kv_len=ctx.kv_len + n, rope=ctx.rope + n,
                hist=ctx.hist + tuple(ids),
            )

    # -- image generation ------------------------------------------------------
    def _stack_contexts(self, contexts: List[GenContext]) -> Tuple[KVCache, jax.Array]:
        """Stack 1-3 single-stream caches into one multi-stream cache padded to
        a common capacity bucket."""
        cap = max(c.cache.capacity for c in contexts)
        quant = {c.cache.quantized for c in contexts}
        assert len(quant) == 1, (
            "cannot stack a mix of int8 and bf16 KV contexts for CFG"
        )
        quant = quant.pop()

        def padded(c: GenContext) -> KVCache:
            pad = cap - c.cache.capacity
            if pad == 0:
                return c.cache
            cc = c.cache
            return KVCache(
                k=jnp.pad(cc.k, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
                v=jnp.pad(cc.v, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))),
                lens=cc.lens,
                k_scale=None if cc.k_scale is None else jnp.pad(
                    cc.k_scale, ((0, 0), (0, 0), (0, 0), (0, pad))
                ),
                v_scale=None if cc.v_scale is None else jnp.pad(
                    cc.v_scale, ((0, 0), (0, 0), (0, 0), (0, pad))
                ),
            )

        caches = [padded(c) for c in contexts]
        # NOTE: the concat runs OUTSIDE the mesh context — explicit-sharding
        # mode cannot always infer a layout for the mixed-sharding inputs;
        # placement happens explicitly right after.
        stacked = KVCache(
            k=jnp.concatenate([c.k for c in caches], axis=1),
            v=jnp.concatenate([c.v for c in caches], axis=1),
            lens=jnp.concatenate([c.lens for c in caches]),
            k_scale=(
                jnp.concatenate([c.k_scale for c in caches], axis=1)
                if quant else None
            ),
            v_scale=(
                jnp.concatenate([c.v_scale for c in caches], axis=1)
                if quant else None
            ),
        )
        positions = jnp.asarray([c.rope for c in contexts], jnp.int32)
        return self._place_cache(stacked), positions

    def gen_image(
        self,
        image_shape: Tuple[int, int],
        gen_context: GenContext,
        cfg_text_scale: float = 4.0,
        cfg_img_scale: float = 1.5,
        cfg_text_precontext: Optional[GenContext] = None,
        cfg_img_precontext: Optional[GenContext] = None,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        num_timesteps: int = 50,
        timestep_shift: float = 3.0,
    ) -> Image.Image:
        """Text/image-conditioned generation with dual CFG
        (inferencer.py:165-232)."""
        latent = self.gen_image_latent(
            image_shape,
            gen_context,
            cfg_text_scale=cfg_text_scale,
            cfg_img_scale=cfg_img_scale,
            cfg_text_precontext=cfg_text_precontext,
            cfg_img_precontext=cfg_img_precontext,
            cfg_interval=cfg_interval,
            cfg_renorm_min=cfg_renorm_min,
            cfg_renorm_type=cfg_renorm_type,
            num_timesteps=num_timesteps,
            timestep_shift=timestep_shift,
        )
        return self.decode_image(latent, image_shape)

    def gen_image_latent(
        self,
        image_shape: Tuple[int, int],
        gen_context: GenContext,
        cfg_text_scale: float = 4.0,
        cfg_img_scale: float = 1.5,
        cfg_text_precontext: Optional[GenContext] = None,
        cfg_img_precontext: Optional[GenContext] = None,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        num_timesteps: int = 50,
        timestep_shift: float = 3.0,
    ) -> jax.Array:
        """Denoise to final latent tokens [h*w, patch_latent_dim] without the
        VAE decode — the latent-level entry behind :meth:`gen_image`."""
        H, W = image_shape
        ld = self.cfg.latent_downsample
        h, w = H // ld, W // ld
        n = h * w

        use_text_cfg = cfg_text_scale > 1.0 and cfg_text_precontext is not None
        use_img_cfg = cfg_img_scale > 1.0 and cfg_img_precontext is not None
        contexts = [gen_context]
        if use_text_cfg:
            contexts.append(cfg_text_precontext)
        if use_img_cfg:
            contexts.append(cfg_img_precontext)
        caches, positions = self._stack_contexts(contexts)

        pos_ids = self._position_ids(H, W, ld, self.cfg.max_latent_size)
        noise = jax.random.normal(
            self._next_rng(), (n, self.cfg.patch_latent_dim), dtype=jnp.float32
        )
        kw = dict(
            num_timesteps=num_timesteps,
            timestep_shift=timestep_shift,
            cfg_text_scale=cfg_text_scale,
            cfg_img_scale=cfg_img_scale,
            cfg_interval=tuple(cfg_interval),
            cfg_renorm_min=cfg_renorm_min,
            cfg_renorm_type=cfg_renorm_type,
            use_text_cfg=use_text_cfg,
            use_img_cfg=use_img_cfg,
        )
        if (
            self.sp_mesh is not None
            and n % self.sp_mesh.shape["seq"] == 0
            and self.cfg.llm.num_key_value_heads % self.sp_mesh.shape["model"] == 0
            # _sp_attention routes projections through the MoT gen twins;
            # non-MoT gen configs fall back to the single-chip denoise
            and self.cfg.llm.mot_attention
        ):
            from unimedvl_tpu.parallel.sp_denoise import generate_latents_tp_sp

            return generate_latents_tp_sp(
                self.params, self.cfg, caches, positions,
                jnp.asarray(pos_ids), noise, self._start_end(),
                self.sp_mesh, **kw,
            )
        with self._mesh_ctx():
            latent = bagel.generate_latents(
                self.params, self.cfg, caches, positions,
                jnp.asarray(pos_ids), noise, self._start_end(), **kw,
            )
        return latent

    def start_gen_job(
        self,
        image_shape: Tuple[int, int],
        gen_context: GenContext,
        cfg_text_scale: float = 4.0,
        cfg_img_scale: float = 1.5,
        cfg_text_precontext: Optional[GenContext] = None,
        cfg_img_precontext: Optional[GenContext] = None,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        num_timesteps: int = 50,
        timestep_shift: float = 3.0,
    ) -> GenImageJob:
        """Begin a resumable denoise (same knobs and context recipe as
        :meth:`gen_image`; consumes one rng draw for the init noise exactly
        like the one-shot path, so a given seed yields the identical image)."""
        H, W = image_shape
        ld = self.cfg.latent_downsample
        h, w = H // ld, W // ld
        n = h * w
        use_text_cfg = cfg_text_scale > 1.0 and cfg_text_precontext is not None
        use_img_cfg = cfg_img_scale > 1.0 and cfg_img_precontext is not None
        contexts = [gen_context]
        if use_text_cfg:
            contexts.append(cfg_text_precontext)
        if use_img_cfg:
            contexts.append(cfg_img_precontext)
        caches, positions = self._stack_contexts(contexts)
        pos_ids = jnp.asarray(self._position_ids(H, W, ld, self.cfg.max_latent_size))
        noise = jax.random.normal(
            self._next_rng(), (n, self.cfg.patch_latent_dim), dtype=jnp.float32
        )
        kw = dict(
            num_timesteps=num_timesteps,
            timestep_shift=timestep_shift,
            cfg_text_scale=cfg_text_scale,
            cfg_img_scale=cfg_img_scale,
            cfg_interval=tuple(cfg_interval),
            cfg_renorm_min=cfg_renorm_min,
            cfg_renorm_type=cfg_renorm_type,
            use_text_cfg=use_text_cfg,
            use_img_cfg=use_img_cfg,
        )
        return GenImageJob(
            image_shape=image_shape, caches=caches, positions=positions,
            pos_ids=pos_ids, x_t=noise, step=0,
            total_steps=num_timesteps - 1, kw=kw,
        )

    def advance_gen_job(self, job: GenImageJob, steps: int) -> GenImageJob:
        """Run the next ``steps`` flow steps (fewer at the tail). Each distinct
        (step, step+steps) window is one compiled program — a fixed chunk size
        bounds the program count at ceil(total/steps). Grouped jobs
        (:meth:`merge_gen_jobs`; ``x_t`` is [G, n, 64]) advance all members
        in ONE batched forward per step."""
        if job.done:
            return job
        hi = min(job.step + steps, job.total_steps)
        if self.gen_window_dynamic:
            # one compiled program per (geometry, G, window): the window
            # start is a traced scalar, so every segment INCLUDING the tail
            # reuses it (bagel.generate_latents_group_window docstring has
            # the cost/parity contract vs the static-split path)
            grouped = job.x_t.ndim == 3
            x = job.x_t if grouped else job.x_t[None]
            with self._mesh_ctx():
                x = bagel.generate_latents_group_window(
                    self.params, self.cfg, job.caches, job.positions,
                    job.pos_ids, x, self._start_end(),
                    jnp.asarray(job.step, jnp.int32), window=steps, **job.kw,
                )
            return dataclasses.replace(
                job, x_t=x if grouped else x[0], step=hi)
        fn = (bagel.generate_latents_group if job.x_t.ndim == 3
              else bagel.generate_latents)
        with self._mesh_ctx():
            x_t = fn(
                self.params, self.cfg, job.caches, job.positions,
                job.pos_ids, job.x_t, self._start_end(),
                step_range=(job.step, hi), **job.kw,
            )
        return dataclasses.replace(job, x_t=x_t, step=hi)

    def merge_gen_jobs(self, jobs: "List[GenImageJob]") -> GenImageJob:
        """Fuse G compatible unstarted-or-aligned jobs into ONE grouped job
        whose denoise runs all members' streams in a single forward per step
        (bagel.generate_latents_group — pays the per-layer fixed overhead
        once per step instead of once per image per step; the single-chip
        analogue of gen_images_grouped's "data" mesh axis).

        Compatibility = identical image geometry, schedule/CFG knobs, step
        counter, and context-cache shape (the serving engine's grouping
        predicate, ContinuousBatcher._advance_gen). Member caches concat on
        the stream axis g-major, so per-image stream layout is preserved."""
        j0 = jobs[0]
        for j in jobs[1:]:
            assert j.image_shape == j0.image_shape, "group: geometry differs"
            assert j.kw == j0.kw, "group: gen knobs differ"
            assert (j.step, j.total_steps) == (j0.step, j0.total_steps)
            assert j.caches.k.shape == j0.caches.k.shape, "group: cache shape"
        if len(jobs) == 1:
            return j0
        caches = KVCache(
            k=jnp.concatenate([j.caches.k for j in jobs], axis=1),
            v=jnp.concatenate([j.caches.v for j in jobs], axis=1),
            lens=jnp.concatenate([j.caches.lens for j in jobs]),
            k_scale=(None if j0.caches.k_scale is None else
                     jnp.concatenate([j.caches.k_scale for j in jobs], axis=1)),
            v_scale=(None if j0.caches.v_scale is None else
                     jnp.concatenate([j.caches.v_scale for j in jobs], axis=1)),
        )
        return dataclasses.replace(
            j0,
            caches=caches,
            positions=jnp.concatenate([j.positions for j in jobs]),
            x_t=jnp.stack([j.x_t for j in jobs]),
        )

    def finish_gen_job(self, job: GenImageJob) -> Image.Image:
        assert job.done, (job.step, job.total_steps)
        assert job.x_t.ndim == 2, "grouped job: use finish_gen_job_group"
        return self.decode_image(job.x_t, job.image_shape)

    def finish_gen_job_group(self, job: GenImageJob) -> "List[Image.Image]":
        assert job.done, (job.step, job.total_steps)
        x_t = job.x_t if job.x_t.ndim == 3 else job.x_t[None]
        return [self.decode_image(x_t[g], job.image_shape)
                for g in range(x_t.shape[0])]

    def gen_images_grouped(
        self,
        image_shape: Tuple[int, int],
        gen_contexts: List[GenContext],
        group_mesh,
        cfg_text_precontexts: Optional[List[GenContext]] = None,
        cfg_img_precontexts: Optional[List[GenContext]] = None,
        **kw,
    ) -> List[Image.Image]:
        """Grouped t2i: G independent images denoise concurrently on a
        ("data", "model", "seq") mesh (docs/MULTICHIP_DENOISE.md lever 3),
        then VAE-decode one by one. Same knobs as :meth:`gen_image`."""
        latents = self.gen_image_latents_grouped(
            image_shape, gen_contexts, group_mesh,
            cfg_text_precontexts=cfg_text_precontexts,
            cfg_img_precontexts=cfg_img_precontexts, **kw,
        )
        return [self.decode_image(latents[g], image_shape)
                for g in range(latents.shape[0])]

    def gen_image_latents_grouped(
        self,
        image_shape: Tuple[int, int],
        gen_contexts: List[GenContext],
        group_mesh,
        cfg_text_precontexts: Optional[List[GenContext]] = None,
        cfg_img_precontexts: Optional[List[GenContext]] = None,
        cfg_text_scale: float = 4.0,
        cfg_img_scale: float = 1.5,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        num_timesteps: int = 50,
        timestep_shift: float = 3.0,
    ) -> jax.Array:
        """G-image grouped denoise over a ("data", "model", "seq") mesh: each
        image runs the parity-tested TP×SP program on its own submesh with
        zero cross-group collectives. All images share the CFG knobs and
        ``image_shape``; per-image caches are padded to a common capacity
        bucket. Returns latents [G, h*w, patch_latent_dim]."""
        G = len(gen_contexts)
        assert group_mesh.axis_names == ("data", "model", "seq"), group_mesh
        assert group_mesh.shape["data"] == G, (group_mesh.shape, G)
        assert self.cfg.llm.mot_attention, (
            "grouped denoise routes projections through the MoT gen experts"
        )
        H, W = image_shape
        ld = self.cfg.latent_downsample
        h, w = H // ld, W // ld
        n = h * w
        assert n % group_mesh.shape["seq"] == 0, (n, group_mesh.shape)
        use_text_cfg = cfg_text_scale > 1.0 and cfg_text_precontexts is not None
        use_img_cfg = cfg_img_scale > 1.0 and cfg_img_precontexts is not None

        group_caches, group_positions = [], []
        for g in range(G):
            contexts = [gen_contexts[g]]
            if use_text_cfg:
                contexts.append(cfg_text_precontexts[g])
            if use_img_cfg:
                contexts.append(cfg_img_precontexts[g])
            caches, positions = self._stack_contexts(contexts)
            group_caches.append(caches)
            group_positions.append(positions)
        # equalize capacities across groups (each is already bucket-padded)
        cap = max(c.capacity for c in group_caches)
        group_caches = [
            c if c.capacity == cap else c.replace(
                k=jnp.pad(c.k, ((0, 0), (0, 0), (0, 0), (0, cap - c.capacity), (0, 0))),
                v=jnp.pad(c.v, ((0, 0), (0, 0), (0, 0), (0, cap - c.capacity), (0, 0))),
            )
            for c in group_caches
        ]

        pos_ids = jnp.asarray(self._position_ids(H, W, ld, self.cfg.max_latent_size))
        group_noise = [
            jax.random.normal(
                self._next_rng(), (n, self.cfg.patch_latent_dim), jnp.float32
            )
            for _ in range(G)
        ]
        from unimedvl_tpu.parallel.sp_denoise import generate_latents_dp_tp_sp

        return generate_latents_dp_tp_sp(
            self.params, self.cfg, group_caches, group_positions,
            [pos_ids] * G, group_noise, self._start_end(), group_mesh,
            num_timesteps=num_timesteps, timestep_shift=timestep_shift,
            cfg_text_scale=cfg_text_scale, cfg_img_scale=cfg_img_scale,
            cfg_interval=tuple(cfg_interval), cfg_renorm_min=cfg_renorm_min,
            cfg_renorm_type=cfg_renorm_type,
            use_text_cfg=use_text_cfg, use_img_cfg=use_img_cfg,
        )

    def decode_image(self, latent_tokens: jax.Array, image_shape) -> Image.Image:
        H, W = image_shape
        ld = self.cfg.latent_downsample
        h, w = H // ld, W // ld
        with self._mesh_ctx():
            img = bagel.decode_latent_to_image(
                self.params, self.cfg, latent_tokens, h, w
            )
        return Image.fromarray(np.asarray(img))

    # -- top-level recipes ------------------------------------------------------
    def interleave_inference(
        self,
        input_lists: List[Union[str, Image.Image]],
        think: bool = False,
        understanding_output: bool = False,
        max_think_token_n: int = 1000,
        do_sample: bool = False,
        text_temperature: float = 0.3,
        cfg_text_scale: float = 3.0,
        cfg_img_scale: float = 1.5,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        timestep_shift: float = 3.0,
        num_timesteps: int = 50,
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        image_shapes: Tuple[int, int] = (1024, 1024),
    ) -> List[Union[str, Image.Image]]:
        """Main interleaved recipe (inferencer.py:552-638)."""
        output_list: List[Union[str, Image.Image]] = []
        gen_context = self.init_gen_context()
        cfg_img_context = gen_context.fork()
        cfg_text_context = gen_context.fork()

        if think:
            sp = VLM_THINK_SYSTEM_PROMPT if understanding_output else GEN_THINK_SYSTEM_PROMPT
            gen_context = self.update_context_text(sp, gen_context)
            cfg_img_context = self.update_context_text(sp, cfg_img_context)

        for input_term in input_lists:
            if isinstance(input_term, str):
                cfg_text_context = gen_context.fork()
                gen_context = self.update_context_text(input_term, gen_context)
                cfg_img_context = self.update_context_text(input_term, cfg_img_context)
            elif isinstance(input_term, Image.Image):
                img = self.vae_transform.resize_transform(pil_img2rgb(input_term))
                gen_context = self.update_context_image(
                    img, gen_context, vae=not understanding_output, vit=True
                )
                cfg_text_context = gen_context.fork()
            else:
                raise ValueError(f"Unsupported input type: {type(input_term)}")

        if understanding_output:
            text = self.gen_text(
                gen_context, max_length=max_think_token_n,
                do_sample=do_sample, temperature=text_temperature,
            )
            output_list.append(text)
        else:
            if think:
                text = self.gen_text(
                    gen_context, max_length=max_think_token_n,
                    do_sample=do_sample, temperature=text_temperature,
                )
                gen_context = self.update_context_text(text, gen_context)
                output_list.append(text)
            img = self.gen_image(
                image_shapes,
                gen_context,
                cfg_text_precontext=cfg_text_context,
                cfg_img_precontext=cfg_img_context,
                cfg_text_scale=cfg_text_scale,
                cfg_img_scale=cfg_img_scale,
                cfg_interval=cfg_interval,
                timestep_shift=timestep_shift,
                num_timesteps=num_timesteps,
                cfg_renorm_min=cfg_renorm_min,
                cfg_renorm_type=cfg_renorm_type,
            )
            output_list.append(img)
        return output_list

    def interleave_inference_for_vqa_reconstruction_ver1(
        self,
        input_lists: List[Union[str, Image.Image]],
        reconstruct_image: bool = False,
        max_think_token_n: int = 1000,
        do_sample: bool = False,
        text_temperature: float = 0.3,
        cfg_text_scale: float = 3.0,
        cfg_img_scale: float = 1.5,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        timestep_shift: float = 3.0,
        num_timesteps: int = 50,
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        **_,
    ) -> List[Union[str, Image.Image]]:
        """VQA + sequential multi-image reconstruction from the answer
        (inferencer.py:282-362). Each generated image is fed back into the
        conditioning context (vae-only) before reconstructing the next."""
        output_list: List[Union[str, Image.Image]] = []
        vqa_context = self.init_gen_context()
        vqa_img_context = vqa_context.fork()

        for input_term in input_lists:
            if isinstance(input_term, str):
                vqa_context = self.update_context_text(input_term, vqa_context)
                vqa_img_context = self.update_context_text(input_term, vqa_img_context)
            elif isinstance(input_term, Image.Image):
                img = self.vae_transform.resize_transform(pil_img2rgb(input_term))
                vqa_context = self.update_context_image(img, vqa_context, vae=True, vit=True)
            else:
                raise ValueError(f"Unsupported input type: {type(input_term)}")

        vqa_answer = self.gen_text(
            vqa_context, max_length=max_think_token_n,
            do_sample=do_sample, temperature=text_temperature,
        )
        output_list.append(vqa_answer)
        if not reconstruct_image or not vqa_answer.strip():
            return output_list

        input_images = [x for x in input_lists if isinstance(x, Image.Image)]
        if not input_images:
            return output_list

        cfg_text_precontext = vqa_context.fork()
        cfg_img_precontext = self.update_context_text(vqa_answer, vqa_img_context.fork())
        full_context = self.update_context_text(vqa_answer, vqa_context.fork())

        for original_image in input_images:
            w, h = original_image.size
            target_shape = self._calculate_target_size_with_aspect_ratio(w, h)
            generated = self.gen_image(
                target_shape,
                full_context,
                cfg_text_precontext=cfg_text_precontext,
                cfg_img_precontext=cfg_img_precontext,
                cfg_text_scale=cfg_text_scale,
                cfg_img_scale=cfg_img_scale,
                cfg_interval=cfg_interval,
                timestep_shift=timestep_shift,
                num_timesteps=num_timesteps,
                cfg_renorm_min=cfg_renorm_min,
                cfg_renorm_type=cfg_renorm_type,
            )
            output_list.append(generated)
            processed = self.vae_transform.resize_transform(pil_img2rgb(generated))
            full_context = self.update_context_image(processed, full_context, vae=True, vit=False)
            cfg_text_precontext = self.update_context_image(
                processed, cfg_text_precontext, vae=True, vit=False
            )
        return output_list

    def interleave_inference_for_vqa_reconstruction_ver0(
        self,
        input_lists: List[Union[str, Image.Image]],
        reconstruct_image: bool = False,
        max_think_token_n: int = 1000,
        do_sample: bool = False,
        text_temperature: float = 0.3,
        cfg_interval: Tuple[float, float] = (0.4, 1.0),
        timestep_shift: float = 3.0,
        num_timesteps: int = 50,
        cfg_renorm_min: float = 0.0,
        cfg_renorm_type: str = "global",
        multi_image: bool = False,
        **_,
    ) -> List[Union[str, Image.Image]]:
        """VQA + per-image fresh-context reconstruction with text+img scale 7.0
        (inferencer.py:365-549; ver0 = first image only, ver0_1 = every image
        via multi_image=True)."""
        output_list: List[Union[str, Image.Image]] = []
        vqa_context = self.init_gen_context()

        for input_term in input_lists:
            if isinstance(input_term, str):
                vqa_context = self.update_context_text(input_term, vqa_context)
            elif isinstance(input_term, Image.Image):
                img = self.vae_transform.resize_transform(pil_img2rgb(input_term))
                vqa_context = self.update_context_image(img, vqa_context, vae=True, vit=True)
            else:
                raise ValueError(f"Unsupported input type: {type(input_term)}")

        vqa_answer = self.gen_text(
            vqa_context, max_length=max_think_token_n,
            do_sample=do_sample, temperature=text_temperature,
        )
        output_list.append(vqa_answer)
        if not reconstruct_image or not vqa_answer.strip():
            return output_list

        input_images = [x for x in input_lists if isinstance(x, Image.Image)]
        if not input_images:
            return output_list
        if not multi_image:
            input_images = input_images[:1]

        for original_image in input_images:
            w, h = original_image.size
            target_shape = self._calculate_target_size_with_aspect_ratio(w, h)
            gen_context = self.init_gen_context()
            processed = self.vae_transform.resize_transform(pil_img2rgb(original_image))
            cfg_text_precontext = self.update_context_image(
                processed, gen_context.fork(), vae=True, vit=True
            )
            full_context = self.update_context_text(vqa_answer, cfg_text_precontext.fork())
            cfg_img_precontext = self.update_context_text(vqa_answer, gen_context.fork())
            generated = self.gen_image(
                target_shape,
                full_context,
                cfg_text_precontext=cfg_text_precontext,
                cfg_img_precontext=cfg_img_precontext,
                cfg_text_scale=7.0,
                cfg_img_scale=7.0,
                cfg_interval=cfg_interval,
                timestep_shift=timestep_shift,
                num_timesteps=num_timesteps,
                cfg_renorm_min=cfg_renorm_min,
                cfg_renorm_type=cfg_renorm_type,
            )
            output_list.append(generated)
        return output_list

    interleave_inference_for_vqa_reconstruction_ver0_1 = (
        lambda self, input_lists, **kw: self.interleave_inference_for_vqa_reconstruction_ver0(
            input_lists, multi_image=True, **kw
        )
    )

    def _calculate_target_size_with_aspect_ratio(self, width: int, height: int):
        """(H, W) preserving aspect ratio under the VAE transform constraints
        (inferencer.py:42-71)."""
        from unimedvl_tpu.data.imaging import compute_resize_shape

        rt = self.vae_transform.resize_transform
        new_w, new_h = compute_resize_shape(
            width, height, rt.max_size, rt.min_size, rt.stride, rt.max_pixels
        )
        return new_h, new_w

    def __call__(
        self,
        image: Optional[Union[Image.Image, List[Image.Image]]] = None,
        text: Optional[str] = None,
        inference_ver: int = 0,
        **kwargs,
    ) -> Dict[str, Any]:
        """Main entry point (inferencer.py:640-680)."""
        output_dict: Dict[str, Any] = {"image": None, "text": None}
        if image is None and text is None:
            return output_dict
        input_list: List[Union[str, Image.Image]] = []
        if image is not None:
            input_list.extend(image if isinstance(image, list) else [image])
        if text is not None:
            input_list.append(text)

        if inference_ver == 0:
            output_list = self.interleave_inference(input_list, **kwargs)
        elif inference_ver == 1:
            output_list = self.interleave_inference_for_vqa_reconstruction_ver1(
                input_list, **kwargs
            )
        else:
            raise ValueError(f"Unsupported inference_ver: {inference_ver}")

        for item in output_list:
            if isinstance(item, Image.Image):
                if output_dict["image"] is None:
                    output_dict["image"] = []
                output_dict["image"].append(item)
            elif isinstance(item, str):
                output_dict["text"] = item
        if isinstance(output_dict["image"], list) and len(output_dict["image"]) == 1:
            output_dict["image"] = output_dict["image"][0]
        return output_dict

    # -- convenience: reference Bagel.chat equivalent ----------------------------
    def chat(
        self,
        images: List[Image.Image],
        prompt: str,
        max_length: int = 512,
        do_sample: bool = False,
        temperature: float = 1.0,
    ) -> str:
        """VQA/report generation (bagel.py:1321-1391): ViT-only image context,
        then prompt, then decode."""
        ctx = self.init_gen_context()
        for image in images:
            ctx = self.update_context_image(
                pil_img2rgb(image), ctx, vae=False, vit=True
            )
        ctx = self.update_context_text(prompt, ctx)
        return self.gen_text(
            ctx, max_length=max_length, do_sample=do_sample, temperature=temperature
        )

    def chat_turn(
        self,
        ctx: Optional[GenContext],
        prompt: str,
        images: Optional[List[Image.Image]] = None,
        max_length: int = 512,
        do_sample: bool = False,
        temperature: float = 1.0,
    ) -> Tuple[str, GenContext]:
        """One turn of a STATEFUL chat: appends images/prompt to ``ctx``
        (None starts a conversation), decodes, and returns (answer, new_ctx)
        whose cache already contains the answer — the next turn prefills ONLY
        its new text. Matches the reference's cache-keeping chat semantics
        (bagel.py:1321-1391 + 1259-1314) without the O(turns^2) re-prefill
        the stateless ``chat`` pays."""
        if ctx is None:
            ctx = self.init_gen_context()
        for image in images or []:
            ctx = self.update_context_image(
                pil_img2rgb(image), ctx, vae=False, vit=True
            )
        ctx = self.update_context_text(prompt, ctx)
        return self.gen_text(
            ctx, max_length=max_length, do_sample=do_sample,
            temperature=temperature, return_ctx=True,
        )

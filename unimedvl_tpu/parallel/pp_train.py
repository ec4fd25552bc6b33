"""GPipe-style pipeline-parallel training over a "pipe" mesh axis.

The reference has no distributed training at all (SURVEY.md §2.4 — it ships
accelerate placement for inference only); this is a beyond-reference scaling
path. The scan-stacked layer pytree [L, ...] (models/qwen2_mot.py
forward_train) shards its leading L dim over "pipe": stage s holds layers
[s*L/S, (s+1)*L/S) and the classic GPipe rotation streams M microbatches
through the S stages with `lax.ppermute` hops between neighbours
(bubble fraction (S-1)/(M+S-1)).

Design notes (TPU-first):
- ONE jitted shard_map holds the whole schedule: a lax.scan over
  M+S-1 ticks; every stage computes every tick (bubble ticks produce
  garbage that is masked out of the output), which keeps the program
  SPMD-uniform — no data-dependent control flow.
- Per-microbatch state (positions, dense mask, MoT routing indexes) is
  replicated and indexed stage-side at microbatch m = tick - stage; the
  layer body is rebuilt per tick via qwen2_mot.make_train_layer_body —
  the rope tables / mask it closes over are O(T) / O(T^2) elementwise,
  negligible next to L/S transformer layers.
- The pipeline is DIFFERENTIABLE end-to-end: ppermute transposes to the
  reverse rotation, so jax.grad through pipeline_train_loss gives exact
  (GPipe, full-stash) gradients; with cfg.llm.remat each stage recomputes
  its layer activations in the backward instead of stashing them.
- Composes with the loss epilogue on replicated params: models/bagel.py
  train_embed / train_losses run vmapped over microbatches outside the
  shard_map (tiny next to the 28-layer stack).

Limitations (asserted): L % S == 0; the diffusion feature-layer tap
(e2e REPA) is not available inside the pipeline — use the TP/FSDP trainer
for REPA runs.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unimedvl_tpu.config import BagelConfig
from unimedvl_tpu.models import bagel
from unimedvl_tpu.models import qwen2_mot as mot


def shard_map(f, *, mesh, in_specs, out_specs, axis_names=None):
    """jax.shard_map across the 0.8 rename (check_vma <- check_rep).
    ``axis_names`` (jax >= 0.9) makes f manual over ONLY those mesh axes —
    the rest stay auto, so XLA's SPMD partitioner handles e.g. the TP axis
    inside the manual pipeline region (requires running under jit)."""
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        kw = {}
        if axis_names is not None:
            kw["axis_names"] = axis_names
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False, **kw,
        )
    from jax.experimental.shard_map import shard_map as _sm  # pragma: no cover

    assert axis_names is None, "partial-auto shard_map needs jax >= 0.9"
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)


def pipe_layer_specs(params: Dict, cfg: BagelConfig = None) -> Dict:
    """PartitionSpec pytree for a Bagel params tree under pipeline
    parallelism: llm.layers shard their stacked L dim over "pipe".

    With ``cfg`` given the specs COMPOSE with tensor parallelism: layer
    kernels keep their TP dims over "model" (P("pipe", ..., "model")), and
    the non-layer LLM params (embed/lm_head) take the usual TP specs
    (replicated over "pipe"). Without cfg, layers are P("pipe") and
    everything else replicated (pipe-only mesh)."""
    if cfg is None:
        specs = jax.tree.map(lambda _: P(), params)
        specs["llm"]["layers"] = jax.tree.map(
            lambda _: P("pipe"), params["llm"]["layers"]
        )
        return specs

    from unimedvl_tpu.parallel.mesh import bagel_param_specs

    specs = bagel_param_specs(cfg, params)
    specs["llm"]["layers"] = jax.tree.map(
        lambda _, s: P("pipe", *tuple(s)[1:]),
        params["llm"]["layers"],
        specs["llm"]["layers"],
    )
    return specs


def place_params_pp(params: Dict, mesh: Mesh, cfg: BagelConfig = None) -> Dict:
    specs = pipe_layer_specs(params, cfg=cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def pipeline_layers(
    cfg: BagelConfig,
    mesh: Mesh,
    layers: Dict,  # stacked [L, ...] layer pytree, L % pipe == 0
    xs: jax.Array,  # [M, T, C] embedded microbatches
    aux: Dict,  # per-microbatch arrays, leading M: position_ids, mask,
    #             und_idx, gen_idx, seg_doc/seg_fn/seg_noise (optional)
) -> jax.Array:
    """Run the layer stack over M microbatches with the GPipe schedule.
    Returns [M, T, C] hidden states (pre final norm).

    With a "data" axis in the mesh the microbatch dim shards over it: each
    data slice runs an INDEPENDENT pipeline over its own M/dp microbatches
    (classic DP of pipelines — zero cross-slice collectives in here; the
    data-axis grad reduction happens automatically in the backward because
    params are replicated over "data"). Composes with auto-TP over "model"
    (partial-auto shard_map) for full 3D PP x DP x TP."""
    S = mesh.shape["pipe"]
    T, C = xs.shape[1:]
    lcfg = cfg.llm

    has_segments = "seg_doc" in aux

    def stage_fn(local_layers, xs, aux):
        stage = jax.lax.axis_index("pipe")
        M = xs.shape[0]  # LOCAL microbatch count (M_global / dp)
        steps = M + S - 1

        def apply_layers(x, a):
            segments = (
                (a["seg_doc"], a["seg_fn"], a["seg_noise"])
                if has_segments
                else None
            )
            body = mot.make_train_layer_body(
                lcfg, a["position_ids"], a["mask"], a["und_idx"], a["gen_idx"],
                segments=segments,
            )
            if lcfg.remat:
                body = jax.checkpoint(
                    body,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            y, _ = jax.lax.scan(body, x, local_layers)
            return y

        def tick(state, t):
            m = t - stage  # microbatch this stage works on (garbage if OOB)
            x = jnp.where(stage == 0, xs[jnp.clip(t, 0, M - 1)], state)
            a = jax.tree.map(lambda v: v[jnp.clip(m, 0, M - 1)], aux)
            y = apply_layers(x, a)
            nxt = jax.lax.ppermute(
                y, "pipe", [(i, (i + 1) % S) for i in range(S)]
            )
            return nxt, y

        _, ys = jax.lax.scan(
            tick, jnp.zeros((T, C), xs.dtype), jnp.arange(steps)
        )
        # microbatch m leaves the last stage at tick m + S - 1
        out = jax.lax.dynamic_slice_in_dim(ys, S - 1, M, axis=0)
        out = jnp.where(stage == S - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pipe")  # replicate the result everywhere

    L = jax.tree.leaves(layers)[0].shape[0]
    assert L % S == 0, f"layers {L} not divisible by pipe stages {S}"

    # Manual over "pipe" (+ "data" when present: microbatches shard over it,
    # so each data slice schedules its LOCAL M/dp pipeline); any other mesh
    # axis (e.g. "model" for TP) stays auto — XLA partitions the layer
    # matmuls/collectives inside the pipeline region from the params'
    # NamedShardings (jax >= 0.9 partial-auto; requires running under jit,
    # which make_pp_train_step guarantees).
    has_data = "data" in mesh.axis_names
    if has_data:
        dp = mesh.shape["data"]
        M = xs.shape[0]
        assert M % dp == 0, f"microbatches {M} not divisible by data axis {dp}"
    manual = {"pipe"} | ({"data"} if has_data else set())
    axis_names = manual if manual != set(mesh.axis_names) else None
    mb = P("data") if has_data else P()
    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P("pipe"), mb, mb),
        out_specs=mb,
        axis_names=axis_names,
    )
    return fn(layers, xs, aux)


def _microbatch_aux(cfg: BagelConfig, batches: Dict) -> Dict:
    """Build the per-microbatch aux pytree ([M, ...]) the pipeline indexes
    stage-side. Dense masks are materialised per microbatch — on TPU with
    T >= 256 the layer body switches to the block-sparse train kernel and
    ignores them (make_train_layer_body use_train_flash), but they must
    exist for the jnp path."""
    from unimedvl_tpu.ops.blockmask import dense_packed_mask

    aux = {
        "position_ids": batches["packed_position_ids"],
        "und_idx": batches["und_idx"],
        "gen_idx": batches["gen_idx"],
        "mask": jax.vmap(dense_packed_mask)(
            batches["mask_document_id"],
            batches["mask_fn_id"],
            batches["mask_noise_id"],
        ),
        "seg_doc": batches["mask_document_id"],
        "seg_fn": batches["mask_fn_id"],
        "seg_noise": batches["mask_noise_id"],
    }
    return aux


def pipeline_train_loss(
    params: Dict,
    cfg: BagelConfig,
    mesh: Mesh,
    batches: Dict,  # pytree with leading microbatch axis [M, ...]
    rng: jax.Array,
    bn_state=None,
):
    """Mean training loss over M microbatches with the layer stack pipelined
    over "pipe". Numerically equivalent to the mean of per-microbatch
    bagel.train_forward losses (tests/test_pp_train.py)."""
    assert cfg.e2e is None or cfg.e2e.diffusion_feature_layer is None, (
        "the diffusion feature tap is not available inside the pipeline"
    )
    M = batches["packed_position_ids"].shape[0]
    rngs = jax.random.split(rng, M)

    def embed_one(batch, r):
        x, stash = bagel.train_embed(params, cfg, batch, r, bn_state=bn_state)
        return x, stash

    xs, stashes = jax.vmap(embed_one)(batches, rngs)

    if cfg.llm.freeze_und:
        def fz(x, und_idx):
            return x.at[und_idx].set(
                jax.lax.stop_gradient(
                    jnp.take(x, und_idx, axis=0, mode="fill", fill_value=0)
                ),
                mode="drop",
            )

        xs = jax.vmap(fz)(xs, batches["und_idx"])

    aux = _microbatch_aux(cfg, batches)
    hs = pipeline_layers(cfg, mesh, params["llm"]["layers"], xs, aux)

    def finish_one(batch, h, stash):
        # final norm runs on replicated params outside the pipeline
        h = mot.final_norm(
            params["llm"], cfg.llm, h, batch["und_idx"], batch["gen_idx"]
        )
        out = bagel.train_losses(params, cfg, batch, h, stash)
        return out["loss"], out.get("bn_state")

    losses, bn_states = jax.vmap(finish_one)(batches, hs, stashes)
    new_bn = (
        jax.tree.map(lambda v: jnp.mean(v, axis=0), bn_states)
        if bn_state is not None
        else None
    )
    return jnp.mean(losses), new_bn

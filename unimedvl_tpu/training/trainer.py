"""Training step: loss, grads, optimizer — sharded over a ("data", "model")
mesh (DP over packed sequences, TP over both MoT experts).

The reference releases no training pipeline (README.md:60-67); this implements
the training-time forward it ships in the modeling code (bagel.py:202-374)
with an optax AdamW loop, TPU-first.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unimedvl_tpu.config import BagelConfig
from unimedvl_tpu.models import bagel
from unimedvl_tpu.parallel.mesh import bagel_param_specs


@struct.dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    step: jax.Array
    # latent batch-norm running stats (e2e-VAE extras); None when disabled
    bn_state: "object | None" = None
    # EMA shadow of params (the released checkpoints ARE the EMA —
    # ema.safetensors, interactive_vqa_inferencer.py:127-161); None when
    # ema_decay is not set. Kept in fp32: at decay 0.999 the per-step update
    # is ~1e-3 of the value, below bf16's resolution.
    ema_params: "Dict | None" = None


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.01, b1=0.9, b2=0.95
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)


def _freeze_und_labels(params: Dict) -> Dict:
    """'train'/'freeze' labels mirroring the freeze_und stop-gradient
    boundary (qwen2_mot._route / forward_train): the und-expert twins of
    every layer (attn q/k/v/o/qkv + q_norm/k_norm, mlp, both layernorms) and
    the und final norm get zero grads from the loss, so the optimizer must
    not move them either — AdamW's decoupled weight decay would otherwise
    shrink 'frozen' weights every step."""
    import jax.tree_util as jtu

    def label(path, _):
        keys = [p.key for p in path if hasattr(p, "key")]
        if "llm" not in keys:
            return "train"
        if "layers" in keys:
            i = keys.index("layers")
            sub = keys[i + 1] if len(keys) > i + 1 else ""
            if sub in ("input_layernorm", "post_attention_layernorm", "mlp"):
                return "freeze"
            if sub == "attn" and len(keys) > i + 2:
                return "train" if keys[i + 2].endswith("_gen") else "freeze"
            return "train"
        li = keys.index("llm")
        if len(keys) > li + 1 and keys[li + 1] == "norm":
            return "freeze"
        return "train"

    return jtu.tree_map_with_path(label, params)


def apply_freeze_und(optimizer, params: Dict) -> optax.GradientTransformation:
    """Wrap an optimizer so frozen-und parameters receive ZERO updates."""
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()},
        _freeze_und_labels(params),
    )


def create_train_state(params: Dict, optimizer=None, cfg: BagelConfig = None) -> TrainState:
    optimizer = optimizer or make_optimizer()
    bn_state = None
    if cfg is not None and cfg.e2e is not None and cfg.e2e.enable_batch_norm:
        from unimedvl_tpu.training.e2e_vae import BatchNormState

        bn_state = BatchNormState.create(cfg.vae.z_channels)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.asarray(0, jnp.int32),
        bn_state=bn_state,
    )


def loss_fn(params, cfg: BagelConfig, batches: Dict, rng, bn_state=None):
    """batches: pytree with a leading DP axis [B, ...] of packed sequences.
    Returns (mean loss, new bn_state or None) — per-sequence BN stats are
    averaged across the DP batch (the sync-BN analogue of the reference's
    use_sync_bn flag, bagel.py:79)."""
    B = batches["packed_position_ids"].shape[0]
    rngs = jax.random.split(rng, B)

    def one(batch, r):
        out = bagel.train_forward(params, cfg, batch, r, bn_state=bn_state)
        return out["loss"], out.get("bn_state")

    losses, bn_states = jax.vmap(one)(batches, rngs)
    new_bn = (
        jax.tree.map(lambda x: jnp.mean(x, axis=0), bn_states)
        if bn_states is not None
        else None
    )
    return jnp.mean(losses), new_bn


@partial(jax.jit, static_argnames=("cfg", "optimizer"), donate_argnums=(0,))
def train_step(
    state: TrainState,
    cfg: BagelConfig,
    batches: Dict,
    rng: jax.Array,
    optimizer=None,
) -> tuple:
    optimizer = optimizer or make_optimizer()
    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batches, rng, state.bn_state
    )
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        TrainState(
            params=params, opt_state=opt_state, step=state.step + 1,
            bn_state=new_bn if new_bn is not None else state.bn_state,
            ema_params=state.ema_params,  # EMA updates live in make_train_step
        ),
        loss,
    )


def _replicate_unplaced(tree, mesh: Mesh):
    """Pin any leaf not already sharded on ``mesh`` (optax counters, the step
    scalar, bn stats) to a replicated NamedSharding. Keeps the whole
    TrainState restorable: orbax restore honours target shardings, and a
    leaf committed to a single device would clash with the mesh-wide step."""
    rep = NamedSharding(mesh, P())

    def fix(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(fix, tree)


def make_train_step(
    cfg: BagelConfig,
    mesh: Mesh,
    params: Dict,
    optimizer=None,
    fsdp: bool = False,
    accum_steps: int = 1,
    ema_decay: "float | None" = None,
    ema_dtype=jnp.float32,
):
    """Build a pjit-ed train step with explicit shardings: params/opt-state TP
    over "model", batch DP over "data". With cfg.llm.freeze_und the und-expert
    subtrees are masked out of the optimizer entirely (zero updates, not just
    zero grads — see apply_freeze_und).

    ``fsdp``: additionally shard the large LLM kernels (and their Adam
    moments) over "data" — XLA all-gathers weights per layer in fwd/bwd and
    reduce-scatters grads back to the shard (grads are explicitly constrained
    to the param sharding so the accumulator never materialises replicated).
    14B bf16 params + fp32 moments do not fit 16 GB/chip under TP(<=4) alone.

    ``accum_steps``: gradient accumulation — batches carry a leading
    [accum_steps, B, ...] axis, scanned with a grad-sum carry (memory is ONE
    grad tree, not accum_steps of them); one optimizer update of the mean
    grad per call. Equivalent to a single [accum_steps*B] batch since
    loss_fn is a mean over sequences.

    ``ema_decay``: maintain an exponential-moving-average shadow of params
    (``state.ema_params``, dtype ``ema_dtype``, sharded exactly like params so
    FSDP splits its memory too) — the released UniMedVL checkpoints are the
    EMA weights (ema.safetensors); export the shadow with
    ``weights.bagel_export.export_bagel_checkpoint(dir, state.ema_params, cfg)``.
    """
    optimizer = optimizer or make_optimizer()
    if cfg.llm.freeze_und:
        optimizer = apply_freeze_und(optimizer, params)
    pspecs = bagel_param_specs(cfg, params, fsdp=fsdp)
    param_shardings = jax.tree.map(
        lambda _, s: NamedSharding(mesh, s), params, pspecs
    )

    def constrain(tree):
        # pin grads/params to the (fsdp-)sharded layout so the grad
        # accumulator and Adam moments never materialise replicated
        return jax.lax.with_sharding_constraint(tree, param_shardings)

    def shard(tree, specs):
        # COPY before placing: device_put aliases when the layout already
        # matches, and the train step donates its state — an aliased
        # init_state would invalidate the CALLER's params after step 1
        return jax.tree.map(
            lambda x, s: jax.device_put(jnp.array(x), NamedSharding(mesh, s)),
            tree, specs,
        )

    def _grad_one(params, bn_state, batch, r):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, cfg, batch, r, bn_state
        )
        return loss, new_bn, constrain(grads)

    def _step(state, batches, rng):
        if accum_steps == 1:
            loss, new_bn, grads = _grad_one(state.params, state.bn_state, batches, rng)
        else:
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                g_acc, l_acc, bn_acc = carry
                batch_i, r_i = xs
                l, nb, g = _grad_one(state.params, state.bn_state, batch_i, r_i)
                g_acc = constrain(jax.tree.map(jnp.add, g_acc, g))
                if bn_acc is not None:
                    bn_acc = jax.tree.map(jnp.add, bn_acc, nb)
                return (g_acc, l_acc + l, bn_acc), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            bn0 = (
                jax.tree.map(jnp.zeros_like, state.bn_state)
                if state.bn_state is not None
                else None
            )
            (g_sum, l_sum, bn_sum), _ = jax.lax.scan(
                body, (g0, jnp.zeros(()), bn0), (batches, rngs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, g_sum)
            loss = l_sum * inv
            new_bn = (
                jax.tree.map(lambda x: x * inv, bn_sum)
                if bn_sum is not None
                else None
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = constrain(optax.apply_updates(state.params, updates))
        new_ema = state.ema_params
        if ema_decay is not None:
            new_ema = constrain(jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p.astype(e.dtype),
                state.ema_params, new_params,
            ))
        return (
            TrainState(
                params=new_params, opt_state=opt_state, step=state.step + 1,
                bn_state=new_bn if new_bn is not None else state.bn_state,
                ema_params=new_ema,
            ),
            loss,
        )

    batch_spec = P("data") if accum_steps == 1 else P(None, "data")
    batch_sharding = NamedSharding(mesh, batch_spec)
    step = jax.jit(
        _step,
        in_shardings=(None, batch_sharding, None),
        donate_argnums=(0,),
    )

    def init_state() -> TrainState:
        sharded_params = shard(params, pspecs)
        opt_state = _replicate_unplaced(optimizer.init(sharded_params), mesh)
        bn_state = None
        if cfg.e2e is not None and cfg.e2e.enable_batch_norm:
            from unimedvl_tpu.training.e2e_vae import BatchNormState

            bn_state = _replicate_unplaced(
                BatchNormState.create(cfg.vae.z_channels), mesh
            )
        ema = None
        if ema_decay is not None:
            # EMA starts equal to params, sharded identically. Must be a
            # DISTINCT buffer even when params are already ema_dtype —
            # astype(same_dtype) aliases, and the donated train-step state
            # would then donate the same buffer twice (Execute() rejects it).
            ema = jax.tree.map(
                lambda x: jnp.array(x, dtype=ema_dtype, copy=True),
                sharded_params,
            )
        return TrainState(
            params=sharded_params,
            opt_state=opt_state,
            step=jax.device_put(jnp.asarray(0, jnp.int32), NamedSharding(mesh, P())),
            bn_state=bn_state,
            ema_params=ema,
        )

    return step, init_state


def make_pp_train_step(cfg: BagelConfig, mesh: Mesh, params: Dict, optimizer=None,
                       ema_decay: "float | None" = None, ema_dtype=jnp.float32):
    """Pipeline-parallel train step: the layer stack shards over the mesh's
    "pipe" axis and M microbatches stream through the GPipe schedule
    (parallel/pp_train.py); embeddings/losses run replicated per microbatch.
    Batches carry a leading microbatch axis [M, ...]; grads are the exact
    mean over microbatches (one optimizer update per call)."""
    from unimedvl_tpu.parallel.pp_train import (
        pipe_layer_specs,
        pipeline_train_loss,
    )

    optimizer = optimizer or make_optimizer()
    if cfg.llm.freeze_und:
        optimizer = apply_freeze_und(optimizer, params)
    # with a ("pipe", "model") mesh the layer specs compose PP with TP
    pspecs = pipe_layer_specs(
        params, cfg=cfg if "model" in mesh.axis_names else None
    )
    param_shardings = jax.tree.map(
        lambda _, s: NamedSharding(mesh, s), params, pspecs
    )

    def _loss(p, batches, rng, bn_state):
        return pipeline_train_loss(p, cfg, mesh, batches, rng, bn_state=bn_state)

    def _step(state, batches, rng):
        (loss, new_bn), grads = jax.value_and_grad(_loss, has_aux=True)(
            state.params, batches, rng, state.bn_state
        )
        grads = jax.lax.with_sharding_constraint(grads, param_shardings)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.lax.with_sharding_constraint(
            optax.apply_updates(state.params, updates), param_shardings
        )
        new_ema = state.ema_params
        if ema_decay is not None:
            new_ema = jax.lax.with_sharding_constraint(jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p.astype(e.dtype),
                state.ema_params, new_params,
            ), param_shardings)
        return (
            TrainState(
                params=new_params, opt_state=opt_state, step=state.step + 1,
                bn_state=new_bn if new_bn is not None else state.bn_state,
                ema_params=new_ema,
            ),
            loss,
        )

    step = jax.jit(
        _step,
        in_shardings=(None, NamedSharding(mesh, P()), None),
        donate_argnums=(0,),
    )

    def init_state() -> TrainState:
        placed = jax.tree.map(
            lambda x, s: jax.device_put(jnp.array(x), s), params, param_shardings
        )
        bn_state = None
        if cfg.e2e is not None and cfg.e2e.enable_batch_norm:
            from unimedvl_tpu.training.e2e_vae import BatchNormState

            bn_state = _replicate_unplaced(
                BatchNormState.create(cfg.vae.z_channels), mesh
            )
        ema = None
        if ema_decay is not None:
            # copy=True: never alias params (donated state, see make_train_step)
            ema = jax.tree.map(
                lambda x: jnp.array(x, dtype=ema_dtype, copy=True), placed
            )
        return TrainState(
            params=placed,
            opt_state=_replicate_unplaced(optimizer.init(placed), mesh),
            step=jax.device_put(jnp.asarray(0, jnp.int32), NamedSharding(mesh, P())),
            bn_state=bn_state,
            ema_params=ema,
        )

    return step, init_state

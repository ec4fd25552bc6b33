"""LoRA / QLoRA parameter-efficient fine-tuning.

Beyond-reference feature (the reference ships no fine-tuning code at all,
README.md:60-67): low-rank adapters ride the linear-projection param dicts of
the stacked-layer LLM pytree — a linear ``{"kernel": [L, in, out], ...}``
gains ``{"lora_a": [L, in, r], "lora_b": [L, r, out], "lora_s": [L]}`` and
``qwen2_mot._linear`` adds ``(x @ a) @ b * s`` on every path that consumes
the dict: the packed training forward, and unfused inference (prefill /
decode / denoise). The fused serving layouts require :func:`merge_lora`
first (``quant.fuse_serving_projections`` refuses unmerged adapters).

QLoRA shape: quantize the base first (``quant.quantize_llm_params`` carries
adapter leaves through), or add adapters onto an already-quantized tree —
the frozen int8 base streams at half bandwidth while only the bf16 adapters
(and their Adam moments) train. On a 16 GB v5e chip that turns 14B-scale
tuning from an 8-chip FSDP job into a 1-2 chip one.

TPU notes: the adapter matmuls are [T, in]x[in, r] and [T, r]x[r, out] —
r >= 16 keeps the second dot on the MXU's lane granularity; under TP the
placement rules in ``parallel/mesh._llm_layer_specs`` put ``lora_b``'s out
dim on "model" for column-parallel linears and ``lora_a``'s in dim on
"model" for row-parallel ones, so the adapter math shards exactly like the
base kernel with no extra collectives beyond the psums already there.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# user-facing target names -> (container key, und name, gen name)
_TARGET_MAP = {
    "q": ("attn", "q", "q_gen"),
    "k": ("attn", "k", "k_gen"),
    "v": ("attn", "v", "v_gen"),
    "o": ("attn", "o", "o_gen"),
    "gate": ("mlp", "gate", None),
    "up": ("mlp", "up", None),
    "down": ("mlp", "down", None),
}
TARGETS_ALL: Tuple[str, ...] = tuple(_TARGET_MAP)

_KERNEL_KEYS = ("kernel", "kernel_q", "kernel_qa", "kernel_p4", "kernel_p4a")


def _kernel_shape(p: Dict) -> Tuple[int, ...]:
    for k in _KERNEL_KEYS:
        if k in p:
            shape = tuple(p[k].shape)
            if k in ("kernel_p4", "kernel_p4a"):
                # packed int4: two in-rows per stored byte (ops/w4_matmul.py)
                shape = shape[:-2] + (2 * shape[-2], shape[-1])
            return shape
    raise ValueError(f"not a linear param dict: {sorted(p)}")


def _adapter_sites(layers: Dict, targets: Sequence[str],
                   experts: Sequence[str]):
    """Yield the linear param dicts to adapt inside the stacked layer tree."""
    for t in targets:
        container, und_name, gen_name = _TARGET_MAP[t]
        if container == "attn":
            attn = layers["attn"]
            if "und" in experts and und_name in attn:
                yield attn, und_name
            if "gen" in experts and gen_name in attn:
                yield attn, gen_name
        else:
            if "und" in experts and "mlp" in layers:
                yield layers["mlp"], t
            if "gen" in experts and "mlp_moe_gen" in layers:
                yield layers["mlp_moe_gen"], t


def add_lora(
    params: Dict,
    rng: jax.Array,
    rank: int = 16,
    alpha: float = 32.0,
    targets: Sequence[str] = TARGETS_ALL,
    experts: Sequence[str] = ("und", "gen"),
    dtype=jnp.bfloat16,
) -> Dict:
    """Return a copy of a Bagel/LLM params tree with LoRA adapters attached.

    ``params`` may be the full Bagel tree (adapts ``params["llm"]``) or the
    LLM subtree itself. ``lora_a`` ~ N(0, 1/in), ``lora_b`` = 0 (the model's
    function is unchanged at step 0), ``lora_s`` = alpha/rank per layer.
    Works on bf16 and int8-quantized bases alike.
    """
    unknown = set(targets) - set(_TARGET_MAP)
    if unknown:
        raise ValueError(f"unknown lora targets {sorted(unknown)}; "
                         f"valid: {TARGETS_ALL}")
    params = jax.tree.map(lambda x: x, params)  # shallow-copy every dict
    llm = params["llm"] if "llm" in params else params
    layers = llm["layers"]
    sites = list(_adapter_sites(layers, targets, experts))
    if not sites:
        raise ValueError("no adapter sites matched (targets/experts filter)")
    keys = jax.random.split(rng, len(sites))
    for key, (container, name) in zip(keys, sites):
        p = dict(container[name])
        shape = _kernel_shape(p)
        if len(shape) == 3:  # stacked [L, in, out]
            L, fan_in, _ = shape
            a_shape = (L, fan_in, rank)
            b_shape = (L, rank, shape[2])
            s_shape = (L,)
        elif len(shape) == 2:
            fan_in = shape[0]
            a_shape = (fan_in, rank)
            b_shape = (rank, shape[1])
            s_shape = ()
        else:
            raise ValueError(f"unexpected kernel rank {shape} at {name}")
        p["lora_a"] = (jax.random.normal(key, a_shape, jnp.float32)
                       * (fan_in ** -0.5)).astype(dtype)
        p["lora_b"] = jnp.zeros(b_shape, dtype)
        p["lora_s"] = jnp.full(s_shape, alpha / rank, jnp.float32)
        container[name] = p
    return params


def merge_lora(params: Dict) -> Dict:
    """Fold every adapter into its base kernel and drop the adapter leaves.

    Only bf16/f32 bases ("kernel") can absorb the update exactly; merging
    into a quantized base would silently requantize — quantize AFTER merging
    instead (raise otherwise).
    """

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        if "lora_a" in tree:
            if "kernel" not in tree:
                raise ValueError(
                    "merge_lora on a quantized base: dequantize or quantize "
                    "after merging instead")
            out = {k: v for k, v in tree.items()
                   if not k.startswith("lora_")}
            a, b, s = tree["lora_a"], tree["lora_b"], tree["lora_s"]
            k = tree["kernel"]
            if k.ndim == 3:
                delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32),
                                   b.astype(jnp.float32))
                delta = delta * s[:, None, None]
            else:
                delta = (a.astype(jnp.float32) @ b.astype(jnp.float32)) * s
            out["kernel"] = (k.astype(jnp.float32) + delta).astype(k.dtype)
            return out
        return {k: walk(v) for k, v in tree.items()}

    return walk(params)


def has_lora(params: Dict) -> bool:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return any(
        getattr(p[-1], "key", None) == "lora_a" for p, _ in leaves
    )


def lora_labels(params: Dict) -> Dict:
    """'train' on lora_a/lora_b, 'freeze' everywhere else (incl. lora_s)."""

    def label(path, _):
        key = getattr(path[-1], "key", None) if path else None
        return "train" if key in ("lora_a", "lora_b") else "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def apply_lora_only(optimizer: optax.GradientTransformation,
                    params: Dict) -> optax.GradientTransformation:
    """Wrap an optimizer so ONLY the adapters receive updates; the base
    (incl. AdamW weight decay, which would otherwise shrink frozen weights)
    is untouched."""
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()},
        lora_labels(params),
    )


def make_lora_train_step(cfg, params: Dict, optimizer=None):
    """Memory-lean adapter training step: differentiates ONLY the adapters.

    ``train_step`` + :func:`apply_lora_only` is correct but still
    materializes a full-tree grad pytree and Adam moments for every frozen
    leaf (28 GB of dead grads at 14B) — and ``jax.grad`` rejects integer
    leaves outright, so it cannot train over an int8 (QLoRA) base at all.
    This step splits the tree positionally: the frozen base rides through
    the jit as a plain argument (never closed over, never differentiated),
    grads/moments exist only for the adapter leaves.

    Returns ``(step, adapters0, opt_state0, base0, combine)`` with
    ``step(adapters, opt_state, base, batches, rng) -> (adapters',
    opt_state', loss)`` (adapters/opt_state donated) and
    ``combine(adapters, base) -> params`` for eval / :func:`merge_lora`.
    ``batches`` follow ``trainer.loss_fn``'s contract (leading DP axis).
    e2e-VAE batch-norm extras are not supported here (bn_state is None).
    """
    import functools

    from unimedvl_tpu.training import trainer

    optimizer = optimizer or optax.adamw(1e-4, b1=0.9, b2=0.95)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    idx = frozenset(
        i for i, (p, _) in enumerate(leaves)
        if getattr(p[-1], "key", None) in ("lora_a", "lora_b")
    )
    if not idx:
        raise ValueError("params carry no adapters — add_lora(...) first")
    n = len(leaves)

    def split(tree):
        vals = jax.tree_util.tree_leaves(tree)
        assert len(vals) == n
        return (tuple(v for i, v in enumerate(vals) if i in idx),
                tuple(v for i, v in enumerate(vals) if i not in idx))

    def combine(adapters, base):
        it_a, it_b = iter(adapters), iter(base)
        return jax.tree_util.tree_unflatten(
            treedef,
            [next(it_a) if i in idx else next(it_b) for i in range(n)],
        )

    adapters0, base0 = split(params)
    opt_state0 = optimizer.init(adapters0)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(adapters, opt_state, base, batches, rng):
        def loss(ad):
            l, _ = trainer.loss_fn(combine(ad, base), cfg, batches, rng)
            return l

        loss_val, grads = jax.value_and_grad(loss)(adapters)
        updates, opt_state = optimizer.update(grads, opt_state, adapters)
        return optax.apply_updates(adapters, updates), opt_state, loss_val

    return step, adapters0, opt_state0, base0, combine


def count_lora_params(params: Dict) -> int:
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    return int(sum(
        np.prod(v.shape) for p, v in leaves
        if getattr(p[-1], "key", None) in ("lora_a", "lora_b")
    ))

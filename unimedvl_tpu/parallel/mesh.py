"""Device mesh + tensor-parallel shardings.

The reference has no distributed compute at all — only accelerate's
layer-by-layer placement (SURVEY.md §2.4). Here parallelism is first-class:
a ("data", "model") Mesh; TP shards the attention heads and MLP intermediate
of BOTH MoT experts over "model" (all-reduces ride ICI via XLA-inserted
psums in o_proj/down_proj); the KV cache shards over kv heads; vocab-sharded
lm_head; batch/stream axes shard over "data".

GQA note: the 14B checkpoint has 4 KV heads. TP degrees <= 4 shard the cache
by head; larger degrees replicate KV within groups (XLA handles this from the
specs below as long as model_size divides num_kv_heads; choose mesh shape
accordingly, e.g. v5e-8 = (data=2, model=4)).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unimedvl_tpu.config import BagelConfig


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert int(np.prod(shape)) == n, (shape, n)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


# column-parallel (output over "model") / row-parallel (input over "model")
# projection names, incl. the fused serving leaves ("qkv"/"qkv_gen"/"gate_up"
# and their tp-interleaved "_tp{N}" variants — quant.fuse_serving_projections)
_COL_NAMES = frozenset({"q", "k", "v", "q_gen", "k_gen", "v_gen", "gate", "up"})
_ROW_NAMES = frozenset({"o", "o_gen", "down"})
_COL_PREFIXES = ("qkv", "gate_up")


def _llm_layer_specs(layers_params: Dict, fsdp: bool = False) -> Dict:
    """Specs for the stacked [L, ...] layer pytree, built from the ACTUAL
    params tree — so bf16 ({"kernel"}), int8 serving ({"kernel_q","scale"}),
    full-int8 ({"kernel_qa"}), and fused-projection layouts all place.

    With ``fsdp`` the non-TP dim of every large kernel additionally shards
    over "data" (ZeRO-3 style): XLA all-gathers weights per layer in the
    forward/backward and reduce-scatters grads back to the shard — params,
    grads, and Adam moments all live at 1/(data*model) per chip.
    """
    d = "data" if fsdp else None

    def walk(tree: Dict) -> Dict:
        out = {}
        for name, v in tree.items():
            if not isinstance(v, dict):
                out[name] = P(None, None)  # stacked norm scales etc.
                continue
            col = name in _COL_NAMES or name.startswith(_COL_PREFIXES)
            row = name in _ROW_NAMES
            if not (col or row):
                out[name] = walk(v)
                continue
            sub = {}
            for k2 in v:
                if k2 in ("kernel", "kernel_q", "kernel_qa",
                          "kernel_p4", "kernel_p4a"):
                    # packed-int4 kernels ([L, in/2, out]) shard like their
                    # unpacked shape: a row-parallel split of the packed dim
                    # lands on even in-rows, i.e. exactly the Megatron shard
                    sub[k2] = P(None, d, "model") if col else P(None, "model", d)
                elif k2 == "scale" and getattr(v[k2], "ndim", 2) == 3:
                    # group-wise w4 scales [L, K/g, N]: groups follow the
                    # K dim, columns follow N
                    sub[k2] = (P(None, None, "model") if col
                               else P(None, "model", None))
                elif k2 in ("scale", "bias"):
                    # per-OUTPUT-column vectors: sharded for col-parallel,
                    # replicated for row-parallel
                    sub[k2] = P(None, "model") if col else P(None)
                elif k2 == "lora_a":
                    # adapters shard like the base kernel's Megatron split:
                    # row-parallel contracts the sharded in-dim through a's
                    # in-dim (the psum already exists); col-parallel keeps a
                    # replicated and splits b's out-dim
                    sub[k2] = P(None, None, None) if col else P(None, "model", None)
                elif k2 == "lora_b":
                    sub[k2] = P(None, None, "model") if col else P(None, None, None)
                elif k2 == "lora_s":
                    sub[k2] = P(None)
                else:
                    sub[k2] = P()
            out[name] = sub
        return out

    return walk(layers_params)


def bagel_param_specs(cfg: BagelConfig, params: Dict, fsdp: bool = False) -> Dict:
    """PartitionSpec pytree matching a Bagel params pytree.

    LLM attention/MLP of both experts: TP over "model". Embedding + lm_head:
    vocab-sharded. ViT/VAE/aux: replicated (tiny next to the 14B LLM).
    With ``fsdp`` the large LLM kernels additionally shard over "data"
    (see _llm_layer_specs) — required for 14B training within 16 GB/chip.
    """
    d = "data" if fsdp else None
    lm_head = params["llm"]["lm_head"]
    if isinstance(lm_head, dict):  # int8 serving layout
        lm_spec: object = {
            k2: (P(d, "model") if k2.startswith("kernel") else P("model"))
            for k2 in lm_head
        }
    else:
        lm_spec = P(d, "model")
    llm = {
        "embed_tokens": P("model", d),
        "layers": _llm_layer_specs(params["llm"]["layers"], fsdp),
        "norm": {"scale": P(None)},
        "lm_head": lm_spec,
    }
    if cfg.llm.use_moe:
        llm["norm_moe_gen"] = {"scale": P(None)}

    specs: Dict = {"llm": llm}
    for name in ("vit", "vae", "connector", "vae2llm", "llm2vae", "time_embedder",
                 "repa_proj", "repa_vae_proj"):
        if name in params:
            specs[name] = jax.tree.map(lambda _: P(), params[name])
    for name in ("vit_pos_embed", "latent_pos_embed"):
        if name in params:
            specs[name] = P()
    return specs


def kv_cache_spec() -> Dict:
    """KVCache sharding: kv heads over 'model', streams over 'data'."""
    from unimedvl_tpu.models.qwen2_mot import KVCache

    return KVCache(
        k=P(None, "data", "model", None, None),
        v=P(None, "data", "model", None, None),
        lens=P("data"),
    )


def shard_params(params: Dict, cfg: BagelConfig, mesh: Mesh, fsdp: bool = False) -> Dict:
    # tree.map flattens `specs` up to the leaf boundary of `params`, so the
    # PartitionSpec tuples at leaf positions are taken whole.
    specs = bagel_param_specs(cfg, params, fsdp=fsdp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(cache, mesh: Mesh):
    spec = kv_cache_spec()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, spec
    )

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


def _llm_layer_specs(mot_attention: bool, use_moe: bool, fsdp: bool = False) -> Dict:
    """Specs for the stacked [L, ...] layer pytree.

    With ``fsdp`` the non-TP dim of every large kernel additionally shards
    over "data" (ZeRO-3 style): XLA all-gathers weights per layer in the
    forward/backward and reduce-scatters grads back to the shard — params,
    grads, and Adam moments all live at 1/(data*model) per chip.
    """
    d = "data" if fsdp else None
    col = {"kernel": P(None, d, "model"), "bias": P(None, "model")}
    col_nb = {"kernel": P(None, d, "model")}
    row_nb = {"kernel": P(None, "model", d)}
    norm = {"scale": P(None, None)}
    head_norm = {"scale": P(None, None)}

    attn = {
        "q": dict(col),
        "k": dict(col),
        "v": dict(col),
        "o": dict(row_nb),
        "q_norm": dict(head_norm),
        "k_norm": dict(head_norm),
    }
    if mot_attention:
        attn.update(
            q_gen=dict(col),
            k_gen=dict(col),
            v_gen=dict(col),
            o_gen=dict(row_nb),
            q_norm_gen=dict(head_norm),
            k_norm_gen=dict(head_norm),
        )
    mlp = {"gate": dict(col_nb), "up": dict(col_nb), "down": dict(row_nb)}
    layer = {
        "attn": attn,
        "input_layernorm": dict(norm),
        "post_attention_layernorm": dict(norm),
        "mlp": mlp,
    }
    if mot_attention:
        layer["input_layernorm_moe_gen"] = dict(norm)
        layer["post_attention_layernorm_moe_gen"] = dict(norm)
    if use_moe:
        layer["mlp_moe_gen"] = {
            "gate": dict(col_nb),
            "up": dict(col_nb),
            "down": dict(row_nb),
        }
    return layer


def bagel_param_specs(cfg: BagelConfig, params: Dict, fsdp: bool = False) -> Dict:
    """PartitionSpec pytree matching a Bagel params pytree.

    LLM attention/MLP of both experts: TP over "model". Embedding + lm_head:
    vocab-sharded. ViT/VAE/aux: replicated (tiny next to the 14B LLM).
    With ``fsdp`` the large LLM kernels additionally shard over "data"
    (see _llm_layer_specs) — required for 14B training within 16 GB/chip.
    """
    d = "data" if fsdp else None
    llm = {
        "embed_tokens": P("model", d),
        "layers": _llm_layer_specs(cfg.llm.mot_attention, cfg.llm.use_moe, fsdp),
        "norm": {"scale": P(None)},
        "lm_head": P(d, "model"),
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

#!/usr/bin/env python
"""Toy end-to-end training run: dataset -> packing -> sharded train step.

Overfits a tiny random-weight Bagel on a handful of synthetic examples across
all three default.yaml task types (vlm_sft / t2i_pretrain / unified_edit) on
the virtual 8-device CPU mesh (TP x DP), proving the losses/masks/MoT routing
compose over consecutive steps — the reference ships no training pipeline at
all (README.md:60-67).

Writes benchmarks/TOY_OVERFIT.json with the loss curve and start/end CE+MSE.

Usage: python scripts/toy_overfit.py [--steps 200] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--ema-decay", type=float, default=None,
                    help="maintain an EMA shadow of params (the released "
                         "checkpoints are EMA weights)")
    ap.add_argument("--export-dir", default=None,
                    help="export the trained (EMA if --ema-decay) weights as "
                         "a released-format checkpoint and reload-verify")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "TOY_OVERFIT.json"))
    args = ap.parse_args()

    import jax

    # before any backend touch (the interpreter preloads jax pinned to the
    # TPU platform; XLA_FLAGS above needs the env set before python starts)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from PIL import Image

    from unimedvl_tpu.data.imaging import ImageTransform
    from unimedvl_tpu.data.tokenizer import add_special_tokens
    from unimedvl_tpu.models import bagel
    from unimedvl_tpu.parallel.mesh import create_mesh
    from unimedvl_tpu.training.dataset import (
        Example, PackedBatchIterator, Prefetcher, make_latent_fn,
    )
    from unimedvl_tpu.training import trainer

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_pipeline import TINY, FakeTokenizer

    params = bagel.init_params(jax.random.PRNGKey(0), TINY, llm2vae_zero=False)
    tok, new_ids, _ = add_special_tokens(FakeTokenizer())

    rng = np.random.default_rng(0)

    def img(seed):
        r = np.random.default_rng(seed)
        return Image.fromarray(r.integers(0, 255, (24, 28, 3), dtype=np.uint8))

    examples = [
        Example("vlm_sft", "what is shown?", image=img(1), answer="a lung."),
        Example("vlm_sft", "any fracture?", image=img(2), answer="no."),
        Example("t2i_pretrain", "a chest x-ray", image=img(3)),
        Example("unified_edit", "add contrast", image=img(4),
                target_image=img(5)),
    ]
    it = Prefetcher(PackedBatchIterator(
        examples, tok, new_ids, TINY,
        vit_transform=ImageTransform(32, 8, 2, 1024),
        vae_transform=ImageTransform(32, 8, 8, 1024),
        latent_fn=make_latent_fn(params, TINY),
        batch_size=args.batch_size, seq_len=args.seq_len, seed=0,
    ))  # background-thread prefetch overlaps packing with the train step

    mesh = create_mesh((2, 4))
    optimizer = trainer.make_optimizer(learning_rate=args.lr)
    step_fn, init_state = trainer.make_train_step(
        TINY, mesh, params, optimizer=optimizer, ema_decay=args.ema_decay)
    state = init_state()

    def eval_losses(p, batch, key):
        out = jax.vmap(
            lambda b, r: bagel.train_forward(p, TINY, b, r)
        )(jax.tree.map(jnp.asarray, batch),
          jax.random.split(key, args.batch_size))
        return float(out["ce"].mean()), float(out["mse"].mean())

    eval_batch = next(it)
    ekey = jax.random.PRNGKey(42)
    ce0, mse0 = eval_losses(params, eval_batch, ekey)
    # snapshot BEFORE training: the donated train state may alias these
    l0 = params["llm"]["layers"]
    w0_und = np.asarray(l0["mlp"]["gate"]["kernel"], np.float32).copy()
    w0_gen = np.asarray(l0["mlp_moe_gen"]["gate"]["kernel"], np.float32).copy()

    curve = []
    t0 = time.time()
    key = jax.random.PRNGKey(7)
    for i in range(args.steps):
        batch = next(it)
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, jax.tree.map(jnp.asarray, batch), sub)
        curve.append(float(loss))
        if i % 20 == 0:
            print(f"step {i}: loss {curve[-1]:.4f}", flush=True)

    final_params = jax.device_get(state.params)
    ce1, mse1 = eval_losses(state.params, eval_batch, ekey)

    # both experts must have moved
    l1 = final_params["llm"]["layers"]
    d_und = float(np.abs(
        np.asarray(l1["mlp"]["gate"]["kernel"], np.float32) - w0_und).max())
    d_gen = float(np.abs(
        np.asarray(l1["mlp_moe_gen"]["gate"]["kernel"], np.float32) - w0_gen
    ).max())

    out = {
        "steps": args.steps,
        "seconds": round(time.time() - t0, 1),
        "loss_first10_mean": round(float(np.mean(curve[:10])), 4),
        "loss_last10_mean": round(float(np.mean(curve[-10:])), 4),
        "ce_before": round(ce0, 4), "ce_after": round(ce1, 4),
        "mse_before": round(mse0, 4), "mse_after": round(mse1, 4),
        "und_expert_max_delta": d_und, "gen_expert_max_delta": d_gen,
        "curve_every5": [round(v, 4) for v in curve[::5]],
    }
    if args.export_dir:
        from unimedvl_tpu.weights.bagel_export import export_bagel_checkpoint
        from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

        tree = state.ema_params if args.ema_decay is not None else state.params
        written = export_bagel_checkpoint(
            args.export_dir, jax.device_get(tree), TINY)
        reloaded = load_bagel_checkpoint(args.export_dir, cfg=TINY,
                                         dtype=jnp.bfloat16)
        want = np.asarray(tree["llm"]["norm"]["scale"],
                          np.float32).astype(jnp.bfloat16)
        got = np.asarray(reloaded["llm"]["norm"]["scale"])
        assert np.array_equal(want, got), "export/reload mismatch"
        out["exported"] = sorted(written)
        out["export_kind"] = "ema" if args.ema_decay is not None else "params"
        print(f"exported {len(written)} files -> {args.export_dir}")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curve_every5"}))
    ok = (out["loss_last10_mean"] < out["loss_first10_mean"]
          and ce1 < ce0 and mse1 < mse0 and d_und > 0 and d_gen > 0)
    print("OVERFIT", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Export a params tree to the released UniMedVL checkpoint layout.

Sources (pick one):
  --from-ckpt DIR      a released-format checkpoint dir (round-trips through
                       the loader; useful with --base for folding a
                       base+finetune pair into one standalone checkpoint)
  --from-snapshot DIR  an orbax snapshot written by weights.snapshot
                       (a raw params tree, or a TrainState — exports
                       ema_params when present unless --no-ema)

Output layout matches interactive_vqa_inferencer.py:127-213: llm_config.json,
vit_config.json, ema.safetensors (sharded + model.safetensors.index.json when
over --shard-gb), ae.safetensors. LoRA adapters are merged automatically.

Usage:
  python scripts/export_checkpoint.py OUT --from-ckpt CKPT [--base BASE]
  python scripts/export_checkpoint.py OUT --from-snapshot SNAP --ckpt-config CKPT
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--from-ckpt")
    src.add_argument("--from-snapshot")
    ap.add_argument("--base", default=None,
                    help="base checkpoint merged under --from-ckpt")
    ap.add_argument("--ckpt-config", default=None,
                    help="checkpoint dir whose llm/vit_config.json describe "
                         "the snapshot's geometry (required with "
                         "--from-snapshot); also used as tokenizer_src")
    ap.add_argument("--shard-gb", type=float, default=4.0)
    ap.add_argument("--no-ema", action="store_true",
                    help="export TrainState.params instead of its EMA shadow")
    ap.add_argument("--cpu", action="store_true",
                    help="stage on CPU (keeps the TPU free)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from unimedvl_tpu.config import BagelConfig
    from unimedvl_tpu.weights.bagel_export import export_bagel_checkpoint

    if args.from_ckpt:
        from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

        cfg = BagelConfig.from_checkpoint_dir(args.from_ckpt)
        params = load_bagel_checkpoint(args.from_ckpt, cfg=cfg,
                                       base_dir=args.base)
        tok_src = args.from_ckpt
    else:
        if args.ckpt_config is None:
            ap.error("--from-snapshot requires --ckpt-config")
        from unimedvl_tpu.weights.snapshot import restore_snapshot

        cfg = BagelConfig.from_checkpoint_dir(args.ckpt_config)
        tree = restore_snapshot(args.from_snapshot)
        if isinstance(tree, dict) and "params" in tree and "opt_state" in tree:
            # a TrainState restored without a target comes back as a dict
            params = (tree.get("ema_params")
                      if tree.get("ema_params") is not None and not args.no_ema
                      else tree["params"])
        else:
            params = tree
        tok_src = args.ckpt_config

    written = export_bagel_checkpoint(
        args.out_dir, params, cfg, shard_gb=args.shard_gb,
        tokenizer_src=tok_src,
    )
    for name in sorted(written):
        print(f"  {name} [{written[name]}]")
    print(f"exported {len(written)} files -> {args.out_dir}")


if __name__ == "__main__":
    main()

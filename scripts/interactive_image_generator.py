#!/usr/bin/env python
"""Interactive medical image generation / editing (reference:
codes/interactive_image_generator.py). Text-to-image, image editing with an
optional understanding ("thinking") pre-pass, and VQA-reconstruction recipes.

Usage:
  python scripts/interactive_image_generator.py --checkpoint /path/to/ckpt \
      --prompt "Chest X-ray with right pleural effusion" --out out.png \
      [--image input.png] [--size 512] [--steps 50] \
      [--cfg-text 3.0 --cfg-img 1.5 --renorm global] [--think]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

from PIL import Image


DEFAULT_CONFIG = {
    # mirrors interactive_image_generator.py DEFAULT_CONFIG (:56-71)
    "num_timesteps": 50,
    "timestep_shift": 3.0,
    "cfg_text_scale": 3.0,
    "cfg_img_scale": 1.5,
    "cfg_interval": (0.4, 1.0),
    "cfg_renorm_type": "global",
    "cfg_renorm_min": 0.0,
    "seed": 42,
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--image", help="optional input image (editing / i2i)")
    ap.add_argument("--out", default="generated.png")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=DEFAULT_CONFIG["num_timesteps"])
    ap.add_argument("--cfg-text", type=float, default=DEFAULT_CONFIG["cfg_text_scale"])
    ap.add_argument("--cfg-img", type=float, default=DEFAULT_CONFIG["cfg_img_scale"])
    ap.add_argument("--renorm", default=DEFAULT_CONFIG["cfg_renorm_type"],
                    choices=["global", "channel", "text_channel"])
    ap.add_argument("--timestep-shift", type=float, default=DEFAULT_CONFIG["timestep_shift"])
    ap.add_argument("--think", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="fuse qkv/gate_up projections (serving layout; with "
                         "--sp > 1 the fusion is tp-interleaved to match the "
                         "mesh) — fewer kernel launches per layer")
    ap.add_argument("--spec", action="store_true",
                    help="prompt-lookup speculative decoding for the think-"
                         "mode text pre-pass (greedy-exact)")
    ap.add_argument("--seed", type=int, default=DEFAULT_CONFIG["seed"])
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree (model axis)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data/stream axis size (use 3 for CFG-stream-parallel t2i)")
    ap.add_argument("--base-checkpoint", default=None,
                    help="base checkpoint merged under the finetune (finetune keys win)")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel degree for the denoise loop: with "
                         "--tp T and --sp S > 1 the T*S devices form a "
                         "(model, seq) mesh and latents shard over seq — the "
                         "measured-best v5e-8 t2i layout is --tp 2 --sp 4 "
                         "(docs/MULTICHIP_DENOISE.md)")
    args = ap.parse_args()

    from unimedvl_tpu.config import BagelConfig, TransformConfig
    from unimedvl_tpu.data.imaging import ImageTransform
    from unimedvl_tpu.data.tokenizer import load_tokenizer
    from unimedvl_tpu.inference import InterleaveInferencer
    from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint
    from unimedvl_tpu.utils import get_logger

    log = get_logger("interactive_gen")
    t0 = time.time()
    cfg = BagelConfig.from_checkpoint_dir(args.checkpoint, max_latent_size=64)
    mesh = None
    sp_mesh = None
    if args.sp > 1:
        import jax
        import numpy as np
        from jax.sharding import Mesh

        devs = np.asarray(jax.devices()[: args.tp * args.sp])
        sp_mesh = Mesh(devs.reshape(args.tp, args.sp), ("model", "seq"))
    elif args.tp > 1 or args.dp > 1:
        from unimedvl_tpu.parallel import create_mesh

        mesh = create_mesh((args.dp, args.tp))
    params = load_bagel_checkpoint(
        args.checkpoint, cfg, mesh=mesh, base_dir=args.base_checkpoint
    )
    if args.fused:
        from unimedvl_tpu.quant import fuse_serving_projections

        params = dict(params)
        # tp-interleaved blocks keep the "model"-axis split shard-aligned
        # in BOTH the auto-TP mesh and the manual sp_mesh paths (the
        # de-interleave is exact either way)
        params["llm"] = fuse_serving_projections(params["llm"], tp=args.tp)
    tokenizer, new_token_ids, _ = load_tokenizer(args.checkpoint)
    tvae = TransformConfig.vae_interactive()
    tvit = TransformConfig.vit_interactive()
    inferencer = InterleaveInferencer(
        params, cfg, tokenizer, new_token_ids,
        vae_transform=ImageTransform(tvae.max_size, tvae.min_size, tvae.stride, tvae.max_pixels),
        vit_transform=ImageTransform(tvit.max_size, tvit.min_size, tvit.stride, tvit.max_pixels),
        seed=args.seed,
        mesh=mesh,
        sp_mesh=sp_mesh,
        spec_decode=args.spec,
    )
    log.info("model loaded in %.1fs", time.time() - t0)

    # image-editing default per reference (interactive_image_generator.py:365-371)
    renorm = args.renorm
    cfg_interval = DEFAULT_CONFIG["cfg_interval"]
    if args.image and args.renorm == "global":
        renorm = "text_channel"
        cfg_interval = (0.0, 1.0)

    inputs = []
    if args.image:
        inputs.append(Image.open(args.image))
    inputs.append(args.prompt)

    t0 = time.time()
    out = inferencer.interleave_inference(
        inputs,
        think=args.think,
        understanding_output=False,
        num_timesteps=args.steps,
        timestep_shift=args.timestep_shift,
        cfg_text_scale=args.cfg_text,
        cfg_img_scale=args.cfg_img,
        cfg_interval=cfg_interval,
        cfg_renorm_type=renorm,
        cfg_renorm_min=DEFAULT_CONFIG["cfg_renorm_min"],
        image_shapes=(args.size, args.size),
    )
    for item in out:
        if isinstance(item, str):
            print(f"[think] {item}")
        else:
            item.save(args.out)
            print(f"[{time.time() - t0:.2f}s] saved {args.out} ({item.size[0]}x{item.size[1]})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Interactive medical VQA / report generation (reference:
codes/interactive_vqa_inferencer.py). Loads a released checkpoint dir and
answers questions about images from a REPL or one-shot flags.

Usage:
  python scripts/interactive_vqa.py --checkpoint /path/to/ckpt \
      [--image xr.png --prompt "What abnormality is visible?"] \
      [--max-length 512] [--sample --temperature 0.3] [--think]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import sys
import time

from PIL import Image


DEFAULT_CONFIG = {
    # mirrors interactive_vqa_inferencer.py DEFAULT_CONFIG (:58-71)
    "max_length": 512,
    "do_sample": False,
    "temperature": 0.3,
    "seed": 42,
}


def build(args):
    from unimedvl_tpu.config import BagelConfig, TransformConfig
    from unimedvl_tpu.data.imaging import ImageTransform
    from unimedvl_tpu.data.tokenizer import load_tokenizer
    from unimedvl_tpu.inference import InterleaveInferencer
    from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint
    from unimedvl_tpu.utils import get_logger, device_memory_stats

    log = get_logger("interactive_vqa")
    t0 = time.time()
    cfg = BagelConfig.from_checkpoint_dir(args.checkpoint)
    mesh = None
    if getattr(args, "tp", 1) > 1 or getattr(args, "dp", 1) > 1:
        from unimedvl_tpu.parallel import create_mesh

        mesh = create_mesh((args.dp, args.tp))
    params = load_bagel_checkpoint(
        args.checkpoint, cfg, mesh=mesh, base_dir=getattr(args, "base_checkpoint", None)
    )
    tokenizer, new_token_ids, _ = load_tokenizer(args.checkpoint)
    tv = TransformConfig.vit_vqa()
    inferencer = InterleaveInferencer(
        params,
        cfg,
        tokenizer,
        new_token_ids,
        vit_transform=ImageTransform(tv.max_size, tv.min_size, tv.stride, tv.max_pixels),
        seed=args.seed,
        mesh=mesh,
        spec_decode=getattr(args, "spec", False),
    )
    log.info("model loaded in %.1fs; device memory: %s", time.time() - t0,
             {k: v for k, v in device_memory_stats().items() if "bytes_in_use" in k})
    return inferencer


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image", action="append", default=[])
    ap.add_argument("--prompt")
    ap.add_argument("--max-length", type=int, default=DEFAULT_CONFIG["max_length"])
    ap.add_argument("--sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=DEFAULT_CONFIG["temperature"])
    ap.add_argument("--think", action="store_true")
    ap.add_argument("--stream", action="store_true",
                    help="print tokens live as they decode (greedy only)")
    ap.add_argument("--spec", action="store_true",
                    help="prompt-lookup speculative decoding (greedy-exact; "
                         "fastest on templated report text)")
    ap.add_argument("--seed", type=int, default=DEFAULT_CONFIG["seed"])
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel degree (model axis)")
    ap.add_argument("--dp", type=int, default=1,
                    help="data/stream axis size (use 3 for CFG-stream-parallel t2i)")
    ap.add_argument("--base-checkpoint", default=None,
                    help="base checkpoint merged under the finetune (finetune keys win)")
    args = ap.parse_args()

    inferencer = build(args)

    def answer(images, prompt):
        t0 = time.time()
        if args.think:
            out = inferencer(
                image=[Image.open(p) for p in images] or None,
                text=prompt,
                think=True,
                understanding_output=True,
                max_think_token_n=args.max_length,
                do_sample=args.sample,
                text_temperature=args.temperature,
            )["text"]
        elif getattr(args, "stream", False) and not args.sample:
            # live token streaming (greedy): chunks print as they decode
            ctx = inferencer.init_gen_context()
            for p in images:
                ctx = inferencer.update_context_image(
                    Image.open(p).convert("RGB"), ctx, vae=False, vit=True)
            ctx = inferencer.update_context_text(prompt, ctx)
            for piece in inferencer.gen_text_stream(
                    ctx, max_length=args.max_length):
                print(piece, end="", flush=True)
            print(f"\n[{time.time() - t0:.2f}s]")
            return
        else:
            out = inferencer.chat(
                [Image.open(p) for p in images],
                prompt,
                max_length=args.max_length,
                do_sample=args.sample,
                temperature=args.temperature,
            )
        print(f"[{time.time() - t0:.2f}s] {out}")

    if args.prompt:
        answer(args.image, args.prompt)
        return

    print("Interactive VQA. Commands: /image <path>  /clear  /quit")
    images = list(args.image)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        if line == "/quit":
            break
        if line == "/clear":
            images = []
            continue
        if line.startswith("/image "):
            images.append(line.split(" ", 1)[1])
            continue
        answer(images, line)


if __name__ == "__main__":
    main()

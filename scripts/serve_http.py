#!/usr/bin/env python
"""HTTP serving daemon: unified report-generation + image-generation service
over the continuous-batching engine (no reference equivalent — the reference
serves one request at a time from a REPL, interactive_vqa_inferencer.py).

Usage:
  python scripts/serve_http.py --checkpoint /path/to/ckpt \
      [--host 127.0.0.1 --port 8000] [--slots 48] [--capacity 4096] \
      [--int8-kv | --int4-kv] [--int8 | --act-int8] [--w4]
      [--spec] [--t2i] [--tp N --dp N]

  curl -s localhost:8000/v1/health
  curl -s -X POST localhost:8000/v1/generate \
      -d '{"prompt": "Describe the findings.", "max_new_tokens": 256}'
  curl -s -X POST localhost:8000/v1/images \
      -d '{"prompt": "frontal chest radiograph", "height": 512, "width": 512}'
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--slots", type=int, default=48)
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--int8-kv", action="store_true")
    ap.add_argument("--int4-kv", action="store_true",
                    help="int4 KV caches (quarter cache traffic; implies "
                         "--int8-kv plumbing, further accuracy step)")
    ap.add_argument("--int8", action="store_true",
                    help="int8 weight quantization (serving mode)")
    ap.add_argument("--act-int8", action="store_true",
                    help="FULL-int8 matmuls (s8xs8 MXU; implies --int8) — "
                         "the bench-headline decode mode")
    ap.add_argument("--w4", action="store_true",
                    help="packed-int4 layer weights (with --int8/--act-int8: "
                         "w4 / w4a8 serving modes)")
    ap.add_argument("--w4-group", type=int, default=0,
                    help="group-wise w4 scale group size (0 = per-channel; "
                         "512 rides the Pallas kernel's k-step for free)")
    ap.add_argument("--fused", action="store_true",
                    help="fuse qkv/gate_up projections (fewer launches/layer)")
    ap.add_argument("--spec", action="store_true",
                    help="speculative continuous batching")
    ap.add_argument("--t2i", action="store_true",
                    help="enable POST /v1/images (wraps an "
                         "InterleaveInferencer for chunked denoise)")
    ap.add_argument("--gen-chunk", type=int, default=10,
                    help="denoise steps per t2i segment between decode chunks")
    ap.add_argument("--gen-group", type=int, default=4,
                    help="max concurrent t2i jobs fused into one batched "
                         "denoise (compatible geometry/knobs only)")
    ap.add_argument("--dynamic-windows", action="store_true",
                    help="one compiled denoise program per (geometry, group "
                         "size, gen-chunk) instead of one per schedule "
                         "window — ~10x fewer cold-start compiles")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix-text", default=None, metavar="TEXT",
                    help="register a shared preamble at boot (prefix cache); "
                         "its prefix_id (0) is logged — clients pass it in "
                         "/v1/generate, or register more via POST /v1/prefixes")
    args = ap.parse_args()

    from unimedvl_tpu.config import BagelConfig, TransformConfig
    from unimedvl_tpu.data.imaging import ImageTransform
    from unimedvl_tpu.data.tokenizer import load_tokenizer
    from unimedvl_tpu.inference.server import ServingDaemon, make_server
    from unimedvl_tpu.inference.serving import ContinuousBatcher
    from unimedvl_tpu.utils import get_logger
    from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

    log = get_logger("serve_http")
    cfg = BagelConfig.from_checkpoint_dir(args.checkpoint)
    mesh = None
    if args.tp > 1 or args.dp > 1:
        from unimedvl_tpu.parallel import create_mesh

        mesh = create_mesh((args.dp, args.tp))
    params = load_bagel_checkpoint(args.checkpoint, cfg, mesh=mesh)
    if args.int8 or args.act_int8:
        from unimedvl_tpu.quant import quantize_llm_params

        params = dict(params)
        params["llm"] = quantize_llm_params(
            params["llm"], via_host=True, act_quant=args.act_int8,
            bits=4 if args.w4 else 8, group_size=args.w4_group,
        )
    if args.fused:
        from unimedvl_tpu.quant import fuse_serving_projections

        params = dict(params)
        params["llm"] = fuse_serving_projections(params["llm"], tp=args.tp)
    tokenizer, new_token_ids, _ = load_tokenizer(args.checkpoint)
    tv = TransformConfig.vit_vqa()
    vit_transform = ImageTransform(tv.max_size, tv.min_size, tv.stride, tv.max_pixels)

    pipeline = None
    if args.t2i:
        from unimedvl_tpu.inference import InterleaveInferencer

        tvae = TransformConfig.vae_interactive()
        pipeline = InterleaveInferencer(
            params, cfg, tokenizer, new_token_ids,
            vae_transform=ImageTransform(
                tvae.max_size, tvae.min_size, tvae.stride, tvae.max_pixels
            ),
            vit_transform=vit_transform, seed=args.seed, mesh=mesh,
            gen_window_dynamic=args.dynamic_windows,
        )

    batcher = ContinuousBatcher(
        params, cfg, tokenizer, new_token_ids,
        num_slots=args.slots, capacity=args.capacity, chunk=args.chunk,
        vit_transform=vit_transform, mesh=mesh,
        kv_quantized=args.int8_kv or args.int4_kv,
        kv_bits=4 if args.int4_kv else 8,
        spec_decode=args.spec, pipeline=pipeline, gen_chunk=args.gen_chunk,
        gen_group=args.gen_group,
        seed=args.seed,
    )
    if args.prefix_text:
        pid = batcher.register_prefix(args.prefix_text)
        log.info("registered boot prefix_id=%d (%d chars)", pid,
                 len(args.prefix_text))
    daemon = ServingDaemon(batcher).start()
    server = make_server(daemon, host=args.host, port=args.port)
    log.info("serving on http://%s:%d (slots=%d%s%s)", args.host, args.port,
             args.slots, ", spec" if args.spec else "",
             ", t2i" if args.t2i else "")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        daemon.stop()


if __name__ == "__main__":
    main()

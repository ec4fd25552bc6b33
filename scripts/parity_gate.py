#!/usr/bin/env python
"""One-command REAL-checkpoint parity gate.

The repo's parity story is proven against the reference *implementation* on
tiny random models (tests/test_reference_parity.py); the released 14B weights
were never on disk. The day they land, this script is the gate: point it at
the checkpoint dir and it runs every BASELINE fidelity check that is possible
with what it finds, emitting a pass/fail JSON report. Steps with missing
prerequisites are SKIPPED with the reason, never silently dropped.

Steps:
  load         configs + weights -> jax params (host-staged bf16; --int8
               quantizes via host), optional ("data","model") mesh placement
  tokenizer    tokenizer + special-token registration (data_utils.py:140-175)
  memory       per-device memory stats after placement
  vqa_greedy   greedy decode vs the reference implementation run from
               /root/reference/codes under the flash-attn SDPA stub
               (torch CPU) - token-for-token (BASELINE "output parity";
               reference flow interactive_vqa_inferencer.py:127-161 +
               bagel.py:1321-1391). Optional --image adds a ViT context turn.
  vae_pixel    VAE encode/decode vs the reference autoencoder (torch) -
               max abs pixel delta + PSNR on a deterministic test image
  t2i_golden   fixed-seed t2i latent statistics + sha256; compared against
               --golden if given, else recorded for future runs

Usage:
  python scripts/parity_gate.py CKPT_DIR [--ref] [--int8] [--mesh DP,TP]
         [--image PATH] [--prompt TEXT] [--max-tokens N]
         [--golden GOLDEN.json] [--out REPORT.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_CODES = "/root/reference/codes"


def _result(status: str, **kw):
    return {"status": status, **kw}


def _install_flash_stub():
    """SDPA emulation of flash_attn_varlen_func (same as
    tests/test_reference_parity.py) so the reference modeling code imports
    without CUDA."""
    import importlib.machinery
    import types

    import torch

    def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k,
                               max_seqlen_q, max_seqlen_k, causal=False,
                               **kw):
        outs = []
        for i in range(len(cu_seqlens_q) - 1):
            qs = q[cu_seqlens_q[i]: cu_seqlens_q[i + 1]].float()
            ks = k[cu_seqlens_k[i]: cu_seqlens_k[i + 1]].float()
            vs = v[cu_seqlens_k[i]: cu_seqlens_k[i + 1]].float()
            Lq, Lk = qs.shape[0], ks.shape[0]
            G = qs.shape[1] // ks.shape[1]
            ks = ks.repeat_interleave(G, dim=1)
            vs = vs.repeat_interleave(G, dim=1)
            mask = None
            if causal:
                # bottom-right aligned causal (flash-attn semantics)
                mask = torch.ones(Lq, Lk, dtype=torch.bool)
                mask = torch.tril(mask, diagonal=Lk - Lq)
            o = torch.nn.functional.scaled_dot_product_attention(
                qs.transpose(0, 1), ks.transpose(0, 1), vs.transpose(0, 1),
                attn_mask=None if mask is None else mask,
            )
            outs.append(o.transpose(0, 1))
        return torch.cat(outs, 0).to(q.dtype)

    if "flash_attn" in sys.modules:
        sys.modules["flash_attn"].flash_attn_varlen_func = flash_attn_varlen_func
    else:
        stub = types.ModuleType("flash_attn")
        stub.flash_attn_varlen_func = flash_attn_varlen_func
        stub.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
        sys.modules["flash_attn"] = stub


def _load_reference_bagel(ckpt_dir: str, cfg):
    """Build the reference torch Bagel with the checkpoint's configs (incl.
    the code-forced overrides, interactive_vqa_inferencer.py:206-213) and load
    ema/model.safetensors strict=False — the reference's own load semantics."""
    import torch

    _install_flash_stub()
    if REFERENCE_CODES not in sys.path:
        sys.path.insert(0, REFERENCE_CODES)
    from modeling.unimedvl.qwen2_navit import Qwen2Config, Qwen2ForCausalLM
    from modeling.unimedvl.siglip_navit import SiglipVisionConfig, SiglipVisionModel
    from modeling.unimedvl.bagel import Bagel, BagelConfig as RefBagelConfig

    llm_config = Qwen2Config.from_json_file(
        os.path.join(ckpt_dir, "llm_config.json"))
    llm_config.qk_norm = True
    llm_config.tie_word_embeddings = False
    llm_config.layer_module = "Qwen2MoTDecoderLayer"
    vit_config = SiglipVisionConfig.from_json_file(
        os.path.join(ckpt_dir, "vit_config.json"))
    vit_config.rope = False
    vit_config.num_hidden_layers -= 1

    class _VAEGeom:
        downsample = cfg.vae.downsample if cfg.vae else 8
        z_channels = cfg.vae.z_channels if cfg.vae else 16

    ref_cfg = RefBagelConfig(
        visual_gen=cfg.visual_gen, visual_und=cfg.visual_und,
        llm_config=llm_config, vit_config=vit_config, vae_config=_VAEGeom(),
        latent_patch_size=cfg.latent_patch_size,
        max_latent_size=cfg.max_latent_size,
        vit_max_num_patch_per_side=cfg.vit_max_num_patch_per_side,
        timestep_shift=cfg.timestep_shift,
    )
    llm = Qwen2ForCausalLM(llm_config)
    vit = SiglipVisionModel(vit_config)
    vit.vision_model.embeddings.convert_conv2d_to_linear(vit_config)
    ref = Bagel(llm, vit, ref_cfg)

    from unimedvl_tpu.weights.bagel_loader import SafetensorsReader

    reader = SafetensorsReader(ckpt_dir, prefer_ema=True)
    sd = {}
    for key in reader.keys():
        sd[key] = torch.from_numpy(np.ascontiguousarray(reader(key)))
    pe = "vit_model.vision_model.embeddings.patch_embedding.weight"
    if pe in sd and sd[pe].ndim == 4:
        # checkpoint holds the conv form; the model was converted to linear
        # (siglip_navit.py:167-182: permute(0,2,3,1).reshape(E, C*p*p))
        sd[pe] = sd[pe].permute(0, 2, 3, 1).reshape(sd[pe].shape[0], -1)
    missing, unexpected = ref.load_state_dict(sd, strict=False)
    ref = ref.eval().to(torch.bfloat16)
    return ref, {"missing": len(missing), "unexpected": len(unexpected)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--ref", action="store_true",
                    help="run reference-implementation comparisons (torch CPU)")
    ap.add_argument("--int8", action="store_true",
                    help="quantize weights to int8 (serving config)")
    ap.add_argument("--mesh", default=None,
                    help="DP,TP device grid, e.g. 1,4")
    ap.add_argument("--image", default=None, help="VQA test image path")
    ap.add_argument("--prompt", default="Describe the findings.")
    ap.add_argument("--max-tokens", type=int, default=8)
    ap.add_argument("--t2i-size", type=int, default=None,
                    help="square t2i test size in px (default: 8 latent "
                         "tokens per side)")
    ap.add_argument("--golden", default=None, help="golden t2i stats json")
    ap.add_argument("--overrides", default=None,
                    help="JSON BagelConfig overrides (e.g. max_latent_size "
                         "for small synthetic checkpoints)")
    ap.add_argument("--vae-config", default=None,
                    help="JSON VAEConfig kwargs (synthetic checkpoints whose "
                         "ae.safetensors is not the FLUX geometry)")
    ap.add_argument("--out", default="parity_report.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import unimedvl_tpu

    unimedvl_tpu.enable_compilation_cache()

    from unimedvl_tpu.config import BagelConfig
    from unimedvl_tpu.weights.bagel_loader import load_bagel_checkpoint

    report = {"ckpt_dir": os.path.abspath(args.ckpt_dir),
              "backend": jax.default_backend(), "steps": {}}
    steps = report["steps"]

    # -- load ---------------------------------------------------------------
    mesh = None
    if args.mesh:
        from unimedvl_tpu.parallel.mesh import create_mesh

        dp, tp = (int(x) for x in args.mesh.split(","))
        mesh = create_mesh((dp, tp))
    overrides = json.loads(args.overrides) if args.overrides else {}
    if args.vae_config:
        from unimedvl_tpu.config import VAEConfig

        vae_kw = json.loads(args.vae_config)
        if "ch_mult" in vae_kw:
            vae_kw["ch_mult"] = tuple(vae_kw["ch_mult"])
        overrides["vae"] = VAEConfig(**vae_kw)
    t0 = time.time()
    try:
        cfg = BagelConfig.from_checkpoint_dir(args.ckpt_dir, **overrides)
        # --int8 quantizes DURING host staging: a 14B bf16 tree (28 GB) can
        # never be device-resident on one 16 GB v5e, so quantize-after-load
        # OOMs — the loader's quantize_bits path stages bf16 in host RAM and
        # commits int8 leaves only.
        params = load_bagel_checkpoint(
            args.ckpt_dir, cfg, mesh=mesh,
            quantize_bits=8 if args.int8 else None,
        )
        n_leaves = len(jax.tree.leaves(params))
        steps["load"] = _result("pass", seconds=round(time.time() - t0, 1),
                                leaves=n_leaves, int8=args.int8,
                                mesh=args.mesh)
    except Exception as e:
        steps["load"] = _result("fail", error=repr(e)[:300])
        _finish(report, args)
        return

    # -- tokenizer ----------------------------------------------------------
    tokenizer = new_token_ids = None
    try:
        from unimedvl_tpu.data.tokenizer import load_tokenizer

        tokenizer, new_token_ids, _ = load_tokenizer(args.ckpt_dir)
        steps["tokenizer"] = _result("pass", specials=new_token_ids)
    except Exception as e:
        steps["tokenizer"] = _result("fail", error=repr(e)[:300])

    # -- memory -------------------------------------------------------------
    try:
        from unimedvl_tpu.utils.profiling import device_memory_stats

        steps["memory"] = _result("pass", devices=device_memory_stats())
    except Exception as e:
        steps["memory"] = _result("skip", error=repr(e)[:200])

    # -- pipeline -----------------------------------------------------------
    from PIL import Image

    from unimedvl_tpu.config import TransformConfig
    from unimedvl_tpu.data.imaging import ImageTransform
    from unimedvl_tpu.inference import InterleaveInferencer

    tv = TransformConfig.vae_interactive()
    ti = TransformConfig.vit_interactive()
    inferencer = None
    if tokenizer is not None:
        inferencer = InterleaveInferencer(
            params, cfg, tokenizer, new_token_ids,
            vae_transform=ImageTransform(tv.max_size, tv.min_size, tv.stride,
                                         tv.max_pixels),
            vit_transform=ImageTransform(ti.max_size, ti.min_size, ti.stride,
                                         ti.max_pixels),
            seed=0, mesh=mesh,
        )

    # -- vqa greedy vs reference --------------------------------------------
    if not args.ref:
        steps["vqa_greedy"] = _result("skip", reason="--ref not given")
    elif not os.path.isdir(REFERENCE_CODES):
        steps["vqa_greedy"] = _result("skip", reason="reference tree absent")
    elif inferencer is None:
        steps["vqa_greedy"] = _result("skip", reason="tokenizer failed")
    else:
        try:
            ref, load_info = _load_reference_bagel(args.ckpt_dir, cfg)
            images = []
            if args.image:
                images = [Image.open(args.image)]
            t0 = time.time()
            mine = inferencer.chat(images, args.prompt,
                                   max_length=args.max_tokens)
            theirs = ref.chat(
                tokenizer, new_token_ids,
                image_transform=inferencer.vit_transform, images=images,
                prompt=args.prompt, max_length=args.max_tokens,
                do_sample=False,
            )
            ok = mine == theirs
            # under --int8 the jax side is weight-quantized while the
            # reference runs bf16 — greedy argmax CAN legitimately diverge
            # (a lossy, documented non-parity step); report it as a warn
            # with the transcripts, not a gate failure. Exact token parity
            # is asserted on the bf16 paths (--mesh multi-chip load, or a
            # checkpoint that fits one chip in bf16).
            status = "pass" if ok else ("warn" if args.int8 else "fail")
            steps["vqa_greedy"] = _result(
                status,
                seconds=round(time.time() - t0, 1), ref_load=load_info,
                mine=mine[:500], reference=str(theirs)[:500],
                **({"reason": "int8 vs bf16-reference greedy divergence "
                              "(quantization is lossy by design)"}
                   if status == "warn" else {}),
            )
        except Exception as e:
            steps["vqa_greedy"] = _result("fail", error=repr(e)[:300])

    # -- speculative decode self-parity + real-text acceptance --------------
    # spec decode is greedy-exact by construction; on REAL weights this step
    # both re-proves it end-to-end and RECORDS the prompt-lookup acceptance
    # rate on genuine model text (unmeasurable with random weights — see
    # benchmarks/spec_decode_bench.py floor/ceiling bounds).
    if inferencer is None:
        steps["spec_decode"] = _result("skip", reason="tokenizer failed")
    else:
        try:
            from unimedvl_tpu.models import bagel as _bagel

            spec_inf = InterleaveInferencer(
                params, cfg, tokenizer, new_token_ids,
                vit_transform=inferencer.vit_transform,
                seed=0, mesh=mesh, spec_decode=True,
            )
            plain_ctx = inferencer.update_context_text(
                args.prompt, inferencer.init_gen_context())
            plain_txt, _ = inferencer.gen_text(
                plain_ctx, max_length=args.max_tokens, return_ctx=True)
            spec_ctx = spec_inf.update_context_text(
                args.prompt, spec_inf.init_gen_context())
            # count verify forwards via the underlying call for the
            # acceptance diagnostic
            hist = list(spec_ctx.hist) + [new_token_ids["bos_token_id"]]
            HL = ((len(hist) + args.max_tokens + 7 + 255) // 256) * 256
            import numpy as _np
            hbuf = _np.zeros((1, HL), _np.int32)
            hbuf[0, : len(hist)] = hist
            grown = spec_inf._ensure_capacity(spec_ctx, args.max_tokens + 8)
            out, lengths, _, n_fwd = _bagel.generate_text_spec(
                spec_inf.params, cfg, grown.cache,
                jnp.asarray([new_token_ids["bos_token_id"]], jnp.int32),
                jnp.asarray([grown.rope], jnp.int32),
                args.max_tokens,
                jnp.asarray(new_token_ids["eos_token_id"], jnp.int32),
                jnp.asarray(hbuf), jnp.asarray([len(hist)], jnp.int32),
            )
            ids = _np.asarray(out[0])
            ids = ids[ids >= 0].tolist()
            spec_txt = tokenizer.decode(ids).split("<|im_end|>")[0]
            if "<|im_start|>" in spec_txt:
                spec_txt = spec_txt.split("<|im_start|>")[1]
            n_tok = int(lengths[0])
            steps["spec_decode"] = _result(
                "pass" if spec_txt == plain_txt else "fail",
                tokens=n_tok, verify_forwards=int(n_fwd),
                tokens_per_forward=round(n_tok / max(int(n_fwd), 1), 2),
                mine=spec_txt[:300], plain=plain_txt[:300],
            )
        except Exception as e:
            steps["spec_decode"] = _result("fail", error=repr(e)[:300])

    # -- vae pixel parity ---------------------------------------------------
    ae_path = os.path.join(args.ckpt_dir, "ae.safetensors")
    if not (cfg.visual_gen and os.path.exists(ae_path)):
        steps["vae_pixel"] = _result("skip", reason="no ae.safetensors")
    elif not os.path.isdir(REFERENCE_CODES) or not args.ref:
        steps["vae_pixel"] = _result("skip", reason="--ref not given")
    else:
        try:
            import torch

            if REFERENCE_CODES not in sys.path:
                sys.path.insert(0, REFERENCE_CODES)
            from modeling.autoencoder import AutoEncoder, AutoEncoderParams
            from safetensors.torch import load_file as st_load

            from unimedvl_tpu.models import vae as jvae

            def ref_load_ae(local_path):
                # load_ae hardcodes the FLUX geometry; build from cfg.vae so
                # synthetic small checkpoints exercise the same path
                vc = cfg.vae
                ae = AutoEncoder(AutoEncoderParams(
                    resolution=vc.resolution, in_channels=3,
                    downsample=vc.downsample, ch=vc.ch, out_ch=3,
                    ch_mult=list(vc.ch_mult),
                    num_res_blocks=vc.num_res_blocks,
                    z_channels=vc.z_channels,
                    scale_factor=vc.scale_factor,
                    shift_factor=vc.shift_factor,
                ))
                raw = st_load(local_path)
                raw = {k.replace("module.", ""): v for k, v in raw.items()}
                ae.load_state_dict(raw, strict=True)
                return ae, None

            side = 4 * cfg.vae.downsample
            rng = np.random.default_rng(0)
            img = (rng.random((1, side, side, 3)) * 2 - 1).astype(np.float32)
            # deterministic posterior-MEAN path on both sides
            z = jvae.encode(params["vae"], cfg.vae, jnp.asarray(img), None)
            out = np.asarray(jvae.decode(params["vae"], cfg.vae, z),
                             np.float32)
            ref_ae, _ = ref_load_ae(local_path=ae_path)
            ref_ae = ref_ae.float().eval()
            with torch.no_grad():
                timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
                moments = ref_ae.encoder(timg)
                mean = torch.chunk(moments, 2, dim=1)[0]
                z_ref = ref_ae.scale_factor * (mean - ref_ae.shift_factor)
                rdec = ref_ae.decode(z_ref).numpy().transpose(0, 2, 3, 1)
            z_delta = float(np.abs(
                np.asarray(z, np.float32)
                - z_ref.numpy().transpose(0, 2, 3, 1)).max())
            delta = np.abs(out - rdec)
            mse = float((delta ** 2).mean())
            psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range [-1, 1]
            steps["vae_pixel"] = _result(
                "pass" if psnr > 35.0 else "fail",
                latent_max_abs=z_delta,
                pixel_max_abs=float(delta.max()),
                psnr_db=round(float(psnr), 2),
            )
        except Exception as e:
            steps["vae_pixel"] = _result("fail", error=repr(e)[:300])

    # -- t2i golden seed ----------------------------------------------------
    if inferencer is None or not cfg.visual_gen:
        steps["t2i_golden"] = _result("skip", reason="no gen stack/tokenizer")
    else:
        try:
            ld = cfg.latent_downsample
            size = args.t2i_size or 8 * ld
            ctx = inferencer.init_gen_context()
            ctx = inferencer.update_context_text("a chest x-ray", ctx)
            latent = inferencer.gen_image_latent(
                (size, size), ctx, cfg_text_scale=4.0,
                num_timesteps=4,
            )
            lat = np.asarray(latent, np.float32)
            stats = {
                "shape": list(lat.shape),
                "mean": round(float(lat.mean()), 6),
                "std": round(float(lat.std()), 6),
                "sha256": hashlib.sha256(lat.tobytes()).hexdigest()[:16],
            }
            if args.golden:
                with open(args.golden) as f:
                    golden = json.load(f)
                close = (abs(stats["mean"] - golden["mean"]) < 1e-3
                         and abs(stats["std"] - golden["std"]) < 1e-3)
                steps["t2i_golden"] = _result(
                    "pass" if close else "fail", stats=stats, golden=golden)
            else:
                steps["t2i_golden"] = _result("pass", stats=stats,
                                              note="recorded (no --golden)")
        except Exception as e:
            steps["t2i_golden"] = _result("fail", error=repr(e)[:300])

    _finish(report, args)


def _finish(report, args):
    statuses = [s["status"] for s in report["steps"].values()]
    report["summary"] = {
        "pass": statuses.count("pass"), "fail": statuses.count("fail"),
        "skip": statuses.count("skip"), "warn": statuses.count("warn"),
    }
    report["ok"] = statuses.count("fail") == 0
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"]))
    for name, s in report["steps"].items():
        print(f"  {name}: {s['status']}"
              + (f" ({s.get('reason', s.get('error', ''))})"
                 if s["status"] != "pass" else ""))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()

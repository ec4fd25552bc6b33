"""Batched VQA evaluation glue (reference eval/vlm/utils.py:486-506 +
VLMEvalKit-style runner acknowledged at README.md:330).

``run_vqa_eval`` drives the continuous-batching engine over (image, question)
samples — the batched-eval path of BASELINE config 3 — and scores with a
pluggable metric (exact match by default, SLAKE/VQA-RAD closed-set style).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

from PIL import Image

from unimedvl_tpu.config import TransformConfig
from unimedvl_tpu.data.imaging import ImageTransform, pil_img2rgb


def build_transform() -> ImageTransform:
    """vlm_sft transform (eval/vlm/utils.py:486-502): 980/378/14/2_007_040."""
    t = TransformConfig.vit_vqa()
    return ImageTransform(t.max_size, t.min_size, t.stride, t.max_pixels)


def process_conversation(images: Sequence[Image.Image], conversation):
    """eval/vlm/utils.py:504-506."""
    return [pil_img2rgb(img) for img in images], conversation


def _normalize(ans: str) -> str:
    ans = ans.strip().lower()
    ans = re.sub(r"[^\w\s]", "", ans)
    return re.sub(r"\s+", " ", ans)


def exact_match_accuracy(
    predictions: Sequence[str], answers: Sequence[str]
) -> float:
    """Closed-set VQA accuracy: normalized exact match (either contained)."""
    hits = 0
    for p, a in zip(predictions, answers):
        pn, an = _normalize(p), _normalize(a)
        if pn == an or (an and an in pn):
            hits += 1
    return hits / max(len(predictions), 1)


def run_vqa_eval(
    params,
    cfg,
    tokenizer,
    new_token_ids: Dict[str, int],
    samples: Iterable[Dict],
    max_new_tokens: int = 64,
    num_slots: int = 8,
    capacity: int = 8192,
    metric: Callable[[Sequence[str], Sequence[str]], object] = exact_match_accuracy,
    mesh=None,
    spec_decode: bool = False,
    kv_quantized: bool = False,
    kv_bits: int = 8,
) -> Tuple[List[str], Optional[object]]:
    """samples: dicts with 'image' (PIL or path), 'question', optional 'answer'.

    ``mesh``: optional ("data", "model") Mesh — runs the whole eval multi-chip
    (TP-sharded params, slot pool over "data"), see ContinuousBatcher.

    ``spec_decode``: speculative continuous batching (greedy-exact, so the
    eval numbers are unchanged — report-generation tasks whose outputs echo
    the prompt/context n-grams run several tokens per weight pass).

    ``metric``: exact_match_accuracy (closed-set VQA, default) or
    eval.text_metrics.report_metrics for the generation-task text columns
    (BLEU-3 / METEOR / ROUGE-L, README.md:270) — any callable over
    (predictions, answers).

    Returns (predictions in sample order, metric result or None if no
    answers).
    """
    from unimedvl_tpu.inference.serving import ContinuousBatcher, Request

    samples = list(samples)
    batcher = ContinuousBatcher(
        params, cfg, tokenizer, new_token_ids,
        num_slots=num_slots, capacity=capacity,
        vit_transform=build_transform(),
        mesh=mesh,
        spec_decode=spec_decode,
        kv_quantized=kv_quantized,
        kv_bits=kv_bits,
    )
    rids = []
    for s in samples:
        img = s.get("image")
        if isinstance(img, str):
            img = Image.open(img)
        if img is not None:
            img = pil_img2rgb(img)
        rids.append(
            batcher.submit(
                Request(prompt=s["question"], image=img, max_new_tokens=max_new_tokens)
            )
        )
    results = batcher.run()
    predictions = [results[r] for r in rids]

    answers = [s.get("answer") for s in samples]
    acc = None
    if all(a is not None for a in answers) and answers:
        acc = metric(predictions, answers)
    return predictions, acc

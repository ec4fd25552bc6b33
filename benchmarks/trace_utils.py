"""Shared jax.profiler trace parsing for the TPU benchmarks: device-lane
event extraction + hlo_category aggregation (works on the axon tunnel's
xplane-exported vm.trace.json.gz)."""

import glob
import gzip
import json
import os
from collections import defaultdict


def load_latest_trace(trace_dir: str) -> dict:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace found under {trace_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    trace["_path"] = path
    return trace


def device_pids(trace: dict) -> set:
    pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = (ev.get("args") or {}).get("name", "")
            if "TPU" in pname or "/device" in pname.lower():
                pids.add(ev.get("pid"))
    return pids


def hlo_category_breakdown(trace: dict, skip=("while",)):
    """Sum device-event durations by hlo_category; returns
    (by_category_us, top_ops) where top_ops maps op name -> (us, long_name,
    shape). 'while'/program wrapper rows double-count their bodies and are
    skipped."""
    pids = device_pids(trace)
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    info = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if pids and ev.get("pid") not in pids:
            continue
        a = ev.get("args") or {}
        cat = a.get("hlo_category")
        if cat is None or cat in skip:
            continue
        dur = ev.get("dur", 0)
        by_cat[cat] += dur
        nm = ev.get("name", "")
        by_op[nm] += dur
        if nm not in info:
            info[nm] = (a.get("long_name", "")[:160],
                        a.get("shape_with_layout", "")[:80])
    top = {
        nm: {"us": round(v, 1), "long_name": info[nm][0], "shape": info[nm][1]}
        for nm, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]
    }
    return dict(by_cat), top

#!/usr/bin/env python
"""Sum TPU op self-times by Python source attribution from a
jax.profiler trace (complements xprof_top.py's per-HLO-op view)."""
import collections
import glob
import gzip
import json
import sys


def main():
    logdir = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        sys.exit(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Device" in n}
    by_src = collections.Counter()
    cat_by_src = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args") or {}
        src = args.get("source")
        if src is None:
            continue  # skip the enclosing while/jit envelopes
        dur = e.get("dur", 0) / 1e3
        by_src[src] += dur
        cat_by_src.setdefault(src, collections.Counter())[
            args.get("hlo_category", "?")] += dur
        total += dur
    print(f"total attributed device time: {total:.1f} ms")
    for src, ms in by_src.most_common(topn):
        cats = ", ".join(f"{c}:{v:.0f}" for c, v in
                         cat_by_src[src].most_common(3))
        print(f"{ms:9.1f} ms  {src}  [{cats}]")


if __name__ == "__main__":
    main()

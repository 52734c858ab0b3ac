"""Summarize a jax.profiler TPU trace without TensorBoard.

tensorboard_plugin_profile's python API is version-broken in this image
(working notes), so this parses the trace's chrome-trace JSON directly: total
device time, top ops by aggregate duration, and a copy/relayout report — the
workflow used for every round-2/3 kernel optimization.

    python scripts/profile_sampler.py --steps 8 --fused --split --out /tmp/t
    python scripts/trace_summary.py /tmp/t [--top 40] [--iters 3]

--iters divides totals so per-iteration numbers come out right when the trace
captured N timed iterations.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace_json(root: str) -> str:
    if os.path.isfile(root):
        return root
    hits = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return hits[-1]  # latest capture


def load_xla_ops(path: str):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e["pid"], e.get("tid"))] = e["args"].get("name")
    ops = [e for e in ev if e.get("ph") == "X" and names.get((e["pid"], e["tid"])) == "XLA Ops"]
    if not ops:
        raise SystemExit(f"no 'XLA Ops' thread in {path}; threads: {sorted(set(names.values()))}")
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir (from utils.trace / profile_sampler) or json.gz")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=1, help="timed iterations in the capture")
    ap.add_argument("--min-copy-us", type=float, default=100.0)
    args = ap.parse_args()

    path = find_trace_json(args.trace)
    ops = load_xla_ops(path)

    # Self-time: ops that execute inside a `while` body (scan iterations) are
    # emitted BOTH as their own events and inside the while's span — a naive
    # sum double-counts them (observed: 313 "ms/step" vs 199 ms wall on the 1B
    # train step). Subtract each event's children so totals are wall-truthful.
    # Nesting is PER TRACE ROW: concurrent events from different devices/rows
    # are not parent/child, so build one stack per (pid, tid).
    child = collections.Counter()  # name -> total time of direct children
    by_row = collections.defaultdict(list)
    for e in ops:
        by_row[(e["pid"], e["tid"])].append(e)
    for row in by_row.values():
        row.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, event) of currently-open enclosing spans
        for e in row:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                child[stack[-1][1]["name"]] += dur
            stack.append((ts + dur, e))

    agg = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    for e in ops:
        agg[e["name"]] += e.get("dur", 0)
        cnt[e["name"]] += 1
        if e["name"] not in meta:
            a = e.get("args", {})
            meta[e["name"]] = {
                "long": a.get("long_name", "")[:160],
                "src": a.get("source", ""),
                "cat": a.get("hlo_category", ""),
            }
    for name, c in child.items():
        agg[name] -= c  # keep per-op *self* time

    k = args.iters
    total = sum(agg.values())
    print(f"trace: {path}")
    print(f"total XLA-op SELF time: {total / 1e3 / k:.2f} ms/iter over {len(ops)} events "
          f"({k} iter{'s' if k != 1 else ''})\n")

    print(f"{'op':<46} {'us/iter':>9} {'n/iter':>7} {'us/ea':>8}  category  (self time)")
    for name, d in agg.most_common(args.top):
        print(
            f"{name[:46]:<46} {d / k:>9.0f} {cnt[name] / k:>7.1f} "
            f"{d / cnt[name]:>8.1f}  {meta[name]['cat']}"
        )

    print(f"\n-- copies / transposes / relayouts >= {args.min_copy_us} us/iter --")
    any_copy = False
    for name, d in agg.most_common():
        if meta[name]["cat"] != "data formatting" and not any(
            key in name.lower() for key in ("copy", "transpose")
        ):
            continue
        if d / k < args.min_copy_us:
            continue
        any_copy = True
        print(f"{name:<30} {d / k:>8.0f} us/iter  n/iter={cnt[name] / k:.1f}")
        if meta[name]["long"]:
            print(f"    {meta[name]['long']}")
        if meta[name]["src"]:
            print(f"    at {meta[name]['src']}")
    if not any_copy:
        print("(none)")


if __name__ == "__main__":
    main()

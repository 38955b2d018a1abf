#!/usr/bin/env python
"""Summarise a jax.profiler trace: device ms per jit program + top ops.

Parses the vm.trace.json.gz produced by `jax.profiler.trace(dir)` (the
CLAUDE.md-documented workflow: aggregate `ph == "X"` events on the
device pid) and prints

  - per-module device totals ("XLA Modules" track — one span per jit
    program execution, summed over executions), and
  - the top op categories ("XLA Ops" track, name prefix before the
    first dot) so regressions like a select_reduce fusion or a
    serialized while-loop show up by name.

This is the parser behind every per-pass table in BENCH_NOTES.md /
docs/PERFORMANCE.md (round-4/5 tables).  Usage:

    python scripts/trace_summary.py /tmp/jt_trace_dir [--ops 20]
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import sys
from pathlib import Path


def find_trace_file(root: str) -> Path:
    hits = sorted(Path(root).rglob("*.trace.json.gz"))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {root}")
    return hits[-1]  # newest session dir sorts last


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--ops", type=int, default=20,
                    help="how many op categories to print")
    args = ap.parse_args()

    path = find_trace_file(args.trace_dir)
    events = json.load(gzip.open(path))["traceEvents"]

    device_pids = set()
    thread_names: dict[tuple[int, int], str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and "TPU" in e["args"].get("name", ""):
            device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    if not device_pids:
        sys.exit("no TPU pid in trace (CPU-only run?)")

    modules: collections.Counter[str] = collections.Counter()
    mod_runs: collections.Counter[str] = collections.Counter()
    ops: collections.Counter[str] = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        track = thread_names.get((e["pid"], e["tid"]), "")
        if track == "XLA Modules":
            # "jit__fused_master_a_packed(16135819073…)" -> strip the id
            name = e["name"].split("(")[0]
            modules[name] += e.get("dur", 0)
            mod_runs[name] += 1
        elif track == "XLA Ops":
            ops[e["name"].split(".")[0]] += e.get("dur", 0)

    total = sum(modules.values())
    print(f"# {path}")
    print(f"\n## device ms per jit module (total {total / 1000:.1f} ms)\n")
    for name, dur in modules.most_common():
        print(f"  {dur / 1000:8.1f} ms  x{mod_runs[name]:<4d} {name}")
    print("\n## top op categories (XLA Ops track)\n")
    for name, dur in ops.most_common(args.ops):
        print(f"  {dur / 1000:8.1f} ms  {name}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Real-TPU bench of the config-5 batch master (process_back_catalogue).

Masters N distinct synthetic episodes through the batched chunked device
programs (parallel/batch_chunked) on the attached chip and reports
aggregate realtime.  The single chip stands in for one dp lane of the
v5e-8 slice BASELINE config 5 targets: lanes scale with chips because the
batch path has no cross-file collectives — per-chip throughput measured
here IS the per-chip term of the 64-episode sweep.

Usage: python scripts/bench_batch_master.py [--files 4] [--secs 300]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--secs", type=float, default=300.0)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--trace", default="",
                    help="wrap the timed run in jax.profiler.trace at this "
                         "dir — gives the BATCHED device ms per file "
                         "(VERDICT r4 #1: the PCIe amortisation claim needs "
                         "a measured batch number, not the single-stream one)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(0, ".")
    from bench import make_fixture

    from jivetalking_tpu.io.wav import write_wav
    from jivetalking_tpu.parallel.batch import process_back_catalogue

    rng = np.random.default_rng(99)
    tmp = Path(tempfile.mkdtemp(prefix="jt_batchbench_"))

    def make_files(tag: str) -> list[str]:
        out = []
        for i in range(args.files):
            x = make_fixture(args.secs, args.sr)
            x = np.clip(
                x + rng.uniform(-1e-4, 1e-4, size=x.shape).astype(np.float32),
                -1.0, 1.0)
            p = tmp / f"episode_{tag}{i}.wav"
            write_wav(str(p), x, args.sr)
            out.append(str(p))
        return out

    paths = make_files("a")

    # warm run (compiles the vmapped chunk programs for this bucket shape)
    t0 = time.perf_counter()
    process_back_catalogue(paths, out_dir=str(tmp / "warm"))
    print(f"warm total {time.perf_counter() - t0:.1f}s", flush=True)

    # timed run on FRESH content (tunnel memoizes by content)
    paths2 = make_files("b")

    trace_ctx = None
    if args.trace:
        trace_ctx = jax.profiler.trace(args.trace)
        trace_ctx.__enter__()
    t0 = time.perf_counter()
    results = process_back_catalogue(paths2, out_dir=str(tmp / "out"))
    wall = time.perf_counter() - t0
    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
    errs = [r for r in results if "error" in r]
    rt = args.secs * args.files / wall
    print(json.dumps({
        "metric": "batch_master_realtime_factor",
        "value": round(rt, 2),
        "unit": f"x_realtime_{args.secs/60:g}min_x{args.files}files_batched",
        "wall_s": round(wall, 3),
        "errors": len(errs),
        "error_msgs": sorted({str(r["error"])[:160] for r in errs}),
        "output_lufs": [round(r.get("output_lufs", float("nan")), 2)
                        for r in results if "error" not in r],
    }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Phase-wall breakdown of the 45-min chunked master (the reference's real
workload) on the attached device.

Reads `pipeline.fused_chunked.LAST_PHASE_WALLS` after a timed run on fresh
fixture content (the axon client memoizes execute/pull by content).  The
*_loop keys are async dispatch loops (host trace time; the device/wire work
they enqueue shows up in the BLOCKING keys that follow), gather_* are the
metric-pull sync points, final_pull is the delivery concat.

Usage:  python scripts/profile_master_chunked.py [--secs 2700] [--sr 48000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=2700.0)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-warm", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jivetalking_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from bench import make_fixture

    import jivetalking_tpu.analysis.analyser as A
    import jivetalking_tpu.pipeline.fused_chunked as FC
    from jivetalking_tpu.adaptive.adapt import adapt_config
    from jivetalking_tpu.adaptive.config import default_filter_config

    rng = np.random.default_rng(args.seed)
    cfg = default_filter_config()

    def run(tag, bump):
        x = make_fixture(args.secs, args.sr) + rng.uniform(
            -1e-4, 1e-4, size=int(args.secs * args.sr)).astype(np.float32)
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        t0 = time.perf_counter()
        ta = time.perf_counter()
        m = A.analyse_audio(xi, args.sr, target_i=cfg.loudnorm.target_i)
        t_analysis = time.perf_counter() - ta
        th = time.perf_counter()
        eff, _diag = adapt_config(cfg, m)
        t_adapt = time.perf_counter() - th
        out, rate, fm, ft = FC.fused_master_chunked(
            m.device_pcm, args.sr, eff, m)
        wall = time.perf_counter() - t0
        rt = args.secs / wall
        print(f"\n[{tag}] wall {wall:.3f}s  ({rt:.1f}x realtime)")
        rows = dict(FC.LAST_PHASE_WALLS)
        rows["analysis"] = t_analysis
        rows["adapt"] = t_adapt
        for k, v in sorted(rows.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<12} {v*1000:9.1f} ms  {100*v/wall:5.1f}%")
        print(json.dumps({"wall_s": round(wall, 3),
                          "rt_factor": round(rt, 2),
                          **{k: round(v, 4) for k, v in rows.items()}}))
        return rt

    if not args.skip_warm:
        print("warming...", flush=True)
        run("warm", 0)
    run("timed", 1)


if __name__ == "__main__":
    main()

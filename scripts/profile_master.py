#!/usr/bin/env python
"""Wall-time breakdown of the full 4-pass master on the attached device.

Answers the round-1 open question (VERDICT Weak #2): where do the
milliseconds go — tunnel transfers, device compute, or host analysis?

Phases timed (fresh fixture content per run — the axon client memoizes
execute/pull by content, so reruns on identical bytes read ~0):

    upload            explicit device_put + block of the int16 PCM
    fused_analysis    Pass-1 device program + packed metrics pull
    host_analysis     interval engine + VAD + elections (host python)
    bands             2 region x 17-band RMS dispatches + pulls
    adapt             Pass 1.5 pure function
    master_stage_a    chain + filtered metering + plan + prefix + pass-3
    master_stage_b    gain + declick + brickwall + final metering + resample
    output_pull       delivery PCM chunks device -> host

Usage:  python scripts/profile_master.py [--secs 300] [--trace DIR]
With --trace, wraps the timed run in jax.profiler.trace for op-level
inspection (parse the vm.trace.json.gz as documented in CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=300.0)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--trace", default="")
    ap.add_argument("--seed", type=int, default=0,
                    help="fixture content seed; vary per run to defeat the "
                         "tunnel's content memoization")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    
    sys.path.insert(0, ".")
    from bench import make_fixture

    import jivetalking_tpu.analysis.analyser as A
    import jivetalking_tpu.pipeline.fused as F
    from jivetalking_tpu.adaptive.adapt import adapt_config
    from jivetalking_tpu.adaptive.config import default_filter_config

    rng = np.random.default_rng(args.seed)
    x = make_fixture(args.secs, args.sr)
    # unique content each run (tunnel memoization defeat): flip low bits
    x = x + rng.uniform(-1e-4, 1e-4, size=x.shape).astype(np.float32)
    xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

    times: dict[str, float] = {}

    def bracket(name):
        class _B:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *exc):
                times[name] = times.get(name, 0.0) + time.perf_counter() - self.t

        return _B()

    # ---- instrument the seams ----
    orig_fused_analysis = F.fused_analysis
    orig_dispatch = F.band_rms_dispatch
    orig_collect = F.band_rms_collect

    def fused_analysis(*a, **k):
        with bracket("fused_analysis"):
            return orig_fused_analysis(*a, **k)

    # analyser.py imports these lazily inside the function body, so module-
    # attribute patching reaches every call site
    F.fused_analysis = fused_analysis

    import jivetalking_tpu.pipeline.fused_chunked as FC

    orig_streamed = FC.fused_analysis_streamed

    def fused_analysis_streamed(*a, **k):
        with bracket("analysis_streamed"):
            return orig_streamed(*a, **k)

    FC.fused_analysis_streamed = fused_analysis_streamed

    def band_rms_dispatch(*a, **k):
        with bracket("bands"):
            return orig_dispatch(*a, **k)

    def band_rms_collect(*a, **k):
        with bracket("bands"):
            return orig_collect(*a, **k)

    F.band_rms_dispatch = band_rms_dispatch
    F.band_rms_collect = band_rms_collect
    import jivetalking_tpu.analysis.bands as BND

    if hasattr(BND, "band_rms_dispatch"):
        BND.band_rms_dispatch = band_rms_dispatch
    if hasattr(BND, "band_rms_collect"):
        BND.band_rms_collect = band_rms_collect

    # ---- warm run (compiles + upload path) ----
    print("warming...", flush=True)
    cfg = default_filter_config()
    t_warm0 = time.perf_counter()
    m = A.analyse_audio(xi, args.sr, target_i=cfg.loudnorm.target_i)
    eff, _diag = adapt_config(cfg, m)
    out, rate, fm, ft = F.fused_master(m.device_pcm, args.sr, eff, m)
    np.concatenate([np.asarray(c) for c in out])
    print(f"warm total {time.perf_counter() - t_warm0:.2f}s", flush=True)

    # ---- timed run on FRESH content ----
    x2 = make_fixture(args.secs, args.sr) + rng.uniform(
        -1e-4, 1e-4, size=x.shape).astype(np.float32)
    xi2 = np.clip(np.round(x2 * 32768.0), -32768, 32767).astype(np.int16)
    times.clear()

    trace_ctx = None
    if args.trace:
        trace_ctx = jax.profiler.trace(args.trace)
        trace_ctx.__enter__()

    # the timed run mirrors the REAL pipeline: analyse_audio receives the
    # host int16 array and owns the upload (streamed chunks overlap the
    # transfers with the per-chunk metering when the file is long enough)
    t0 = time.perf_counter()
    with bracket("analysis_total"):
        m = A.analyse_audio(xi2, args.sr, target_i=cfg.loudnorm.target_i)
    with bracket("adapt"):
        eff, _diag = adapt_config(cfg, m)
    out, rate, fm, ft = F.fused_master(m.device_pcm, args.sr, eff, m)
    times["master_stage_a"] = ft["stage_a"]
    times["master_stage_b"] = ft["stage_b"]
    times["master_pre"] = ft.get("pre", 0.0)
    times["master_post"] = ft.get("post", 0.0)
    with bracket("output_pull"):
        pcm = np.concatenate([np.asarray(c) for c in out])
    wall = time.perf_counter() - t0

    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)

    times["host_analysis"] = (times.get("analysis_total", 0.0)
                              - times.get("fused_analysis", 0.0)
                              - times.get("analysis_streamed", 0.0)
                              - times.get("bands", 0.0))
    times.pop("analysis_total", None)
    accounted = sum(times.values())
    times["unaccounted"] = wall - accounted

    rt = args.secs / wall
    print(f"\nwall {wall:.3f}s  ({rt:.1f}x realtime, {args.secs:.0f}s fixture, "
          f"{len(pcm)} out samples @ {rate} Hz)")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<18} {v*1000:8.1f} ms  {100*v/wall:5.1f}%")
    print(json.dumps({"wall_s": round(wall, 3), "rt_factor": round(rt, 2),
                      **{k: round(v, 4) for k, v in times.items()}}))


if __name__ == "__main__":
    main()

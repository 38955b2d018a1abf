#!/usr/bin/env python
"""Per-filter ablation benchmark matrix.

Mirror of the reference's filter ablation harness (ref: internal/processor/
filter_ablation_benchmark_test.go): times the Pass-2 chain with each filter
toggled off in turn, against the full chain, so regressions in any one
kernel are attributable.  Prints one JSON line per configuration.

Usage: python bench_ablation.py   (env: BENCH_DURATION_SECS, BENCH_SAMPLE_RATE)
"""

import copy
import json
import os
import time



# The ablation matrix: each entry disables exactly ONE production filter,
# leaving every other field of the adapted config untouched, so a timing
# delta is attributable to that filter alone (ref: the fullbench pass-2
# ablation specs, filter_ablation_benchmark_test.go:419-540 — each spec
# is the production chain minus one clause, order preserved).
ABLATIONS = ("rumble_highpass", "bandlimit_lowpass", "nlm", "afftdn",
             "speech_gate", "compressor", "deesser")


def ablate(base_cfg, name):
    """A deep copy of `base_cfg` with the named filter (and nothing else)
    disabled."""
    cfg = copy.deepcopy(base_cfg)
    if name == "rumble_highpass":
        cfg.rumble_highpass.enabled = False
    elif name == "bandlimit_lowpass":
        cfg.bandlimit_lowpass.enabled = False
    elif name == "nlm":
        cfg.noise_reduction.enabled = False
    elif name == "afftdn":
        cfg.noise_reduction.afftdn_enabled = False
    elif name == "speech_gate":
        cfg.speech_gate.enabled = False
    elif name == "compressor":
        cfg.levelling_compressor.enabled = False
    elif name == "deesser":
        cfg.deesser.enabled = False
    else:
        raise ValueError(f"unknown ablation {name!r}")
    return cfg


def main() -> None:
    duration = float(os.environ.get("BENCH_DURATION_SECS", "60"))
    sr = int(os.environ.get("BENCH_SAMPLE_RATE", "48000"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from bench import make_fixture
    from jivetalking_tpu.adaptive import adapt_config, default_filter_config
    from jivetalking_tpu.analysis import analyse_audio
    from jivetalking_tpu.pipeline.pass2 import apply_filter_chain

    x = make_fixture(duration, sr)
    m = analyse_audio(x, sr)
    base_cfg, _ = adapt_config(default_filter_config(), m)

    configs = ["full", *ABLATIONS]
    full_time = None
    for name in configs:
        cfg = base_cfg if name == "full" else ablate(base_cfg, name)
        y = apply_filter_chain(x, sr, cfg)
        y.block_until_ready()
        # best of 3: sub-second walls on the remote tunnel swing with
        # per-dispatch round-trip latency, which otherwise swamps the
        # per-filter cost being measured
        wall = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = apply_filter_chain(x, sr, cfg)
            y.block_until_ready()
            wall = min(wall, time.perf_counter() - t0)
        if name == "full":
            full_time = wall
        print(json.dumps({
            "config": name if name == "full" else f"minus_{name}",
            "wall_s": round(wall, 3),
            "realtime_factor": round(duration / wall, 1),
            "saving_vs_full_s": round((full_time - wall), 3) if full_time else 0.0,
        }), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Real-TPU micro-bench: astats windowed stats, flat vs lane-major prefixes.

The flat `lax.cummax`/`jnp.cumsum` in `_sliding_max`/`_sliding_sumsq`
lowered to the 58.1 ms select_reduce fusions in the 300 s master's stage A
(trace /tmp/jt_trace_r5_head2, 2026-08-20).  This times `_astats_core`
standalone on a 300 s 48 kHz signal for both formulations
(JT_ASTATS_LANE_PREFIX in a subprocess each) — fresh content per run, the
tunnel memoizes by content.

Usage: python scripts/bench_astats_variants.py [inner]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

INNER = r"""
import time
import numpy as np
import jivetalking_tpu  # noqa: F401  (axon site init)
import jax, jax.numpy as jnp
from jivetalking_tpu.metering.astats import _astats_core

sr = 48000
n = 300 * sr
w = int(0.05 * sr)
def make(seed):
    rng = np.random.default_rng(seed)
    x = (0.1 * np.sin(np.arange(n) * 0.01)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))
    jax.block_until_ready(xd)
    return xd

# compile warm-up on separate content (the tunnel memoizes execute by
# content — time FIRST executions on fresh signals only)
jax.block_until_ready(_astats_core(make(0), w))
best = float("inf")
for run in range(3):
    xd = make(1000 + run + int(time.time()))
    t0 = time.perf_counter()
    jax.block_until_ready(_astats_core(xd, w))
    best = min(best, time.perf_counter() - t0)
print("RESULT", best)
"""


def run(flag: str) -> float:
    env = dict(os.environ, JT_ASTATS_LANE_PREFIX=flag)
    p = subprocess.run([sys.executable, "-c", INNER], env=env,
                       capture_output=True, text=True, timeout=900)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"no RESULT (flag={flag}):\n{p.stdout}\n{p.stderr}")


def main() -> None:
    flat = run("0")
    lane = run("1")
    print(json.dumps({
        "astats_core_300s_flat_ms": round(flat * 1000, 1),
        "astats_core_300s_lane_ms": round(lane * 1000, 1),
        "speedup": round(flat / lane, 3),
    }))


if __name__ == "__main__":
    main()

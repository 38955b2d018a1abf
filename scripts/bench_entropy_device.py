#!/usr/bin/env python
"""Device-time sweep of the 8192-bin histogram (astats entropy) variants.

The round-5 session-1 sweep (`bench_entropy_variants.py`) timed WALL
clock, where the ~30 ms tunnel dispatch noise hides device-time
differences between ~20 and ~30 ms candidates.  This one wraps each
timed run in `jax.profiler.trace` and sums the jit module's device
spans (same parser as scripts/trace_summary.py), so a 2x device win is
visible even through a congested tunnel.

Context: the shipping int8 one-hot MXU contraction costs 29.1 ms per
300 s signal (trace /tmp/jt_trace_r5_s3) against a ~15 ms systolic
floor for K=14.4M at one K-element/cycle — the sweep asks whether any
formulation feeds the array closer to that floor.

Run on the attached TPU: python scripts/bench_entropy_device.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BINS = 8192


def _onehots(idx, hi_bins, dtype):
    lo_bins = BINS // hi_bins
    shift = int(np.log2(lo_bins))
    hi = (idx >> shift).astype(jnp.int32)
    lo = (idx & (lo_bins - 1)).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(hi_bins, dtype=jnp.int32)[None, :]).astype(dtype)
    oh_lo = (lo[:, None] == jnp.arange(lo_bins, dtype=jnp.int32)[None, :]).astype(dtype)
    return oh_hi, oh_lo


def hist_dot(idx, hi_bins=128, dtype=jnp.int8, acc=jnp.int32):
    oh_hi, oh_lo = _onehots(idx, hi_bins, dtype)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())), preferred_element_type=acc)
    return counts.reshape(-1).astype(jnp.float32)


def hist_ksplit(idx, parts=8, hi_bins=128, dtype=jnp.int8, acc=jnp.int32):
    """K split into independent contractions (can they overlap on the MXUs?)"""
    n = idx.shape[0]
    m = n // parts
    total = None
    for p in range(parts):
        oh_hi, oh_lo = _onehots(idx[p * m:(p + 1) * m], hi_bins, dtype)
        c = jax.lax.dot_general(
            oh_hi, oh_lo, (((0,), (0,)), ((), ())), preferred_element_type=acc)
        total = c if total is None else total + c
    return total.reshape(-1).astype(jnp.float32)


def hist_batched(idx, parts=8, hi_bins=128, dtype=jnp.int8, acc=jnp.int32):
    """Batch-dim contraction: (B, m, hi) x (B, m, lo) -> (B, hi, lo), sum B."""
    n = idx.shape[0]
    m = n // parts
    lo_bins = BINS // hi_bins
    shift = int(np.log2(lo_bins))
    r = idx[: parts * m].reshape(parts, m)
    hi = (r >> shift).astype(jnp.int32)
    lo = (r & (lo_bins - 1)).astype(jnp.int32)
    oh_hi = (hi[..., None] == jnp.arange(hi_bins, dtype=jnp.int32)).astype(dtype)
    oh_lo = (lo[..., None] == jnp.arange(lo_bins, dtype=jnp.int32)).astype(dtype)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))), preferred_element_type=acc)
    return jnp.sum(counts, axis=0).reshape(-1).astype(jnp.float32)


def entropy_from(counts_f32, n):
    p = counts_f32 / n
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)) / np.log2(BINS)


def make(fn, **kw):
    def run(x):
        n = x.shape[0]
        idx = jnp.clip(((x + 1.0) * (BINS / 2.0)).astype(jnp.int32), 0, BINS - 1)
        return entropy_from(fn(idx, **kw), n)
    return jax.jit(run)


def device_ms(trace_dir: str) -> float:
    hits = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    events = json.load(gzip.open(hits[-1]))["traceEvents"]
    pids = {e["pid"] for e in events if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")}
    tname = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "thread_name"}
    mods = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e["pid"] in pids \
                and tname.get((e["pid"], e["tid"])) == "XLA Modules":
            mods[e["name"].split("(")[0]] += e.get("dur", 0)
    # the entropy program is the dominant module in the window
    return max(mods.values()) / 1000 if mods else float("nan")


def main():
    sr = 48000
    n = 300 * sr
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) * 0.1).astype(np.float32)

    variants = {
        "int8_128hi": make(hist_dot),
        "bf16_128hi": make(hist_dot, dtype=jnp.bfloat16, acc=jnp.float32),
        "int8_64hi": make(hist_dot, hi_bins=64),
        "ksplit8": make(hist_ksplit),
        "batched8": make(hist_batched),
        "batched64": make(hist_batched, parts=64),
        "batched64_bf16": make(hist_batched, parts=64,
                               dtype=jnp.bfloat16, acc=jnp.float32),
    }
    ref = None
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            y = float(fn(jnp.asarray(x)))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for i in range(2):
                xv = jnp.asarray(x + np.float32(1e-7 * (i + 1)))
                xv.block_until_ready()
                tdir = f"/tmp/jt_ent_trace_{name}_{i}"
                with jax.profiler.trace(tdir):
                    fn(xv).block_until_ready()
                best = min(best, device_ms(tdir))
            if ref is None:
                ref = y
            print(f"{name:15s} compile {compile_s:6.1f}s  device {best:7.2f} ms"
                  f"  ent {y:.6f}  d={y - ref:+.2e}", flush=True)
        except Exception as e:
            print(f"{name:15s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()

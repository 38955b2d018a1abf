#!/usr/bin/env python
"""Micro-bench: 8192-bin sample-value histogram formulations (astats entropy).

The round-4 trace put the one-hot int8 MXU contraction at ~29 ms per
300 s stage (it runs once in stage A on the filtered signal and once in
stage B on the final output — different signals, so it cannot be shared;
the lever is making one run cheaper).  Candidates:

  int8   — (n,128) x (n,64) int8 one-hots, int32 accumulate   (ships today)
  bf16   — same contraction with bf16 one-hots, f32 accumulate (native MXU
           path; exact while n < 2^24 per (hi,lo) cell)
  w128   — one-hot ONLY the 128 hi bins; fold the 64 lo bins into a second
           operand built by comparing lo against an iota (same as base but
           dot_general arranged (64,n)x(n,128) so the big operand is read
           once in its natural layout)
  hi4096 — factor 8192 = 64*128 the other way round (lo wider than hi)

Run on the attached TPU: python scripts/bench_entropy_variants.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

BINS = 8192


def hist_int8(idx, hi_bins=128):
    lo_bins = BINS // hi_bins
    shift = int(np.log2(lo_bins))
    hi = (idx >> shift).astype(jnp.int32)
    lo = (idx & (lo_bins - 1)).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(hi_bins, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    oh_lo = (lo[:, None] == jnp.arange(lo_bins, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return counts.reshape(-1).astype(jnp.float32)


def hist_bf16(idx, hi_bins=128):
    lo_bins = BINS // hi_bins
    shift = int(np.log2(lo_bins))
    hi = (idx >> shift).astype(jnp.int32)
    lo = (idx & (lo_bins - 1)).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(hi_bins, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    oh_lo = (lo[:, None] == jnp.arange(lo_bins, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return counts.reshape(-1)


def entropy_from(p_counts, n):
    p = p_counts / n
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)) / np.log2(BINS)


def make(fn, **kw):
    def run(x):
        n = x.shape[0]
        idx = jnp.clip(((x + 1.0) * (BINS / 2.0)).astype(jnp.int32), 0, BINS - 1)
        return entropy_from(fn(idx, **kw), n)
    return jax.jit(run)


def main():
    sr = 48000
    n = 300 * sr
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) * 0.1).astype(np.float32)

    variants = {
        "int8": make(hist_int8),
        "bf16": make(hist_bf16),
        "int8_64hi": make(hist_int8, hi_bins=64),
        "bf16_64hi": make(hist_bf16, hi_bins=64),
        "int8_256hi": make(hist_int8, hi_bins=256),
        "bf16_256hi": make(hist_bf16, hi_bins=256),
    }
    ref = None
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            y = float(fn(jnp.asarray(x)))
            compile_s = time.perf_counter() - t0
            walls = []
            for i in range(3):
                xv = jnp.asarray(x + np.float32(1e-7 * (i + 1)))
                xv.block_until_ready()
                t0 = time.perf_counter()
                fn(xv).block_until_ready()
                walls.append(time.perf_counter() - t0)
            if ref is None:
                ref = y
            print(f"{name:11s} compile {compile_s:6.1f}s  run {min(walls)*1000:7.1f} ms  "
                  f"(all {[f'{w*1000:.0f}' for w in walls]})  ent {y:.6f}  d={y-ref:+.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:11s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

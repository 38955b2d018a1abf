#!/usr/bin/env python
"""Micro-bench: linear-recurrence prefix formulations for the followers.

Round-4 trace: ops/dynamics.py:59 (the flat Hillis-Steele steps of
linear_recurrence) is 122.8 ms of stage A's 464 ms on the 300 s fixture —
the envelope followers re-solve the recurrence 6x (fixed-point) x 3 chains.
The flat form does log2(65536)=16 full read+write passes per solve.

Candidate `lane128`: view the signal as (rows, 128) — a FREE bitcast for a
1D T(1024)-tiled array (8 sublanes x 128 lanes = exactly one tile) — run
the 7-step Hillis-Steele along the lane axis, recurse on the (rows,) carry
recurrence, then one combine pass: ~8 full passes instead of 16.

This is NOT the measured radix-8 trap (trailing axis of 8 wasting 15/16 of
every (8,128) tile): the trailing axis here is exactly the 128-lane tile.

Run: python scripts/bench_follower_variants.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _ab_prefix(A, B, length):
    s = 1
    pad0 = [(0, 0)] * (A.ndim - 1)
    while s < length:
        Ash = jnp.pad(A, pad0 + [(s, 0)], constant_values=1.0)[..., :length]
        Bsh = jnp.pad(B, pad0 + [(s, 0)])[..., :length]
        A, B = Ash * A, A * Bsh + B
        s *= 2
    return A, B


_LR_BLOCK = 65536


def lr_flat(a, b, y0=0.0):
    """The shipping form (ops/dynamics.linear_recurrence)."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    b = b.at[..., 0].add(a[..., 0] * y0)
    block = _LR_BLOCK
    if n <= block:
        return _ab_prefix(a, b, n)[1]
    m = -(-n // block)
    pad = m * block - n
    if pad:
        a = jnp.concatenate([a, jnp.ones((*lead, pad), a.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((*lead, pad), b.dtype)], axis=-1)
    A2, B2 = _ab_prefix(a.reshape(*lead, m, block), b.reshape(*lead, m, block), block)
    _, Bc = _ab_prefix(A2[..., -1], B2[..., -1], m)
    carry = jnp.concatenate([jnp.zeros_like(Bc[..., :1]), Bc[..., :-1]], axis=-1)
    y = B2 + A2 * carry[..., None]
    return y.reshape(*lead, m * block)[..., :n]


_LANE = 128


def lr_lane(a, b, y0=0.0):
    n = a.shape[-1]
    lead = a.shape[:-1]
    b = b.at[..., 0].add(a[..., 0] * y0)
    return _lr_lane_core(a, b)


def _lr_lane_core(a, b):
    n = a.shape[-1]
    lead = a.shape[:-1]
    if n <= _LANE:
        return _ab_prefix(a, b, n)[1]
    r = -(-n // _LANE)
    pad = r * _LANE - n
    if pad:
        a = jnp.concatenate([a, jnp.ones((*lead, pad), a.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((*lead, pad), b.dtype)], axis=-1)
    A2, B2 = _ab_prefix(a.reshape(*lead, r, _LANE), b.reshape(*lead, r, _LANE), _LANE)
    yr = _lr_lane_core(A2[..., -1], B2[..., -1])
    carry = jnp.concatenate(
        [jnp.zeros_like(yr[..., :1]), yr[..., :-1]], axis=-1)
    y = B2 + A2 * carry[..., None]
    return y.reshape(*lead, r * _LANE)[..., :n]


def follower(lr, d, ca, cr, iters=6):
    c = jnp.full_like(d, (ca + cr) * 0.5)
    y = lr(1.0 - c, c * d)
    init_col = jnp.zeros((*d.shape[:-1], 1), d.dtype)
    for _ in range(iters - 1):
        y_prev = jnp.concatenate([init_col, y[..., :-1]], axis=-1)
        c = jnp.where(d > y_prev, ca, cr)
        y = lr(1.0 - c, c * d)
    return y


def stage_like(lr, x):
    """Mimics stage A's three follower solves: gate (1d), comp (1d),
    de-esser pair (2, n)."""
    e1 = follower(lr, x * x, 0.016, 0.0004)
    y = x * jnp.minimum(1.0, 0.3 / jnp.sqrt(jnp.maximum(e1, 1e-12)))
    e2 = follower(lr, y * y, 0.008, 0.0004)
    z = y * jnp.minimum(1.0, 0.5 / jnp.sqrt(jnp.maximum(e2, 1e-12)))
    pair = jnp.stack([jnp.abs(z), jnp.abs(y)])
    e3 = follower(lr, pair, 0.03, 0.001)
    return z, e3.sum(axis=0)


def main():
    n = 300 * 48000
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32) * 0.1

    fns = {
        "flat64k": jax.jit(lambda v: stage_like(lr_flat, v)),
        "lane128": jax.jit(lambda v: stage_like(lr_lane, v)),
    }
    ref = None
    for name, fn in fns.items():
        t0 = time.perf_counter()
        z, e = fn(jnp.asarray(x))
        z.block_until_ready()
        compile_s = time.perf_counter() - t0
        walls = []
        for i in range(3):
            xv = jnp.asarray(x + np.float32(1e-6 * (i + 1)))
            np.asarray(xv[:4])   # force the lazy upload through the tunnel
            t0 = time.perf_counter()
            r = fn(xv)
            # block_until_ready does not force remote execution on the axon
            # backend; a tiny pull does
            np.asarray(r[0][:4]), np.asarray(r[1][:4])
            walls.append(time.perf_counter() - t0)
        if ref is None:
            ref = (np.asarray(z), np.asarray(e))
            err = 0.0
        else:
            err = max(float(np.max(np.abs(np.asarray(z) - ref[0]))),
                      float(np.max(np.abs(np.asarray(e) - ref[1]))))
        print(f"{name:8s} compile {compile_s:6.1f}s  run {min(walls)*1000:7.1f} ms"
              f"  (all {[f'{w*1000:.0f}' for w in walls]})  max|err| {err:.3e}",
              flush=True)

    # correctness vs a sequential reference on a short signal
    ns = 20000
    xs = rng.standard_normal(ns).astype(np.float32) * 0.1
    d = (xs * xs).astype(np.float64)
    ca, cr = 0.016, 0.0004
    y_seq = np.zeros(ns)
    y = 0.0
    # one follower iteration-0 equivalent isn't sequential semantics; compare
    # the two parallel forms against each other instead on the full follower
    za = np.asarray(jax.jit(lambda v: follower(lr_flat, v, ca, cr))(jnp.asarray(xs * xs)))
    zb = np.asarray(jax.jit(lambda v: follower(lr_lane, v, ca, cr))(jnp.asarray(xs * xs)))
    print(f"short-signal flat-vs-lane max|diff| {np.max(np.abs(za - zb)):.3e} "
          f"(f32 association only)")


if __name__ == "__main__":
    main()

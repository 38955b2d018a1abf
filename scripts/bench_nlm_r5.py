#!/usr/bin/env python
"""Round-5 NLM micro-bench: HBM-traffic cuts inside the block scan.

The shipping grouped-bf16 form (ops/nlm.py, 200.1 ms on the 300 s fixture)
is HBM-bound: per 14-offset group it materialises the f32 `shifted` stack
(read twice: diff^2 + mid), the bf16 `frames` concatenate (2x the diff^2
bytes), and the f32 `dist` matmul output (written + re-read by the weight
fusion).  Candidates, each attacking one of those:

  base  — the shipping grouped bf16 form (ops/nlm._nlm_core)
  split — banded matmul WITHOUT the frames concatenate: band (2w, w) split
          into tril/strict-triu halves, sums = blocks[:-1] @ B1 +
          blocks[1:] @ B2 (two overlapping operand READS of diff^2 instead
          of a doubled concatenate write+read)
  nostk — never materialise `shifted`: diff^2 built bf16 directly from win
          slices, mid re-sliced from win at the weight-apply (win is ~2 MB,
          cache-resident; saves the (G, width) f32 stack write + one read)
  b16d  — dist accumulates f32 in the MXU but stores bf16
          (preferred_element_type=bf16): halves the dist write + re-read
  all   — split + nostk + b16d

Run on the attached TPU: python scripts/bench_nlm_r5.py [--secs 300]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from jivetalking_tpu.ops.nlm import _band_matrix, _nlm_core, _sliding_sum_matmul


@functools.lru_cache(maxsize=8)
def _band_halves(w: int):
    band = _band_matrix(w)
    return band[:w].copy(), band[w:].copy()


def sliding_sum_split(x, w, out_dtype=jnp.float32):
    *lead, n = x.shape
    n_out = n - w + 1
    n_frames = -(-n_out // w)
    pad_to = n_frames * w + w
    if pad_to != n:
        xp = jnp.zeros((*lead, pad_to), x.dtype).at[..., :n].set(x)
    else:
        xp = x
    blocks = xp.reshape(*lead, n_frames + 1, w)
    b1, b2 = _band_halves(w)
    dn = (((blocks.ndim - 1,), (0,)), ((), ()))
    s = jax.lax.dot_general(
        blocks[..., :-1, :], jnp.asarray(b1), dn,
        preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    ) + jax.lax.dot_general(
        blocks[..., 1:, :], jnp.asarray(b2), dn,
        preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )
    return s.reshape(*lead, n_frames * w)[..., :n_out]


def sliding_sum_base(x, w, out_dtype=jnp.float32):
    if out_dtype == jnp.float32:
        return _sliding_sum_matmul(x, w)
    # bf16-out variant of the shipping concatenate form
    *lead, n = x.shape
    n_out = n - w + 1
    n_frames = -(-n_out // w)
    pad_to = n_frames * w + w
    xp = jnp.zeros((*lead, pad_to), x.dtype).at[..., :n].set(x) if pad_to != n else x
    blocks = xp.reshape(*lead, n_frames + 1, w)
    frames = jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)
    band = jnp.asarray(_band_matrix(w))
    sums = jax.lax.dot_general(
        frames, band, (((frames.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )
    return sums.reshape(*lead, n_frames * w)[..., :n_out]


def make_core(split=False, nostk=False, b16d=False):
    sliding = sliding_sum_split if split else sliding_sum_base
    out_dtype = jnp.bfloat16 if b16d else jnp.float32

    def core(x, h2, P, R, block=524288):
        n = int(x.shape[0])
        halo = P + R
        m = -(-n // block)
        total = m * block
        xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo: halo + n].set(x)
        width = block + 2 * P
        w_box = 2 * P + 1
        offs_all = np.arange(-R, R + 1)
        n_groups = max(1, (len(offs_all) + 13) // 14)
        groups = np.array_split(offs_all, n_groups)

        def body(_, i):
            s = i * block
            win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
            centre = win[R: R + width]
            t_global = s + jnp.arange(block)
            num = jnp.zeros(block, jnp.float32)
            den = jnp.zeros(block, jnp.float32)
            for goffs in groups:
                if nostk:
                    diff2 = jnp.stack([
                        ((centre - win[R + d: R + d + width]) ** 2).astype(jnp.bfloat16)
                        for d in goffs])
                    mid = jnp.stack([win[halo + d: halo + d + block] for d in goffs])
                else:
                    shifted = jnp.stack([win[R + d: R + d + width] for d in goffs])
                    diff2 = ((centre[None, :] - shifted) ** 2).astype(jnp.bfloat16)
                    mid = shifted[:, P: P + block]
                dist = sliding(diff2, w_box, out_dtype)
                valid = ((t_global[None, :] + goffs[:, None]) >= 0) & (
                    (t_global[None, :] + goffs[:, None]) < n)
                w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
                num = num + jnp.sum(w * mid, axis=0)
                den = den + jnp.sum(w, axis=0)
            return None, num / jnp.maximum(den, 1e-12)

        _, ys = jax.lax.scan(body, None, jnp.arange(m))
        return ys.reshape(-1)[:n]
    return jax.jit(core, static_argnames=("P", "R", "block"))


def make_core_symgrp(pos_group=17, out_group=14):
    """Symmetric distance field + offset grouping + bf16 stores: the
    positive-offset dist rows are computed once (grouped, halving the
    diff^2 + banded-matmul traffic) and the negative rows are shifted
    READS of them — D(t, -d) = D(t-d, +d) (the identity the opt-in
    JT_NLM_SYMMETRIC path already proves).  The round-3 symmetric
    experiment was a wash UNGROUPED (full-width fields dominated both
    forms); grouping + bf16 changed the traffic mix, so re-measure."""
    def core(x, h2, P, R, block=524288):
        n = int(x.shape[0])
        halo = P + 2 * R
        m = -(-n // block)
        total = m * block
        xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo: halo + n].set(x)
        w_box = 2 * P + 1
        ext = block + 2 * R + 2 * P
        offs_all = np.arange(-R, R + 1)
        n_out_groups = max(1, (len(offs_all) + out_group - 1) // out_group)
        out_groups = np.array_split(offs_all, n_out_groups)

        def body(_, i):
            s = i * block
            win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
            centre = win[R: R + ext]
            pieces = []
            for g0 in range(0, R + 1, pos_group):
                gs = range(g0, min(R + 1, g0 + pos_group))
                shifted = jnp.stack([win[R + d: R + d + ext] for d in gs])
                diff2 = ((centre[None, :] - shifted) ** 2).astype(jnp.bfloat16)
                pieces.append(sliding_sum_base(diff2, w_box, jnp.bfloat16))
            dist_pos = jnp.concatenate(pieces, axis=0)   # (R+1, block+2R) bf16
            t_global = s + jnp.arange(block)
            num = jnp.zeros(block, jnp.float32)
            den = jnp.zeros(block, jnp.float32)
            for goffs in out_groups:
                rows = [dist_pos[d, R: R + block] if d >= 0
                        else dist_pos[-d, R + d: R + d + block]
                        for d in goffs]
                dist = jnp.stack(rows)
                mid = jnp.stack([win[halo + d: halo + d + block] for d in goffs])
                valid = ((t_global[None, :] + goffs[:, None]) >= 0) & (
                    (t_global[None, :] + goffs[:, None]) < n)
                w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
                num = num + jnp.sum(w * mid, axis=0)
                den = den + jnp.sum(w, axis=0)
            return None, num / jnp.maximum(den, 1e-12)

        _, ys = jax.lax.scan(body, None, jnp.arange(m))
        return ys.reshape(-1)[:n]
    return jax.jit(core, static_argnames=("P", "R", "block"))


def make_core_symfuse(pos_group=25):
    """Symmetric + FUSED weight-apply (VERDICT r5 #3): each positive-group
    distance piece is consumed IMMEDIATELY for both its +d and -d offsets
    — the full-width (R+1, block+2R) dist_pos concatenate never
    materialises, saving its write + the cross-piece re-read.  Same bf16
    quantisation points as the shipping symmetric form; accumulation
    order over offsets differs (pairs by |d| instead of ascending d), so
    expect ~1 ulp f32 num/den drift, not bit identity."""
    def core(x, h2, P, R, block=524288):
        n = int(x.shape[0])
        halo = P + 2 * R
        m = -(-n // block)
        total = m * block
        xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo: halo + n].set(x)
        w_box = 2 * P + 1
        ext = block + 2 * R + 2 * P

        def body(_, i):
            s = i * block
            win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
            centre = win[R: R + ext]
            t_global = s + jnp.arange(block)
            num = jnp.zeros(block, jnp.float32)
            den = jnp.zeros(block, jnp.float32)
            for g0 in range(0, R + 1, pos_group):
                gs = list(range(g0, min(R + 1, g0 + pos_group)))
                shifted = jnp.stack([win[R + d: R + d + ext] for d in gs])
                diff2 = ((centre[None, :] - shifted) ** 2).astype(jnp.bfloat16)
                dist_g = sliding_sum_base(diff2, w_box, jnp.bfloat16)
                # both signs of every offset in this piece, d=0 once
                offs = [d for d in gs] + [-d for d in gs if d > 0]
                rows = [dist_g[j, R: R + block] for j, _ in enumerate(gs)] + [
                    dist_g[j, R - d: R - d + block]
                    for j, d in enumerate(gs) if d > 0]
                goffs = np.asarray(offs)
                dist = jnp.stack(rows)
                mid = jnp.stack([win[halo + d: halo + d + block] for d in offs])
                valid = ((t_global[None, :] + goffs[:, None]) >= 0) & (
                    (t_global[None, :] + goffs[:, None]) < n)
                w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
                num = num + jnp.sum(w * mid, axis=0)
                den = den + jnp.sum(w, axis=0)
            return None, num / jnp.maximum(den, 1e-12)

        _, ys = jax.lax.scan(body, None, jnp.arange(m))
        return ys.reshape(-1)[:n]
    return jax.jit(core, static_argnames=("P", "R", "block"))


def main():
    secs = 300
    if "--secs" in sys.argv:
        secs = int(sys.argv[sys.argv.index("--secs") + 1])
    sr = 48000
    n = secs * sr
    P, R = 144, 48
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    h2 = jnp.float32(0.1 * 0.1 / 3.0)

    ships = jax.jit(_nlm_core, static_argnames=("patch_radius", "research_radius", "block"))
    only = sys.argv[sys.argv.index("--only") + 1].split(",") if "--only" in sys.argv else None
    variants = {
        # "base" is now the SHIPPING symmetric-grouped default (ops/nlm.py)
        "base": lambda xv: ships(xv, h2, patch_radius=P, research_radius=R),
        "fuse13": (lambda f: lambda xv: f(xv, h2, P, R))(make_core_symfuse(pos_group=13)),
        "fuse17": (lambda f: lambda xv: f(xv, h2, P, R))(make_core_symfuse(pos_group=17)),
        "fuse25": (lambda f: lambda xv: f(xv, h2, P, R))(make_core_symfuse(pos_group=25)),
        "fuse49": (lambda f: lambda xv: f(xv, h2, P, R))(make_core_symfuse(pos_group=49)),
    }
    if only:
        variants = {k: v for k, v in variants.items() if k in only or k == "base"}

    ref = None
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            y = np.asarray(fn(jnp.asarray(x)))
            compile_s = time.perf_counter() - t0
            walls = []
            for i in range(3):
                xv = jnp.asarray(x + np.float32(1e-6 * (i + 1)))
                xv.block_until_ready()
                t0 = time.perf_counter()
                fn(xv).block_until_ready()
                walls.append(time.perf_counter() - t0)
            if ref is None:
                ref = y
                err = 0.0
            else:
                err = float(np.max(np.abs(y - ref)))
            print(f"{name:7s} compile {compile_s:6.1f}s  run {min(walls)*1000:7.1f} ms  "
                  f"(all {[f'{w*1000:.0f}' for w in walls]})  max|err| vs base {err:.3e}",
                  flush=True)
        except Exception as e:
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

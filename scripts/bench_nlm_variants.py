#!/usr/bin/env python
"""Micro-bench: sliding-box-sum formulations inside the NLM block scan.

The round-4 trace decomposed the NLM while-loop body (~7.1 ms/iter over 28
blocks): banded matmul 0.76 ms, but its two frame reshapes (289-wide
trailing axis, tile-hostile) + layout copy cost ~2.3 ms/iter of pure data
formatting.  Candidates measured here against the shipping form:

  base   — frames of width w=289, band (2w, w)          (ships today)
  tile   — frames of width F=384 (lane multiple), band (2F, F)
  comb   — box_289 = comb_17 o box_17: two 17-term shifted-add fusions in
           the native (97, n) layout; no reshape, no matmul
  conv   — lax.conv_general_dilated with a ones(289) kernel

Run on the attached TPU: python scripts/bench_nlm_variants.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _band_matrix_rect(w: int, f: int) -> np.ndarray:
    """(2f, f) band: output column j sums frame rows [j, j+w)."""
    i = np.arange(2 * f)[:, None]
    j = np.arange(f)[None, :]
    return ((j <= i) & (i < j + w)).astype(np.float32)


def sliding_sum_matmul(x, w, f=None):
    *lead, n = x.shape
    f = f or w
    n_out = n - w + 1
    n_frames = -(-n_out // f)
    pad_to = n_frames * f + f
    if pad_to != n:
        xp = jnp.zeros((*lead, pad_to), x.dtype).at[..., :n].set(x)
    else:
        xp = x
    blocks = xp.reshape(*lead, n_frames + 1, f)
    frames = jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)
    band = jnp.asarray(_band_matrix_rect(w, f))
    sums = jax.lax.dot_general(
        frames, band,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return sums.reshape(*lead, n_frames * f)[..., :n_out]


def sliding_sum_comb(x, w):
    """w = a*b decomposition: box_w = comb_a(stride b) o box_b, two
    shifted-add fusions in the native layout."""
    *lead, n = x.shape
    n_out = n - w + 1
    # factor w = a*b with both near sqrt(w)
    b = int(round(w ** 0.5))
    while w % b:
        b -= 1
    a = w // b
    inner = x[..., : n - b + 1]
    b_sum = functools.reduce(
        lambda acc, k: acc + x[..., k : n - b + 1 + k], range(1, b), inner)
    m = b_sum.shape[-1]
    out = b_sum[..., : n_out]
    out = functools.reduce(
        lambda acc, j: acc + b_sum[..., j * b : j * b + n_out], range(1, a), out)
    return out


def sliding_sum_conv(x, w):
    *lead, n = x.shape
    xr = x.reshape(-1, 1, n)
    k = jnp.ones((1, 1, w), x.dtype)
    y = jax.lax.conv_general_dilated(
        xr, k, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.DEFAULT,
    )
    return y.reshape(*lead, n - w + 1)


def make_nlm(sliding):
    """_nlm_core with the box-sum swapped (mirrors ops/nlm.py structure)."""
    def core(x, h2, P, R, block=524288):
        n = int(x.shape[0])
        halo = P + R
        m = -(-n // block)
        total = m * block
        xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo: halo + n].set(x)
        width = block + 2 * P
        w_box = 2 * P + 1
        offs = np.arange(-R, R + 1)

        def body(_, i):
            s = i * block
            win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
            centre = win[R: R + width]
            shifted = jnp.stack([win[R + d: R + d + width] for d in offs])
            diff2 = (centre[None, :] - shifted) ** 2
            dist = sliding(diff2, w_box)
            t_global = s + jnp.arange(block)
            valid = ((t_global[None, :] + offs[:, None]) >= 0) & (
                (t_global[None, :] + offs[:, None]) < n)
            w = jnp.exp(-dist / h2) * valid
            mid = shifted[:, P: P + block]
            y = jnp.sum(w * mid, axis=0) / jnp.maximum(jnp.sum(w, axis=0), 1e-12)
            return None, y

        _, ys = jax.lax.scan(body, None, jnp.arange(m))
        return ys.reshape(-1)[:n]
    return jax.jit(core, static_argnames=("P", "R", "block"))


def make_nlm_grouped(n_groups: int, bf16_diff: bool = False):
    """Offset-GROUPED accumulation: the (97, block) dist/w/mid fields never
    materialise at full offset width — an unrolled loop over offset groups
    keeps (G, block) intermediates and accumulates (num, den) running sums,
    targeting the block scan's HBM traffic (the round-4 trace put ~65% of
    the 7.1 ms/iter body in field materialisation + layout).  `bf16_diff`
    additionally stores diff^2 in bf16 — free precision-wise: the banded
    matmul already truncates operands to bf16 (DEFAULT), and dist feeds
    only the similarity weights (the pinned bf16-distance tolerance)."""
    def core(x, h2, P, R, block=524288):
        n = int(x.shape[0])
        halo = P + R
        m = -(-n // block)
        total = m * block
        xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo: halo + n].set(x)
        width = block + 2 * P
        w_box = 2 * P + 1
        offs_all = np.arange(-R, R + 1)
        groups = np.array_split(offs_all, n_groups)

        def body(_, i):
            s = i * block
            win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
            centre = win[R: R + width]
            t_global = s + jnp.arange(block)
            num = jnp.zeros(block, jnp.float32)
            den = jnp.zeros(block, jnp.float32)
            for offs in groups:
                shifted = jnp.stack([win[R + d: R + d + width] for d in offs])
                diff2 = (centre[None, :] - shifted) ** 2
                if bf16_diff:
                    diff2 = diff2.astype(jnp.bfloat16)
                dist = sliding_sum_matmul(diff2, w_box)
                valid = ((t_global[None, :] + offs[:, None]) >= 0) & (
                    (t_global[None, :] + offs[:, None]) < n)
                w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
                mid = shifted[:, P: P + block]
                num = num + jnp.sum(w * mid, axis=0)
                den = den + jnp.sum(w, axis=0)
            return None, num / jnp.maximum(den, 1e-12)

        _, ys = jax.lax.scan(body, None, jnp.arange(m))
        return ys.reshape(-1)[:n]
    return jax.jit(core, static_argnames=("P", "R", "block"))


def main():
    sr = 48000
    n = 300 * sr  # 14.4 M, the 300 s fixture
    P, R = 144, 48
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32) * 0.1
    h2 = jnp.float32(0.1 * 0.1 / 3.0)

    variants = {
        "base": make_nlm(lambda d, w: sliding_sum_matmul(d, w)),
        "grp7": make_nlm_grouped(7),
        "grp13": make_nlm_grouped(13),
        "grp7b": make_nlm_grouped(7, bf16_diff=True),
        "bf16d": make_nlm_grouped(1, bf16_diff=True),
    }
    ref = None
    for name, fn in variants.items():
        try:
            t0 = time.perf_counter()
            y = np.asarray(fn(jnp.asarray(x), h2, P, R))
            compile_s = time.perf_counter() - t0
            walls = []
            for i in range(3):
                xv = jnp.asarray(x + np.float32(1e-6 * (i + 1)))
                xv.block_until_ready()
                t0 = time.perf_counter()
                fn(xv, h2, P, R).block_until_ready()
                walls.append(time.perf_counter() - t0)
            if ref is None:
                ref = y
                err = 0.0
            else:
                err = float(np.max(np.abs(y - ref)))
            print(f"{name:8s} compile {compile_s:6.1f}s  "
                  f"run {min(walls)*1000:7.1f} ms  (all {[f'{w*1000:.0f}' for w in walls]})  "
                  f"max|err| vs base {err:.3e}", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()

"""astats-equivalent time-domain statistics as batched JAX reductions.

TPU-native replacement for FFmpeg's `astats=metadata=1:measure_perchannel=all`
(ref spec: internal/processor/filters.go:624; extracted keys
internal/processor/analyser_metrics.go:450-475).  Formula provenance:
/root/reference/docs/Spectral-Metrics-Reference.md "astats" table.

Sliding-window stats (RMS peak/trough, noise floor) use the 50 ms default
window.  They are computed with two-level block tricks (local cumsum /
van Herk prefix-suffix max) so everything stays O(n) vector work — no
sequential state, float32-safe (no global cumsum).
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.prefix import lane_cummax, lane_cumsum

# Lane-major two-level prefixes instead of flat lax.cummax/jnp.cumsum for
# the windowed stats: the flat forms lower to ~log2(2400) full-array
# select_reduce passes (58.1 ms of stage A on a 300 s master, trace
# /tmp/jt_trace_r5_head2); the lane-major forms do 7 in-lane passes plus a
# 128x-smaller carry recursion.  JT_ASTATS_LANE_PREFIX=0 reverts.
_LANE_PREFIX = os.environ.get("JT_ASTATS_LANE_PREFIX", "1") != "0"

WINDOW_SECS = 0.05  # astats `length` default
_ENTROPY_BINS = 8192
_ENT_HI = 128
_ENT_LO = _ENTROPY_BINS // _ENT_HI  # 64


def histogram_8192(idx: jnp.ndarray) -> jnp.ndarray:
    """8192-bin histogram of int32 bin indices in [0, 8192] (index == 8192
    counts nowhere — the chunked paths use it as a padding sentinel).

    Scatter-free AND sort-free: factor idx = hi*64 + lo and contract two
    one-hot int8 operands on the MXU — counts[h, l] = sum_t 1[hi_t = h] *
    1[lo_t = l].  The previous full-signal `lax.sort` + searchsorted was
    ~90 ms of stage-A device time on a 300 s file (profiled 2026-08-17);
    the one-hot contraction is ~n*(128+64) bytes of int8 operand traffic
    plus a trivial integer matmul, and the counts are exact in int32."""
    hi = (idx >> 6).astype(jnp.int32)
    lo = (idx & 63).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(_ENT_HI, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    oh_lo = (lo[:, None] == jnp.arange(_ENT_LO, dtype=jnp.int32)[None, :]).astype(jnp.int8)
    counts = jax.lax.dot_general(
        oh_hi, oh_lo, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return counts.reshape(-1)


@dataclass
class AstatsResult:
    rms_level: float          # dBFS
    peak_level: float         # dBFS
    rms_trough: float         # dBFS
    rms_peak: float           # dBFS
    crest_factor: float       # linear ratio (reference converts to dB downstream)
    dynamic_range: float      # dB
    noise_floor: float        # dBFS
    noise_floor_count: float
    flat_factor: float
    peak_count: float
    dc_offset: float
    min_level: float          # linear signed
    max_level: float          # linear signed
    min_difference: float
    max_difference: float
    mean_difference: float
    rms_difference: float
    zero_crossings: float
    zero_crossings_rate: float
    entropy: float
    bit_depth: float
    number_of_samples: float


def _db(linear: float, floor: float = -150.0) -> float:
    return 20.0 * math.log10(linear) if linear > 0 else floor


def _sliding_sumsq(x2: jnp.ndarray, w: int) -> jnp.ndarray:
    """Sum of x2 over every length-w window (valid positions), computed with
    per-2w-frame local cumsums so float32 precision never sees a global sum."""
    n = x2.shape[0]
    n_out = n - w + 1
    n_frames = -(-n_out // w)
    pad_to = n_frames * w + w
    xp = jnp.zeros(pad_to, x2.dtype).at[:n].set(x2)
    # gather-free: (n_frames+1, w) contiguous blocks; window i = blocks i,i+1
    blocks = xp.reshape(n_frames + 1, w)
    frames = jnp.concatenate([blocks[:-1], blocks[1:]], axis=1)  # (n_frames, 2w)
    csum = lane_cumsum(frames) if _LANE_PREFIX else jnp.cumsum(frames, axis=1)
    zero = jnp.zeros((n_frames, 1), csum.dtype)
    csum = jnp.concatenate([zero, csum], axis=1)  # (n_frames, 2w+1)
    # window starting at local offset j (0..w-1): sum = csum[j+w] - csum[j]
    sums = csum[:, w : 2 * w] - csum[:, 0:w]  # (n_frames, w)
    return sums.reshape(-1)[:n_out]


def _sliding_max(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """van Herk / Gil-Werman sliding max over length-w windows (valid)."""
    n = x.shape[0]
    n_out = n - w + 1
    n_blocks = -(-n // w)
    pad_to = n_blocks * w
    neg = jnp.finfo(x.dtype).min
    xp = jnp.full(pad_to + w, neg, x.dtype).at[:n].set(x)
    blocks = xp[: n_blocks * w].reshape(n_blocks, w)
    _cummax = lane_cummax if _LANE_PREFIX else (
        lambda b: jax.lax.cummax(b, axis=b.ndim - 1))
    suffix = _cummax(blocks[:, ::-1])[:, ::-1]  # suffix max within block
    nxt = xp[w:][: n_blocks * w].reshape(n_blocks, w)
    prefix = _cummax(nxt)  # prefix max of following samples
    # window at block-local offset j covers suffix[j:] (w-j samples) plus the
    # FIRST j samples of the next block — prefix shifted right by one (j=0
    # needs none).  Unshifted prefix[j] would add an extra (w+1)th sample
    # (off-by-one caught by the stride-tricks oracle, 2026-08-20).
    pref = jnp.concatenate(
        [jnp.full((n_blocks, 1), neg, x.dtype), prefix[:, :-1]], axis=1)
    out = jnp.maximum(suffix, pref).reshape(-1)
    return out[:n_out]


@functools.partial(jax.jit, static_argnames=("w",))
def _astats_core(x: jnp.ndarray, w: int):
    x = x.astype(jnp.float32)
    n = x.shape[0]
    nf = jnp.asarray(n, jnp.float32)

    abs_x = jnp.abs(x)
    x2 = x * x
    sum_sq = jnp.sum(x2)
    rms_lin = jnp.sqrt(sum_sq / nf)
    min_level = jnp.min(x)
    max_level = jnp.max(x)
    peak_lin = jnp.maximum(-min_level, max_level)
    dc = jnp.sum(x) / nf

    # differences
    d = jnp.abs(x[1:] - x[:-1])
    max_diff = jnp.max(d) if n > 1 else jnp.zeros(())
    min_diff = jnp.min(d) if n > 1 else jnp.zeros(())
    mean_diff = jnp.mean(d) if n > 1 else jnp.zeros(())
    rms_diff = jnp.sqrt(jnp.mean(d * d)) if n > 1 else jnp.zeros(())

    # zero crossings (sign change between consecutive samples; FFmpeg counts
    # transitions across 0 with >=0 / <0 classes)
    neg = x < 0
    zc = jnp.sum(neg[1:] != neg[:-1]).astype(jnp.float32) if n > 1 else jnp.zeros(())

    # min non-zero |x| for dynamic range
    big = jnp.where(abs_x > 0, abs_x, jnp.inf)
    min_nonzero = jnp.min(big)

    # runs at min/max level (flat factor + peak count)
    at_min = x == min_level
    at_max = x == max_level
    min_count = jnp.sum(at_min).astype(jnp.float32)
    max_count = jnp.sum(at_max).astype(jnp.float32)
    min_runs = jnp.sum(at_min[1:] & ~at_min[:-1]) + at_min[0]
    max_runs = jnp.sum(at_max[1:] & ~at_max[:-1]) + at_max[0]

    # entropy over an 8192-bin sample-value histogram, log2-normalised
    # (scatter-free AND sort-free: one-hot int8 MXU contraction)
    bins = _ENTROPY_BINS
    idx = jnp.clip(((x + 1.0) * (bins / 2.0)).astype(jnp.int32), 0, bins - 1)
    p = histogram_8192(idx).astype(jnp.float32) / nf
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)) / math.log2(bins)

    # windowed stats
    if n >= w:
        win_sumsq = _sliding_sumsq(x2, w)
        rms_peak = jnp.sqrt(jnp.max(win_sumsq) / w)
        rms_trough = jnp.sqrt(jnp.maximum(jnp.min(win_sumsq), 0.0) / w)
        win_peak = _sliding_max(abs_x, w)
        noise_floor_lin = jnp.min(win_peak)
    else:
        rms_peak = rms_lin
        rms_trough = rms_lin
        noise_floor_lin = peak_lin

    # effective bit depth: OR the 32-bit fixed-point patterns, count the span
    # of set bits (approximation of af_astats' integer-domain estimate)
    q = jnp.clip(jnp.abs(x) * (2.0**31), 0, 2.0**31 - 1).astype(jnp.uint32)
    mask = jax.lax.reduce(q, jnp.uint32(0), jax.lax.bitwise_or, (0,))

    return dict(
        rms_lin=rms_lin, peak_lin=peak_lin, min_level=min_level,
        max_level=max_level, dc=dc, max_diff=max_diff, min_diff=min_diff,
        mean_diff=mean_diff, rms_diff=rms_diff, zc=zc,
        min_nonzero=min_nonzero, min_count=min_count, max_count=max_count,
        min_runs=min_runs, max_runs=max_runs, entropy=ent,
        rms_peak=rms_peak, rms_trough=rms_trough,
        noise_floor_lin=noise_floor_lin, bit_mask=mask,
    )


def assemble_astats(r: dict, n: int, w: int) -> AstatsResult:
    """Host-side assembly of an AstatsResult from the `_astats_core` output
    dict (shared by the per-op path and the fused whole-pass program)."""
    peak = float(r["peak_lin"])
    rms = float(r["rms_lin"])
    crest = peak / rms if rms > 0 else 1.0
    min_nonzero = float(r["min_nonzero"])
    if math.isfinite(min_nonzero) and min_nonzero > 0 and peak > 0:
        dyn_range = 20.0 * math.log10(2.0 * peak / min_nonzero)
    else:
        dyn_range = 0.0
    runs = float(r["min_runs"] + r["max_runs"])
    counts = float(r["min_count"] + r["max_count"])
    flat = 20.0 * math.log10(counts / runs) if runs > 0 and counts > 0 else 0.0

    mask = int(r["bit_mask"])
    if mask:
        high = mask.bit_length()
        low = (mask & -mask).bit_length()
        bit_depth = float(min(32, high - low + 1))
    else:
        bit_depth = 0.0

    return AstatsResult(
        rms_level=_db(rms),
        peak_level=_db(peak),
        rms_trough=_db(float(r["rms_trough"])),
        rms_peak=_db(float(r["rms_peak"])),
        crest_factor=crest,
        dynamic_range=dyn_range,
        noise_floor=_db(float(r["noise_floor_lin"])),
        noise_floor_count=float(n if n < w else n - w + 1),
        flat_factor=flat,
        peak_count=counts,
        dc_offset=float(r["dc"]),
        min_level=float(r["min_level"]),
        max_level=float(r["max_level"]),
        min_difference=float(r["min_diff"]),
        max_difference=float(r["max_diff"]),
        mean_difference=float(r["mean_diff"]),
        rms_difference=float(r["rms_diff"]),
        zero_crossings=float(r["zc"]),
        zero_crossings_rate=float(r["zc"]) / max(1, n - 1),
        entropy=float(r["entropy"]),
        bit_depth=bit_depth,
        number_of_samples=float(n),
    )


def measure_astats(x, sample_rate: int) -> AstatsResult:
    x = jnp.asarray(x)
    n = int(x.shape[0])
    w = max(2, int(round(WINDOW_SECS * sample_rate)))
    r = {k: np.asarray(v) for k, v in _astats_core(x, w).items()}
    return assemble_astats(r, n, w)

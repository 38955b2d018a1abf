"""Envelope-follower dynamics: speech gate (soft expander) + levelling
compressor.

TPU-native replacement for FFmpeg's `agate` / `acompressor` (ref specs:
internal/processor/filters.go:869-916; both are CALF-derived log-domain
processors with a shared detector).  Parameter semantics follow FFmpeg:

  * attack/release coefficient = min(1, 4000 / (ms * sample_rate))
  * detector: one-pole smoothing of |x| (peak) or x^2 (rms) with the attack
    coefficient while rising, release while falling
  * gain law in log domain with Hermite soft knee of width `knee` (linear
    factor, knee_start/stop = threshold -/+ log(knee)/2)

TPU-first formulation: the detector recurrence
    y[t] = y[t-1] + (d[t] - y[t-1]) * c[t],   c[t] = ca if d[t] > y[t-1] else cr
is data-dependent, which defeats a plain linear scan.  We solve it as a
fixed-point of LINEAR time-varying recurrences: freeze the attack/release
decision c[t] from the previous iterate, solve y exactly with a parallel
`jax.lax.associative_scan` (first-order linear recurrence is associative),
re-derive c, repeat.  The decision only flips within one hop of rise/fall
boundaries, so 2-3 iterations converge; every pass is O(n log n) fully
parallel vector work — no sequential sample loop anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def envelope_coeff(ms: float, sample_rate: float) -> float:
    """FFmpeg's attack/release coefficient convention
    (af_sidechaincompress/af_agate: min(1, 1/(ms * sr / 4000)))."""
    if ms <= 0:
        return 1.0
    return min(1.0, 4000.0 / (ms * sample_rate))


_LR_LANE = 128


def _ab_prefix(A: jnp.ndarray, B: jnp.ndarray, length: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive Hillis-Steele prefix of the first-order-recurrence monoid
    (A1,B1)∘(A2,B2) = (A1·A2, A2·B1+B2) along the last axis.

    Used over SHORT last axes only (the 128-lane rows and the carry
    recursions of `linear_recurrence`).  A radix-R recursion with a SMALL
    trailing axis is a TPU layout trap: a last axis of R=8 wastes 15/16 of
    every (8, 128) memory tile — measured 2026-08-17 it made the four
    stage-A followers 1.14 s of device time.  The lane-major form below is
    safe because its trailing axis is exactly the 128-lane tile."""
    s = 1
    pad0 = [(0, 0)] * (A.ndim - 1)
    while s < length:
        Ash = jnp.pad(A, pad0 + [(s, 0)], constant_values=1.0)[..., :length]
        Bsh = jnp.pad(B, pad0 + [(s, 0)])[..., :length]
        A, B = Ash * A, A * Bsh + B
        s *= 2
    return A, B


def linear_recurrence(a: jnp.ndarray, b: jnp.ndarray, y0: float | jnp.ndarray = 0.0) -> jnp.ndarray:
    """Solve y[t] = a[t] * y[t-1] + b[t] with y[-1] = y0 along the LAST axis
    (leading axes batch): lane-major two-level parallel prefix —
    Hillis-Steele along 128-sample rows, recursing on the row carries.

    Formulation chosen for the TPU AOT compiler as much as the TPU itself:
    a flat `associative_scan` over the full signal unrolls ~2*log2(n)
    full-array HLO stages PER CALL and the compile helper gets OOM-killed
    on programs with several of them (measured 2026-08-16).  No `lax.scan`
    over blocks either: each while-loop iteration costs ~1 ms of dispatch
    overhead (a 220-block scan burnt ~270 ms per follower, 2026-08-16).

    Lane-major (round 4): viewing the flat signal as (rows, 128) is a
    FREE relayout (eight 128-lane rows = exactly one T(1024) tile), the
    in-row prefix is log2(128)=7 full passes instead of the flat form's
    log2(65536)=16, and the (rows,) carry recurrence recurses on arrays
    128x smaller.  Measured on the 300 s follower workload
    (scripts/bench_follower_variants.py): 205.5 ms -> 133.4 ms (1.54x);
    outputs differ from the flat form only by f32 association (~2e-7)."""
    n = a.shape[-1]
    lead = a.shape[:-1]
    b = b.at[..., 0].add(a[..., 0] * y0)
    return _lr_lane(a, b)


def _lr_lane(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    n = a.shape[-1]
    lead = a.shape[:-1]
    if n <= _LR_LANE:
        return _ab_prefix(a, b, n)[1]
    m = -(-n // _LR_LANE)
    pad = m * _LR_LANE - n
    if pad:
        a = jnp.concatenate([a, jnp.ones((*lead, pad), a.dtype)], axis=-1)
        b = jnp.concatenate([b, jnp.zeros((*lead, pad), b.dtype)], axis=-1)
    A2, B2 = _ab_prefix(a.reshape(*lead, m, _LR_LANE),
                        b.reshape(*lead, m, _LR_LANE), _LR_LANE)
    # carries: y at each row's end obeys the same recurrence over rows —
    # recurse on the 128x-smaller carry arrays
    yc = _lr_lane(A2[..., -1], B2[..., -1])
    carry = jnp.concatenate([jnp.zeros_like(yc[..., :1]), yc[..., :-1]], axis=-1)
    y = B2 + A2 * carry[..., None]
    return y.reshape(*lead, m * _LR_LANE)[..., :n]


@functools.partial(jax.jit, static_argnames=("iters",))
def attack_release_follower(
    d: jnp.ndarray, ca: float, cr: float, iters: int = 6, init: float | jnp.ndarray = 0.0
) -> jnp.ndarray:
    """Attack/release one-pole follower of detector signal `d` (>= 0).

    Fixed-point of linear scans: freeze the per-sample attack-vs-release
    decision from the previous iterate, solve the now-linear recurrence in
    parallel, repeat.  The decision set stabilises EXACTLY within ~6
    iterations even on per-sample-flipping noise input (measured: max
    relative error 0.0 at iter 6 vs the sequential recurrence), so the
    default matches the sequential semantics, not an approximation."""
    d = d.astype(jnp.float32)
    ca = jnp.float32(ca)
    cr = jnp.float32(cr)

    # init may be a scalar or a per-row array (carried chunk state)
    init_arr = jnp.broadcast_to(jnp.asarray(init, d.dtype), d.shape[:-1])
    init_col = init_arr[..., None]

    # iteration 0: midpoint coefficient (converges slightly faster than
    # release-only or attack-only initialisation)
    c = jnp.full_like(d, (ca + cr) * 0.5)
    y = linear_recurrence(1.0 - c, c * d, init_arr)
    for _ in range(max(0, iters - 1)):
        y_prev = jnp.concatenate([init_col, y[..., :-1]], axis=-1)
        c = jnp.where(d > y_prev, ca, cr)
        y = linear_recurrence(1.0 - c, c * d, init_arr)
    return y


def _hermite(x, x0, x1, p0, p1, m0, m1):
    """Cubic Hermite interpolation matching values p and derivatives m at the
    knee endpoints (FFmpeg hermite_interpolation)."""
    width = x1 - x0
    t = (x - x0) / width
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00 * p0 + h10 * width * m0 + h01 * p1 + h11 * width * m1


_LOG_EPS = 1e-12


def compressor_gain(
    lin_slope: jnp.ndarray,
    threshold_lin,
    ratio,
    knee,
    detection_rms: bool = True,
) -> jnp.ndarray:
    """Downward-compression gain from the detector state (CALF law:
    out(slope) = slope below the knee, thres + (slope-thres)/ratio above,
    Hermite blend inside; gain = exp(out - slope)).  threshold/ratio/knee
    may be python floats or traced jnp scalars (per-file params inside one
    compiled program)."""
    slope = jnp.log(jnp.maximum(lin_slope, _LOG_EPS))
    if detection_rms:
        slope = slope * 0.5
    thres = jnp.log(jnp.maximum(threshold_lin, _LOG_EPS))
    half_knee = 0.5 * jnp.log(jnp.maximum(knee, 1.0 + 1e-9))
    knee_start = thres - half_knee
    knee_stop = thres + half_knee

    line = thres + (slope - thres) / ratio
    soft = _hermite(slope, knee_start, knee_stop, knee_start,
                    thres + half_knee / ratio, 1.0, 1.0 / ratio)
    out = jnp.where(slope <= knee_start, slope,
                    jnp.where(slope >= knee_stop, line, soft))
    return jnp.exp(out - slope)


def gate_gain(
    lin_slope: jnp.ndarray,
    threshold_lin,
    ratio,
    knee,
    range_lin,
    detection_rms: bool = True,
) -> jnp.ndarray:
    """Downward-expansion (gate) gain (CALF law: out(slope) = slope above the
    knee, thres + (slope-thres)*ratio below, Hermite blend inside; gain
    floored at `range_lin`).  Params may be traced scalars."""
    slope = jnp.log(jnp.maximum(lin_slope, _LOG_EPS))
    if detection_rms:
        slope = slope * 0.5
    thres = jnp.log(jnp.maximum(threshold_lin, _LOG_EPS))
    half_knee = 0.5 * jnp.log(jnp.maximum(knee, 1.0 + 1e-9))
    knee_start = thres - half_knee
    knee_stop = thres + half_knee

    line = thres + (slope - thres) * ratio
    soft = _hermite(slope, knee_start, knee_stop,
                    thres - half_knee * ratio, knee_stop, ratio, 1.0)
    out = jnp.where(slope >= knee_stop, slope,
                    jnp.where(slope <= knee_start, line, soft))
    gain = jnp.exp(out - slope)
    return jnp.maximum(gain, range_lin)


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "threshold", "ratio", "attack_ms",
                     "release_ms", "range_lin", "knee", "makeup", "detection_rms"),
)
def apply_gate(
    x: jnp.ndarray,
    sample_rate: int,
    threshold: float,
    ratio: float = 2.0,
    attack_ms: float = 5.0,
    release_ms: float = 200.0,
    range_lin: float = 0.19952623,
    knee: float = 3.0,
    makeup: float = 1.0,
    detection_rms: bool = True,
) -> jnp.ndarray:
    """Speech gate / soft expander (ref spec: filters.go:869-894
    `agate=threshold=..:ratio=..:attack=5:release=200:range=..:knee=3:
    detection=rms:makeup=1`).  `threshold` and `range_lin` are linear
    amplitudes as in the FFmpeg option."""
    x = x.astype(jnp.float32)
    d = x * x if detection_rms else jnp.abs(x)
    ca = envelope_coeff(attack_ms, sample_rate)
    cr = envelope_coeff(release_ms, sample_rate)
    env = attack_release_follower(d, ca, cr)
    gain = gate_gain(env, threshold, ratio, knee, range_lin, detection_rms)
    return x * gain * makeup


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "threshold_db", "ratio", "attack_ms",
                     "release_ms", "knee", "makeup", "mix", "detection_rms"),
)
def apply_compressor(
    x: jnp.ndarray,
    sample_rate: int,
    threshold_db: float,
    ratio: float = 3.0,
    attack_ms: float = 10.0,
    release_ms: float = 200.0,
    knee: float = 4.0,
    makeup: float = 1.0,
    mix: float = 1.0,
    detection_rms: bool = True,
) -> jnp.ndarray:
    """Levelling compressor (ref spec: filters.go:900-916
    `acompressor=threshold=..:ratio=3:attack=10:release=200:makeup=1:knee=4:
    detection=rms:mix=1`)."""
    x = x.astype(jnp.float32)
    threshold_lin = 10.0 ** (threshold_db / 20.0)
    d = x * x if detection_rms else jnp.abs(x)
    ca = envelope_coeff(attack_ms, sample_rate)
    cr = envelope_coeff(release_ms, sample_rate)
    env = attack_release_follower(d, ca, cr)
    gain = compressor_gain(env, threshold_lin, ratio, knee, detection_rms)
    y = x * gain * makeup
    if mix < 1.0:
        y = y * mix + x * (1.0 - mix)
    return y

"""Lane-major parallel prefixes (cummax / cummin / cumsum) along the last axis.

XLA lowers `lax.cummax`/`jnp.cumsum` over a long axis into ~log2(L)
full-array select_reduce passes — the astats van Herk sliding-max's two
cummax calls over (blocks, 2400) rows alone were 58.1 ms of the 300 s
master's stage A (trace /tmp/jt_trace_r5_head2, 2026-08-20).  The
lane-major two-level form below does log2(128)=7 in-lane passes on a
(..., m, 128) view — a free bitcast of the T(1024) tiling — and recurses
on row carries 128x smaller, the same formulation measured 1.54x faster
for the follower recurrences (see dynamics.linear_recurrence and
limiter._maxplus_prefix; BENCH_NOTES 2026-08-19).

These helpers are generic over leading batch axes and are used by the
astats windowed stats (metering/astats.py).  The monoid-specific prefixes
(max-plus in ops/limiter, affine in ops/dynamics) keep their own tuned
implementations.

Reference behaviour being served: FFmpeg astats 50 ms windowed RMS
peak/trough + noise floor (ref: internal/processor/filters.go:624,
analyser_metrics.go:450-475).
"""

from __future__ import annotations

import jax.numpy as jnp

_LANE = 128


def _hs(P: jnp.ndarray, length: int, op, identity) -> jnp.ndarray:
    """Inclusive Hillis-Steele prefix along the last axis (length small:
    a 128-lane row or a carry axis)."""
    s = 1
    pad0 = [(0, 0)] * (P.ndim - 1)
    while s < length:
        Psh = jnp.pad(P, pad0 + [(s, 0)], constant_values=identity)[..., :length]
        P = op(P, Psh)
        s *= 2
    return P


def _lane_prefix(x: jnp.ndarray, op, identity) -> jnp.ndarray:
    n = x.shape[-1]
    lead = x.shape[:-1]
    if n <= _LANE:
        return _hs(x, n, op, identity)
    m = -(-n // _LANE)
    pad = m * _LANE - n
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((*lead, pad), identity, x.dtype)], axis=-1)
    P = _hs(x.reshape(*lead, m, _LANE), _LANE, op, identity)
    # carries: the prefix at each row's end, combined across rows (128x
    # smaller array — recurse)
    Cl = _lane_prefix(P[..., -1], op, identity)
    carry = jnp.concatenate(
        [jnp.full((*lead, 1), identity, x.dtype), Cl[..., :-1]], axis=-1)
    out = op(P, carry[..., None])
    return out.reshape(*lead, m * _LANE)[..., :n]


def lane_cummax(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max along the last axis (leading axes batch)."""
    ident = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min
    return _lane_prefix(x, jnp.maximum, ident)


def lane_cummin(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running min along the last axis (leading axes batch)."""
    ident = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).max
    return _lane_prefix(x, jnp.minimum, ident)


def lane_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running sum along the last axis (leading axes batch).

    Association differs from `jnp.cumsum` (pairwise vs sequential) so f32
    results can differ by ~1 ulp per combine; callers that need the local-
    precision property (sums bounded by one row) keep it — every partial
    lives inside one lane row or the carry chain of row totals."""
    return _lane_prefix(x, jnp.add, 0)

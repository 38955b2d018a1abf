"""Lookahead limiter (alimiter equivalent).

TPU-native replacement for FFmpeg's `alimiter` (ref specs:
internal/processor/normalise.go:446-480 — levelling limiter
`limit=..:attack=5:release=100:...:latency=1` and the final brickwall
`attack=1:release=50`).

TPU-first formulation (no sequential sample loop):

1. needed[t] = min(1, limit / |x[t]|)
2. target[t] = min over the lookahead window [t, t+A) of needed  — a van
   Herk / Gil-Werman sliding-window minimum (two cummin passes), so the gain
   is already down when the peak arrives (the lookahead "attack").
3. release: u[t] = max(1 - target[t], lambda * u[t-1]) is the classic
   instant-down / exponential-up recovery.  In log domain this is
   w[t] = max(wv[t], c + w[t-1]) = t*c + cummax(wv[s] - s*c) — an exact
   parallel prefix (jnp.maximum.accumulate), no scan.
4. g = 1 - u;  since u >= 1 - target, g <= target <= limit/|x|, the output
   NEVER exceeds the limit in the sample domain (hard guarantee, no final
   clip needed).

The asc (auto-slow-control) refinement of FFmpeg's release is not
modelled; it affects release shape between peaks, not the peak ceiling, so
the metering contract (output TP <= ceiling) is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-9
_LOG_FLOOR = -80.0  # log(1-target) floor; exp(-80) ~ 1.8e-35, i.e. "no limiting"


def _sliding_min_lookahead(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """min over [t, t+w) with edge padding (+inf -> no constraint), van Herk
    two-pass cummin formulation."""
    n = x.shape[0]
    n_blocks = -(-n // w)
    pad_to = n_blocks * w
    big = jnp.finfo(x.dtype).max
    xp = jnp.full(pad_to + w, big, x.dtype).at[:n].set(x)
    blocks = xp[: n_blocks * w].reshape(n_blocks, w)
    suffix = jax.lax.cummin(blocks[:, ::-1], axis=1)[:, ::-1]
    nxt = xp[w:][: n_blocks * w].reshape(n_blocks, w)
    prefix = jax.lax.cummin(nxt, axis=1)
    # window at block-local offset j covers suffix[j:] (w-j samples) plus the
    # FIRST j samples of the next block — prefix shifted right by one (the
    # unshifted prefix[j] adds a (w+1)th lookahead sample; same off-by-one as
    # astats._sliding_max, caught by the stride-tricks oracle 2026-08-20).
    pref = jnp.concatenate(
        [jnp.full((n_blocks, 1), big, x.dtype), prefix[:, :-1]], axis=1)
    return jnp.minimum(suffix, pref).reshape(-1)[:n]


_MP_LANE = 128


_MP_NEG = -3.0e38


def _mp_prefix(P: jnp.ndarray, c, length: int) -> jnp.ndarray:
    """Inclusive max-plus prefix w[t] = max(P[t], w[t-1] + c) along the last
    axis (Hillis-Steele; step s adds s*c).  Used over SHORT last axes only
    (the 128-lane rows / carry recursions below) — see dynamics._ab_prefix
    for why a SMALL-trailing-axis radix recursion is a TPU layout trap."""
    s = 1
    pad0 = [(0, 0)] * (P.ndim - 1)
    while s < length:
        Psh = jnp.pad(P, pad0 + [(s, 0)], constant_values=_MP_NEG)[..., :length]
        P = jnp.maximum(P, Psh + s * c)
        s *= 2
    return P


def _maxplus_prefix(v: jnp.ndarray, c) -> jnp.ndarray:
    """w[t] = max(v[t], w[t-1] + c) with w[-1] = -inf: lane-major two-level
    max-plus parallel prefix — Hillis-Steele along 128-sample rows (a FREE
    relayout: eight 128-lane rows = one T(1024) tile; log2(128)=7 full
    passes instead of a flat form's 16), recursing on the row carries with
    the per-row step 128*c.  Program size stays O(log n) — a flat
    associative scan over the signal OOM-kills the AOT compile helper —
    and the in-row additive offsets stay tiny (|s*c| <= 64/release).  The
    carry recursion's deepest offsets reach n*c exactly as the old 64k
    carry stage did: max-plus just saturates those to the floor, i.e. the
    older value decays to irrelevance, which is the limiter semantics.
    No `lax.scan` over blocks: TPU while-loop iterations cost ~1 ms each
    in dispatch overhead (profiled 2026-08-16)."""
    v = v.astype(jnp.float32)
    c = jnp.float32(c)
    neg = jnp.float32(_MP_NEG)
    lead = v.shape[:-1]

    n = v.shape[-1]
    if n <= _MP_LANE:
        return _mp_prefix(v, c, n)
    m = -(-n // _MP_LANE)
    pad = m * _MP_LANE - n
    if pad:
        v = jnp.concatenate(
            [v, jnp.full((*lead, pad), neg, v.dtype)], axis=-1)
    P = _mp_prefix(v.reshape(*lead, m, _MP_LANE), c, _MP_LANE)
    # carries: w at row ends obey w_i = max(P_i[-1], w_{i-1} + 128*c)
    Cl = _maxplus_prefix(P[..., -1], _MP_LANE * c)
    carry = jnp.concatenate(
        [jnp.full((*lead, 1), neg), Cl[..., :-1]], axis=-1)
    steps = jnp.arange(1, _MP_LANE + 1, dtype=jnp.float32) * c
    w = jnp.maximum(P, carry[..., None] + steps)
    return w.reshape(*lead, m * _MP_LANE)[..., :n]


def limiter_core(
    x: jnp.ndarray,
    limit,
    lookahead: int,
    release_samples: float,
) -> jnp.ndarray:
    """The traced-limit limiter body: `limit` may be a python float or a
    jnp scalar (per-file ceiling inside one compiled program)."""
    x = x.astype(jnp.float32)
    n = x.shape[0]
    needed = jnp.minimum(1.0, limit / jnp.maximum(jnp.abs(x), _EPS))
    target = _sliding_min_lookahead(needed, lookahead)

    c = -1.0 / release_samples           # log(lambda)
    v = 1.0 - target                     # attenuation depth, in [0, 1)
    wv = jnp.log(jnp.maximum(v, jnp.exp(_LOG_FLOOR)))
    w = _maxplus_prefix(wv, c)           # w[t] = max(wv[t], w[t-1] + c)
    u = jnp.exp(jnp.minimum(w, 0.0))
    gain = 1.0 - u
    gain = jnp.minimum(gain, target)
    return x * gain


@functools.partial(jax.jit, static_argnames=("sample_rate", "limit", "attack_ms", "release_ms"))
def apply_limiter(
    x: jnp.ndarray,
    sample_rate: int,
    limit: float,
    attack_ms: float = 5.0,
    release_ms: float = 50.0,
) -> jnp.ndarray:
    """Lookahead-limit `x` so no sample exceeds `limit` (linear amplitude).

    attack_ms sets the lookahead window; release_ms the exponential gain
    recovery.  Latency-compensated (output aligned with input, as the
    reference's `latency=1`)."""
    x = x.astype(jnp.float32)
    lookahead = max(1, int(round(attack_ms * sample_rate / 1000.0)))
    release_samples = max(1.0, release_ms * sample_rate / 1000.0)
    return limiter_core(x, limit, lookahead, release_samples)

"""Polyphase rational resampler (aresample equivalent).

TPU-native replacement for FFmpeg's `aresample=<rate>` /
`aformat=sample_rates=44100` (ref specs: internal/processor/
normalise.go:1302-1304, filters.go:706-710).

Design: rational L/M resampling with a Kaiser windowed-sinc prototype,
evaluated as a phase-batched gather + matmul: output n uses phase
n*M mod L and input offset floor(n*M/L).  Grouping outputs by phase turns
the whole resample into L independent FIR convolutions (one per phase) over
strided input — each a conv/dot the MXU handles natively, with no
sequential state.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _design_polyphase(L: int, M: int, taps_per_phase: int = 96, beta: float = 10.0):
    """(L, taps_per_phase) polyphase bank of a windowed-sinc low-pass with
    cutoff just below min(pi/L, pi/M) on the upsampled grid, gain L.

    The 147/160 (48k->44.1k) conversion needs a narrow transition band
    (20.4k pass to 22.05k stop), hence the long 96-tap phases; the whole
    bank is one (n_out, taps) gather + dot, so tap count costs bandwidth,
    not latency."""
    n_taps = L * taps_per_phase
    cutoff = 0.92 * min(1.0 / L, 1.0 / M)
    m = np.arange(n_taps, dtype=np.float64) - (n_taps - 1) / 2.0
    h = np.sinc(m * cutoff) * cutoff * L
    h *= np.kaiser(n_taps, beta)
    # polyphase decomposition: phase p holds taps p, p+L, p+2L, ...
    bank = h.reshape(taps_per_phase, L).T  # (L, taps_per_phase)
    return np.ascontiguousarray(bank[:, ::-1]).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("L", "M", "taps", "n_out"))
def _resample_impl(xp: jnp.ndarray, bank: jnp.ndarray, L: int, M: int, taps: int, n_out: int):
    n_idx = jnp.arange(n_out)
    phase = (n_idx * M) % L
    base = (n_idx * M) // L
    # window [base - taps + 1, base] on the padded signal (offset taps-1)
    idx = base[:, None] + jnp.arange(taps)[None, :]
    frames = xp[idx]                       # (n_out, taps)
    coeff = bank[phase]                    # (n_out, taps)
    return jnp.sum(frames * coeff, axis=-1)


def resample(x, src_rate: int, dst_rate: int) -> jnp.ndarray:
    """Resample 1-D `x` from src_rate to dst_rate (e.g. 48000 -> 44100)."""
    if src_rate == dst_rate:
        return jnp.asarray(x)
    g = math.gcd(src_rate, dst_rate)
    L = dst_rate // g
    M = src_rate // g
    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    n_out = int(n * L // M)
    bank = _design_polyphase(L, M)
    taps = bank.shape[1]
    # centre the filter: pad taps//2 on the left for ~zero group delay
    xp = jnp.concatenate(
        [jnp.zeros(taps // 2, x.dtype), x, jnp.zeros(taps, x.dtype)]
    )
    return _resample_impl(xp, jnp.asarray(bank), L, M, taps, n_out)

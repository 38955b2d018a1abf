"""True-peak measurement per ITU-R BS.1770-4 Annex 2 (4x oversampling).

The reference reads `lavfi.r128.true_peak` from FFmpeg's ebur128 filter,
which oversamples via libswresample (ref: internal/processor/filters.go:
626-689, "peak=sample+true").  Here the 4x interpolation is a polyphase
windowed-sinc FIR evaluated as a single matmul over framed samples — an
MXU-shaped formulation rather than a sequential resampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

OVERSAMPLE = 4
_TAPS_PER_PHASE = 12  # 48-tap prototype, 12 per phase (BS.1770 suggests 4x with >= 4-tap phases)


@functools.lru_cache(maxsize=8)
def _polyphase_bank(taps_per_phase: int = _TAPS_PER_PHASE, oversample: int = OVERSAMPLE) -> np.ndarray:
    """(oversample, taps_per_phase) polyphase decomposition of a Kaiser
    windowed-sinc interpolation low-pass with cutoff at the original Nyquist."""
    n_taps = taps_per_phase * oversample
    # centre of the prototype filter
    m = np.arange(n_taps, dtype=np.float64) - (n_taps - 1) / 2.0
    cutoff = 1.0 / oversample  # normalised to the oversampled Nyquist
    h = np.sinc(m * cutoff) * cutoff * oversample  # gain `oversample` preserves amplitude
    h *= np.kaiser(n_taps, 8.0)
    # polyphase: phase p takes taps p, p+L, p+2L, ...
    bank = h.reshape(taps_per_phase, oversample).T  # (L, taps_per_phase)
    return np.ascontiguousarray(bank[:, ::-1])  # reverse for dot-with-window form


@jax.jit
def _true_peak_impl(x: jnp.ndarray, bank: jnp.ndarray) -> jnp.ndarray:
    # Each polyphase branch is a short FIR; 12 shifted per-tap f32 FMAs on
    # the VPU are exact and faster than conv_general_dilated (which pays
    # either bf16 operand truncation or the 6-pass HIGHEST algorithm).
    taps = int(bank.shape[1])
    xp = jnp.pad(x, (taps - 1, taps - 1))
    n_out = xp.shape[0] - taps + 1
    acc = jnp.zeros((int(bank.shape[0]), n_out), jnp.float32)
    for k in range(taps):
        acc = acc + bank[:, k][:, None] * xp[k : k + n_out][None, :]
    return jnp.max(jnp.abs(acc))


def true_peak_linear(x: jnp.ndarray) -> jnp.ndarray:
    """Max absolute value of the 4x-oversampled signal (linear amplitude).

    The sample-peak is a lower bound; oversampled inter-sample peaks can
    exceed it by up to ~0.8 dB on programme material (ref corpus p100 =
    0.817 dB, docs/Normalisation-Tuning.md:18-25)."""
    bank = jnp.asarray(_polyphase_bank(), dtype=jnp.float32)
    sample_peak = jnp.max(jnp.abs(x))
    return jnp.maximum(_true_peak_impl(x.astype(jnp.float32), bank), sample_peak)


def sample_peak_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.abs(x))

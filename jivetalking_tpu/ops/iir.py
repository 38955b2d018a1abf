"""Biquad (second-order-section) design + TPU-native application.

The reference reaches FFmpeg's `highpass`/`lowpass` biquads (transposed
direct-form II, ref spec strings in internal/processor/filters.go:725-789).
Sequential IIR recurrences are hostile to TPUs, so this module provides two
TPU-first formulations:

* `sosfilt_scan`  — exact sample-sequential filter via `jax.lax.scan`
  (reference semantics; used for tests and short regions).
* `sosfilt_fir`   — the production path: the SOS cascade's impulse response is
  truncated at `ir_len` taps (error < -300 dB for the 80 Hz/20.5 kHz filters
  used here) and applied with overlap-save FFT convolution, which XLA maps
  onto large batched rFFTs.  Identical output to the IIR within float
  tolerance, fully parallel over the time axis.

Filter design runs on host (numpy/scipy), mirroring the reference's split of
"parameter derivation on CPU, DSP on the engine".
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _ssig


# ---------------------------------------------------------------------------
# RBJ biquad design (host side)
# ---------------------------------------------------------------------------

def design_highpass(freq: float, sample_rate: float, q: float = 0.7071) -> np.ndarray:
    """RBJ 2-pole high-pass (FFmpeg `highpass=f=..:poles=2:width_type=q`).

    Returns one SOS row [b0, b1, b2, 1, a1, a2].  The corner is clamped
    below Nyquist: FFmpeg rejects f >= sr/2 outright; here a low-rate
    caller (tests, dry-runs) gets a stable near-Nyquist filter instead of
    an unstable recursion whose impulse response overflows f32.
    """
    freq = min(freq, 0.49 * sample_rate)
    w0 = 2.0 * math.pi * freq / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cosw = math.cos(w0)
    b0 = (1.0 + cosw) / 2.0
    b1 = -(1.0 + cosw)
    b2 = (1.0 + cosw) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cosw
    a2 = 1.0 - alpha
    return np.array([[b0 / a0, b1 / a0, b2 / a0, 1.0, a1 / a0, a2 / a0]])


def design_lowpass(freq: float, sample_rate: float, q: float = 0.7071) -> np.ndarray:
    """RBJ 2-pole low-pass (FFmpeg `lowpass=f=..:poles=2:width_type=q`).
    The corner clamps below Nyquist (see design_highpass)."""
    freq = min(freq, 0.49 * sample_rate)
    w0 = 2.0 * math.pi * freq / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cosw = math.cos(w0)
    b0 = (1.0 - cosw) / 2.0
    b1 = 1.0 - cosw
    b2 = (1.0 - cosw) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cosw
    a2 = 1.0 - alpha
    return np.array([[b0 / a0, b1 / a0, b2 / a0, 1.0, a1 / a0, a2 / a0]])


def cascade(*sos_list: np.ndarray) -> np.ndarray:
    return np.concatenate(sos_list, axis=0)


# ---------------------------------------------------------------------------
# Exact sequential application (tests / short regions)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_sections",))
def _sosfilt_scan_impl(sos: jnp.ndarray, x: jnp.ndarray, n_sections: int) -> jnp.ndarray:
    def one_section(x_in, row):
        b0, b1, b2, _, a1, a2 = (row[i] for i in range(6))

        def step(carry, xn):
            z1, z2 = carry
            # transposed direct form II
            yn = b0 * xn + z1
            z1_new = b1 * xn - a1 * yn + z2
            z2_new = b2 * xn - a2 * yn
            return (z1_new, z2_new), yn

        _, y = jax.lax.scan(step, (jnp.zeros(()), jnp.zeros(())), x_in)
        return y

    y = x
    for s in range(n_sections):
        y = one_section(y, sos[s])
    return y


def sosfilt_scan(sos: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Exact TDF-II SOS cascade via lax.scan (zero initial state)."""
    x = jnp.asarray(x)
    sos_j = jnp.asarray(sos, dtype=jnp.float64 if x.dtype == jnp.float64 else jnp.float32)
    return _sosfilt_scan_impl(sos_j, x, sos.shape[0])


# ---------------------------------------------------------------------------
# Truncated-IR FFT application (production path)
# ---------------------------------------------------------------------------

def sos_impulse_response(sos: np.ndarray, n: int) -> np.ndarray:
    """Impulse response of the SOS cascade, computed on host in float64."""
    imp = np.zeros(n, dtype=np.float64)
    imp[0] = 1.0
    scipy_sos = np.asarray(sos, dtype=np.float64)
    return _ssig.sosfilt(scipy_sos, imp)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def chain_ir_len(hp_hz: float, sample_rate: float) -> int:
    """Truncation length for the HP+LP cleanup-chain impulse response.

    The slow pole is the rumble high-pass (Q = 0.707): its envelope decays
    one e-fold every Q*sr/(pi*f0) samples, so 13.8 e-folds (amplitude 1e-6,
    ~-120 dB — below the conv's own f32 round-off) needs
    13.8*0.707*sr/(pi*f0) ≈ 3.105*sr/f0 samples.  At the default 80 Hz /
    48 kHz that is 1863 -> 2048 taps; the previous fixed 8192 made the
    HIGHEST-precision banded conv 3x more expensive than needed (the
    dominant stage-A conv, profiled 2026-08-17).  Clamped to [1024, 8192]
    so halo geometry and program metas stay bounded."""
    need = int(math.ceil(3.105 * sample_rate / max(hp_hz, 1.0)))
    return min(8192, max(1024, _next_pow2(need)))


@functools.partial(jax.jit, static_argnames=("block", "ir_len", "out_len"))
def _overlap_save(x_padded: jnp.ndarray, ir_fft: jnp.ndarray, block: int, ir_len: int, out_len: int) -> jnp.ndarray:
    """Overlap-save convolution.  x_padded: (n_blocks*hop + ir_len - 1,) with
    ir_len-1 leading zeros already prepended; returns first out_len samples."""
    hop = block - (ir_len - 1)
    n_blocks = (x_padded.shape[0] - (ir_len - 1)) // hop
    # gather overlapping frames: frame i covers [i*hop, i*hop + block)
    idx = jnp.arange(n_blocks)[:, None] * hop + jnp.arange(block)[None, :]
    frames = x_padded[idx]
    spec = jnp.fft.rfft(frames, axis=-1) * ir_fft[None, :]
    conv = jnp.fft.irfft(spec, n=block, axis=-1)
    valid = conv[:, ir_len - 1 :]
    return valid.reshape(-1)[:out_len]


def fir_convolve_long(x: jnp.ndarray, ir: np.ndarray, block: int | None = None) -> jnp.ndarray:
    """Causal FIR filtering of a long 1-D signal via overlap-save rFFT.

    Output length == input length (same as streaming the IIR).
    """
    x = jnp.asarray(x)
    ir = np.asarray(ir, dtype=np.float32)
    ir_len = int(ir.shape[0])
    n = int(x.shape[0])
    if block is None:
        block = max(8192, _next_pow2(4 * ir_len))
    block = max(block, _next_pow2(ir_len + 1))
    hop = block - (ir_len - 1)
    n_blocks = -(-n // hop)
    pad_total = (ir_len - 1) + n_blocks * hop
    x_padded = jnp.concatenate(
        [
            jnp.zeros(ir_len - 1, dtype=x.dtype),
            x,
            jnp.zeros(pad_total - (ir_len - 1) - n, dtype=x.dtype),
        ]
    )
    ir_fft = jnp.fft.rfft(jnp.asarray(ir), n=block)
    return _overlap_save(x_padded, ir_fft, block, ir_len, n)


def sosfilt_fir(
    sos: np.ndarray,
    x: jnp.ndarray,
    ir_len: int = 8192,
    block: int | None = None,
) -> jnp.ndarray:
    """Apply an SOS cascade as a truncated-IR FFT convolution (production path)."""
    ir = sos_impulse_response(sos, ir_len)
    return fir_convolve_long(x, ir, block=block)

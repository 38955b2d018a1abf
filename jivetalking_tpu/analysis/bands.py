"""Region/band-scoped RMS measurement: speech body/sibilant bands + the 15
afftdn noise bands.

Behavioural rebuild of internal/processor/analyser_bands.go +
analyser_noise_bands.go.  The reference re-decodes the file 17 times through
`atrim -> highpass(p=2) -> lowpass(p=2) -> astats` filter graphs, fanned out
over NumCPU goroutines.  Here the PCM is already resident on device, so each
measurement is a slice + band-limit + mean-square reduction — and ALL bands
over one region run as a single batched FFT-convolution kernel (one rFFT of
the region, N band-filter spectra, one fused irfft+reduction), which is the
TPU-shaped formulation of the reference's goroutine fan-out.

Band-limit filters match the reference's FFmpeg spec `highpass=f=X:p=2,
lowpass=f=Y:p=2`: one RBJ biquad each at the default q=0.7071 (ref:
analyser_bands.go:32, speechBandAnalysisFilterFormat).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.iir import cascade, design_highpass, design_lowpass, sos_impulse_response
from ..utils.afftdn_bands import (
    AFFTDN_BAND_CENTRES_HZ,
    AFFTDN_MIN_FINITE_BANDS,
    afftdn_band_edges_hz,
)
from .types import Region

# Speech-region band edges (ref: analyser_bands.go:20-26)
BAND_BODY_LOW_HZ, BAND_BODY_HIGH_HZ = 1000.0, 3000.0
BAND_SIB_LOW_HZ, BAND_SIB_HIGH_HZ = 6000.0, 9000.0

_BAND_IR_LEN = 4096


def _band_ir(low_hz: float, high_hz: float, sample_rate: int, ir_len: int = _BAND_IR_LEN) -> np.ndarray | None:
    """Impulse response of highpass(low)+lowpass(high) band-limit, or None
    when the band is unmeasurable at this rate (edge at/above Nyquist — the
    reference's FFmpeg graph reports a non-finite RMS there, ref:
    analyser_noise_bands.go:100-105)."""
    nyquist = sample_rate / 2.0
    if low_hz >= nyquist or high_hz >= nyquist:
        return None
    sos = cascade(design_highpass(low_hz, sample_rate), design_lowpass(high_hz, sample_rate))
    ir = sos_impulse_response(sos, ir_len)
    if not np.all(np.isfinite(ir)):
        return None
    return ir.astype(np.float32)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


@functools.partial(jax.jit, static_argnames=("fft_len", "n_valid"))
def _banded_rms_impl(x: jnp.ndarray, ir_ffts: jnp.ndarray, fft_len: int, n_valid: int) -> jnp.ndarray:
    """Mean-square per band of the causally-filtered region.  One rFFT of the
    region, broadcast-multiplied against every band filter's spectrum, one
    batched irfft, fused reduction."""
    spec = jnp.fft.rfft(x, n=fft_len)
    band_specs = spec[None, :] * ir_ffts
    y = jnp.fft.irfft(band_specs, n=fft_len, axis=-1)[:, :n_valid]
    return jnp.mean(y.astype(jnp.float32) ** 2, axis=-1)


def measure_band_rms_batch(
    x,
    sample_rate: int,
    region: Region,
    bands: list[tuple[float, float]],
) -> list[float]:
    """RMS (dBFS) of each (low, high) band over the region.  NaN marks an
    unmeasurable band (edge at/above Nyquist), mirroring the reference's
    non-finite astats result for such bands."""
    x = jnp.asarray(x)
    n = int(x.shape[0])
    s = max(0, int(round(region.start * sample_rate)))
    e = min(n, int(round(region.end * sample_rate)))
    if e <= s:
        return [math.nan] * len(bands)
    seg = x[s:e]
    seg_len = e - s

    irs: list[np.ndarray | None] = [_band_ir(lo, hi, sample_rate) for lo, hi in bands]
    live = [i for i, ir in enumerate(irs) if ir is not None]
    out = [math.nan] * len(bands)
    if not live:
        return out

    ir_len = _BAND_IR_LEN
    fft_len = _next_pow2(seg_len + ir_len - 1)
    ir_mat = np.stack([irs[i] for i in live])  # (n_live, ir_len)
    ir_ffts = jnp.fft.rfft(jnp.asarray(ir_mat), n=fft_len, axis=-1)
    ms = np.asarray(_banded_rms_impl(seg, ir_ffts, fft_len, seg_len), dtype=np.float64)

    for k, i in enumerate(live):
        v = float(ms[k])
        out[i] = 10.0 * math.log10(v) if v > 0 and math.isfinite(v) else -math.inf
    return out


def measure_speech_bands(x, sample_rate: int, speech_region: Region) -> tuple[float, float, bool]:
    """(body_rms, sib_rms, measured) over the elected speech region
    (ref: measureSpeechBands, analyser_bands.go:115-168)."""
    body, sib = measure_band_rms_batch(
        x, sample_rate, speech_region,
        [(BAND_BODY_LOW_HZ, BAND_BODY_HIGH_HZ), (BAND_SIB_LOW_HZ, BAND_SIB_HIGH_HZ)],
    )
    body_ok = math.isfinite(body)
    sib_ok = math.isfinite(sib)
    return (body if body_ok else 0.0, sib if sib_ok else 0.0, body_ok and sib_ok)


def measure_noise_bands(x, sample_rate: int, noise_region: Region) -> tuple[list[float], bool]:
    """Per-afftdn-band RMS over the room-tone region; measured=True when >=10
    of 15 bands are finite (ref: measureNoiseBands,
    analyser_noise_bands.go:65-126)."""
    bands = [afftdn_band_edges_hz(i) for i in range(len(AFFTDN_BAND_CENTRES_HZ))]
    rms = measure_band_rms_batch(x, sample_rate, noise_region, bands)
    finite = sum(1 for v in rms if math.isfinite(v))
    return rms, finite >= AFFTDN_MIN_FINITE_BANDS

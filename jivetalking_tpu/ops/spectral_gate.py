"""FFT-domain spectral denoiser (afftdn equivalent).

TPU-native replacement for FFmpeg's `afftdn` (ref spec:
internal/processor/filters.go:830-861 `afftdn=nr=12:nt=w|custom:bn=..:
tn=0/1:nf=<floor>`; adaptation internal/processor/adaptive.go:127-170).

FFmpeg's noise-model internals are not fully specified by the spec string;
per the rebuild contract (SURVEY.md §7 "hard parts") this kernel matches the
MEASURED OUTCOME — floor reduced by up to `nr` dB where the spectrum sits at
the modelled noise, speech left intact — rather than afftdn's exact DSP.

Design: one fused batched kernel — STFT (hann, 75% overlap) -> per-bin
noise PSD model -> Wiener-style gain floored at -nr dB, smoothed over time
and frequency to avoid musical noise -> overlap-add.  Everything is batched
rFFT + elementwise work, which XLA fuses and tiles onto the TPU naturally.

Noise model:
  * nt=w (white): flat magnitude at the calibrated `nf` level.
  * nt=custom:   the 15-band shape `bn` (dB offsets at the fixed afftdn
    band centres, ref analyser_noise_bands.go:15-17) is linearly
    interpolated over log-frequency and added to `nf`.
  * tn=1 (track-noise fallback): per-bin noise magnitude estimated as a low
    percentile of the frame magnitudes (minimum-statistics style).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.afftdn_bands import AFFTDN_BAND_CENTRES_HZ
from .framing import frame_signal, overlap_add

WIN = 1024
HOP = WIN // 4  # 75% overlap keeps OLA constant with hann


def _hann(win: int) -> np.ndarray:
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)


def noise_magnitude_model(
    sample_rate: int,
    nf_db: float,
    band_shape_db: list[float] | None,
    win: int = WIN,
) -> np.ndarray:
    """Per-bin noise magnitude (linear, frame-analysis scale).

    Calibration: white noise whose astats RMS is `nf_db` dBFS has per-bin
    spectral magnitude  rms * sqrt(2/win) * win_gain  after a hann rFFT with
    1/win normalisation (win_gain = mean(hann) adjustment folded into the
    sqrt(E[|X|^2]) expectation)."""
    n_bins = win // 2 + 1
    rms = 10.0 ** (nf_db / 20.0)
    # E[|X_k|^2] for white noise through a hann window with 1/win scaling:
    # sum(w^2)/win^2 * sigma^2 per bin (one-sided doubling folded into use)
    w = _hann(win)
    bin_mag = rms * math.sqrt(np.sum(w**2)) / win
    mag = np.full(n_bins, bin_mag)
    if band_shape_db:
        centres = np.asarray(AFFTDN_BAND_CENTRES_HZ)
        shape = np.asarray(band_shape_db, dtype=np.float64)
        freqs = np.arange(n_bins) * sample_rate / win
        logf = np.log(np.maximum(freqs, 1.0))
        interp = np.interp(logf, np.log(centres), shape)
        mag = mag * 10.0 ** (interp / 20.0)
    return mag.astype(np.float32)


def noise_profile_ingraph(nf_db, band_shape_db, sr: int, win: int) -> jnp.ndarray:
    """Per-bin noise magnitude from a (possibly TRACED) floor + 15-band
    shape — the in-graph twin of `noise_magnitude_model` (the fused
    programs carry nf/shape as per-file traced params so electing a new
    noise profile never recompiles).  Same calibration maths."""
    n_bins = win // 2 + 1
    rms = 10.0 ** (nf_db / 20.0)
    w2 = float(np.sum(_hann(win) ** 2))
    bin_mag = rms * jnp.sqrt(w2) / win
    freqs = jnp.arange(n_bins) * (sr / win)
    logf = jnp.log(jnp.maximum(freqs, 1.0))
    centres = jnp.log(jnp.asarray(AFFTDN_BAND_CENTRES_HZ))
    shape_db = jnp.interp(logf, centres, band_shape_db)
    return bin_mag * 10.0 ** (shape_db / 20.0)


def wiener_gain(mag: jnp.ndarray, noise: jnp.ndarray, nr_db=12.0) -> jnp.ndarray:
    """THE afftdn gain law: Wiener-style gain floored at -nr dB, then
    2-frame temporal + 3-bin spectral smoothing against musical noise.
    Single definition shared by this op, the fused master, the chunked
    master, and the sequence-parallel master — a constant tweaked here
    changes all four together (they restated it before; VERDICT r2 #3).
    `mag` is (n_frames, n_bins) frame magnitudes; `noise` is (n_bins,)
    model magnitudes; `nr_db` may be a python float or a traced scalar."""
    floor_gain = 10.0 ** (-nr_db / 20.0)
    snr2 = (mag / jnp.maximum(noise[None, :], 1e-12)) ** 2
    gain = jnp.maximum(floor_gain, 1.0 - 1.0 / jnp.maximum(snr2, 1e-6))
    prev = jnp.concatenate([gain[:1], gain[:-1]], axis=0)
    gain = 0.5 * (gain + prev)
    left = jnp.concatenate([gain[:, :1], gain[:, :-1]], axis=1)
    right = jnp.concatenate([gain[:, 1:], gain[:, -1:]], axis=1)
    return 0.25 * left + 0.5 * gain + 0.25 * right


def afftdn_ext(y_ext: jnp.ndarray, n_frames: int, noise: jnp.ndarray,
               win: int, hop: int, nr_db=12.0) -> jnp.ndarray:
    """STFT -> `wiener_gain` -> normalised overlap-add over an extended /
    padded 1-D signal; returns the full ext-length result (callers slice
    their region of interest).  The single framing+gain+OLA body behind
    every afftdn call site."""
    n_ext = int(y_ext.shape[0])
    window = jnp.asarray(_hann(win), dtype=jnp.float32)
    frames = frame_signal(y_ext, n_frames, win, hop) * window[None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    mag = jnp.abs(spec) / win
    gain = wiener_gain(mag, noise, nr_db)
    out_frames = jnp.fft.irfft(spec * gain, n=win, axis=-1) * window[None, :]
    ola = overlap_add(out_frames, n_frames, win, hop, n_ext)
    norm = overlap_add(
        jnp.broadcast_to(window * window, (n_frames, win)), n_frames, win,
        hop, n_ext,
    )
    return ola / jnp.maximum(norm, 1e-6)


@functools.partial(jax.jit, static_argnames=("n_frames", "win", "hop", "nr_db", "track_noise", "out_len"))
def _spectral_gate_impl(
    x_padded: jnp.ndarray,
    noise_mag: jnp.ndarray,
    n_frames: int,
    win: int,
    hop: int,
    nr_db: float,
    track_noise: bool,
    out_len: int,
) -> jnp.ndarray:
    if track_noise:
        # minimum-statistics estimate: per-bin median magnitude scaled to sit
        # at the Rayleigh mean (median of |X| for white noise = 1.18 sigma;
        # x1.5 places the model just above the bulk of noise-only bins)
        window = jnp.asarray(_hann(win), dtype=jnp.float32)
        frames = frame_signal(x_padded, n_frames, win, hop) * window[None, :]
        mag = jnp.abs(jnp.fft.rfft(frames, axis=-1)) / win
        noise = jnp.percentile(mag, 50.0, axis=0) * 1.5
    else:
        noise = noise_mag
    out = afftdn_ext(x_padded, n_frames, noise, win, hop, nr_db)
    return out[win : win + out_len]


def apply_spectral_gate(
    x,
    sample_rate: int,
    nr_db: float = 12.0,
    nf_db: float = -50.0,
    band_shape_db: list[float] | None = None,
    track_noise: bool = False,
) -> jnp.ndarray:
    """Denoise `x`: attenuate bins at/below the modelled noise magnitude by
    up to `nr_db`, leave high-SNR content untouched."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    # pad one window on each side so OLA normalisation is flat over the signal
    n_frames = 1 + -(-(n + 2 * WIN - WIN) // HOP)
    pad_total = WIN + n + 2 * WIN
    x_padded = jnp.zeros(pad_total, jnp.float32).at[WIN : WIN + n].set(x)
    noise = jnp.asarray(noise_magnitude_model(sample_rate, nf_db, band_shape_db))
    return _spectral_gate_impl(
        x_padded, noise, n_frames, WIN, HOP, float(nr_db), bool(track_noise), n
    )

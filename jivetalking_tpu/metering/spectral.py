"""aspectralstats-equivalent per-frame spectral statistics.

TPU-native replacement for FFmpeg's
`aspectralstats=win_size=2048:win_func=hann:measure=all` (ref spec:
internal/processor/filters.go:625).  Formula provenance:
/root/reference/docs/Spectral-Metrics-Reference.md "aspectralstats" table,
including the division-by-zero guards (1.0 for centroid/spread/skewness/
kurtosis/entropy, 0.0 for flatness/crest/slope/decrease) and the raw
(non-PMF) entropy convention.

One fused batched rFFT + moment-reduction pass produces all 13 metrics for
every frame; whole-file / interval / region values are averages over frames.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

WIN_SIZE = 2048
HOP = 1024  # 50% overlap (aspectralstats default)
_EPS = 1.1920929e-07  # FLT_EPSILON, matching the C implementation

METRIC_NAMES = (
    "mean", "variance", "centroid", "spread", "skewness", "kurtosis",
    "entropy", "flatness", "crest", "flux", "slope", "decrease", "rolloff",
)


@dataclass
class SpectralMetrics:
    mean: float = 0.0
    variance: float = 0.0
    centroid: float = 0.0
    spread: float = 0.0
    skewness: float = 0.0
    kurtosis: float = 0.0
    entropy: float = 0.0
    flatness: float = 0.0
    crest: float = 0.0
    flux: float = 0.0
    slope: float = 0.0
    decrease: float = 0.0
    rolloff: float = 0.0
    found: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "SpectralMetrics":
        return cls(**{k: float(d[k]) for k in METRIC_NAMES}, found=True)


@dataclass
class SpectralFrameSeries:
    """Per-frame metric arrays plus each frame's start time (seconds)."""

    metrics: dict = field(default_factory=dict)  # name -> np.ndarray (n_frames,)
    frame_times: np.ndarray = field(default_factory=lambda: np.zeros(0))

    def average(self, mask: np.ndarray | None = None) -> SpectralMetrics:
        if self.frame_times.size == 0:
            return SpectralMetrics()
        out = {}
        for k in METRIC_NAMES:
            v = self.metrics[k]
            if mask is not None:
                if not mask.any():
                    return SpectralMetrics()
                v = v[mask]
            out[k] = float(np.mean(v))
        return SpectralMetrics(**out, found=True)


@functools.partial(jax.jit, static_argnames=("n_frames", "win", "hop"))
def _spectral_core(x: jnp.ndarray, n_frames: int, win: int, hop: int,
                   sample_rate: float, row_valid=None):
    from ..ops.framing import frame_signal

    frames = frame_signal(x, n_frames, win, hop).astype(jnp.float32)
    window = (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(win) / win)).astype(jnp.float32)
    spec = jnp.fft.rfft(frames * window[None, :], axis=-1) / win
    size = win // 2
    mag = jnp.abs(spec[:, :size])  # (n_frames, size), bin Nyquist excluded
    if row_valid is not None:
        # chunked callers mask frames before the signal start so the flux
        # zero-previous-frame convention matches the whole-file grid
        mag = jnp.where(row_valid[:, None], mag, 0.0)

    scale = (sample_rate / 2.0) / size
    n_idx = jnp.arange(size, dtype=jnp.float32)
    freq = n_idx * scale

    s_mag = jnp.sum(mag, axis=1)
    mean = s_mag / size
    variance = jnp.sum((mag - mean[:, None]) ** 2, axis=1) / size

    nz = s_mag > 0
    centroid = jnp.where(nz, jnp.sum(mag * freq[None, :], axis=1) / jnp.maximum(s_mag, _EPS), 1.0)
    dev = freq[None, :] - centroid[:, None]
    spread_sq = jnp.sum(mag * dev**2, axis=1) / jnp.maximum(s_mag, _EPS)
    spread = jnp.where(nz, jnp.sqrt(jnp.maximum(spread_sq, 0.0)), 1.0)
    sp_ok = nz & (spread > 0)
    skewness = jnp.where(
        sp_ok,
        jnp.sum(mag * dev**3, axis=1) / jnp.maximum(s_mag * spread**3, _EPS),
        1.0,
    )
    kurtosis = jnp.where(
        sp_ok,
        jnp.sum(mag * dev**4, axis=1) / jnp.maximum(s_mag * spread**4, _EPS),
        1.0,
    )

    entropy = -jnp.sum(mag * jnp.log(mag + _EPS), axis=1) / jnp.log(float(size))
    entropy = jnp.where(nz, entropy, 1.0)

    geo = jnp.exp(jnp.mean(jnp.log(mag + _EPS), axis=1))
    arith = jnp.mean(mag + _EPS, axis=1)
    flatness = jnp.where(nz, geo / arith, 0.0)

    crest = jnp.where(nz, jnp.max(mag, axis=1) / jnp.maximum(mean, _EPS), 0.0)

    prev = jnp.concatenate([jnp.zeros((1, size), mag.dtype), mag[:-1]], axis=0)
    flux = jnp.sqrt(jnp.sum((mag - prev) ** 2, axis=1))

    m_half = size * 0.5
    norm_idx = (n_idx - m_half) / m_half
    denom_slope = jnp.sum(norm_idx**2)
    slope = jnp.where(
        nz, jnp.sum(norm_idx[None, :] * (mag - mean[:, None]), axis=1) / denom_slope, 0.0
    )

    inv_n = jnp.concatenate([jnp.zeros(1, jnp.float32), 1.0 / jnp.arange(1, size, dtype=jnp.float32)])
    dec_num = jnp.sum((mag - mag[:, :1]) * inv_n[None, :], axis=1)
    dec_den = jnp.sum(mag[:, 1:], axis=1)
    decrease = jnp.where(dec_den > 0, dec_num / jnp.maximum(dec_den, _EPS), 0.0)

    csum = jnp.cumsum(mag, axis=1)
    target = 0.85 * s_mag
    reached = csum >= target[:, None]
    first = jnp.argmax(reached, axis=1)
    rolloff = jnp.where(nz, first.astype(jnp.float32) * scale, 0.0)

    return dict(
        mean=mean, variance=variance, centroid=centroid, spread=spread,
        skewness=skewness, kurtosis=kurtosis, entropy=entropy,
        flatness=flatness, crest=crest, flux=flux, slope=slope,
        decrease=decrease, rolloff=rolloff,
    )


def spectral_frames(x, sample_rate: int, win: int = WIN_SIZE, hop: int = HOP) -> SpectralFrameSeries:
    """Compute the 13 aspectralstats metrics for every (win, hop) frame."""
    x = jnp.asarray(x)
    n = int(x.shape[0])
    if n < win:
        x = jnp.zeros(win, x.dtype).at[:n].set(x)
        n = win
    n_frames = 1 + (n - win) // hop
    out = _spectral_core(x, n_frames, win, hop, float(sample_rate))
    metrics = {k: np.asarray(v, dtype=np.float64) for k, v in out.items()}
    times = np.arange(n_frames, dtype=np.float64) * hop / sample_rate
    return SpectralFrameSeries(metrics=metrics, frame_times=times)


def measure_spectral(x, sample_rate: int) -> SpectralMetrics:
    """Whole-signal averaged spectral metrics (the reference averages the
    per-frame lavfi values across the file)."""
    return spectral_frames(x, sample_rate).average()

"""The 15 fixed afftdn noise-profile band centres, shared by the analysis
band measurement and the spectral-gate noise model (ref:
internal/processor/analyser_noise_bands.go:15-17, verified against ffmpeg
af_afftdn.c by the reference)."""

from __future__ import annotations

import math

AFFTDN_BAND_CENTRES_HZ = (
    80.0, 125.0, 195.0, 290.0, 440.0, 660.0, 1000.0, 1500.0,
    2250.0, 3350.0, 5000.0, 7500.0, 11200.0, 16000.0, 24000.0,
)

# minimum finite bands for the custom profile to count (ref: :24)
AFFTDN_MIN_FINITE_BANDS = 10


def afftdn_band_edges_hz(index: int) -> tuple[float, float]:
    """[low, high] edges at geometric midpoints between adjacent centres;
    outer bands extend one geometric step (ref: afftdnBandEdgesHz,
    analyser_noise_bands.go:33-56)."""
    c = AFFTDN_BAND_CENTRES_HZ
    last = len(c) - 1
    if index <= 0:
        low = c[0] / math.sqrt(c[1] / c[0])
    else:
        low = math.sqrt(c[index - 1] * c[index])
    if index >= last:
        high = c[last] * math.sqrt(c[last] / c[last - 1])
    else:
        high = math.sqrt(c[index] * c[index + 1])
    return low, high

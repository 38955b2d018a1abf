"""K-weighting pre-filter per ITU-R BS.1770-4.

Two-stage filter: a high-shelf modelling head diffraction (+~4 dB above
1.5 kHz) and an RLB high-pass (~38 Hz).  BS.1770 tabulates coefficients at
48 kHz only; for arbitrary sample rates we re-derive them from the analog
prototype via the pre-warped bilinear transform (the parameterisation
published by Mansbridge/DeMan and used across open loudness meters).  At
48 kHz these formulas reproduce the BS.1770 table to ~1e-6.

Replaces the K-weighting stage inside FFmpeg's `ebur128` filter (ref spec:
internal/processor/filters.go:626-689).
"""

from __future__ import annotations

import math

import numpy as np

# Analog prototype constants (BS.1770-4 derivation)
_SHELF_F0 = 1681.9744509555319
_SHELF_GAIN_DB = 3.999843853973347
_SHELF_Q = 0.7071752369554196
_HP_F0 = 38.13547087602444
_HP_Q = 0.5003270373238773


def k_weighting_sos(sample_rate: float) -> np.ndarray:
    """Return the 2-section K-weighting cascade as SOS rows
    [b0 b1 b2 1 a1 a2] at the given sample rate."""
    # Stage 1: high shelf
    K = math.tan(math.pi * _SHELF_F0 / sample_rate)
    Vh = 10.0 ** (_SHELF_GAIN_DB / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / _SHELF_Q + K * K
    shelf = [
        (Vh + Vb * K / _SHELF_Q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / _SHELF_Q + K * K) / a0,
        1.0,
        2.0 * (K * K - 1.0) / a0,
        (1.0 - K / _SHELF_Q + K * K) / a0,
    ]

    # Stage 2: RLB high-pass.  Per the BS.1770 table the numerator is the
    # un-normalised [1, -2, 1] (slight gain above unity at Nyquist is
    # intentional and part of the spec).
    K = math.tan(math.pi * _HP_F0 / sample_rate)
    a0 = 1.0 + K / _HP_Q + K * K
    hp = [
        1.0,
        -2.0,
        1.0,
        1.0,
        2.0 * (K * K - 1.0) / a0,
        (1.0 - K / _HP_Q + K * K) / a0,
    ]
    return np.array([shelf, hp], dtype=np.float64)

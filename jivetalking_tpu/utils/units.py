"""Measurement-axis helpers and dB conversions.

The reference codifies a strict "two-axis discipline": momentary-LUFS
(K-weighted, 400 ms blocks), astats-RMS (unweighted sample RMS in dBFS), and
BS.1770 integrated LUFS are distinct measurement axes that must never be
mixed (ref: internal/processor/quality.go:169-220, AGENTS.md "Measurement
axes").  We keep plain floats but centralise the conversions so every module
uses identical maths (ref: internal/processor/filters.go:589-602).
"""

from __future__ import annotations

import math

# Floor used when a level is digital silence (linear amplitude 0).
DB_FLOOR = -150.0

# ebur128 reports -70.0 LUFS as its gating floor; anything at/below is
# treated as silence (ref: internal/processor/normalise.go:840-842).
LUFS_SILENCE_FLOOR = -70.0


def db_to_linear(db: float) -> float:
    """Convert a dB amplitude value to a linear gain (20*log10 axis)."""
    return 10.0 ** (db / 20.0)


def linear_to_db(linear: float, floor: float = DB_FLOOR) -> float:
    """Convert linear amplitude to dB; non-positive values return *floor*."""
    if linear is None or not (linear > 0.0) or math.isnan(linear):
        return floor
    return 20.0 * math.log10(linear)


def power_to_db(power: float, floor: float = DB_FLOOR) -> float:
    """Convert a power (mean-square) value to dB (10*log10 axis)."""
    if power is None or not (power > 0.0) or math.isnan(power):
        return floor
    return 10.0 * math.log10(power)


def sanitize_float(value: float, fallback: float = 0.0) -> float:
    """NaN/Inf -> fallback, mirroring the reference's pervasive sanitising
    (ref: internal/processor/adaptive_math.go:6-11)."""
    if value is None:
        return fallback
    try:
        v = float(value)
    except (TypeError, ValueError):
        return fallback
    if math.isnan(v) or math.isinf(v):
        return fallback
    return v


def clamp(value: float, lo: float, hi: float) -> float:
    return max(lo, min(hi, value))

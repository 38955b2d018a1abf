"""Filter Chain + Analysis status boxes (string rendering).

Behavioural rebuild of internal/ui/statusboxes.go:269-396: two bordered
boxes built from the AdaptedSummary view-model — the chain box lists each
stage with its adapted parameter, the analysis box the key measurements.
Pending values render as the ⋯ token until their data arrives."""

from __future__ import annotations

import math

from .summary import AdaptedSummary

PENDING = "⋯"
BOX_WIDTH = 44


def _row(label: str, value: str) -> str:
    inner = BOX_WIDTH - 4
    text = f"{label:<16} {value}"
    return f"│ {text:<{inner}} │"


def _box(title: str, rows: list[str]) -> str:
    inner = BOX_WIDTH - 4
    top = f"╭─ {title} " + "─" * max(0, BOX_WIDTH - 5 - len(title)) + "╮"
    bottom = "╰" + "─" * (BOX_WIDTH - 2) + "╯"
    return "\n".join([top, *rows, bottom])


def format_sample_rate(hz: float) -> str:
    """kHz with a trimmed trailing .0: 44100 -> '44.1 kHz', 48000 ->
    '48 kHz' (ref: formatSampleRate, TestFormatSampleRate,
    statusboxes_test.go:93-111)."""
    khz = hz / 1000.0
    s = f"{khz:.1f}".rstrip("0").rstrip(".")
    return f"{s} kHz"


def _db(v: float) -> str:
    return f"{v:.1f} ㏈" if math.isfinite(v) else "-"


def render_filter_chain_box(s: AdaptedSummary) -> str:
    """(ref: statusboxes.go filter-chain box)."""
    if not s.chain_ready:
        rows = [_row(label, PENDING) for label in
                ("Downmix", "High-pass", "Low-pass", "Denoise", "Gate",
                 "Compressor", "De-esser", "Limiter")]
        return _box("Filter Chain", rows)

    denoise = []
    if s.denoise_nlm:
        denoise.append("NLM")
    if s.denoise_fft:
        denoise.append("FFT")
    if s.limiter_ready:
        limiter = _db(s.limiter_ceiling) + "TP" if s.limiter_enabled else "off"
    else:
        limiter = PENDING
    rows = [
        _row("Downmix", "mono" if s.downmix_mono else "off"),
        _row("High-pass", f"{s.highpass_hz:.0f} Hz"),
        _row("Low-pass", format_sample_rate(s.lowpass_hz)),
        _row("Denoise", "+".join(denoise) if denoise else "off"),
        _row("Gate", f"{_db(s.gate_thresh_db)} @ {s.gate_ratio:.1f}:1"),
        _row("Compressor", f"{_db(s.comp_thresh_db)} @ 3.0:1"),
        _row("De-esser", f"i={s.deesser_i:.2f}" if s.deesser_on else "off"),
        _row("Limiter", limiter),
        _row("Output", f"{format_sample_rate(s.sample_rate)} s16"),
    ]
    return _box("Filter Chain", rows)


def render_analysis_box(s: AdaptedSummary) -> str:
    """(ref: statusboxes.go analysis box)."""
    if not s.chain_ready:
        rows = [_row(label, PENDING) for label in
                ("Loudness", "True peak", "LRA", "Voice avg",
                 "Noise floor", "Separation", "Sibilance")]
        return _box("Analysis", rows)

    rows = [
        _row("Loudness", f"{s.input_lufs:.1f} LUFS"),
        _row("True peak", _db(s.true_peak_dbtp) + "TP"),
        _row("LRA", f"{s.input_lra:.1f} LU"),
        _row("Voice avg", _db(s.voice_avg_db) if s.has_speech else "-"),
        _row("Noise floor", _db(s.noise_floor_db) if s.has_noise_floor else "-"),
        _row("Separation",
             _db(s.separation_db) if (s.has_speech and s.has_noise_floor) else "-"),
        _row("Sibilance", _db(s.sibilance_db) if s.has_sibilance else "-"),
        _row("Gate depth", _db(s.gate_depth_db)),
    ]
    return _box("Analysis", rows)

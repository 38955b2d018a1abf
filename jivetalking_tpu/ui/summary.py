"""AdaptedSummary view-model: the resolved display values behind the
Filter Chain + Analysis status boxes.

Behavioural rebuild of internal/ui/summary.go:16-164 — derived from the
per-file effective config, diagnostics and Pass-1 measurements after
AdaptConfig; holds display values only, never live signal.  The limiter
portion fills in at completion via `with_limiter`."""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..adaptive.adapt import AdaptiveDiagnostics
from ..adaptive.config import FilterConfig
from ..analysis.analyser import AudioMeasurements
from ..quality import input_display_noise_floor_db
from ..utils.units import linear_to_db


@dataclass
class AdaptedSummary:
    chain_ready: bool = False

    # filter chain rows
    downmix_mono: bool = True
    sample_rate: int = 44100
    highpass_hz: float = 0.0
    lowpass_hz: float = 0.0
    denoise_nlm: bool = False
    denoise_fft: bool = False
    gate_thresh_db: float = 0.0
    comp_thresh_db: float = 0.0
    deesser_on: bool = False
    deesser_i: float = 0.0

    # limiter (filled at completion)
    limiter_ready: bool = False
    limiter_enabled: bool = False
    limiter_ceiling: float = 0.0

    # analysis rows
    has_speech: bool = False
    voice_avg_db: float = 0.0
    has_noise_floor: bool = False
    noise_floor_db: float = 0.0
    separation_db: float = 0.0
    input_lra: float = 0.0
    gate_ratio: float = 0.0
    true_peak_dbtp: float = 0.0
    has_sibilance: bool = False
    sibilance_db: float = 0.0
    gate_depth_db: float = 0.0
    input_lufs: float = 0.0


def new_adapted_summary(
    cfg: FilterConfig | None,
    diag: AdaptiveDiagnostics | None,
    m: AudioMeasurements | None,
) -> AdaptedSummary:
    """(ref: NewAdaptedSummary, summary.go:59-164)."""
    s = AdaptedSummary(chain_ready=True)
    if cfg is None or m is None:
        s.chain_ready = False
        return s

    s.downmix_mono = True
    s.sample_rate = cfg.resample.sample_rate
    s.highpass_hz = cfg.rumble_highpass.frequency
    s.lowpass_hz = cfg.bandlimit_lowpass.frequency
    s.denoise_nlm = cfg.noise_reduction.enabled
    s.denoise_fft = cfg.noise_reduction.enabled and cfg.noise_reduction.afftdn_enabled
    s.gate_thresh_db = linear_to_db(cfg.speech_gate.threshold)
    s.comp_thresh_db = cfg.levelling_compressor.threshold
    s.deesser_i = cfg.deesser.intensity
    s.deesser_on = cfg.deesser.intensity > 0

    s.noise_floor_db, s.has_noise_floor = input_display_noise_floor_db(m)
    s.input_lra = m.loudness.input_lra
    s.gate_ratio = cfg.speech_gate.ratio
    s.true_peak_dbtp = m.loudness.input_tp
    s.input_lufs = m.loudness.input_i
    if diag is not None:
        s.gate_depth_db = diag.speech_gate_depth_db

    sp = m.vad.speech_profile
    if sp is not None:
        s.has_speech = True
        s.voice_avg_db = sp.sample.rms_level
        if s.has_noise_floor:
            s.separation_db = s.voice_avg_db - s.noise_floor_db
            # voice-activated: recompute on the momentary-LUFS axis (the
            # astats gap inflates against a digital-silence room tone)
            if m.noise.voice_activated and m.vad.noise_profile is not None:
                f = m.vad.noise_profile.measured_noise_floor
                if f != 0 and math.isfinite(f):
                    mom = sp.sample.momentary_lufs - f
                    if math.isfinite(mom):
                        s.separation_db = mom
        if sp.bands_measured:
            s.has_sibilance = True
            s.sibilance_db = sp.sib_band_rms - sp.body_band_rms

    return s


def with_limiter(s: AdaptedSummary, enabled: bool, ceiling_dbtp: float) -> AdaptedSummary:
    """Completion-time limiter fill (ref: WithLimiter)."""
    s.limiter_ready = True
    s.limiter_enabled = enabled
    s.limiter_ceiling = ceiling_dbtp
    return s

"""Pass 1.5: measurement -> effective filter config (pure function).

Behavioural rebuild of `AdaptConfig` and its per-filter tuners
(ref: internal/processor/adaptive.go:13-40, adaptive_bandlimit_lowpass.go,
adaptive_speech_gate.go, adaptive_deesser.go,
adaptive_levelling_compressor.go).  This is deliberately host-side Python
between device passes, mirroring the reference's design: adaptation consumes
scalar measurements and produces scalar parameters, so it never belongs
inside jit.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..analysis.analyser import AudioMeasurements
from ..utils.units import db_to_linear, linear_to_db, sanitize_float
from .config import (
    BANDLIMIT_LP_FREQ,
    FilterConfig,
    derive_effective_config,
)

# --- afftdn bounds (ref: adaptive.go:43-47) ---
AFFTDN_NF_MIN_DB = -80.0
AFFTDN_NF_MAX_DB = -20.0

# --- custom-profile gates (ref: adaptive.go:54-63) ---
AFFTDN_CUSTOM_MIN_SEPARATION_DB = 12.0
AFFTDN_CUSTOM_MIN_FLATNESS = 0.45
AFFTDN_BAND_SHAPE_CLIP_DB = 24.0

# --- speech gate (ref: adaptive_speech_gate.go:3-69) ---
LUFS_GAP_EXTREME = 25.0
GATE_THRESHOLD_MIN_DB = -80.0
GATE_THRESHOLD_MAX_DB = -25.0
GATE_CREST_FACTOR_THRESHOLD = 20.0
GATE_TARGET_REDUCTION_DB = 12.0
GATE_TARGET_THRESHOLD_DB = -40.0
GATE_SPEECH_MARGIN_DB = 6.0
GATE_NOISE_MARGIN_DB = 6.0
GATE_LRA_WIDE = 15.0
GATE_RATIO_GENTLE = 1.5
GATE_RATIO_MOD = 2.0
GATE_ATTACK_MS = 5.0
GATE_RELEASE_MS = 200.0
GATE_DEPTH_FIXED_DB = 14.0
GATE_DEPTH_NARROW_DB = 8.0
GATE_KNEE_FIXED = 3.0
GATE_DEFAULT_THRESHOLD = 0.01  # -40 dBFS linear

# --- de-esser ramp (ref: adaptive_deesser.go:3-24) ---
DEESS_EXCESS_OFF_DB = -6.0
DEESS_EXCESS_MID_DB = -3.0
DEESS_EXCESS_MAX_DB = 0.0
DEESS_INTENSITY_MID = 0.6
DEESS_INTENSITY_MAX = 0.85

# --- levelling compressor (ref: adaptive_levelling_compressor.go:5-50) ---
COMP_THRESHOLD_SPEECH_OFFSET_DB = 9.0
COMP_THRESHOLD_MIN = -45.0
COMP_THRESHOLD_MAX = -6.0
COMP_FALLBACK_PEAK_HEADROOM_DB = 20.0
COMP_DEFAULT_THRESHOLD = -18.0
COMP_FIXED_RATIO = 3.0
COMP_FIXED_ATTACK = 10.0
COMP_FIXED_RELEASE = 200.0
COMP_FIXED_KNEE = 4.0
COMP_FIXED_MIX = 1.0
COMP_FIXED_MAKEUP = 0.0


@dataclass
class AdaptiveDiagnostics:
    """Tuning decisions surfaced to reports/UI
    (ref: AdaptiveDiagnostics usage across adaptive*.go)."""

    bandlimit_lp_reason: str = ""
    afftdn_enabled: bool = True
    afftdn_disable_reason: str = ""
    afftdn_noise_floor_db: float = 0.0
    afftdn_noise_type: str = ""
    speech_gate_narrow_gap: bool = False
    speech_gate_quiet_speech_estimate: float = 0.0
    speech_gate_speech_separation: float = 0.0
    speech_gate_threshold_unclamped: float = 0.0
    speech_gate_speech_headroom: float = 0.0
    speech_gate_clamp_reason: str = ""
    speech_gate_depth_db: float = 0.0


def _is_finite(v: float) -> bool:
    return not (math.isnan(v) or math.isinf(v))


# ---------------------------------------------------------------------------
# afftdn noise-reduction tuning (ref: adaptive.go:81-170)
# ---------------------------------------------------------------------------

def build_afftdn_band_noise(bands: list[float]) -> list[float] | None:
    """Per-band shape RELATIVE to the finite-band mean, clipped to +-24 dB;
    non-finite bands emit 0.0 (white reference).  None when no band is finite
    (ref: buildAfftdnBandNoise, adaptive.go:81-110)."""
    if not bands:
        return None
    finite = [v for v in bands if _is_finite(v)]
    if not finite:
        return None
    mean = sum(finite) / len(finite)
    out = []
    for v in bands:
        if not _is_finite(v):
            out.append(0.0)
            continue
        shape = v - mean
        out.append(max(-AFFTDN_BAND_SHAPE_CLIP_DB, min(AFFTDN_BAND_SHAPE_CLIP_DB, shape)))
    return out


def use_custom_afftdn_profile(m: AudioMeasurements) -> bool:
    """(ref: useCustomAfftdnProfile, adaptive.go:116-125)."""
    profile = m.vad.noise_profile
    if profile is None or not profile.bands_measured:
        return False
    if m.vad.gate_stats.separation_db < AFFTDN_CUSTOM_MIN_SEPARATION_DB:
        return False
    return profile.spectral.flatness >= AFFTDN_CUSTOM_MIN_FLATNESS


def tune_noise_reduction(cfg: FilterConfig, diag: AdaptiveDiagnostics, m: AudioMeasurements) -> None:
    """(ref: tuneNoiseReduction, adaptive.go:127-170)."""
    if m.noise.voice_activated:
        cfg.noise_reduction.afftdn_enabled = False
        diag.afftdn_enabled = False
        diag.afftdn_disable_reason = "voice_activated"
        return

    diag.afftdn_enabled = cfg.noise_reduction.afftdn_enabled

    if m.noise.floor == 0:
        return

    floor = max(AFFTDN_NF_MIN_DB, min(AFFTDN_NF_MAX_DB, m.noise.floor))
    cfg.noise_reduction.afftdn_noise_floor = floor
    cfg.noise_reduction.afftdn_track_noise = False
    diag.afftdn_noise_floor_db = floor

    cfg.noise_reduction.afftdn_noise_type = "w"
    if use_custom_afftdn_profile(m):
        bn = build_afftdn_band_noise(m.vad.noise_profile.band_noise)
        if bn is not None:
            cfg.noise_reduction.afftdn_noise_type = "custom"
            cfg.noise_reduction.afftdn_band_noise = bn
    diag.afftdn_noise_type = cfg.noise_reduction.afftdn_noise_type


# ---------------------------------------------------------------------------
# band-limit (ref: adaptive_bandlimit_lowpass.go)
# ---------------------------------------------------------------------------

def tune_bandlimit_lowpass(cfg: FilterConfig, diag: AdaptiveDiagnostics, m: AudioMeasurements) -> None:
    cfg.bandlimit_lowpass.enabled = True
    cfg.bandlimit_lowpass.frequency = BANDLIMIT_LP_FREQ
    cfg.bandlimit_lowpass.poles = 2
    cfg.bandlimit_lowpass.mix = 1.0
    diag.bandlimit_lp_reason = "20.5 kHz band-limit (always on)"


# ---------------------------------------------------------------------------
# speech gate (ref: adaptive_speech_gate.go)
# ---------------------------------------------------------------------------

def calculate_speech_gate_ratio(lra: float) -> float:
    return GATE_RATIO_GENTLE if lra > GATE_LRA_WIDE else GATE_RATIO_MOD


def calculate_speech_gate_threshold(voiced_low_pct: float, separation: float) -> tuple[float, bool]:
    """Voiced-anchored threshold: p10 - 6 dB, clamped [-80, -25]; narrow gap
    when separation < 12 dB (ref: calculateSpeechGateThreshold)."""
    threshold_db = voiced_low_pct - GATE_SPEECH_MARGIN_DB
    narrow_gap = separation < (GATE_SPEECH_MARGIN_DB + GATE_NOISE_MARGIN_DB)
    # Go's min/max propagate NaN; Python's silently keep the other operand.
    # A NaN must survive to sanitize_config, which resets it to the default.
    if not math.isnan(threshold_db):
        threshold_db = max(GATE_THRESHOLD_MIN_DB, min(threshold_db, GATE_THRESHOLD_MAX_DB))
    return db_to_linear(threshold_db) if not math.isnan(threshold_db) else math.nan, narrow_gap


def calculate_speech_gate_threshold_no_profile(
    floor: float, room_tone_peak: float, room_tone_crest: float, ratio: float, lufs_gap: float
) -> float:
    """No-profile safety path (ref: calculateSpeechGateThresholdNoProfile)."""
    use_peak_reference = (
        room_tone_crest > GATE_CREST_FACTOR_THRESHOLD
        and room_tone_peak != 0
        and lufs_gap < LUFS_GAP_EXTREME
    )
    if use_peak_reference:
        threshold_db = room_tone_peak + 3.0
    else:
        min_gap_db = GATE_TARGET_REDUCTION_DB / (1.0 - 1.0 / ratio)
        threshold_db = max(floor + min_gap_db, GATE_TARGET_THRESHOLD_DB)
    threshold_db = max(GATE_THRESHOLD_MIN_DB, min(threshold_db, GATE_THRESHOLD_MAX_DB))
    return db_to_linear(threshold_db)


def tune_speech_gate(cfg: FilterConfig, diag: AdaptiveDiagnostics, m: AudioMeasurements) -> None:
    """(ref: tuneSpeechGate, adaptive_speech_gate.go:100-187)."""
    if m.vad.noise_profile is not None:
        room_tone_crest = m.vad.noise_profile.crest_factor
        room_tone_peak = m.vad.noise_profile.peak_level
    else:
        room_tone_crest = 15.0
        room_tone_peak = 0.0

    lufs_gap = max(0.0, cfg.loudnorm.target_i - m.loudness.input_i)

    cfg.speech_gate.ratio = calculate_speech_gate_ratio(m.loudness.input_lra)

    narrow_gap = False
    if m.vad.speech_profile is not None:
        threshold, narrow_gap = calculate_speech_gate_threshold(
            m.vad.gate_stats.voiced_low_percentile,
            m.vad.gate_stats.separation_db,
        )
        cfg.speech_gate.threshold = threshold
        diag.speech_gate_narrow_gap = narrow_gap
        diag.speech_gate_quiet_speech_estimate = m.vad.gate_stats.voiced_low_percentile
        diag.speech_gate_speech_separation = m.vad.gate_stats.separation_db
        diag.speech_gate_threshold_unclamped = (
            m.vad.gate_stats.voiced_low_percentile - GATE_SPEECH_MARGIN_DB
        )
        diag.speech_gate_speech_headroom = (
            m.vad.gate_stats.voiced_low_percentile - linear_to_db(threshold)
        )
        diag.speech_gate_clamp_reason = "narrow_gap" if narrow_gap else "none"
    else:
        cfg.speech_gate.threshold = calculate_speech_gate_threshold_no_profile(
            m.noise.floor, room_tone_peak, room_tone_crest, cfg.speech_gate.ratio, lufs_gap
        )

    cfg.speech_gate.attack = GATE_ATTACK_MS
    cfg.speech_gate.release = GATE_RELEASE_MS
    depth_db = GATE_DEPTH_NARROW_DB if narrow_gap else GATE_DEPTH_FIXED_DB
    cfg.speech_gate.range = db_to_linear(-depth_db)
    diag.speech_gate_depth_db = depth_db
    cfg.speech_gate.knee = GATE_KNEE_FIXED
    cfg.speech_gate.detection = "rms"


# ---------------------------------------------------------------------------
# de-esser (ref: adaptive_deesser.go)
# ---------------------------------------------------------------------------

def tune_deesser(cfg: FilterConfig, m: AudioMeasurements) -> None:
    """Intensity from sibilance excess = sib RMS - body RMS; OFF unless both
    bands measured (ref: tuneDeesser, adaptive_deesser.go:44-67)."""
    sp = m.vad.speech_profile
    if sp is None or not sp.bands_measured:
        cfg.deesser.intensity = 0.0
        return

    excess = sp.sib_band_rms - sp.body_band_rms
    if excess < DEESS_EXCESS_OFF_DB:
        cfg.deesser.intensity = 0.0
    elif excess < DEESS_EXCESS_MID_DB:
        frac = (excess - DEESS_EXCESS_OFF_DB) / (DEESS_EXCESS_MID_DB - DEESS_EXCESS_OFF_DB)
        cfg.deesser.intensity = frac * DEESS_INTENSITY_MID
    elif excess < DEESS_EXCESS_MAX_DB:
        frac = (excess - DEESS_EXCESS_MID_DB) / (DEESS_EXCESS_MAX_DB - DEESS_EXCESS_MID_DB)
        cfg.deesser.intensity = DEESS_INTENSITY_MID + frac * (DEESS_INTENSITY_MAX - DEESS_INTENSITY_MID)
    else:
        cfg.deesser.intensity = DEESS_INTENSITY_MAX


# ---------------------------------------------------------------------------
# levelling compressor (ref: adaptive_levelling_compressor.go)
# ---------------------------------------------------------------------------

def tune_levelling_compressor(cfg: FilterConfig, m: AudioMeasurements) -> None:
    """(ref: tuneLevellingCompressor)."""
    c = cfg.levelling_compressor
    c.ratio = COMP_FIXED_RATIO
    c.attack = COMP_FIXED_ATTACK
    c.release = COMP_FIXED_RELEASE
    c.knee = COMP_FIXED_KNEE
    c.mix = COMP_FIXED_MIX
    c.makeup = COMP_FIXED_MAKEUP

    if m.vad.speech_profile is not None:
        speech_rms = m.vad.speech_profile.sample.rms_level
        full_file_rms = m.dynamics.rms_level
        if full_file_rms < 0 and not (math.isinf(full_file_rms) and full_file_rms < 0):
            speech_rms = max(speech_rms, full_file_rms)
        threshold = speech_rms + COMP_THRESHOLD_SPEECH_OFFSET_DB
    else:
        peak = m.dynamics.peak_level
        if math.isnan(peak) or math.isinf(peak):
            c.threshold = COMP_DEFAULT_THRESHOLD
            return
        threshold = peak - COMP_FALLBACK_PEAK_HEADROOM_DB

    c.threshold = max(COMP_THRESHOLD_MIN, min(threshold, COMP_THRESHOLD_MAX))


# ---------------------------------------------------------------------------
# sanitising (ref: adaptive.go:173-237)
# ---------------------------------------------------------------------------

def sanitize_config(cfg: FilterConfig) -> None:
    from .config import (
        RUMBLE_HP_FREQ,
        DeesserConfig,
        LevellingCompressorConfig,
        NoiseReductionConfig,
        SpeechGateConfig,
    )

    for biquad, default_freq in (
        (cfg.rumble_highpass, RUMBLE_HP_FREQ),
        (cfg.bandlimit_lowpass, BANDLIMIT_LP_FREQ),
    ):
        biquad.frequency = sanitize_float(biquad.frequency, default_freq)
        biquad.width = sanitize_float(biquad.width, 0.707)
        biquad.mix = sanitize_float(biquad.mix, 1.0)

    nr_d = NoiseReductionConfig()
    nr = cfg.noise_reduction
    nr.strength = sanitize_float(nr.strength, nr_d.strength)
    nr.patch_sec = sanitize_float(nr.patch_sec, nr_d.patch_sec)
    nr.research_sec = sanitize_float(nr.research_sec, nr_d.research_sec)
    nr.smooth = sanitize_float(nr.smooth, nr_d.smooth)
    nr.afftdn_noise_reduction = sanitize_float(nr.afftdn_noise_reduction, nr_d.afftdn_noise_reduction)
    nr.afftdn_noise_floor = sanitize_float(nr.afftdn_noise_floor, nr_d.afftdn_noise_floor)
    if nr.afftdn_noise_type == "custom" and not nr.afftdn_band_noise:
        nr.afftdn_noise_type = "w"

    g_d = SpeechGateConfig()
    g = cfg.speech_gate
    if math.isnan(g.threshold) or math.isinf(g.threshold) or g.threshold <= 0:
        g.threshold = GATE_DEFAULT_THRESHOLD
    g.ratio = sanitize_float(g.ratio, g_d.ratio)
    g.attack = sanitize_float(g.attack, g_d.attack)
    g.release = sanitize_float(g.release, g_d.release)
    g.range = sanitize_float(g.range, g_d.range)
    g.knee = sanitize_float(g.knee, g_d.knee)
    g.makeup = sanitize_float(g.makeup, g_d.makeup)

    lc_d = LevellingCompressorConfig()
    lc = cfg.levelling_compressor
    lc.ratio = sanitize_float(lc.ratio, lc_d.ratio)
    lc.threshold = sanitize_float(lc.threshold, COMP_DEFAULT_THRESHOLD)
    lc.attack = sanitize_float(lc.attack, lc_d.attack)
    lc.release = sanitize_float(lc.release, lc_d.release)
    lc.makeup = sanitize_float(lc.makeup, lc_d.makeup)
    lc.knee = sanitize_float(lc.knee, lc_d.knee)
    lc.mix = sanitize_float(lc.mix, lc_d.mix)

    de_d = DeesserConfig()
    de = cfg.deesser
    de.intensity = sanitize_float(de.intensity, 0.0)
    de.amount = sanitize_float(de.amount, de_d.amount)
    de.frequency = sanitize_float(de.frequency, de_d.frequency)


# ---------------------------------------------------------------------------
# the entry point (ref: AdaptConfig, adaptive.go:13-40)
# ---------------------------------------------------------------------------

def adapt_config(
    base: FilterConfig, m: AudioMeasurements
) -> tuple[FilterConfig, AdaptiveDiagnostics]:
    """Tune all filter parameters from Pass-1 measurements; returns the
    per-file effective config + diagnostics without mutating the base."""
    cfg = derive_effective_config(base)
    diag = AdaptiveDiagnostics()

    tune_bandlimit_lowpass(cfg, diag, m)
    tune_noise_reduction(cfg, diag, m)
    tune_speech_gate(cfg, diag, m)
    tune_deesser(cfg, m)
    tune_levelling_compressor(cfg, m)
    sanitize_config(cfg)

    return cfg, diag

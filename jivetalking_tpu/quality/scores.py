"""Quality scoring: processed-output stars, recording (input capture) stars,
and input-gain advice.

Behavioural rebuild of internal/processor/quality.go, recording.go,
advice.go — every constant and ramp preserved."""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..analysis.analyser import AudioMeasurements
from ..pipeline.process import ProcessResult

NORM_TARGET_LUFS = -16.0

# quality rubric (ref: quality.go:20-62)
QUALITY_WEIGHT_LOUDNESS = 0.50
QUALITY_WEIGHT_TRUE_PEAK = 0.30
QUALITY_WEIGHT_NOISE = 0.20
QUALITY_LOUDNESS_TIGHT_TOL = 0.5
QUALITY_LOUDNESS_LOOSE_TOL = 3.0
QUALITY_TP_SAFE = -1.0
QUALITY_TP_HOT = 0.0
QUALITY_NOISE_CLEAN_FLOOR = -75.0
QUALITY_NOISE_DIRTY_FLOOR = -50.0

# star bands (ref: quality.go:55-62)
STAR_BANDS = (
    (90.0, 5, "Excellent"),
    (75.0, 4, "Great"),
    (60.0, 3, "Good"),
    (40.0, 2, "Fair"),
    (0.0, 1, "Poor"),
)

# recording rubric (ref: recording.go:23-70)
RECORDING_WEIGHT_CLEANLINESS = 0.50
RECORDING_WEIGHT_HEADROOM = 0.30
RECORDING_WEIGHT_LEVEL = 0.20
RECORDING_SNR_FULL = 45.0
RECORDING_SNR_ZERO = 16.0
RECORDING_FLOOR_FULL = -75.0
RECORDING_FLOOR_ZERO = -45.0
RECORDING_SNR_WEIGHT = 0.7
RECORDING_FLOOR_WEIGHT = 0.3
RECORDING_HEADROOM_FULL = -6.0
RECORDING_HEADROOM_ZERO = -1.0
RECORDING_LEVEL_TARGET = -23.0
RECORDING_DEFICIT_FULL = 6.0
RECORDING_DEFICIT_ZERO = 18.0
RECORDING_LRA_FULL = 13.0
RECORDING_LRA_ZERO = 22.0
RECORDING_DEFICIT_WEIGHT = 0.6
RECORDING_LRA_WEIGHT = 0.4

# gain-advice anchors (ref: advice.go:28-40)
GAIN_ADVICE_TARGET_TP = -6.0
GAIN_ADVICE_HOT_TP = -1.0
GAIN_ADVICE_QUIET_TP = -12.0


@dataclass
class QualityScore:
    """(ref: QualityScore, quality.go:9-14)."""

    score: float = 0.0
    stars: int = 0
    label: str = "Poor"


def linear_score(v: float, full: float, zero: float) -> float:
    """Direction-agnostic linear ramp: 1.0 at full, 0.0 at zero
    (ref: linearScore, recording.go:77-87)."""
    if full == zero:
        return 1.0 if v == full else 0.0
    t = (v - zero) / (full - zero)
    return min(1.0, max(0.0, t))


def stars_for_score(score: float) -> tuple[int, str]:
    for lo, stars, label in STAR_BANDS:
        if score >= lo:
            return stars, label
    return 1, "Poor"


# ---------------------------------------------------------------------------
# display resolvers (ref: quality.go:143-259)
# ---------------------------------------------------------------------------

def input_room_tone_floor_db(m: AudioMeasurements | None) -> tuple[float, bool]:
    """Canonical input room-tone astats-RMS floor (ref:
    InputRoomToneFloorDB, quality.go:169-186)."""
    if m is None or m.vad.elected_room_tone_sample is None:
        return 0.0, False
    floor = m.vad.elected_room_tone_sample.rms_level
    if floor == 0 or math.isnan(floor) or math.isinf(floor):
        return 0.0, False
    return floor, True


def input_display_noise_floor_db(m: AudioMeasurements | None) -> tuple[float, bool]:
    """The displayed input floor: astats room-tone RMS normally; for
    voice-activated captures the VAD momentary-LUFS floor (ref:
    InputDisplayNoiseFloorDB, quality.go:188-211)."""
    if m is not None and m.noise.voice_activated and m.vad.noise_profile is not None:
        f = m.vad.noise_profile.measured_noise_floor
        if f != 0 and not math.isnan(f) and not math.isinf(f):
            return f, True
    return input_room_tone_floor_db(m)


def final_room_tone_rms(result: ProcessResult) -> tuple[float, bool]:
    sample = result.final.room_tone_sample
    if sample is None:
        return 0.0, False
    return sample.rms_level, True


# ---------------------------------------------------------------------------
# processed-output quality (ref: ComputeQualityScore, quality.go:67-141)
# ---------------------------------------------------------------------------

def compute_quality_score(result: ProcessResult | None) -> QualityScore:
    if result is None:
        return QualityScore(stars=0, label="Poor")

    target = result.normalisation.requested_target_i or NORM_TARGET_LUFS
    loudness = linear_score(
        abs(result.normalisation.output_lufs - target),
        QUALITY_LOUDNESS_TIGHT_TOL, QUALITY_LOUDNESS_LOOSE_TOL,
    )
    true_peak = linear_score(result.normalisation.output_tp, QUALITY_TP_SAFE, QUALITY_TP_HOT)

    floor, ok = final_room_tone_rms(result)
    if not ok:
        floor, ok = input_room_tone_floor_db(result.measurements)
    if not ok:
        noise = 0.0
    elif math.isinf(floor) and floor < 0:
        noise = 1.0  # digital silence is maximally clean
    else:
        noise = linear_score(floor, QUALITY_NOISE_CLEAN_FLOOR, QUALITY_NOISE_DIRTY_FLOOR)

    composite = 100.0 * (
        QUALITY_WEIGHT_LOUDNESS * loudness
        + QUALITY_WEIGHT_TRUE_PEAK * true_peak
        + QUALITY_WEIGHT_NOISE * noise
    )
    stars, label = stars_for_score(composite)
    return QualityScore(score=composite, stars=stars, label=label)


# ---------------------------------------------------------------------------
# recording (input capture) score (ref: ComputeRecordingScore, recording.go)
# ---------------------------------------------------------------------------

def _floor_or_zero(m: AudioMeasurements) -> float:
    """(ref: floorOrZero — momentary-LUFS axis floor, or 0 = maximally dirty)."""
    if m.vad.noise_profile is None:
        return 0.0
    return m.vad.noise_profile.measured_noise_floor


def compute_recording_score(m: AudioMeasurements | None) -> QualityScore:
    if m is None:
        return QualityScore(stars=0, label="Poor")

    floor_score = linear_score(_floor_or_zero(m), RECORDING_FLOOR_FULL, RECORDING_FLOOR_ZERO)
    speech = m.vad.speech_profile
    if speech is None:
        cleanliness = floor_score
    else:
        snr_gap = speech.sample.momentary_lufs - _floor_or_zero(m)
        snr_score = linear_score(snr_gap, RECORDING_SNR_FULL, RECORDING_SNR_ZERO)
        cleanliness = RECORDING_SNR_WEIGHT * snr_score + RECORDING_FLOOR_WEIGHT * floor_score

    headroom = linear_score(m.loudness.input_tp, RECORDING_HEADROOM_FULL, RECORDING_HEADROOM_ZERO)

    deficit = max(0.0, RECORDING_LEVEL_TARGET - m.loudness.input_i)
    deficit_score = linear_score(deficit, RECORDING_DEFICIT_FULL, RECORDING_DEFICIT_ZERO)
    lra_score = linear_score(m.loudness.input_lra, RECORDING_LRA_FULL, RECORDING_LRA_ZERO)
    level = RECORDING_DEFICIT_WEIGHT * deficit_score + RECORDING_LRA_WEIGHT * lra_score

    composite = 100.0 * (
        RECORDING_WEIGHT_CLEANLINESS * cleanliness
        + RECORDING_WEIGHT_HEADROOM * headroom
        + RECORDING_WEIGHT_LEVEL * level
    )
    stars, label = stars_for_score(composite)
    return QualityScore(score=composite, stars=stars, label=label)


# ---------------------------------------------------------------------------
# gain advice (ref: GainAdvice, advice.go:60-89)
# ---------------------------------------------------------------------------

@dataclass
class GainAdviceResult:
    kind: str            # "fine" | "quiet" | "hot" | "clipping"
    input_tp: float
    delta_db: float

    def message(self) -> str:
        """(ref: Message, advice.go:97-117)."""
        if self.kind == "clipping":
            return (f"Clipping. Peaks at {self.input_tp:+.1f} ㏈TP. "
                    f"Lower input gain ~{abs(self.delta_db):.0f} ㏈.")
        if self.kind == "hot":
            return (f"Hot. Peaks at {self.input_tp:+.1f} ㏈TP. "
                    f"Lower input gain ~{abs(self.delta_db):.0f} ㏈.")
        if self.kind == "quiet":
            return (f"Quiet. Peaks at {self.input_tp:+.1f} ㏈TP. "
                    f"Raise input gain ~{abs(self.delta_db):.0f} ㏈.")
        return f"Level well set. Peaks at {self.input_tp:+.1f} ㏈TP. No action required."


def _round_half_away(x: float) -> float:
    """Go math.Round semantics (half away from zero); Python's round is
    half-to-even, which diverges at exact .5 deltas."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def gain_advice(input_tp: float) -> GainAdviceResult:
    """4-state advice on the input true peak alone."""
    lower_delta = -_round_half_away(input_tp - GAIN_ADVICE_TARGET_TP)
    if input_tp >= 0:
        return GainAdviceResult("clipping", input_tp, lower_delta)
    if input_tp > GAIN_ADVICE_HOT_TP:
        return GainAdviceResult("hot", input_tp, lower_delta)
    if input_tp < GAIN_ADVICE_QUIET_TP:
        return GainAdviceResult("quiet", input_tp, _round_half_away(GAIN_ADVICE_TARGET_TP - input_tp))
    return GainAdviceResult("fine", input_tp, 0.0)

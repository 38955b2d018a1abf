"""Quality scoring + gain advice (ref: internal/processor/quality.go,
recording.go, advice.go)."""

from .scores import (
    GainAdviceResult,
    QualityScore,
    compute_quality_score,
    compute_recording_score,
    gain_advice,
    input_display_noise_floor_db,
    input_room_tone_floor_db,
    linear_score,
    stars_for_score,
)

__all__ = [
    "GainAdviceResult",
    "QualityScore",
    "compute_quality_score",
    "compute_recording_score",
    "gain_advice",
    "input_display_noise_floor_db",
    "input_room_tone_floor_db",
    "linear_score",
    "stars_for_score",
]

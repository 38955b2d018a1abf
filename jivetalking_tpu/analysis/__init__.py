"""Pass-1 analysis layer: interval engine, VAD, elections, band measures.

Behavioural rebuild of the reference's analyser family
(ref: internal/processor/analyser*.go)."""

from .analyser import AudioMeasurements, analyse_audio
from .intervals import Intervals, build_intervals
from .types import (
    GateStatistics,
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
    VADResult,
)
from .vad import detect_voice_activity, estimate_noise_floor_seed

__all__ = [
    "AudioMeasurements",
    "analyse_audio",
    "Intervals",
    "build_intervals",
    "GateStatistics",
    "NoiseProfile",
    "Region",
    "RegionSample",
    "SpeechCandidate",
    "VADResult",
    "detect_voice_activity",
    "estimate_noise_floor_seed",
]

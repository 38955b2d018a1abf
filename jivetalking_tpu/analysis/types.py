"""Analysis-layer value types (behavioural mirror of the reference's
measurement structs, ref: internal/processor/analyser.go:28-250).

All times are float seconds (the reference uses time.Duration ns; the JSON
layer converts).  All levels carry their axis in the field name discipline:
momentary-LUFS vs astats-RMS dBFS are never mixed (ref AGENTS.md
"Measurement axes")."""

from __future__ import annotations

from dataclasses import dataclass, field

from ..metering.spectral import SpectralMetrics


@dataclass
class Region:
    start: float
    end: float

    @property
    def duration(self) -> float:
        return self.end - self.start


@dataclass
class RegionSample:
    """Per-region amplitude/spectral/loudness subset
    (ref: internal/processor/analyser.go RegionSample)."""

    rms_level: float = 0.0          # dBFS (astats axis)
    peak_level: float = 0.0         # dBFS
    crest_factor: float = 0.0       # peak - rms, dB
    spectral: SpectralMetrics = field(default_factory=SpectralMetrics)
    momentary_lufs: float = 0.0
    short_term_lufs: float = 0.0
    true_peak: float = 0.0          # dBTP
    sample_peak: float = 0.0        # dBFS


@dataclass
class NoiseProfile:
    """Measurements from the elected room-tone region
    (ref: internal/processor/analyser.go NoiseProfile)."""

    start: float = 0.0
    duration: float = 0.0
    measured_noise_floor: float = 0.0   # overwritten with VAD percentile floor
    peak_level: float = 0.0
    crest_factor: float = 0.0
    entropy: float = 0.0                # spectral-entropy average (reference quirk)
    extraction_warning: str = ""
    spectral: SpectralMetrics = field(default_factory=SpectralMetrics)
    band_noise: list = field(default_factory=list)  # per-afftdn-band RMS dBFS
    bands_measured: bool = False
    original_start: float = 0.0
    original_duration: float = 0.0
    was_refined: bool = False


@dataclass
class SpeechCandidate:
    """A scored speech-region candidate
    (ref: internal/processor/analyser.go SpeechCandidateMetrics)."""

    region: Region
    sample: RegionSample
    voicing_density: float = 0.0
    body_band_rms: float = 0.0      # 1-3 kHz, dBFS
    sib_band_rms: float = 0.0       # 6-9 kHz, dBFS
    bands_measured: bool = False
    score: float = 0.0
    original_start: float = 0.0
    original_duration: float = 0.0
    was_refined: bool = False


@dataclass
class GateStatistics:
    """Gate-window stats on the VAD level axis
    (ref: internal/processor/analyser_vad.go deriveGateStatistics)."""

    voiced_low_percentile: float = 0.0
    noise_high_percentile: float = 0.0
    separation_db: float = 0.0


@dataclass
class VADResult:
    split: float = 0.0
    floor: float = 0.0
    margin: float = 0.0
    gap_tolerance_intervals: int = 0
    speech_regions: list = field(default_factory=list)      # [Region]
    speech_candidates: list = field(default_factory=list)   # [SpeechCandidate]
    speech_profile: SpeechCandidate | None = None
    noise_region: Region | None = None
    noise_profile: NoiseProfile | None = None
    elected_room_tone_sample: RegionSample | None = None
    gate_stats: GateStatistics = field(default_factory=GateStatistics)
    floored_fraction: float = 0.0
    voice_activated: bool = False

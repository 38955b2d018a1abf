"""Filter configuration model: the per-file tunable parameter set.

Behavioural rebuild of the reference's config structs + defaults
(ref: internal/processor/filters.go:340-532).  `BaseFilterConfig` is the
caller-owned seed; `EffectiveFilterConfig` is the per-file derived copy the
adaptation layer mutates (ref: filters.go:277-281, 347-349).  There is no
user config file by design — all tuning lives here plus `adapt_config`.
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field

from ..utils.units import db_to_linear

# Pass-2 chain order (ref: filters.go:58-68)
PASS2_FILTER_ORDER = (
    "downmix",
    "rumble_highpass",
    "bandlimit_lowpass",
    "noise_reduction",
    "speech_gate",
    "levelling_compressor",
    "deesser",
    "analysis",
    "resample",
)

NORM_TARGET_LUFS = -16.0   # ref: filters.go:76
NORM_TOLERANCE_LU = 0.5    # ref: filters.go:80

RUMBLE_HP_FREQ = 80.0      # ref: filters.go:104
BANDLIMIT_LP_FREQ = 20500.0

# anlmdn production constants (ref: filters.go:95-100)
NR_STRENGTH = 0.00001
NR_PATCH_SEC = 0.0060
NR_RESEARCH_SEC = 0.0020
NR_SMOOTH = 3.0

SPEECH_GATE_ATTACK_MS = 5.0
SPEECH_GATE_RELEASE_MS = 200.0
SPEECH_GATE_DEPTH_DB = 14.0
SPEECH_GATE_KNEE = 3.0


@dataclass
class BiquadFilterConfig:
    """(ref: defaultBiquadConfig, filters.go:441-451)."""

    enabled: bool = True
    frequency: float = 0.0
    poles: int = 2
    width: float = 0.707
    mix: float = 1.0
    transform: str = "tdii"


@dataclass
class NoiseReductionConfig:
    """anlmdn + afftdn tail (ref: defaultNoiseReductionConfig, filters.go:461-476)."""

    enabled: bool = True
    strength: float = NR_STRENGTH
    patch_sec: float = NR_PATCH_SEC
    research_sec: float = NR_RESEARCH_SEC
    smooth: float = NR_SMOOTH
    afftdn_enabled: bool = True
    afftdn_noise_reduction: float = 12.0
    afftdn_noise_type: str = "w"
    afftdn_track_noise: bool = True
    afftdn_noise_floor: float = 0.0        # 0 = unset (omit nf)
    afftdn_band_noise: list = field(default_factory=list)  # per-band shape, dB


@dataclass
class SpeechGateConfig:
    """(ref: defaultSpeechGateConfig, filters.go:478-492)."""

    enabled: bool = True
    threshold: float = 0.01    # linear amplitude (-40 dBFS)
    ratio: float = 2.0
    attack: float = SPEECH_GATE_ATTACK_MS
    release: float = SPEECH_GATE_RELEASE_MS
    range: float = db_to_linear(-SPEECH_GATE_DEPTH_DB)
    knee: float = SPEECH_GATE_KNEE
    makeup: float = 1.0
    detection: str = "rms"


@dataclass
class LevellingCompressorConfig:
    """(ref: defaultLevellingCompressorConfig, filters.go:494-505)."""

    enabled: bool = True
    threshold: float = -18.0   # dBFS
    ratio: float = 3.0
    attack: float = 10.0
    release: float = 200.0
    makeup: float = 0.0
    knee: float = 4.0
    mix: float = 1.0


@dataclass
class DeesserConfig:
    """(ref: defaultDeesserConfig, filters.go:507-511)."""

    enabled: bool = True
    intensity: float = 0.0
    amount: float = 0.50       # m: ~12 dB max-cut cap
    frequency: float = 0.80    # f: corner ~7.5 kHz


@dataclass
class AdeclickConfig:
    """(ref: defaultAdeclickConfig, filters.go:513-521)."""

    enabled: bool = True
    threshold: float = 1.7
    window: float = 55.0
    overlap: float = 50.0
    method: str = "s"


@dataclass
class LoudnormConfig:
    """(ref: defaultLoudnormConfig, filters.go:523-532)."""

    enabled: bool = True
    target_i: float = NORM_TARGET_LUFS
    target_tp: float = -1.0
    target_lra: float = 20.0
    dual_mono: bool = True
    linear: bool = True


@dataclass
class ResampleConfig:
    """(ref: defaultResampleConfig, filters.go:430-437)."""

    enabled: bool = True
    sample_rate: int = 44100
    format: str = "s16"
    frame_size: int = 4096


@dataclass
class FilterConfig:
    """The full per-file parameter set (ref: filterConfigDefaults)."""

    rumble_highpass: BiquadFilterConfig = field(
        default_factory=lambda: BiquadFilterConfig(frequency=RUMBLE_HP_FREQ)
    )
    bandlimit_lowpass: BiquadFilterConfig = field(
        default_factory=lambda: BiquadFilterConfig(frequency=BANDLIMIT_LP_FREQ)
    )
    noise_reduction: NoiseReductionConfig = field(default_factory=NoiseReductionConfig)
    speech_gate: SpeechGateConfig = field(default_factory=SpeechGateConfig)
    levelling_compressor: LevellingCompressorConfig = field(default_factory=LevellingCompressorConfig)
    deesser: DeesserConfig = field(default_factory=DeesserConfig)
    adeclick: AdeclickConfig = field(default_factory=AdeclickConfig)
    loudnorm: LoudnormConfig = field(default_factory=LoudnormConfig)
    resample: ResampleConfig = field(default_factory=ResampleConfig)
    filter_order: tuple = PASS2_FILTER_ORDER


# naming parity with the reference's seed/derived split
BaseFilterConfig = FilterConfig


def default_filter_config() -> FilterConfig:
    """(ref: DefaultFilterConfig, filters.go:353)."""
    return FilterConfig()


def derive_effective_config(base: FilterConfig) -> FilterConfig:
    """Per-file deep copy of the caller's seed — adaptation mutates the copy,
    never the base (ref: deriveEffectiveFilterConfig / CloneForWorker,
    filters.go:368-373)."""
    return copy.deepcopy(base)

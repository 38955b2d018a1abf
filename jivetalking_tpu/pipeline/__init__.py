"""Pass 2/3/4 pipeline: filter chain, normalisation contract, 4-pass driver
(ref: internal/processor/processor.go, normalise.go)."""

from .normalise import (
    NormalisationResult,
    SilentAudioError,
    apply_normalisation,
    calculate_limiter_ceiling,
    calculate_linear_mode_target,
    calculate_pre_gain,
    loudnorm_internal_target_tp,
    plan_limiter,
)
from .pass2 import apply_filter_chain, downmix, output_resample
from .process import OutputMeasurements, ProcessResult, analyse_only, process_audio

__all__ = [
    "NormalisationResult",
    "SilentAudioError",
    "apply_normalisation",
    "calculate_limiter_ceiling",
    "calculate_linear_mode_target",
    "calculate_pre_gain",
    "loudnorm_internal_target_tp",
    "plan_limiter",
    "apply_filter_chain",
    "downmix",
    "output_resample",
    "OutputMeasurements",
    "ProcessResult",
    "analyse_only",
    "process_audio",
]

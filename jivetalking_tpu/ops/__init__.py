"""DSP kernels: biquads/FIR, dynamics (gate/compressor), lookahead limiter,
spectral denoise, NLM denoise, de-esser, resampler, declick.

All kernels are TPU-first: batched rFFT convolutions, parallel associative
scans for recurrences, stencils for local repair — no sequential sample
loops (ref DSP engine being replaced: FFmpeg libavfilter via cgo, SURVEY.md
§2.1)."""

from .declick import apply_declick
from .deesser import apply_deesser
from .dynamics import apply_compressor, apply_gate, attack_release_follower
from .iir import (
    cascade,
    design_highpass,
    design_lowpass,
    fir_convolve_long,
    sos_impulse_response,
    sosfilt_fir,
    sosfilt_scan,
)
from .limiter import apply_limiter
from .nlm import apply_nlm
from .resample import resample
from .spectral_gate import apply_spectral_gate

__all__ = [
    "apply_declick",
    "apply_deesser",
    "apply_compressor",
    "apply_gate",
    "attack_release_follower",
    "cascade",
    "design_highpass",
    "design_lowpass",
    "fir_convolve_long",
    "sos_impulse_response",
    "sosfilt_fir",
    "sosfilt_scan",
    "apply_limiter",
    "apply_nlm",
    "resample",
    "apply_spectral_gate",
]

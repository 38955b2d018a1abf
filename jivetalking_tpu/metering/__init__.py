from .astats import AstatsResult, measure_astats
from .ebur128 import LoudnessResult, k_weight, measure_loudness
from .spectral import (
    SpectralFrameSeries,
    SpectralMetrics,
    measure_spectral,
    spectral_frames,
)
from .truepeak import sample_peak_linear, true_peak_linear

"""Region re-measurement on processed audio.

Behavioural rebuild of `MeasureOutputRegions` (ref: internal/processor/
analyser_output.go:18-120): the reference seeks -5 s before the region and
runs an `atrim`-scoped astats + aspectralstats + ebur128 graph per region.
Here the processed PCM is already on device, so a region measure is a slice
+ the fused metering kernels — no decode, no pre-roll seek."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..metering.astats import measure_astats
from ..metering.ebur128 import measure_loudness
from ..metering.spectral import measure_spectral
from .types import Region, RegionSample


def measure_region(x, sample_rate: int, region: Region) -> RegionSample | None:
    """astats/spectral/loudness RegionSample over [start, end) of `x`
    (ref: analyser_output.go RegionSample assembly)."""
    x = jnp.asarray(x)
    n = int(x.shape[0])
    s = max(0, int(round(region.start * sample_rate)))
    e = min(n, int(round(region.end * sample_rate)))
    if e <= s:
        return None
    seg = x[s:e]

    ast = measure_astats(seg, sample_rate)
    spec = measure_spectral(seg, sample_rate)
    loud = measure_loudness(seg, sample_rate)

    mom = loud.momentary_lufs
    st = loud.short_term_lufs
    return RegionSample(
        rms_level=ast.rms_level,
        peak_level=ast.peak_level,
        crest_factor=ast.peak_level - ast.rms_level,
        spectral=spec,
        momentary_lufs=float(np.mean(mom)) if mom.size else -120.0,
        short_term_lufs=float(np.mean(st)) if st.size else -120.0,
        true_peak=loud.true_peak_db,
        sample_peak=loud.sample_peak_db,
    )

"""The 4-pass mastering driver.

Behavioural rebuild of `ProcessAudio` (ref: internal/processor/
processor.go:78-216) and `AnalyseOnlyDetailed` (processor.go:29-69):

    PASS 1    analyse_audio            (metering + VAD + bands)
    PASS 1.5  adapt_config             (pure function)
    PASS 2    apply_filter_chain       (cleanup chain on device)
              + output metering + region re-measure on the filtered audio
    PASS 3/4  apply_normalisation      (limiter plan, linear gain, adeclick,
              brickwall, final metering) + final region re-measure
    publish   resample to 44.1 kHz s16 (the chain-final FilterResample)

Where the reference round-trips FLAC files between passes (temp file +
atomic rename, processor.go:206-214), this pipeline keeps the PCM resident
on device across all passes; the host I/O layer owns the atomic publish.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..adaptive.adapt import AdaptiveDiagnostics, adapt_config
from ..adaptive.config import FilterConfig, default_filter_config
from ..analysis.analyser import AudioMeasurements, analyse_audio
from ..analysis.regions import measure_region
from ..analysis.types import RegionSample
from ..metering.astats import AstatsResult, measure_astats
from ..metering.ebur128 import LoudnessResult, measure_loudness
from ..metering.spectral import SpectralMetrics, measure_spectral
from .normalise import NormalisationResult, apply_normalisation
from .pass2 import apply_filter_chain, downmix, output_resample


@dataclass
class OutputMeasurements:
    """Pass-2 (Filtered) / Pass-4 (Final) stage metering
    (ref: OutputMeasurements, analyser.go:252-287)."""

    loudness: LoudnessResult | None = None
    astats: AstatsResult | None = None
    spectral: SpectralMetrics = field(default_factory=SpectralMetrics)
    room_tone_sample: RegionSample | None = None
    speech_sample: RegionSample | None = None


@dataclass
class ProcessResult:
    """Everything a caller (CLI pool, reports, UI) needs from one file
    (ref: ProcessingResult, processor.go + pool.go wiring)."""

    measurements: AudioMeasurements
    effective_config: FilterConfig
    diagnostics: AdaptiveDiagnostics
    filtered: OutputMeasurements
    final: OutputMeasurements
    normalisation: NormalisationResult
    output_audio: np.ndarray          # final PCM at output_rate, float32
    output_rate: int
    pass_timings: dict = field(default_factory=dict)   # pass name -> seconds


def _measure_output(x, sample_rate: int, m: AudioMeasurements) -> OutputMeasurements:
    out = OutputMeasurements(
        loudness=measure_loudness(x, sample_rate),
        astats=measure_astats(x, sample_rate),
        spectral=measure_spectral(x, sample_rate),
    )
    if m.vad.noise_region is not None:
        out.room_tone_sample = measure_region(x, sample_rate, m.vad.noise_region)
    if m.vad.speech_profile is not None:
        out.speech_sample = measure_region(x, sample_rate, m.vad.speech_profile.region)
    return out


def analyse_only(
    x,
    sample_rate: int,
    base_config: FilterConfig | None = None,
) -> tuple[AudioMeasurements, FilterConfig, AdaptiveDiagnostics]:
    """-a mode: Pass 1 + AdaptConfig only (ref: AnalyseOnlyDetailed,
    processor.go:29-69)."""
    cfg = base_config or default_filter_config()
    mono = downmix(x)
    m = analyse_audio(mono, sample_rate, target_i=cfg.loudnorm.target_i)
    eff, diag = adapt_config(cfg, m)
    return m, eff, diag


def process_audio(
    x,
    sample_rate: int,
    base_config: FilterConfig | None = None,
    progress=None,
    on_adapted=None,
) -> ProcessResult:
    """Full 4-pass master of (channels, n) or (n,) PCM at `sample_rate`.

    `progress`, when given, is called as progress(pass_name, fraction).
    `on_adapted`, when given, is called as on_adapted(effective_config,
    diagnostics, measurements) right after Pass 1.5 (the reference's
    AdaptedSummaryMsg at Pass-2 start, ref: pool.go:193-222)."""
    cfg_base = base_config or default_filter_config()

    def report(stage, frac):
        if progress is not None:
            progress(stage, frac)

    timings: dict[str, float] = {}
    mono = downmix(x)

    # PASS 1
    t0 = time.perf_counter()
    report("analysis", 0.0)
    m = analyse_audio(mono, sample_rate, target_i=cfg_base.loudnorm.target_i)
    timings["analysis"] = time.perf_counter() - t0
    report("analysis", 1.0)

    # PASS 1.5
    eff, diag = adapt_config(cfg_base, m)
    if on_adapted is not None:
        try:
            on_adapted(eff, diag, m)
        except Exception:
            pass

    # PASS 2
    t0 = time.perf_counter()
    report("processing", 0.0)
    filtered_audio = apply_filter_chain(mono, sample_rate, eff)
    filtered = _measure_output(filtered_audio, sample_rate, m)
    timings["processing"] = time.perf_counter() - t0
    report("processing", 1.0)

    # PASS 3 + 4
    t0 = time.perf_counter()
    report("normalising", 0.0)
    final_audio, norm = apply_normalisation(filtered_audio, sample_rate, eff)
    final = _measure_output(final_audio, sample_rate, m)
    timings["normalising"] = time.perf_counter() - t0
    report("normalising", 1.0)

    # chain-final resample (FilterResample: 44.1 kHz s16 delivery format)
    out_audio, out_rate = output_resample(final_audio, sample_rate, eff)
    out_np = np.asarray(jnp.clip(out_audio, -1.0, 1.0), dtype=np.float32)

    return ProcessResult(
        measurements=m,
        effective_config=eff,
        diagnostics=diag,
        filtered=filtered,
        final=final,
        normalisation=norm,
        output_audio=out_np,
        output_rate=out_rate,
        pass_timings=timings,
    )

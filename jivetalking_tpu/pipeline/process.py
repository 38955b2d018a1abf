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
from .normalise import NormalisationResult, SilentAudioError, apply_normalisation
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
    output_audio: np.ndarray          # final PCM at output_rate, int16
    output_rate: int
    pass_timings: dict = field(default_factory=dict)   # pass name -> seconds
    # deferred delivery (process_audio(defer_output_pull=True)): the device
    # buffers whose async pulls are in flight; output_audio is None until
    # finish_output_pull(result) materialises it.  Lets a pool overlap file
    # N's multi-MB downlink with file N+1's compute from a separate thread.
    output_chunks: list = field(default=None, repr=False)


def finish_output_pull(result: "ProcessResult") -> np.ndarray:
    """Materialise a deferred delivery pull (see ProcessResult.output_chunks).
    Idempotent; returns the int16 PCM and caches it on the result."""
    if result.output_audio is None and result.output_chunks is not None:
        result.output_audio = np.concatenate(
            [np.asarray(c) for c in result.output_chunks])
        result.output_chunks = None
    return result.output_audio


def _pull_pcm(dev) -> np.ndarray:
    """Device->host pull of the delivery PCM.  The remote-TPU tunnel moves
    one buffer at ~15-25 MB/s but overlaps concurrent transfers, so a large
    pull goes as four async chunk copies (~25-30% faster, measured
    2026-08-16); small buffers pull directly."""
    import jax

    n = int(dev.shape[0])
    if n < (1 << 21):
        return np.asarray(dev)
    k = 4
    bounds = [(i * n) // k for i in range(k + 1)]
    slices = [jax.lax.slice(dev, (bounds[i],), (bounds[i + 1],)) for i in range(k)]
    for s in slices:
        s.copy_to_host_async()
    return np.concatenate([np.asarray(s) for s in slices])


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
    processor.go:29-69).  Downmix happens inside the fused analysis
    program."""
    cfg = base_config or default_filter_config()
    m = analyse_audio(x, sample_rate, target_i=cfg.loudnorm.target_i)
    eff, diag = adapt_config(cfg, m)
    return m, eff, diag


def _loudness_from_fused(d: dict, sample_rate: int) -> LoudnessResult:
    """Assemble a LoudnessResult from the fused program's loudness dict."""
    import math

    mom = np.asarray(d["momentary"], dtype=np.float64)
    st = np.asarray(d["short_term"], dtype=np.float64)
    sp = float(d["sample_peak"])
    tp = float(d["true_peak"])
    hop = max(1, int(round(sample_rate * 0.1))) / sample_rate
    return LoudnessResult(
        integrated_lufs=float(d["integrated"]),
        lra_lu=float(d["lra"]),
        lra_low_lufs=float(d["lra_low"]),
        lra_high_lufs=float(d["lra_high"]),
        threshold_lufs=float(d["rel_thresh"]),
        sample_peak_db=20.0 * math.log10(sp) if sp > 0 else -150.0,
        true_peak_db=20.0 * math.log10(tp) if tp > 0 else -150.0,
        momentary_max_lufs=float(mom.max()) if mom.size else -150.0,
        short_term_max_lufs=float(st.max()) if st.size else -150.0,
        momentary_lufs=mom,
        short_term_lufs=st,
        block_starts_sec=np.arange(mom.size, dtype=np.float64) * hop,
    )


def _spectral_from_means(d: dict) -> SpectralMetrics:
    return SpectralMetrics(**{k: float(v) for k, v in d.items()}, found=True)


def _region_from_fused(d: dict, present: bool) -> RegionSample | None:
    """RegionSample from the fused masked region dict.  True peak is the
    in-graph 4x-oversampled masked maximum (fused._region_sample_ingraph),
    matching the unfused measure_region within the boundary-ring tolerance."""
    import math

    if not present:
        return None
    rms = float(d["rms"])
    peak = float(d["peak"])
    tp = float(d.get("tp", peak))
    rms_db = 20.0 * math.log10(rms) if rms > 0 else -150.0
    peak_db = 20.0 * math.log10(peak) if peak > 0 else -150.0
    tp_db = 20.0 * math.log10(tp) if tp > 0 else -150.0
    spec = {k[5:]: float(v) for k, v in d.items() if k.startswith("spec_")}
    return RegionSample(
        rms_level=rms_db,
        peak_level=peak_db,
        crest_factor=peak_db - rms_db,
        spectral=SpectralMetrics(**spec, found=True) if spec else SpectralMetrics(),
        momentary_lufs=float(d["momentary"]),
        short_term_lufs=float(d["momentary"]),
        true_peak=tp_db,
        sample_peak=peak_db,
    )


def assemble_fused_stage_results(
    fm: dict,
    m: AudioMeasurements,
    eff: FilterConfig,
    sample_rate: int,
    n_mono: int,
) -> tuple[OutputMeasurements, OutputMeasurements, NormalisationResult]:
    """Host assembly of the filtered/final stage measurements and the
    NormalisationResult from a fused master's metrics tree (`fused_master`
    / `fused_master_chunked` / the batched back-catalogue master all emit
    the same tree shape).  Raises SilentAudioError on un-normalisable
    input (ref: normalise.go:840-842)."""
    from ..metering.astats import assemble_astats

    has_noise = m.vad.noise_region is not None
    has_speech = m.vad.speech_profile is not None
    w = max(2, int(round(0.05 * sample_rate)))
    filtered = OutputMeasurements(
        loudness=_loudness_from_fused(fm["filtered"], sample_rate),
        astats=assemble_astats(fm["filtered_astats"], n_mono, w),
        spectral=_spectral_from_means(fm["filtered_spectral"]),
        room_tone_sample=_region_from_fused(fm["regions"]["filtered_noise"], has_noise),
        speech_sample=_region_from_fused(fm["regions"]["filtered_speech"], has_speech),
    )
    final = OutputMeasurements(
        loudness=_loudness_from_fused(fm["final"], sample_rate),
        astats=assemble_astats(fm["final_astats"], n_mono, w),
        spectral=_spectral_from_means(fm["final_spectral"]),
        room_tone_sample=_region_from_fused(fm["regions"]["final_noise"], has_noise),
        speech_sample=_region_from_fused(fm["regions"]["final_speech"], has_speech),
    )

    plan = fm["plan"]
    measured_i = float(plan["measured_i"])
    if not np.isfinite(measured_i) or measured_i < -70.0:
        raise SilentAudioError("cannot normalise silent audio")
    norm = NormalisationResult(
        input_lufs=measured_i,
        input_tp=float(plan["measured_tp_db"]),
        output_lufs=final.loudness.integrated_lufs,
        output_tp=final.loudness.true_peak_db,
        gain_applied_db=float(plan["offset_db"]),
        within_target=abs(final.loudness.integrated_lufs - float(plan["effective_i"])) <= 0.5,
        requested_target_i=eff.loudnorm.target_i,
        effective_target_i=float(plan["effective_i"]),
        linear_mode_forced=bool(float(plan["effective_i"]) < eff.loudnorm.target_i - 1e-6),
        limiter_enabled=bool(plan["needed"]),
        limiter_ceiling_dbtp=float(plan["ceiling_db"]) if bool(plan["needed"]) else 0.0,
        limiter_gain_db=float(plan["gain_db"]),
        limiter_filtered_tp=filtered.loudness.true_peak_db,
        pre_gain_db=float(plan["pre_gain_db"]),
        limiter_clamped=bool(plan["clamped"]),
        final_loudness=final.loudness,
    )
    return filtered, final, norm


def process_audio(
    x,
    sample_rate: int,
    base_config: FilterConfig | None = None,
    progress=None,
    on_adapted=None,
    fused: bool = True,
    on_filtered_levels=None,
    on_limiter_plan=None,
    defer_output_pull: bool = False,
) -> ProcessResult:
    """Full 4-pass master of (channels, n) or (n,) PCM at `sample_rate`.

    `progress`, when given, is called as progress(pass_name, fraction).
    `on_adapted`, when given, is called as on_adapted(effective_config,
    diagnostics, measurements) right after Pass 1.5 (the reference's
    AdaptedSummaryMsg at Pass-2 start, ref: pool.go:193-222).

    `fused=True` (default) runs passes 2-4 as ONE compiled device program
    (pipeline/fused.py) — same numerical contract, ~30x fewer device
    round trips.  `fused=False` keeps the per-op path (the unit-tested
    reference implementation)."""
    cfg_base = base_config or default_filter_config()
    if not fused and hasattr(x, "read"):
        raise ValueError(
            "stream readers require the fused path (fused=False needs the "
            "whole PCM in memory)"
        )

    def report(stage, frac):
        if progress is not None:
            progress(stage, frac)

    timings: dict[str, float] = {}

    # PASS 1 (fused: raw PCM straight to device; downmix happens in-graph
    # and the mono f32 stays resident for the band/master programs)
    t0 = time.perf_counter()
    report("analysis", 0.0)
    if fused:
        m = analyse_audio(x, sample_rate, target_i=cfg_base.loudnorm.target_i)
        mono = m.device_pcm
    else:
        mono = downmix(x)
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

    from .chunked import should_chunk

    if fused:
        # PASSES 2+3+4 fused.  Whole-file: two chained device programs.
        # Hour-scale files (the reference's real ~45-min workload): the
        # chunked fused master — same maths over fixed-shape chunks with
        # carried state, per-chunk progress, bounded HBM.
        report("processing", 0.0)

        n_mono = int(mono.shape[0])
        chunk = should_chunk(n_mono, sample_rate)
        chunk_secs = 240.0
        # NOTE (measured 2026-08-17): routing tunnel-attached 5-min files
        # through the chunked master (75 s chunks) to overlap delivery
        # pulls with compute scored 88.9x vs the whole-file master's
        # 115.7x — the chunked form's three host sync points and chunk
        # halo overheads cost more than the ~0.7 s pull overlap saves.
        # Whole-file stays the sub-20-min path everywhere; the chunked
        # master's per-chunk early pulls still pay off where chunking is
        # structurally required (hour-scale files).
        if chunk:
            from .fused_chunked import fused_master_chunked

            started_norm = False

            def chunk_progress(frac):
                # chain+deess passes ~ pass 2; limit+B ~ passes 3/4.
                # Cadence contract (ref: TestApplyNormalisationProgressCadenceGuard,
                # normalise_test.go:937-1020): every pass opens with
                # (pass, 0.0) and closes with exactly (pass, 1.0)
                nonlocal started_norm
                if frac <= 0.55:
                    report("processing", min(1.0, frac / 0.55))
                else:
                    if not started_norm:
                        started_norm = True
                        report("processing", 1.0)
                        report("normalising", 0.0)
                    report("normalising", min(1.0, (frac - 0.55) / 0.45))

            out_chunks, out_rate, fm, fused_t = fused_master_chunked(
                mono, sample_rate, eff, m, progress=chunk_progress,
                chunk_secs=chunk_secs,
                on_filtered_levels=on_filtered_levels,
                on_limiter_plan=on_limiter_plan,
            )
        else:
            from .fused import fused_master

            def _stage_a_done():
                report("processing", 1.0)
                report("normalising", 0.0)

            out_chunks, out_rate, fm, fused_t = fused_master(
                mono, sample_rate, eff, m, on_stage_a_done=_stage_a_done,
                on_filtered_levels=on_filtered_levels,
                on_limiter_plan=on_limiter_plan,
            )

        filtered, final, norm = assemble_fused_stage_results(
            fm, m, eff, sample_rate, int(mono.shape[0])
        )
        # MEASURED stage walls (fused_master blocks per stage): stage A is
        # the pass-2 chain + filtered metering + limiter plan + pass-3
        # measure; stage B is the pass-3/4 gain + declick + brickwall +
        # final metering + delivery resample
        timings["processing"] = fused_t["stage_a"]
        timings["normalising"] = fused_t["stage_b"]
        report("normalising", 1.0)
        # chunk pulls were started async inside fused_master
        if defer_output_pull:
            return ProcessResult(
                measurements=m, effective_config=eff, diagnostics=diag,
                filtered=filtered, final=final, normalisation=norm,
                output_audio=None, output_rate=out_rate,
                pass_timings=timings, output_chunks=list(out_chunks),
            )
        out_np = np.concatenate([np.asarray(c) for c in out_chunks])
    else:
        # PASS 2
        t0 = time.perf_counter()
        report("processing", 0.0)
        if should_chunk(int(mono.shape[0]), sample_rate):
            from .chunked import apply_filter_chain_chunked

            filtered_audio = apply_filter_chain_chunked(mono, sample_rate, eff)
        else:
            filtered_audio = apply_filter_chain(mono, sample_rate, eff)
        filtered = _measure_output(filtered_audio, sample_rate, m)
        timings["processing"] = time.perf_counter() - t0
        report("processing", 1.0)

        # PASS 3 + 4
        t0 = time.perf_counter()
        report("normalising", 0.0)
        final_audio, norm = apply_normalisation(filtered_audio, sample_rate, eff)
        if on_limiter_plan is not None:
            try:
                on_limiter_plan(norm.limiter_enabled,
                                norm.limiter_ceiling_dbtp)
            except Exception:
                pass
        final = _measure_output(final_audio, sample_rate, m)
        timings["normalising"] = time.perf_counter() - t0
        report("normalising", 1.0)

        # chain-final resample (FilterResample: 44.1 kHz s16 delivery
        # format); quantise to s16 ON DEVICE so the pull is half the bytes
        # (the fused path does both inside the master program)
        out_audio, out_rate = output_resample(final_audio, sample_rate, eff)
        out_i16 = jnp.clip(
            jnp.round(out_audio * 32767.0), -32768.0, 32767.0
        ).astype(jnp.int16)
        out_np = _pull_pcm(out_i16)

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

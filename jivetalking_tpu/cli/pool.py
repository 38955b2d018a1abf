"""Bounded worker pool + per-file artefact emission spine.

Behavioural rebuild of cmd/jivetalking/pool.go:122-340:

  * jobs = max(1, min(num_files, NumCPU)) (ref: main.go:50-52) — here the
    bound applies to host-side work (decode/encode/report writes); the
    device passes serialise on the single accelerator queue naturally.
  * per-file error isolation: one file failing reports its error and the
    others continue (ref: pool.go:210-216).
  * artefact emission is non-fatal and isolated per artefact
    (ref: emitReportArtefacts, pool.go:288-340).
  * no-residue-on-cancel: output publish is atomic (dot-temp + rename) and
    cancellation checks run between passes (ref: main.go:136-151).
"""

from __future__ import annotations

import math
import os
import threading
import time

import numpy as np
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ..adaptive.config import FilterConfig, default_filter_config
from ..analysis.analyser import AudioMeasurements
from ..io.audio import open_audio_file, save_flac
from ..pipeline.process import ProcessResult, analyse_only, process_audio
from ..quality import compute_quality_score, compute_recording_score
from ..report import (
    Timings,
    analysis_record_path,
    analysis_report_path,
    candidates_sidecar_path,
    intervals_sidecar_path,
    new_analysis_run_record,
    new_run_record,
    output_audio_path,
    record_path,
    report_path,
    write_markdown_report,
    write_run_record,
)
from ..report.runrecord import write_candidates_sidecar, write_interval_sidecar


# Minimum pipeline depth when several files queue.  The reference bounds
# jobs by NumCPU because its FFmpeg workers are CPU-bound (main.go:50-52);
# here the DSP runs on the accelerator and a worker spends its life waiting
# on uploads/dispatches, so a small host must still keep >=3 files in
# flight to hide the wire behind neighbouring files (pipe3 measured 137.7x
# vs sequential 111.4x, scripts/bench_aggregate_experiment.py 2026-08-17).
_MIN_PIPELINE_JOBS = 3


def resolve_jobs(num_files: int, num_cpu: int) -> int:
    """jobs = max(1, min(files, max(NumCPU, 3))) — the reference's rule
    (ref: resolveJobs, main.go:50-52) with a pipeline floor: workers are
    device-I/O-bound, not CPU-bound, so CPU count alone must not throttle
    the file pipeline on small hosts."""
    return max(1, min(num_files, max(num_cpu, _MIN_PIPELINE_JOBS)))


# stream-decode any FLAC the streamed analysis would chunk anyway (>=60 s):
# the native decoder runs chunk-by-chunk BETWEEN uploads, so host decode
# overlaps the wire instead of preceding it, and host memory stays O(chunk)
STREAM_DECODE_THRESHOLD_SECS = 60.0


def _open_for_processing(path: str):
    """Decode for the processing path.  Hour-scale FLAC inputs return a
    bounded-memory FlacStreamReader (fed chunk-by-chunk into the streamed
    analysis; the PCM accumulates only on device); everything else decodes
    fully (16-bit sources as raw int16)."""
    from ..io.audio import AudioMetadata, open_audio_file

    if os.path.splitext(path)[1].lower() == ".flac":
        from ..io.flac import FlacStreamReader, flac_info

        n, channels, rate, bits = flac_info(path)
        if n > STREAM_DECODE_THRESHOLD_SECS * rate:
            meta = AudioMetadata(
                sample_rate=rate, channels=channels, num_samples=n,
                duration_secs=n / rate, format_name="flac",
                codec_name="flac", bit_depth=bits,
            )
            return FlacStreamReader(path), meta
    return open_audio_file(path, raw_int16=True)


@dataclass
class FileOutcome:
    """Per-file completion summary (ref: CompletionResult fields consumed by
    the done box, ui/views.go:646-860)."""

    path: str
    error: str = ""
    output_path: str = ""
    input_lufs: float = 0.0
    output_lufs: float = 0.0
    input_tp: float = 0.0
    output_tp: float = 0.0
    input_lra: float = 0.0
    output_lra: float = 0.0
    input_noise_floor: float | None = None
    output_noise_floor: float | None = None
    quality_stars: int = 0
    quality_label: str = ""
    recording_stars: int = 0
    recording_label: str = ""
    wall_secs: float = 0.0
    realtime_factor: float = 0.0
    # the .md report landed — the no-TTY confirmation line is suppressed
    # when it did not (ref: emitAnalysisReport reportWritten, main.go:498-520)
    report_written: bool = True
    result: ProcessResult | None = field(default=None, repr=False)
    measurements: AudioMeasurements | None = field(default=None, repr=False)


@dataclass
class PoolEvents:
    """Callbacks into the UI layer; every callback is optional and must be
    tolerant (the pool never fails on a UI error)."""

    on_file_start: callable = None
    on_duration: callable = None        # (path, audio_secs) once metadata is read
    on_progress: callable = None        # (path, pass_name, fraction)
    on_adapted: callable = None         # (path, AdaptedSummary)
    on_levels: callable = None          # (path, levels_db ndarray, hop_secs)
    on_limiter: callable = None         # (path, enabled, ceiling_dbtp)
    on_file_complete: callable = None   # (FileOutcome)
    on_warning: callable = None         # (str)
    on_debug: callable = None           # (path, str) -> serialised debug sink


def _emit(cb, *args) -> None:
    if cb is None:
        return
    try:
        cb(*args)
    except Exception:
        pass


def _emit_report_artefacts(
    path: str,
    outcome: FileOutcome,
    res: ProcessResult,
    diagnostics: bool,
    warn,
    spectrograms: list | None = None,
) -> None:
    """Write record + report (+ sidecars under --diagnostics); each write is
    isolated and non-fatal (ref: emitReportArtefacts, pool.go:288-340)."""
    rec = new_run_record(path, res)
    if spectrograms:
        rec["spectrograms"] = spectrograms
    t = res.pass_timings
    timings = Timings(
        analysis_s=t.get("analysis", 0.0),
        processing_s=t.get("processing", 0.0),
        normalising_s=t.get("normalising", 0.0),
        realtime_factor=outcome.realtime_factor,
    )
    for fn, target in (
        (lambda p: write_run_record(p, rec), record_path(path)),
        (lambda p: write_markdown_report(p, rec, timings), report_path(path)),
    ):
        try:
            fn(target)
        except Exception as e:  # non-fatal, isolated
            _emit(warn, f"failed to write {os.path.basename(target)}: {e}")
    if diagnostics and res.measurements.intervals is not None:
        for fn, target in (
            (lambda p: write_interval_sidecar(p, res.measurements.intervals),
             intervals_sidecar_path(record_path(path))),
            (lambda p: write_candidates_sidecar(p, res.measurements),
             candidates_sidecar_path(record_path(path))),
        ):
            try:
                fn(target)
            except Exception as e:
                _emit(warn, f"failed to write {os.path.basename(target)}: {e}")


def _debug_analysis(events: PoolEvents, path: str, m: AudioMeasurements) -> None:
    """Per-file Pass-1 debug lines (ref: the VAD summary Logf,
    analyser_vad.go:781-783)."""
    v = m.vad
    _emit(
        events.on_debug, path,
        "VAD: split=%.1f dB, floor=%.1f dB, margin=%.2f dB, gapTol=%d, "
        "runs=%d, speechElected=%s, noiseRegion=%s, flooredFrac=%.2f, "
        "voiceActivated=%s"
        % (v.split, v.floor, v.margin, v.gap_tolerance_intervals,
           len(v.speech_regions),
           f"{v.speech_profile.region.start:.1f}s+{v.speech_profile.region.duration:.1f}s"
           if v.speech_profile else "none",
           f"{v.noise_region.start:.1f}s+{v.noise_region.duration:.1f}s"
           if v.noise_region else "none",
           v.floored_fraction, v.voice_activated),
    )
    g = v.gate_stats
    _emit(
        events.on_debug, path,
        "gate stats: voicedP10=%.1f dB, noiseP95=%.1f dB, separation=%.1f dB"
        % (g.voiced_low_percentile, g.noise_high_percentile, g.separation_db),
    )


def _debug_result(events: PoolEvents, path: str, res: ProcessResult) -> None:
    """Per-file adaptation + normalisation debug lines (ref: the plan and
    detective messages in normalise.go and the AdaptConfig diagnostics)."""
    eff, d = res.effective_config, res.diagnostics
    nr = eff.noise_reduction
    _emit(
        events.on_debug, path,
        "adapted: afftdn=%s nf=%.1f type=%s; gate thr=%.1f dB ratio=%.1f "
        "depth=%.0f dB; comp thr=%.1f dB; deesser i=%.2f"
        % ("on" if nr.afftdn_enabled else "off", nr.afftdn_noise_floor,
           nr.afftdn_noise_type,
           20.0 * math.log10(eff.speech_gate.threshold)
           if eff.speech_gate.threshold > 0 else float("-inf"),
           eff.speech_gate.ratio,
           d.speech_gate_depth_db if d else 0.0,
           eff.levelling_compressor.threshold,
           eff.deesser.intensity),
    )
    n = res.normalisation
    _emit(
        events.on_debug, path,
        "normalise: limiter=%s ceiling=%.1f dBTP preGain=%.1f dB clamped=%s; "
        "offset=%.2f dB effectiveTarget=%.2f LUFS final=%.2f LUFS withinTarget=%s"
        % ("on" if n.limiter_enabled else "off", n.limiter_ceiling_dbtp,
           n.pre_gain_db, n.limiter_clamped, n.gain_applied_db,
           n.effective_target_i, n.output_lufs, n.within_target),
    )
    if n.linear_mode_forced:
        _emit(
            events.on_debug, path,
            "NOTE: linear-mode cap engaged; effective target %.2f LUFS below "
            "requested %.2f (peak-limited input)"
            % (n.effective_target_i, n.requested_target_i),
        )
        # surface the detective at the console, the rebuild's analogue of
        # the reference's dynamic-fallback WARNING (ref: normalise.go:683-693
        # detectDynamicNormalisation): the user asked for -16 and did not
        # get it — say so, don't bury it in the run record
        _emit(
            events.on_warning,
            "%s: target lowered to %.1f LUFS (requested %.1f): input is "
            "peak-limited; loudness kept in linear mode"
            % (os.path.basename(path), n.effective_target_i,
               n.requested_target_i),
        )


def process_one_file(
    path: str,
    base: FilterConfig,
    events: PoolEvents,
    diagnostics: bool,
    cancel: threading.Event,
    finisher=None,
):
    """Process one file through the 4-pass pipeline + publish + artefacts.

    With `finisher` (a 1-thread executor shared across the pool), the
    delivery pull + encode + artefact spine run on THAT thread and a
    Future[FileOutcome] is returned: file N's multi-MB downlink and host
    encode then overlap file N+1's upload/compute instead of serialising
    inside its worker (measured 2026-08-17: 134.9x vs 113.2x aggregate,
    scripts/bench_aggregate_experiment.py).  Without it the behaviour is
    unchanged and a FileOutcome is returned directly."""
    outcome = FileOutcome(path=path)
    start = time.perf_counter()
    _emit(events.on_file_start, path)
    try:
        # keep 16-bit sources as int16 end to end until the device: half
        # the host memory AND half the upload bytes, no decode-then-
        # requantise round trip (the fused programs downmix/convert
        # in-graph); deeper sources stay float32.  Hour-scale FLAC inputs
        # stream through the bounded-memory decoder instead of a whole-
        # file host buffer (ref: reader.go's O(frame) loop).
        samples, meta = _open_for_processing(path)
        # the audio duration drives the live row's ⚡ realtime-speed badge
        # (ref: FileProgress.Duration, views.go:255-263)
        _emit(events.on_duration, path, float(meta.duration_secs))
        if (isinstance(samples, np.ndarray) and samples.dtype != np.int16
                and meta.bit_depth and meta.bit_depth <= 16):
            samples = np.clip(
                np.round(samples * 32768.0), -32768, 32767
            ).astype(np.int16)

        def progress(stage, frac):
            if cancel.is_set():
                raise InterruptedError("cancelled")
            _emit(events.on_progress, path, stage, frac)

        def on_adapted(eff, diag, m):
            from ..ui.summary import new_adapted_summary

            _emit(events.on_adapted, path, new_adapted_summary(eff, diag, m))
            # the 250 ms interval RMS series feeds the live VU meter during
            # the device passes (ref: the per-~100-frame VU level the
            # encoder streams to the TUI, encoder.go:224-234)
            if m.intervals is not None and len(m.intervals):
                _emit(events.on_levels, path,
                      np.asarray(m.intervals.rms_level, dtype=np.float64),
                      float(m.intervals.hop))

        def on_limiter_plan(enabled, ceiling_dbtp):
            # the Pass-4 limiter snapshot lights the chain box's Limiter
            # row DURING processing (ref: LimiterProgressMsg,
            # WithLimiterProgress — summary_test.go:385)
            _emit(events.on_limiter, path, bool(enabled),
                  float(ceiling_dbtp))

        def on_filtered_levels(levels_db, hop_secs):
            # truthful meter for the processing/normalising tail: the
            # PROCESSED signal's momentary series (+ the linear-mode
            # offset), not the Pass-1 input levels (ref: the encoder's
            # frame-level VU stream, encoder.go:235-257)
            _emit(events.on_levels, path,
                  np.asarray(levels_db, dtype=np.float64), float(hop_secs))

        res = process_audio(
            samples, meta.sample_rate, base_config=base,
            progress=progress, on_adapted=on_adapted,
            on_filtered_levels=on_filtered_levels,
            on_limiter_plan=on_limiter_plan,
            defer_output_pull=finisher is not None,
        )
    except InterruptedError:
        outcome.error = "cancelled"
    except Exception as e:
        outcome.error = str(e)

    if outcome.error:
        outcome.wall_secs = time.perf_counter() - start
        _emit(events.on_file_complete, outcome)
        if finisher is None:
            return outcome
        import concurrent.futures

        done: "concurrent.futures.Future" = concurrent.futures.Future()
        done.set_result(outcome)
        return done

    # the finish half only reads `samples` for the --diagnostics
    # spectrograms; don't let the closure pin a whole file's PCM (hundreds
    # of MB at hour scale) in the finisher queue when it's never used
    finish_samples = samples if diagnostics else None
    samples = None

    def _finish() -> FileOutcome:
        return _finish_one_file(
            path, outcome, res, finish_samples, meta, events, diagnostics,
            start)

    if finisher is None:
        return _finish()
    return finisher.submit(_finish)


def _finish_one_file(
    path: str,
    outcome: FileOutcome,
    res: ProcessResult,
    samples,
    meta,
    events: PoolEvents,
    diagnostics: bool,
    start: float,
) -> FileOutcome:
    """The publish half of process_one_file: delivery pull, encode,
    spectrograms, scores, artefact spine, done-box emit.  Runs either
    inline (no finisher) or on the pool's single finisher thread so it
    overlaps the next file's compute."""
    try:
        from ..pipeline.process import finish_output_pull

        finish_output_pull(res)

        # name the file after the MEASURED output loudness (ref:
        # processor.go:199-214 result.OutputLUFS): a linear-mode-capped
        # file that lands at -19.3 is LUFS-19, not LUFS-16
        n_res = res.normalisation
        name_lufs = n_res.output_lufs
        if not (name_lufs < 0.0):   # skipped/degenerate normalisation
            name_lufs = n_res.effective_target_i or n_res.requested_target_i
        out_path = output_audio_path(path, name_lufs)
        save_flac(out_path, res.output_audio, res.output_rate)

        spectrogram_images = None
        if diagnostics:
            # before/after spectrogram set for whole file + elected regions,
            # named off the OUTPUT stem (ref: pool.go:43-65, 370; <=6 PNGs)
            try:
                from ..io.audio import downmix_mono
                from ..report.spectrogram import (
                    PROCESSING_STAGES,
                    derive_spectrogram_images,
                    render_run_spectrograms,
                )

                stem = os.path.splitext(out_path)[0]
                m = res.measurements
                speech_region = (
                    m.vad.speech_profile.region if m.vad.speech_profile else None
                )
                before_mono = (
                    np.asarray(res.measurements.device_pcm)
                    if not isinstance(samples, np.ndarray)   # streamed input
                    else downmix_mono(samples)
                )
                render_run_spectrograms(
                    stem,
                    {
                        "before": before_mono,
                        "after": (res.output_audio, res.output_rate),
                    },
                    meta.sample_rate,
                    noise_region=m.vad.noise_region,
                    speech_region=speech_region,
                )
                spectrogram_images = derive_spectrogram_images(
                    stem, PROCESSING_STAGES,
                    has_room_tone=m.vad.noise_profile is not None,
                    has_speech=m.vad.speech_profile is not None,
                )
            except Exception as e:
                _emit(events.on_warning, f"spectrogram render failed: {e}")

        outcome.output_path = out_path
        outcome.input_lufs = res.measurements.loudness.input_i
        outcome.output_lufs = res.normalisation.output_lufs
        outcome.input_tp = res.measurements.loudness.input_tp
        outcome.output_tp = res.normalisation.output_tp
        outcome.input_lra = res.measurements.loudness.input_lra
        if res.final.loudness is not None:
            outcome.output_lra = res.final.loudness.lra_lu
        from ..quality import input_display_noise_floor_db

        floor, ok = input_display_noise_floor_db(res.measurements)
        outcome.input_noise_floor = floor if ok else None
        if res.final.room_tone_sample is not None:
            outcome.output_noise_floor = res.final.room_tone_sample.rms_level
        q = compute_quality_score(res)
        r = compute_recording_score(res.measurements)
        outcome.quality_stars, outcome.quality_label = q.stars, q.label
        outcome.recording_stars, outcome.recording_label = r.stars, r.label
        outcome.wall_secs = time.perf_counter() - start
        if outcome.wall_secs > 0:
            outcome.realtime_factor = meta.duration_secs / outcome.wall_secs
        outcome.result = res
        outcome.measurements = res.measurements

        _debug_analysis(events, path, res.measurements)
        _debug_result(events, path, res)
        _emit_report_artefacts(path, outcome, res, diagnostics, events.on_warning,
                               spectrograms=spectrogram_images)
    except InterruptedError:
        outcome.error = "cancelled"
    except Exception as e:
        outcome.error = str(e)
    outcome.wall_secs = time.perf_counter() - start
    _emit(events.on_file_complete, outcome)
    return outcome


def analyse_one_file(
    path: str,
    base: FilterConfig,
    events: PoolEvents,
    diagnostics: bool,
    cancel: threading.Event,
) -> FileOutcome:
    """-a mode: Pass 1 + AdaptConfig + analysis artefacts
    (ref: AnalyseOnlyDetailed path, main.go:343-441)."""
    outcome = FileOutcome(path=path)
    start = time.perf_counter()
    _emit(events.on_file_start, path)
    try:
        # keep 16-bit sources as int16 until the device (half the upload
        # bytes; the fused programs downmix/convert in-graph)
        samples, meta = open_audio_file(path, raw_int16=True)
        _emit(events.on_duration, path, float(meta.duration_secs))
        if cancel.is_set():
            raise InterruptedError("cancelled")
        m, eff, diag = analyse_only(samples, meta.sample_rate, base)
        _debug_analysis(events, path, m)
        outcome.input_lufs = m.loudness.input_i
        outcome.input_tp = m.loudness.input_tp
        outcome.input_lra = m.loudness.input_lra
        r = compute_recording_score(m)
        outcome.recording_stars, outcome.recording_label = r.stars, r.label
        outcome.measurements = m
        outcome.wall_secs = time.perf_counter() - start
        if outcome.wall_secs > 0:
            outcome.realtime_factor = meta.duration_secs / outcome.wall_secs

        rec = new_analysis_run_record(path, m)
        if diagnostics:
            # input-stage spectrograms off the analysis report stem
            # (ref: AnalysisSpectrogramStages, main.go:466-502)
            try:
                from ..io.audio import downmix_mono
                from ..report.spectrogram import (
                    ANALYSIS_STAGES,
                    derive_spectrogram_images,
                    render_run_spectrograms,
                )

                stem = os.path.splitext(analysis_record_path(path))[0]
                speech_region = (
                    m.vad.speech_profile.region if m.vad.speech_profile else None
                )
                render_run_spectrograms(
                    stem,
                    {"input": downmix_mono(samples)},
                    meta.sample_rate,
                    noise_region=m.vad.noise_region,
                    speech_region=speech_region,
                )
                rec["spectrograms"] = derive_spectrogram_images(
                    stem, ANALYSIS_STAGES,
                    has_room_tone=m.vad.noise_profile is not None,
                    has_speech=m.vad.speech_profile is not None,
                )
            except Exception as e:
                _emit(events.on_warning, f"spectrogram render failed: {e}")
        for fn, target, is_report in (
            (lambda p: write_run_record(p, rec), analysis_record_path(path), False),
            (lambda p: write_markdown_report(p, rec), analysis_report_path(path), True),
        ):
            try:
                fn(target)
            except Exception as e:
                if is_report:
                    outcome.report_written = False
                _emit(events.on_warning, f"failed to write {os.path.basename(target)}: {e}")
        if diagnostics and m.intervals is not None:
            try:
                write_interval_sidecar(
                    intervals_sidecar_path(analysis_record_path(path)), m.intervals
                )
                write_candidates_sidecar(
                    candidates_sidecar_path(analysis_record_path(path)), m
                )
            except Exception as e:
                _emit(events.on_warning, f"failed to write sidecars: {e}")
    except InterruptedError:
        outcome.error = "cancelled"
    except Exception as e:
        outcome.error = str(e)
    outcome.wall_secs = time.perf_counter() - start
    _emit(events.on_file_complete, outcome)
    return outcome


def emit_batch_outcomes(
    results: list[dict],
    events: PoolEvents | None = None,
    diagnostics: bool = False,
) -> list[FileOutcome]:
    """Route `process_back_catalogue` results through the SAME artefact
    spine as the per-file pool: run record + report (+ sidecars under
    --diagnostics), quality/recording scores, debug lines, and a
    FileOutcome per file for the done boxes (VERDICT r2: the batch path
    must not bypass the spine, ref: emitReportArtefacts pool.go:288-340)."""
    events = events or PoolEvents()
    outcomes = []
    for r in results:
        outcome = FileOutcome(path=r["path"])
        if "error" in r:
            outcome.error = r["error"]
            _emit(events.on_file_complete, outcome)
            outcomes.append(outcome)
            continue
        res: ProcessResult = r["result"]
        outcome.output_path = r["output_path"]
        outcome.input_lufs = res.measurements.loudness.input_i
        outcome.output_lufs = res.normalisation.output_lufs
        outcome.input_tp = res.measurements.loudness.input_tp
        outcome.output_tp = res.normalisation.output_tp
        outcome.input_lra = res.measurements.loudness.input_lra
        if res.final.loudness is not None:
            outcome.output_lra = res.final.loudness.lra_lu
        from ..quality import input_display_noise_floor_db

        floor, ok = input_display_noise_floor_db(res.measurements)
        outcome.input_noise_floor = floor if ok else None
        if res.final.room_tone_sample is not None:
            outcome.output_noise_floor = res.final.room_tone_sample.rms_level
        q = compute_quality_score(res)
        rs = compute_recording_score(res.measurements)
        outcome.quality_stars, outcome.quality_label = q.stars, q.label
        outcome.recording_stars, outcome.recording_label = rs.stars, rs.label
        outcome.wall_secs = r.get("wall_secs", 0.0)
        if outcome.wall_secs > 0:
            outcome.realtime_factor = res.measurements.duration / outcome.wall_secs
        outcome.result = res
        outcome.measurements = res.measurements

        _debug_analysis(events, r["path"], res.measurements)
        _debug_result(events, r["path"], res)
        _emit_report_artefacts(r["path"], outcome, res, diagnostics,
                               events.on_warning)
        _emit(events.on_file_complete, outcome)
        outcomes.append(outcome)
    return outcomes


def run_pool(
    files: list[str],
    base: FilterConfig | None = None,
    events: PoolEvents | None = None,
    diagnostics: bool = False,
    analysis_only: bool = False,
    jobs: int | None = None,
    cancel: threading.Event | None = None,
) -> list[FileOutcome]:
    """Run the bounded pool over `files`; returns outcomes in input order."""
    base = base or default_filter_config()
    events = events or PoolEvents()
    cancel = cancel or threading.Event()
    jobs = jobs or resolve_jobs(len(files), os.cpu_count() or 1)

    # per-worker config clone (ref: CloneForWorker, filters.go:368-373)
    import copy

    if analysis_only:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futures = [
                ex.submit(analyse_one_file, f, copy.deepcopy(base), events,
                          diagnostics, cancel)
                for f in files
            ]
            return [f.result() for f in futures]

    # processing: compute workers + ONE shared finisher thread.  Each
    # worker defers its delivery pull; the finisher pulls + encodes +
    # writes artefacts while the workers move on to the next file's
    # upload/compute (the pull and the upload are the two big wire terms;
    # overlapping them is worth ~20% aggregate, measured 2026-08-17).
    with ThreadPoolExecutor(max_workers=1, thread_name_prefix="finisher") as fin:
        with ThreadPoolExecutor(max_workers=jobs) as ex:
            futures = [
                ex.submit(process_one_file, f, copy.deepcopy(base), events,
                          diagnostics, cancel, fin)
                for f in files
            ]
            handles = [f.result() for f in futures]
        # each handle is a Future from the finisher (or a resolved one for
        # compute-side failures)
        return [h.result() for h in handles]

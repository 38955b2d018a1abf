"""Run record: the machine-readable per-file observability artefact
(schema_version 1).

Behavioural rebuild of internal/processor/runrecord*.go: one JSON document
per file per run, assembling domain blocks — loudness/dynamics/spectral
with input/filtered/final stages, noise, nested regions (elected profiles,
candidate summaries, per-stage samples, gate statistics), filters
(effective config + diagnostics, gate threshold/range in honest dB),
normalisation, and the interval summary.  NaN/Inf sanitise to null
(ref: runrecord.go:431-529); the full interval/candidate series stream to
`.jsonl` sidecars (ref: runrecord_write.go:88-161).
"""

from __future__ import annotations

import json
import math
import os
import sys
from dataclasses import asdict, is_dataclass
from datetime import datetime, timezone

import numpy as np

from .. import __version__
from ..adaptive.adapt import AdaptiveDiagnostics
from ..adaptive.config import FilterConfig
from ..analysis.analyser import AudioMeasurements
from ..analysis.intervals import Intervals
from ..io.atomic import atomic_publish
from ..pipeline.process import ProcessResult
from ..utils.units import linear_to_db

SCHEMA_VERSION = 1


# ---------------------------------------------------------------------------
# sanitising (ref: runrecord.go:431-529 — NaN/Inf -> null at marshal)
# ---------------------------------------------------------------------------

def sanitize_json(obj):
    """Recursively convert NaN/Inf floats to None so the JSON stays valid."""
    if isinstance(obj, dict):
        return {k: sanitize_json(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [sanitize_json(v) for v in obj]
    if isinstance(obj, (float, np.floating)):
        f = float(obj)
        return f if math.isfinite(f) else None
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, np.ndarray):
        return [sanitize_json(v) for v in obj.tolist()]
    return obj


def _dc(obj) -> dict | None:
    if obj is None:
        return None
    if is_dataclass(obj):
        return asdict(obj)
    return dict(obj)


# ---------------------------------------------------------------------------
# block builders
# ---------------------------------------------------------------------------

def _loudness_stage_from_result(lr) -> dict | None:
    if lr is None:
        return None
    return {
        "momentary_lufs": lr.momentary_max_lufs,
        "short_term_lufs": lr.short_term_max_lufs,
        "sample_peak_dbfs": lr.sample_peak_db,
        "integrated_lufs": lr.integrated_lufs,
        "true_peak_dbtp": lr.true_peak_db,
        "lra_lu": lr.lra_lu,
        "thresh_lufs": lr.threshold_lufs,
    }


def _input_loudness_block(m: AudioMeasurements) -> dict:
    lo = m.loudness
    return {
        "momentary_lufs": lo.momentary_lufs,
        "short_term_lufs": lo.short_term_lufs,
        "sample_peak_dbfs": lo.sample_peak_dbfs,
        "integrated_lufs": lo.input_i,
        "true_peak_dbtp": lo.input_tp,
        "lra_lu": lo.input_lra,
        "thresh_lufs": lo.input_thresh,
        "target_offset_db": lo.target_offset,
    }


def _dynamics_from_astats(ast) -> dict | None:
    if ast is None:
        return None
    crest_db = 20.0 * math.log10(ast.crest_factor) if ast.crest_factor > 0 else 0.0
    return {
        "dynamic_range_db": ast.dynamic_range,
        "rms_level_dbfs": ast.rms_level,
        "peak_level_dbfs": ast.peak_level,
        "rms_trough_dbfs": ast.rms_trough,
        "rms_peak_dbfs": ast.rms_peak,
        "dc_offset": ast.dc_offset,
        "flat_factor": ast.flat_factor,
        "crest_factor_astats_db": crest_db,
        "zero_crossings_rate": ast.zero_crossings_rate,
        "zero_crossings_count": ast.zero_crossings,
        "max_difference": ast.max_difference,
        "min_difference": ast.min_difference,
        "mean_difference": ast.mean_difference,
        "rms_difference": ast.rms_difference,
        "entropy": ast.entropy,
        "min_level_dbfs": linear_to_db(abs(ast.min_level)),
        "max_level_dbfs": linear_to_db(abs(ast.max_level)),
        "noise_floor_count": ast.noise_floor_count,
        "bit_depth": ast.bit_depth,
        "number_of_samples": ast.number_of_samples,
    }


# §8.4 canonical spectral keys (ref: SpectralMetrics JSON tags,
# analyser_metrics.go:696-711): Hz-valued metrics carry the _hz suffix
_SPECTRAL_KEY = {
    "mean": "mean", "variance": "variance", "centroid": "centroid_hz",
    "spread": "spread_hz", "skewness": "skewness", "kurtosis": "kurtosis",
    "entropy": "entropy", "flatness": "flatness", "crest": "crest",
    "flux": "flux", "slope": "slope", "decrease": "decrease",
    "rolloff": "rolloff_hz",
}


def _spectral_block(spec) -> dict | None:
    if spec is None:
        return None
    d = _dc(spec)
    d.pop("found", None)
    return {_SPECTRAL_KEY[k]: v for k, v in d.items()}


def _region_sample_block(sample) -> dict | None:
    """(ref: RegionSample JSON tags, analyser.go:85-99)."""
    if sample is None:
        return None
    return {
        "rms_level_dbfs": sample.rms_level,
        "peak_level_dbfs": sample.peak_level,
        "crest_factor_db": sample.crest_factor,
        "spectral": _spectral_block(sample.spectral) or {},
        "momentary_lufs": sample.momentary_lufs,
        "short_term_lufs": sample.short_term_lufs,
        "true_peak_dbtp": sample.true_peak,
        "sample_peak_dbfs": sample.sample_peak,
    }


def _noise_profile_block(npf) -> dict:
    """(ref: NoiseProfile JSON tags + MarshalJSON spectral_* flattening,
    analyser.go:48-79, runrecord.go:464).  Times are seconds (the reference
    emits Go duration ns; this schema uses _s-suffixed seconds throughout)."""
    out = {
        "start_s": npf.start,
        "duration_s": npf.duration,
        "measured_floor_dbfs": npf.measured_noise_floor,
        "peak_level_dbfs": npf.peak_level,
        "crest_factor_db": npf.crest_factor,
        "entropy": npf.entropy,
    }
    if npf.extraction_warning:
        out["extraction_warning"] = npf.extraction_warning
    spec = _dc(npf.spectral) or {}
    spec.pop("found", None)
    out.update({f"spectral_{_SPECTRAL_KEY[k]}": v for k, v in spec.items()})
    if npf.band_noise:
        out["band_noise_dbfs"] = list(npf.band_noise)
        out["band_noise_measured"] = npf.bands_measured
    if npf.was_refined:
        out["original_start_s"] = npf.original_start
        out["original_duration_s"] = npf.original_duration
    return out


def _interval_summary(iv: Intervals | None) -> dict | None:
    """(ref: IntervalSummary / newIntervalSummary, runrecord.go:139-163):
    RMS distribution over non-silent intervals with integer-index
    percentiles, plus the largest adjacent-sorted-RMS gap."""
    if iv is None or len(iv) == 0:
        return None
    out: dict = {"count": int(len(iv))}
    rms = np.sort(iv.rms_level[iv.rms_level > -120.0])
    if rms.size >= 10:
        n = int(rms.size)
        # Integer-index selection sorted[n*k/d], NOT interpolation and NOT
        # the (n-1)-scaled index (they differ at e.g. P75 for n=11) — the
        # reference pins this exact maths (runrecord_summary.go:15,39-46,
        # runrecord_sidecar_test.go TestNewIntervalSummary_MatchesReportMaths).
        out["rms_distribution"] = {
            "min_dbfs": float(rms[0]),
            "p10_dbfs": float(rms[n // 10]),
            "p25_dbfs": float(rms[n // 4]),
            "p50_dbfs": float(rms[n // 2]),
            "p75_dbfs": float(rms[n * 3 // 4]),
            "p90_dbfs": float(rms[n * 9 // 10]),
            "max_dbfs": float(rms[-1]),
        }
        gaps = np.diff(rms)
        out["largest_gap_db"] = float(np.max(gaps)) if gaps.size else 0.0
    return out


def _filters_block(cfg: FilterConfig, diag: AdaptiveDiagnostics | None) -> dict:
    """Adapted config with gate threshold/range converted to honest dB
    (ref: newFiltersBlock, runrecord.go FiltersBlock)."""
    block = {
        "rumble_highpass": _dc(cfg.rumble_highpass),
        "bandlimit_lowpass": _dc(cfg.bandlimit_lowpass),
        "noise_reduction": _dc(cfg.noise_reduction),
        "speech_gate": _dc(cfg.speech_gate),
        "levelling_compressor": _dc(cfg.levelling_compressor),
        "deesser": _dc(cfg.deesser),
        "adeclick": _dc(cfg.adeclick),
        "loudnorm": _dc(cfg.loudnorm),
    }
    g = block["speech_gate"]
    g["threshold_dbfs"] = linear_to_db(g.pop("threshold"))
    g["range_db"] = linear_to_db(g.pop("range"))
    if diag is not None:
        block["diagnostics"] = _dc(diag)
    return block


def _normalisation_block(res: ProcessResult) -> dict:
    n = res.normalisation
    return {
        "input_lufs": n.input_lufs,
        "input_dbtp": n.input_tp,
        "output_lufs": n.output_lufs,
        "output_dbtp": n.output_tp,
        "gain_applied_db": n.gain_applied_db,
        "within_target": n.within_target,
        "skipped": n.skipped,
        "requested_target_lufs": n.requested_target_i,
        "effective_target_lufs": n.effective_target_i,
        "linear_mode_forced": n.linear_mode_forced,
        "limiter_enabled": n.limiter_enabled,
        "ceiling_dbtp": n.limiter_ceiling_dbtp,
        "gain_db": n.limiter_gain_db,
        "filtered_dbtp": n.limiter_filtered_tp,
        "pre_gain_db": n.pre_gain_db,
        "limiter_clamped": n.limiter_clamped,
    }


def _regions_block(m: AudioMeasurements, res: ProcessResult | None) -> dict:
    vad = m.vad

    room: dict = {"samples": {}}
    if vad.noise_profile is not None:
        room["elected"] = _noise_profile_block(vad.noise_profile)
    if vad.elected_room_tone_sample is not None:
        room["samples"]["input"] = _region_sample_block(vad.elected_room_tone_sample)

    speech: dict = {"samples": {}}
    if vad.speech_profile is not None:
        sp = vad.speech_profile
        speech["elected"] = {
            "region": {"start_s": sp.region.start, "end_s": sp.region.end,
                       "duration_s": sp.region.duration},
            **(_region_sample_block(sp.sample) or {}),
            "voicing_density": sp.voicing_density,
            "speech_band_body_rms_dbfs": sp.body_band_rms,
            "speech_band_sib_rms_dbfs": sp.sib_band_rms,
            "speech_bands_measured": sp.bands_measured,
            "score": sp.score,
            "was_refined": sp.was_refined,
        }
        speech["samples"]["input"] = _region_sample_block(sp.sample)
    if vad.speech_candidates:
        elected_score = vad.speech_profile.score if vad.speech_profile else None
        speech["candidates_summary"] = {
            "evaluated_count": len(vad.speech_candidates),
            **({"elected_score": elected_score} if elected_score is not None else {}),
        }

    if res is not None:
        if res.filtered.room_tone_sample is not None:
            room["samples"]["filtered"] = _region_sample_block(res.filtered.room_tone_sample)
        if res.final.room_tone_sample is not None:
            room["samples"]["final"] = _region_sample_block(res.final.room_tone_sample)
        if res.filtered.speech_sample is not None:
            speech["samples"]["filtered"] = _region_sample_block(res.filtered.speech_sample)
        if res.final.speech_sample is not None:
            speech["samples"]["final"] = _region_sample_block(res.final.speech_sample)

    return {
        "room_tone": room,
        "speech": speech,
        "gate_statistics": {
            "voiced_low_percentile_dbfs": vad.gate_stats.voiced_low_percentile,
            "noise_high_percentile_dbfs": vad.gate_stats.noise_high_percentile,
            "gate_separation_db": vad.gate_stats.separation_db,
        },
    }


def _pass1_record(m: AudioMeasurements, input_file: str) -> dict:
    return {
        "schema_version": SCHEMA_VERSION,
        "run": {
            "input_file": os.path.basename(input_file),
            "version": __version__,
            "executable": sys.argv[0] and os.path.abspath(sys.argv[0]) or "",
            "processed_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
            "duration_s": m.duration,
            "sample_rate_hz": m.sample_rate,
            "channels": 1,
        },
        "loudness": {
            "target_i_lufs": -16.0,
            "stages": {"input": _input_loudness_block(m)},
        },
        "dynamics": {"stages": {"input": _dynamics_from_astats(m.astats)}},
        "spectral": {"stages": {"input": _spectral_block(m.spectral)}},
        "noise": {
            "floor_dbfs": m.noise.floor,
            "floor_source": m.noise.floor_source,
            "floor_prescan_dbfs": m.noise.floor_prescan,
            "floor_astats_dbfs": m.noise.floor_astats,
            "room_tone_detect_level_dbfs": m.noise.room_tone_detect_level,
            "voice_activated": m.noise.voice_activated,
            "floored_fraction": m.noise.floored_fraction,
            "reduction_headroom_db": m.noise.reduction_headroom,
        },
        "interval_summary": _interval_summary(m.intervals),
    }


def new_analysis_run_record(input_file: str, m: AudioMeasurements) -> dict:
    """Analysis-only (-a) record: Pass-1 blocks only
    (ref: NewAnalysisRunRecord, runrecord.go:306-310)."""
    rec = _pass1_record(m, input_file)
    rec["regions"] = _regions_block(m, None)
    return sanitize_json(rec)


def new_run_record(input_file: str, res: ProcessResult) -> dict:
    """Full processing record (ref: NewRunRecord, runrecord.go:251-304)."""
    m = res.measurements
    rec = _pass1_record(m, input_file)
    rec["loudness"]["target_i_lufs"] = res.normalisation.requested_target_i
    rec["loudness"]["stages"]["filtered"] = _loudness_stage_from_result(res.filtered.loudness)
    rec["loudness"]["stages"]["final"] = _loudness_stage_from_result(res.final.loudness)
    rec["dynamics"]["stages"]["filtered"] = _dynamics_from_astats(res.filtered.astats)
    rec["dynamics"]["stages"]["final"] = _dynamics_from_astats(res.final.astats)
    rec["spectral"]["stages"]["filtered"] = _spectral_block(res.filtered.spectral)
    rec["spectral"]["stages"]["final"] = _spectral_block(res.final.spectral)
    rec["regions"] = _regions_block(m, res)
    rec["filters"] = _filters_block(res.effective_config, res.diagnostics)
    rec["normalisation"] = _normalisation_block(res)
    return sanitize_json(rec)


# ---------------------------------------------------------------------------
# writing (ref: runrecord_write.go — record + .jsonl sidecars)
# ---------------------------------------------------------------------------

def write_run_record(path: str, record: dict) -> None:
    """Write the record JSON atomically (sibling dot-temp + rename, ref:
    file_write.go:13-47)."""
    with atomic_publish(path, "record") as tmp:
        with open(tmp, "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")


def write_interval_sidecar(path: str, iv: Intervals) -> None:
    """Stream per-250ms interval rows to .intervals.jsonl
    (ref: runrecord_write.go:88-161).  Spectral metrics are FLATTENED into
    the row as `spectral_*` keys — the reference's IntervalSample JSON
    contract has no nested spectral object (ref: IntervalSample MarshalJSON,
    analyser.go; pinned by TestIntervalSampleJSON_PreservesFlatSpectralFields,
    analyser_test.go:29-132)."""
    with atomic_publish(path, "sidecar") as tmp, open(tmp, "w") as f:
        for i in range(len(iv)):
            row = {
                "timestamp_s": float(iv.timestamp[i]),
                "rms_dbfs": float(iv.rms_level[i]),
                "peak_dbfs": float(iv.peak_level[i]),
                "momentary_lufs": float(iv.momentary_lufs[i]),
                "short_term_lufs": float(iv.short_term_lufs[i]),
            }
            row.update({
                f"spectral_{_SPECTRAL_KEY[k]}": float(iv.spectral[k][i])
                for k in iv.spectral
            })
            f.write(json.dumps(sanitize_json(row)) + "\n")


def write_candidates_sidecar(path: str, m: AudioMeasurements) -> None:
    """Stream scored speech candidates to .candidates.jsonl; each line is
    tagged with its candidate kind alongside the spliced-in fields
    (ref: streamCandidates; TestWriteCandidatesSidecar_TaggedLines,
    runrecord_sidecar_test.go)."""
    with atomic_publish(path, "sidecar") as tmp, open(tmp, "w") as f:
        for c in m.vad.speech_candidates:
            row = {
                "kind": "speech",
                "region": {"start_s": c.region.start, "end_s": c.region.end,
                           "duration_s": c.region.duration},
                "score": c.score,
                "voicing_density": c.voicing_density,
                "rms_level_dbfs": c.sample.rms_level,
                "was_refined": c.was_refined,
            }
            f.write(json.dumps(sanitize_json(row)) + "\n")

"""Artefact path derivation (ref: internal/report/paths.go:14-24 and
internal/processor output naming)."""

from __future__ import annotations

import os


def output_audio_path(input_path: str, output_lufs: float = -16.0) -> str:
    """<stem>-LUFS-NN-processed.flac (ref: processor.go:206-214).  NN comes
    from the MEASURED output loudness (ref: result.OutputLUFS — when the
    linear-mode cap lowers the effective target the reference names the
    file after what it actually delivered, e.g. LUFS-19).  The value rounds
    half away from zero like Go's math.Round (ref: lufsFilenameValue:
    -16.5 -> 17, not banker's 16)."""
    stem, _ = os.path.splitext(input_path)
    v = abs(output_lufs)
    nn = int(v + 0.5)
    return f"{stem}-LUFS-{nn}-processed.flac"


def analysis_report_path(input_path: str) -> str:
    """<input>-<ext>-analysis.md (ref: report/paths.go:14-24)."""
    stem, ext = os.path.splitext(input_path)
    return f"{stem}-{ext.lstrip('.')}-analysis.md"


def analysis_record_path(input_path: str) -> str:
    stem, ext = os.path.splitext(input_path)
    return f"{stem}-{ext.lstrip('.')}-analysis.json"


def report_path(input_path: str) -> str:
    stem, _ = os.path.splitext(input_path)
    return f"{stem}-report.md"


def record_path(input_path: str) -> str:
    stem, _ = os.path.splitext(input_path)
    return f"{stem}-report.json"


def intervals_sidecar_path(record: str) -> str:
    stem, _ = os.path.splitext(record)
    return f"{stem}.intervals.jsonl"


def candidates_sidecar_path(record: str) -> str:
    stem, _ = os.path.splitext(record)
    return f"{stem}.candidates.jsonl"

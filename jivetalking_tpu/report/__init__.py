"""Run record (JSON schema v1) + Markdown report renderer + artefact paths
(ref: internal/processor/runrecord*.go, internal/report/*)."""

from .paths import (
    analysis_record_path,
    analysis_report_path,
    candidates_sidecar_path,
    intervals_sidecar_path,
    output_audio_path,
    record_path,
    report_path,
)
from .render import Timings, render_markdown, write_markdown_report
from .runrecord import (
    SCHEMA_VERSION,
    new_analysis_run_record,
    new_run_record,
    sanitize_json,
    write_candidates_sidecar,
    write_interval_sidecar,
    write_run_record,
)

__all__ = [
    "analysis_record_path",
    "analysis_report_path",
    "candidates_sidecar_path",
    "intervals_sidecar_path",
    "output_audio_path",
    "record_path",
    "report_path",
    "Timings",
    "render_markdown",
    "write_markdown_report",
    "SCHEMA_VERSION",
    "new_analysis_run_record",
    "new_run_record",
    "sanitize_json",
    "write_candidates_sidecar",
    "write_interval_sidecar",
    "write_run_record",
]

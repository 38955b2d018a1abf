"""Markdown report renderer — renders a run record dict, never re-measures.

Behavioural rebuild of internal/report/render.go: section order
Header -> Processing Summary -> Loudness -> Dynamics -> Spectral ->
Noise Floor -> Regions -> Interval Summary -> Filter Chain ->
Normalisation.  An empty section contributes nothing, so analysis-only
records naturally drop the processing blocks (ref: render.go:25-61).

Formatting rules mirror mdtable.go: "-" placeholder for missing values,
"< -120" token for digital silence, "< -70" for the LUFS gating floor.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .definitions import define

DIGITAL_SILENCE_DB = -120.0
LUFS_FLOOR = -70.0


@dataclass
class Timings:
    """Pass wall-clock metadata the record does not carry
    (ref: report.Timings)."""

    analysis_s: float = 0.0
    processing_s: float = 0.0
    measuring_s: float = 0.0
    normalising_s: float = 0.0
    realtime_factor: float = 0.0

    @property
    def is_zero(self) -> bool:
        return not any([self.analysis_s, self.processing_s, self.measuring_s,
                        self.normalising_s, self.realtime_factor])


def _fmt_duration(secs: float) -> str:
    """Human-readable duration: '12.5s', '1m 30s', '2h 3m 4s'
    (ref: formatDuration; vectors in TestFormatDuration,
    mdtable_test.go:183-199)."""
    if secs >= 3600:
        h, rem = divmod(int(round(secs)), 3600)
        m, s = divmod(rem, 60)
        return f"{h}h {m}m {s}s"
    if secs >= 60:
        m, s = divmod(int(round(secs)), 60)
        return f"{m}m {s}s"
    return f"{secs:.1f}s"


def _channel_name(n) -> str:
    """'mono' / 'stereo' / 'N channels' (ref: channelName; vectors in
    TestChannelName, mdtable_test.go:202-216)."""
    if n == 1:
        return "mono"
    if n == 2:
        return "stereo"
    return f"{n} channels" if n else "-"


def _fmt(value, unit: str = "", signed: bool = False) -> str:
    """(ref: mdtable.go:80-131 formatting rules; `signed` renders an
    explicit + for positives — the target-offset row, formatMetricSigned)."""
    if value is None:
        return "-"
    if isinstance(value, bool):
        return "yes" if value else "no"
    if isinstance(value, str):
        return value if value else "-"
    v = float(value)
    # digital silence (-inf or at/below -120) renders the token on dB axes;
    # NaN/+inf render the placeholder (ref: isDigitalSilence + formatMetricDB,
    # mdtable.go:80-117)
    if unit in ("dBFS", "dBTP") and (v == -math.inf or v <= DIGITAL_SILENCE_DB):
        return "< -120"
    if unit == "LUFS" and (v == -math.inf or v < LUFS_FLOOR):
        return "< -70"
    if not math.isfinite(v):
        return "-"
    if signed:
        return f"{v:+.2f}"
    if unit in ("LUFS", "dBTP", "dBFS", "dB", "LU", "s", "Hz"):
        return f"{v:.2f}"
    if abs(v) != 0 and (abs(v) < 1e-3 or abs(v) >= 1e6):
        return f"{v:.2e}"
    return f"{v:.4f}"


def _escape_cell(cell: str) -> str:
    """Backslash-escape literal pipes and collapse newlines/carriage
    returns to a space so neither can break the row or column structure —
    the metric-definition glosses carry `|min|,|max|`
    (ref: escapeCell, mdtable.go; TestMdTableEscapesCellContent)."""
    if "|" not in cell and "\n" not in cell and "\r" not in cell:
        return cell
    return (cell.replace("|", "\\|")
                .replace("\r\n", " ").replace("\n", " ").replace("\r", " "))


def _table(headers: list[str], rows: list[list[str]]) -> str:
    """Markdown table; short rows pad with the placeholder, over-long rows
    truncate to the header width, cells escape (ref: mdTable, mdtable.go)."""
    width = len(headers)
    out = ["| " + " | ".join(_escape_cell(h) for h in headers) + " |",
           "| " + " | ".join("---" for _ in headers) + " |"]
    for r in rows:
        cells = [_escape_cell(c) for c in r[:width]]
        cells += ["-"] * (width - len(cells))
        out.append("| " + " | ".join(cells) + " |")
    return "\n".join(out)


def _metric_rows(keys: list[str], stages: dict) -> list[list[str]]:
    """One row per key across the present stages."""
    present = [s for s in ("input", "filtered", "final") if stages.get(s)]
    rows = []
    for key in keys:
        label, definition, unit = define(key)
        # the target-offset row renders with an explicit sign
        # (ref: formatMetricSigned, mdtable.go:129-131; "+19.22" in
        # sections_test.go TestRenderLoudnessFullStages)
        signed = key.startswith("target_offset")
        cells = [_fmt(stages[s].get(key), unit, signed=signed) for s in present]
        rows.append([label, f"{definition} ({unit})" if unit else definition, *cells])
    return rows


def _stage_headers(stages: dict) -> list[str]:
    return [s.capitalize() for s in ("input", "filtered", "final") if stages.get(s)]


# ---------------------------------------------------------------------------
# sections
# ---------------------------------------------------------------------------

def _render_header(rec: dict) -> str:
    run = rec.get("run", {})
    sr = run.get("sample_rate_hz") or 0
    rows = [
        ["Input file", _fmt(run.get("input_file"))],
        ["Version", _fmt(run.get("version"))],
        ["Executable", _fmt(run.get("executable"))],
        ["Processed at", _fmt(run.get("processed_at"))],
        ["Duration", _fmt_duration(run.get("duration_s") or 0.0)],
        ["Sample rate", f"{sr / 1000.0:.1f} kHz" if sr else "-"],
        ["Channels", _channel_name(run.get("channels"))],
    ]
    return "# Audio Processing Report\n\n## Run\n\n" + _table(["Field", "Value"], rows)


def _render_processing_summary(t: Timings | None) -> str:
    if t is None or t.is_zero:
        return ""
    rows = [
        ["Pass 1 (analysis)", _fmt_duration(t.analysis_s)],
        ["Pass 2 (filter chain)", _fmt_duration(t.processing_s)],
        ["Pass 3 (loudnorm measure)", _fmt_duration(t.measuring_s)],
        ["Pass 4 (loudnorm apply)", _fmt_duration(t.normalising_s)],
        ["Real-time factor", f"{t.realtime_factor:.1f}x"],
    ]
    return "## Processing Summary\n\n" + _table(["Stage", "Duration"], rows)


_LOUDNESS_KEYS = [
    "integrated_lufs", "true_peak_dbtp", "lra_lu", "thresh_lufs",
    "momentary_lufs", "short_term_lufs", "sample_peak_dbfs", "target_offset_db",
]
_DYNAMICS_KEYS = [
    "rms_level_dbfs", "peak_level_dbfs", "crest_factor_astats_db",
    "dynamic_range_db", "min_level_dbfs", "max_level_dbfs", "rms_peak_dbfs",
    "rms_trough_dbfs", "flat_factor", "dc_offset", "zero_crossings_rate",
    "bit_depth", "entropy",
]
_SPECTRAL_KEYS = [
    "mean", "variance", "centroid_hz", "spread_hz", "skewness", "kurtosis",
    "entropy", "flatness", "crest", "flux", "slope", "decrease", "rolloff_hz",
]


def _render_stage_domain(title: str, rec: dict, domain: str, keys: list[str]) -> str:
    stages = rec.get(domain, {}).get("stages", {})
    if not any(stages.get(s) for s in ("input", "filtered", "final")):
        return ""
    headers = ["Metric", "Definition", *_stage_headers(stages)]
    return f"## {title}\n\n" + _table(headers, _metric_rows(keys, stages))


def _render_noise(rec: dict) -> str:
    noise = rec.get("noise")
    if not noise:
        return ""
    keys = ["floor_dbfs", "floor_source", "floor_prescan_dbfs",
            "floor_astats_dbfs", "room_tone_detect_level_dbfs",
            "voice_activated", "floored_fraction", "reduction_headroom_db"]
    rows = []
    for k in keys:
        label, definition, unit = define(k)
        rows.append([label, f"{definition} ({unit})" if unit else definition,
                     _fmt(noise.get(k), unit)])
    return "## Noise Floor\n\n" + _table(["Metric", "Definition", "Value"], rows)


def _render_kv_block(title: str, data: dict, keys: list[str]) -> str:
    rows = []
    for k in keys:
        if k not in data:
            continue
        label, definition, unit = define(k)
        rows.append([label, f"{definition} ({unit})" if unit else definition,
                     _fmt(data.get(k), unit)])
    if not rows:
        return ""
    return f"{title}\n\n" + _table(["Metric", "Definition", "Value"], rows)


def _render_regions(rec: dict) -> str:
    regions = rec.get("regions")
    if not regions:
        return ""
    parts = ["## Regions"]

    room = regions.get("room_tone", {})
    parts.append("### Room Tone")
    elected = room.get("elected")
    if elected:
        flat = {k: elected.get(k) for k in (
            "start_s", "duration_s", "measured_floor_dbfs",
            "peak_level_dbfs", "crest_factor_db", "entropy")}
        spec = {k[len("spectral_"):]: v for k, v in elected.items()
                if k.startswith("spectral_")}
        sub = _render_kv_block("**Elected profile**", flat,
                               ["start_s", "duration_s", "measured_floor_dbfs",
                                "peak_level_dbfs", "crest_factor_db", "entropy"])
        if sub:
            parts.append(sub)
        sub = _render_kv_block("**Elected spectral**", spec,
                               ["centroid_hz", "flatness", "kurtosis", "flux"])
        if sub:
            parts.append(sub)
    samples = room.get("samples") or {}
    if any(samples.values()):
        headers = ["Metric", "Definition", *_stage_headers(samples)]
        keys = ["rms_level_dbfs", "peak_level_dbfs", "crest_factor_db",
                "momentary_lufs", "short_term_lufs", "true_peak_dbtp",
                "sample_peak_dbfs"]
        parts.append("**Samples**\n\n" + _table(headers, _metric_rows(keys, samples)))

    speech = regions.get("speech", {})
    parts.append("### Speech")
    elected = speech.get("elected")
    if elected:
        region = elected.get("region") or {}
        flat = {
            "start_s": region.get("start_s"),
            "duration_s": region.get("duration_s"),
            "rms_level_dbfs": elected.get("rms_level_dbfs"),
            "peak_level_dbfs": elected.get("peak_level_dbfs"),
            "crest_factor_db": elected.get("crest_factor_db"),
            "momentary_lufs": elected.get("momentary_lufs"),
            "true_peak_dbtp": elected.get("true_peak_dbtp"),
            "speech_band_body_rms_dbfs": elected.get("speech_band_body_rms_dbfs"),
            "speech_band_sib_rms_dbfs": elected.get("speech_band_sib_rms_dbfs"),
            "voicing_density": elected.get("voicing_density"),
            "score": elected.get("score"),
        }
        sub = _render_kv_block("**Elected profile**", flat, list(flat))
        if sub:
            parts.append(sub)
    cand = speech.get("candidates_summary")
    if cand:
        # (ref: renderCandidatesSummary, sections.go:377-399): count row is a
        # literal, the elected score reuses the catalogued "score" entry.
        rows = [["Evaluated count", "Number of region candidates evaluated.",
                 str(int(cand.get("evaluated_count", 0)))]]
        if "elected_score" in cand:
            label, definition, _ = define("score")
            rows.append([label, definition, _fmt(cand["elected_score"])])
        parts.append("**Candidates**\n\n"
                     + _table(["Metric", "Definition", "Value"], rows))
    samples = speech.get("samples") or {}
    if any(samples.values()):
        headers = ["Metric", "Definition", *_stage_headers(samples)]
        keys = ["rms_level_dbfs", "peak_level_dbfs", "crest_factor_db",
                "momentary_lufs", "short_term_lufs", "true_peak_dbtp",
                "sample_peak_dbfs"]
        parts.append("**Samples**\n\n" + _table(headers, _metric_rows(keys, samples)))

    gate = regions.get("gate_statistics")
    if gate:
        sub = _render_kv_block("### Gate Statistics", gate,
                               ["voiced_low_percentile_dbfs",
                                "noise_high_percentile_dbfs", "gate_separation_db"])
        if sub:
            parts.append(sub)
    return "\n\n".join(parts)


def _render_spectrograms(rec: dict) -> str:
    """(ref: sections_spectrograms.go): table grouped by kind with one
    column per present stage; cells are Markdown image links to the
    record's relative basenames; empty when no images were derived."""
    images = rec.get("spectrograms") or []
    if not images:
        return ""
    by_key = {(i["kind"], i["stage"]): i for i in images}
    present = {i["stage"] for i in images}
    stage_order = [("before", "Before"), ("after", "After"), ("input", "Input")]
    stages = [(s, h) for s, h in stage_order if s in present]
    kind_order = [("whole", "Whole file"), ("roomtone", "Room tone"),
                  ("speech", "Speech")]
    headers = ["Region", *[h for _, h in stages]]
    rows = []
    for kind, label in kind_order:
        row = [label]
        any_img = False
        for stage, _ in stages:
            img = by_key.get((kind, stage))
            if img is None:
                row.append("-")
                continue
            any_img = True
            row.append(f"![{kind} {stage}]({img['path']})")
        if any_img:
            rows.append(row)
    return "## Spectrograms\n\n" + _table(headers, rows)


def _render_interval_summary(rec: dict) -> str:
    """(ref: renderIntervalSummary, sections.go:460-485): a single-stage
    Metric | Definition | Value table — count row, the seven RMS
    distribution rows when present, the largest-gap row last; labels and
    glosses from the definitions catalogue."""
    s = rec.get("interval_summary")
    if not s:
        return ""

    def row(key, value):
        label, definition, unit = define(key)
        return [label, f"{definition} ({unit})" if unit else definition,
                _fmt(value, unit) if not isinstance(value, str) else value]

    rows = [row("interval_count", str(int(s.get("count", 0))))]
    dist = s.get("rms_distribution")
    if dist:
        for k in ("min_dbfs", "p10_dbfs", "p25_dbfs", "p50_dbfs", "p75_dbfs",
                  "p90_dbfs", "max_dbfs"):
            rows.append(row(f"rms_dist_{k}", dist.get(k)))
    if "largest_gap_db" in s:
        rows.append(row("largest_gap_db", s["largest_gap_db"]))
    return "## Interval Summary\n\n" + _table(["Metric", "Definition", "Value"], rows)


def _render_filters(rec: dict) -> str:
    filters = rec.get("filters")
    if not filters:
        return ""
    parts = ["## Filter Chain"]
    order = [
        ("Rumble high-pass", "rumble_highpass",
         [("frequency", "Hz"), ("poles", ""), ("width", ""), ("enabled", "")]),
        ("Band-limit low-pass", "bandlimit_lowpass",
         [("frequency", "Hz"), ("poles", ""), ("enabled", "")]),
        ("Noise reduction", "noise_reduction",
         [("strength", ""), ("patch_sec", "s"), ("research_sec", "s"),
          ("smooth", ""), ("afftdn_enabled", ""), ("afftdn_noise_reduction", "dB"),
          ("afftdn_noise_type", ""), ("afftdn_noise_floor", "dBFS"),
          ("afftdn_track_noise", "")]),
        ("Speech gate", "speech_gate",
         [("threshold_dbfs", "dBFS"), ("ratio", ""), ("attack", "ms"),
          ("release", "ms"), ("range_db", "dB"), ("knee", ""), ("detection", "")]),
        ("Levelling compressor", "levelling_compressor",
         [("threshold", "dBFS"), ("ratio", ""), ("attack", "ms"),
          ("release", "ms"), ("knee", ""), ("mix", "")]),
        ("De-esser", "deesser",
         [("intensity", ""), ("amount", ""), ("frequency", "")]),
        ("Adeclick", "adeclick",
         [("threshold", ""), ("window", "ms"), ("overlap", "%"), ("method", "")]),
    ]
    for title, key, fields in order:
        block = filters.get(key)
        if not block:
            continue
        rows = [[f, _fmt(block.get(f), unit) + (f" {unit}" if unit and block.get(f) is not None else "")]
                for f, unit in fields if f in block]
        parts.append(f"### {title}\n\n" + _table(["Parameter", "Value"], rows))
    diag = filters.get("diagnostics")
    if diag:
        rows = [[k, _fmt(v)] for k, v in diag.items()]
        parts.append("### Adaptation diagnostics\n\n" + _table(["Field", "Value"], rows))
    return "\n\n".join(parts)


def _render_normalisation(rec: dict) -> str:
    n = rec.get("normalisation")
    if not n:
        return ""
    keys = ["requested_target_lufs", "effective_target_lufs", "gain_applied_db",
            "within_target", "linear_mode_forced", "ceiling_dbtp", "pre_gain_db"]
    rows = []
    for k in keys:
        label, definition, unit = define(k)
        rows.append([label, f"{definition} ({unit})" if unit else definition,
                     _fmt(n.get(k), unit)])
    rows.append(["Input", "Pre-normalisation loudness / true peak",
                 f"{_fmt(n.get('input_lufs'), 'LUFS')} LUFS / {_fmt(n.get('input_dbtp'), 'dBTP')} dBTP"])
    rows.append(["Output", "Post-normalisation loudness / true peak",
                 f"{_fmt(n.get('output_lufs'), 'LUFS')} LUFS / {_fmt(n.get('output_dbtp'), 'dBTP')} dBTP"])
    return "## Normalisation\n\n" + _table(["Metric", "Definition", "Value"], rows)


def render_markdown(rec: dict, timings: Timings | None = None) -> str:
    """Render a run record to Markdown (ref: RenderMarkdown, render.go:25)."""
    if not rec:
        return ""
    sections = [
        _render_header(rec),
        _render_processing_summary(timings),
        _render_stage_domain("Loudness", rec, "loudness", _LOUDNESS_KEYS),
        _render_stage_domain("Dynamics", rec, "dynamics", _DYNAMICS_KEYS),
        _render_stage_domain("Spectral", rec, "spectral", _SPECTRAL_KEYS),
        _render_noise(rec),
        _render_regions(rec),
        _render_spectrograms(rec),
        _render_interval_summary(rec),
        _render_filters(rec),
        _render_normalisation(rec),
    ]
    parts = [s.rstrip("\n") for s in sections if s.strip()]
    return "\n\n".join(parts) + "\n"


def write_markdown_report(path: str, rec: dict, timings: Timings | None = None) -> None:
    """Atomic write (sibling dot-temp + rename, ref: report/write.go:41)."""
    from ..io.atomic import atomic_publish

    content = render_markdown(rec, timings)
    with atomic_publish(path, "report") as tmp:
        with open(tmp, "w") as f:
            f.write(content)

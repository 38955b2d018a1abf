"""Filter Chain + Analysis status boxes (string rendering).

Behavioural rebuild of internal/ui/statusboxes.go: two bordered boxes
built from the AdaptedSummary view-model, with the reference's exact row
grammar — `● label value` lit rows, `○ label ⋯` pending rows, `○ label
OFF` settled-off rows (statusboxes.go:234-264); the chain box's 8 stages
(statusboxes.go:269-321); the analysis box's 8 measurements in the
reference's row order (Gate depth on row 6, Sibilance on row 7 so it
lines up with the De-esser; statusboxes.go:326-383) including the inline
3-cell SNR-gap bar over a 0-60 dB span (separationBar,
statusboxes.go:385-396) and the square unit glyphs ㏈/㎑/㎐
(statusboxes.go:58-63).  Titles are spliced into the top border
(TestBorderTitleInTopBorder)."""

from __future__ import annotations

import unicodedata

from .summary import AdaptedSummary

PENDING = "⋯"            # valuePending (statusboxes.go:53)
GLYPH_ACTIVE = "●"
GLYPH_OFF = "○"          # also the pending glyph
UNIT_DB = "㏈"           # U+33C8 (statusboxes.go:60-63)
UNIT_KHZ = "㎑"
UNIT_HZ = "㎐"
UNIT_DBTP = "㏈TP"

CHAIN_INNER = 23         # chainBoxInnerWidth (statusboxes.go:28)
ANALYSIS_INNER = 30      # analysisBoxInnerWidth
CHAIN_LABEL_W = 10       # chainLabelWidth (statusboxes.go:35)
ANALYSIS_LABEL_W = 13    # analysisLabelWidth
SEPARATION_BAR_W = 3     # separationBarWidth (statusboxes.go:43)
SEPARATION_SPAN_DB = 60.0

CHAIN_LABELS = ("Downmix", "Hi-pass", "Lo-pass", "Denoise",
                "Gate", "Comp", "De-esser", "Limiter")
ANALYSIS_LABELS = ("Voice avg", "Noise floor", "SNR Gap", "Dynamics",
                   "True peak", "Gate depth", "Sibilance", "Loudness")


def _disp_width(s: str) -> int:
    """Terminal display width: East-Asian Wide/Fullwidth glyphs (㏈/㎑/㎐)
    count 2 cells (the reference sizes rows with lipgloss.Width)."""
    return sum(2 if unicodedata.east_asian_width(c) in ("W", "F") else 1
               for c in s)


def _status_row(glyph: str, label: str, label_w: int, value: str) -> str:
    """`<glyph> <label padded to label_w><value>` (ref: statusRow,
    statusboxes.go:234-239)."""
    return f"{glyph} {label:<{label_w}}{value}"


def _active(label: str, w: int, value: str) -> str:
    return _status_row(GLYPH_ACTIVE, label, w, value)


def _off(label: str, w: int, value: str = "OFF") -> str:
    return _status_row(GLYPH_OFF, label, w, value)


def _pending(label: str, w: int) -> str:
    return _status_row(GLYPH_OFF, label, w, PENDING)


_INDIGO_SGR = "\x1b[38;2;99;102;241m"   # the lit-border indigo #6366F1
_SGR_RESET = "\x1b[0m"


def _box(title: str, inner: int, rows: list[str], lit: bool = False,
         color: bool = False) -> str:
    """Rounded box, title spliced into the top border, one space padding
    (ref: statusBox + border title, statusboxes.go:117-140).  Once the
    summary content has landed the border lights indigo; the pending box
    stays plain (ref: TestProgressiveLightingBorder,
    statusboxes_test.go:596)."""
    width = max(inner, max((_disp_width(r) for r in rows), default=0))
    top = f"╭─ {title} " + "─" * max(0, width - 2 - len(title)) + "─╮"
    bottom = "╰" + "─" * (width + 2) + "╯"
    if color and lit:
        side_l = _INDIGO_SGR + "│" + _SGR_RESET
        side_r = side_l
        top = _INDIGO_SGR + top + _SGR_RESET
        bottom = _INDIGO_SGR + bottom + _SGR_RESET
    else:
        side_l = side_r = "│"
    body = [f"{side_l} {r}{' ' * max(0, width - _disp_width(r))} {side_r}"
            for r in rows]
    return "\n".join([top, *body, bottom])


def format_sample_rate(hz: float) -> str:
    """kHz glyph with a trimmed trailing .0: 44100 -> '44.1㎑', 48000 ->
    '48㎑' (ref: formatSampleRate, statusboxes.go:405-410)."""
    s = f"{hz / 1000.0:.1f}"
    if s.endswith(".0"):
        s = s[:-2]
    return f"{s}{UNIT_KHZ}"


def format_hz(hz: float) -> str:
    """'80 ㎐' below 1 kHz, '20.5 ㎑' at/above, trailing .0 trimmed
    (ref: formatHz, statusboxes.go:398-403)."""
    if hz >= 1000:
        s = f"{hz / 1000.0:.1f}"
        if s.endswith(".0"):
            s = s[:-2]
        return f"{s} {UNIT_KHZ}"
    return f"{hz:.0f} {UNIT_HZ}"


def separation_bar(separation_db: float) -> str:
    """Inline voice/noise bar: fill proportional to the separation over a
    0-60 dB span (ref: separationBar, statusboxes.go:385-396)."""
    frac = max(0.0, min(1.0, separation_db / SEPARATION_SPAN_DB))
    filled = max(0, min(SEPARATION_BAR_W, int(frac * SEPARATION_BAR_W + 0.5)))
    return "▰" * filled + "▱" * (SEPARATION_BAR_W - filled)


def render_filter_chain_box(s: AdaptedSummary, color: bool = False) -> str:
    """(ref: renderChainBox, statusboxes.go:269-321)."""
    w = CHAIN_LABEL_W
    if not s.chain_ready:
        return _box("Filter Chain", CHAIN_INNER,
                    [_pending(label, w) for label in CHAIN_LABELS])

    mix = "mono" if s.downmix_mono else "—"
    if s.sample_rate > 0:
        mix = f"{mix}/{format_sample_rate(s.sample_rate)}"

    if s.denoise_nlm and s.denoise_fft:
        denoise = "NLM+FFT"
    elif s.denoise_nlm:
        denoise = "NLM"
    elif s.denoise_fft:
        denoise = "FFT"
    else:
        denoise = "—"

    deesser = (_active("De-esser", w, f"i={s.deesser_i:.2f}")
               if s.deesser_on else _off("De-esser", w))

    limiter = _pending("Limiter", w)
    if s.limiter_ready:
        if s.limiter_enabled:
            limiter = _active("Limiter", w, f"{s.limiter_ceiling:.1f} {UNIT_DBTP}")
        else:
            limiter = _off("Limiter", w)

    rows = [
        _active("Downmix", w, mix),
        _active("Hi-pass", w, format_hz(s.highpass_hz)),
        _active("Lo-pass", w, format_hz(s.lowpass_hz)),
        _active("Denoise", w, denoise),
        _active("Gate", w, f"{s.gate_thresh_db:.1f} {UNIT_DB}"),
        _active("Comp", w, f"{s.comp_thresh_db:.1f} {UNIT_DB}"),
        deesser,
        limiter,
    ]
    return _box("Filter Chain", CHAIN_INNER, rows, lit=True, color=color)


def render_analysis_box(s: AdaptedSummary, color: bool = False) -> str:
    """(ref: renderAnalysisBox, statusboxes.go:326-383).  Row order: Gate
    depth row 6, Sibilance row 7 (aligns with the chain's De-esser, its
    driver), Loudness the bottom row."""
    w = ANALYSIS_LABEL_W
    if not s.chain_ready:
        return _box("Analysis", ANALYSIS_INNER,
                    [_pending(label, w) for label in ANALYSIS_LABELS])

    voice = (_active("Voice avg", w, f"{s.voice_avg_db:.1f} {UNIT_DB}")
             if s.has_speech else _off("Voice avg", w, PENDING))

    # SNR Gap needs both sides; otherwise dim/pending rather than a gap
    # against an absent floor
    if s.has_speech and s.has_noise_floor:
        sep = _active("SNR Gap", w,
                      f"{s.separation_db:.0f} {UNIT_DB} "
                      f"{separation_bar(s.separation_db)}")
    else:
        sep = _off("SNR Gap", w, PENDING)

    # unmeasured floor shows the done box's "n/a", never a bogus 0 dB
    floor = (_active("Noise floor", w, f"{s.noise_floor_db:.0f} {UNIT_DB}")
             if s.has_noise_floor else _off("Noise floor", w, "n/a"))

    sib = (_active("Sibilance", w, f"{s.sibilance_db:.0f} {UNIT_DB}")
           if s.has_sibilance else _off("Sibilance", w, PENDING))

    depth = (_active("Gate depth", w, f"{s.gate_depth_db:.0f} {UNIT_DB}")
             if s.gate_depth_db > 0 else _off("Gate depth", w, PENDING))

    rows = [
        voice,
        floor,
        sep,
        _active("Dynamics", w, f"{s.input_lra:.1f} LU → {s.gate_ratio:.1f}:1"),
        _active("True peak", w, f"{s.true_peak_dbtp:.1f} {UNIT_DBTP}"),
        depth,
        sib,
        _active("Loudness", w, f"{s.input_lufs:.1f} LUFS"),
    ]
    return _box("Analysis", ANALYSIS_INNER, rows, lit=True, color=color)

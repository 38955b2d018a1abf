"""The VU-meter gradient and peak-arrow marker contracts, ported from the
reference's progress-bar suite (ref: internal/ui/progress_bar_test.go:67-410
— TestProgressFillIsGradient, TestMeterIsGradient, TestMeterHasNoInBarPeakGlyph,
TestMeterPeakMarkerIsSingleLine, TestMeterPeakArrowTethersValue,
TestSuperscriptValue, TestMeterPeakAtCeilingStaysInBounds,
TestMeterNoPeakMarkerAtFloor, TestMeterPeakArrowIsOrange,
TestMeterPeakArrowPulses).

Layout deltas vs the reference, held deliberately: the rebuild's meter is a
single bar ROW with the level value inline (the reference renders a separate
"Level:" header line, so its block is 3 lines to our 2), the bar sits between
▐ ▌ caps (so marker columns are offset by the 1-cell cap), and the bar is 30
cells to the reference's 40.  Everything else — the piecewise green→yellow→
orange→red ramp keyed to -16 dB, the whole-length colouring, the no-in-bar-
glyph rule, the ⬑/⬏ tether-and-flip grammar, superscript values with no
unit, the static-orange value + 1.2 Hz dim↔bright orange arrow pulse — is
the reference contract."""

import re

from jivetalking_tpu.ui.live import (
    _METER_FLOOR_DB,
    _METER_WIDTH,
    _bar,
    _meter_cell,
    render_meter,
    superscript_value,
)

_SGR = re.compile(r"\x1b\[([0-9;]*)m")
_FG24 = re.compile(r"^38;2;(\d+);(\d+);(\d+)$")


def _fill_colors(line):
    """Ordered distinct 24-bit foreground colours styling the bar cells
    (the reference suite's fillColors helper)."""
    colors, cur = [], None
    for tok in re.split(r"(\x1b\[[0-9;]*m)", line):
        m = _SGR.fullmatch(tok)
        if m:
            fg = _FG24.match(m.group(1))
            cur = tuple(map(int, fg.groups())) if fg else None
            continue
        if cur is not None and any(c in tok for c in "█░▓"):
            if not colors or colors[-1] != cur:
                colors.append(cur)
    return colors


def _glyph_color(out, glyphs):
    """The active 24-bit colour at the first occurrence of any glyph (the
    reference suite's arrowColor helper)."""
    cur = None
    for tok in re.split(r"(\x1b\[[0-9;]*m)", out):
        m = _SGR.fullmatch(tok)
        if m:
            fg = _FG24.match(m.group(1))
            cur = tuple(map(int, fg.groups())) if fg else None
            continue
        if any(g in tok for g in glyphs):
            return cur
    return None


def _vivid(colors):
    return any(max(c) - min(c) > 40 for c in colors)


class TestProgressFillIsGradient:
    """(ref: TestProgressFillIsGradient :67)."""

    def test_gradient_fill_at_half(self):
        out = _bar(0.5, color=True)
        colors = _fill_colors(out)
        # drop the trailing empty-track colour; the fill itself must carry
        # multiple stops
        fill = [c for c in colors if c != (0x44, 0x44, 0x44)]
        assert len(fill) >= 3, colors
        # brand red never appears in the progress fill
        assert (164, 0, 0) not in colors
        # start endpoint: sky-blue #38BDF8 exactly
        assert fill[0] == (0x38, 0xBD, 0xF8), fill
        # the fill edge reads indigo (#6366F1) within 12 per channel
        last = fill[-1]
        assert all(abs(a - b) <= 12 for a, b in zip(last, (99, 102, 241)))
        assert _vivid(fill), fill

    def test_plain_form_carries_no_sgr(self):
        assert "\x1b" not in _bar(0.5)
        assert "\x1b" not in render_meter(-20.0, -10.0)


class TestMeterIsGradient:
    """(ref: TestMeterIsGradient :117) — a smooth green→yellow→orange→red
    ramp rather than flat zones."""

    def test_hot_meter_ramps_green_to_red(self):
        out = render_meter(-1.0, 0.0, color=True).splitlines()[0]
        colors = _fill_colors(out)
        assert len(colors) > 3, colors
        first, last = colors[0], colors[-1]
        assert first[1] > first[0] and first[1] > first[2], first  # green
        assert last[0] > last[1] and last[0] > last[2], last       # red
        assert _vivid(colors), colors

    def test_ramp_colours_empty_track_too(self):
        # the ramp spans the whole bar length (views.go:411-419): a quiet
        # level still renders the hot-end colours on the empty cells
        out = render_meter(-60.0, _METER_FLOOR_DB, color=True).splitlines()[0]
        colors = _fill_colors(out)
        assert any(c[0] > c[1] and c[0] > c[2] for c in colors), colors


class TestMeterHasNoInBarPeakGlyph:
    """(ref: TestMeterHasNoInBarPeakGlyph :157)."""

    def test_bar_line_has_no_peak_glyph(self):
        lines = render_meter(-20.0, -10.0).splitlines()
        bar_line = next(l for l in lines if "█" in l or "░" in l)
        assert "|" not in bar_line and "┃" not in bar_line


class TestMeterPeakMarkerIsSingleLine:
    """(ref: TestMeterPeakMarkerIsSingleLine :193) — bar + one marker line
    carrying an up-tip arrow (the reference's extra line is its "Level:"
    header; the rebuild's level value is inline in the bar row)."""

    def test_marker_collapses_to_one_line(self):
        for peak in (-10.0, -30.0):
            lines = render_meter(-40.0, peak).splitlines()
            assert len(lines) == 2, (peak, lines)
            assert "⬑" in lines[1] or "⬏" in lines[1]


class TestMeterPeakArrowTethersValue:
    """(ref: TestMeterPeakArrowTethersValue :236) — the marker carries the
    superscript value with no unit, the arrow aligns at the peak column
    (+1 for the ▐ cap), flipping near the right edge."""

    def test_leading_arrow_form(self):
        peak = -30.0
        line = render_meter(-40.0, peak).splitlines()[1]
        assert superscript_value(f"{peak:.1f}") in line
        assert "dB" not in line and "㏈" not in line
        assert line.index("⬑") == 1 + _meter_cell(peak)
        assert len(line) <= 1 + _METER_WIDTH

    def test_flipped_trailing_arrow_form(self):
        peak = -10.0
        line = render_meter(-40.0, peak).splitlines()[1]
        assert superscript_value(f"{peak:.1f}") in line
        assert line.rstrip().endswith("⬏")
        assert line.index("⬏") == 1 + _meter_cell(peak)
        assert len(line) <= 1 + _METER_WIDTH


class TestSuperscriptValue:
    """(ref: TestSuperscriptValue :287)."""

    def test_vectors(self):
        cases = {
            "-20.3": "⁻²⁰·³",
            "6.0": "⁶·⁰",
            "-7": "⁻⁷",
            "123456789.0": "¹²³⁴⁵⁶⁷⁸⁹·⁰",
        }
        for raw, want in cases.items():
            got = superscript_value(raw)
            assert got == want
            assert "㏈" not in got
            assert not set(got) & set("-.0123456789"), got


class TestMeterPeakAtCeilingStaysInBounds:
    """(ref: TestMeterPeakAtCeilingStaysInBounds :315)."""

    def test_ceiling_peaks_keep_arrow_in_bounds(self):
        for peak in (0.0, -0.5, -1.0):
            lines = render_meter(-40.0, peak).splitlines()
            line = lines[1]
            assert line.index("⬏") == 1 + (_METER_WIDTH - 1), (peak, line)
            for l in lines:
                assert len(l) <= 2 + _METER_WIDTH + 9


class TestMeterNoPeakMarkerAtFloor:
    """(ref: TestMeterNoPeakMarkerAtFloor :341)."""

    def test_no_marker_at_silence_floor(self):
        out = render_meter(-40.0, _METER_FLOOR_DB)
        assert "⬑" not in out and "⬏" not in out


class TestMeterPeakArrowIsOrange:
    """(ref: TestMeterPeakArrowIsOrange :351) — r > g > b with a
    substantial green component."""

    def test_arrow_is_orange_shade(self):
        out = render_meter(-40.0, -10.0, color=True)
        c = _glyph_color(out, "⬑⬏")
        assert c is not None, out
        assert c[0] > c[1] > c[2], c

    def test_value_is_static_orange(self):
        out = render_meter(-40.0, -30.0, color=True)
        c = _glyph_color(out, "⁻")
        assert c == (0xFF, 0xA5, 0x00), c


class TestMeterRampOracle:
    """The cached ramp against a per-frame oracle (ref: views_test.go:65-129
    — TestMeterRampMatchesPerFrame, TestMeterRampStableAcrossCalls,
    TestRenderAudioLevelMeterMatchesOracle): the cache must never change
    the visible meter."""

    @staticmethod
    def _oracle_ramp():
        from jivetalking_tpu.ui.live import (
            _blend1d,
            _METER_GREEN,
            _METER_ORANGE,
            _METER_RED,
            _METER_YELLOW,
        )

        # independent arithmetic: the piecewise green zone keyed to -16 dB
        gz = int(((-16.0 - _METER_FLOOR_DB) / (0.0 - _METER_FLOOR_DB))
                 * _METER_WIDTH)
        return (_blend1d(gz, _METER_GREEN, _METER_YELLOW)
                + _blend1d(_METER_WIDTH - gz, _METER_YELLOW, _METER_ORANGE,
                           _METER_RED))

    def test_ramp_matches_per_frame_oracle(self):
        from jivetalking_tpu.ui.live import _meter_ramp

        ramp = _meter_ramp()
        assert len(ramp) == _METER_WIDTH
        assert ramp == self._oracle_ramp()
        # endpoints: brand green start, brand red end
        assert ramp[0] == (0x00, 0xAA, 0x00)
        assert ramp[-1] == (0xA4, 0x00, 0x00)

    def test_ramp_stable_across_calls(self):
        from jivetalking_tpu.ui.live import _meter_ramp

        assert _meter_ramp() is _meter_ramp()

    def test_rendered_meter_stable_across_calls(self):
        # (ref: TestRenderAudioLevelMeterMatchesOracle :129) — rendering
        # through the cached ramp is deterministic at every fill level
        for lvl in (_METER_FLOOR_DB, -70.0, -65.0, -60.0, -50.0, -40.0,
                    -30.0, -20.0, -16.0, -12.0, -8.0, -6.0, -3.0, -1.0, 0.0):
            a = render_meter(lvl, _METER_FLOOR_DB, color=True)
            b = render_meter(lvl, _METER_FLOOR_DB, color=True)
            assert a == b, lvl


class TestPeakMarkerColorOracle:
    """(ref: TestPeakMarkerColorMatchesOracle, views_test.go:164-187) —
    the pulse colour sampled across a full 1.2 Hz cycle matches the
    documented channel maths `dim + phase*(bright-dim) + 0.5` exactly."""

    def test_pulse_matches_channel_oracle(self):
        import math as _math

        from jivetalking_tpu.ui.live import _METER_ORANGE, _ORANGE_DIM, _pulse_rgb

        cycle = 1.0 / 1.2
        samples = [i / 64.0 * cycle for i in range(65)]
        samples += [0.0, 0.208, 0.417, 5.0]
        for e in samples:
            phase = 0.5 * (1.0 + _math.sin(2.0 * _math.pi * 1.2 * e))
            want = tuple(int(a + phase * (b - a) + 0.5)
                         for a, b in zip(_ORANGE_DIM, _METER_ORANGE))
            assert _pulse_rgb(e) == want, e

    def test_endpoints_are_the_palette_oranges(self):
        from jivetalking_tpu.ui.live import _METER_ORANGE, _ORANGE_DIM, _pulse_rgb

        # sine trough (phase 0) = dim orange; crest (phase 1) = full orange
        assert _pulse_rgb(0.625) == _ORANGE_DIM
        assert _pulse_rgb(0.625 + 0.5 / 1.2) == _METER_ORANGE


class TestMeterPeakArrowPulses:
    """(ref: TestMeterPeakArrowPulses :364) — the arrow oscillates between
    two distinct orange shades across pulse phases; both stay orange."""

    def test_pulse_phases_differ_and_stay_orange(self):
        # 1.2 Hz sine: t=0.625 s lands on the dim trough (sin = -1),
        # t=0.208 s near the bright crest (sin ≈ +1)
        dim = _glyph_color(render_meter(-40.0, -10.0, 0.625, color=True),
                           "⬑⬏")
        bright = _glyph_color(render_meter(-40.0, -10.0, 0.208, color=True),
                              "⬑⬏")
        assert dim is not None and bright is not None
        assert dim != bright
        for c in (dim, bright):
            assert c[0] > c[1] > c[2], c

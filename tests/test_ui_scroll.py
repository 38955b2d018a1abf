"""Viewport scrolling contracts, ported from the reference's
scrollbar_test.go (182 LoC).

The reference renders a proportional thumb scrollbar beside the Bubble
Tea viewport; this rebuild scrolls a plain-text window with textual
"… N earlier/later line(s) …" indicators instead (ui/live.py
clip_to_viewport), so the thumb-geometry vectors have no counterpart.
The behavioural contracts that survive: nothing scroll-related renders
when content fits (scrollbar_test.go:99-122), indicators appear exactly
when content overflows (:124-151), the view height stays stable across
overflow states (:153-182), and the scroll offset clamps to the content
bounds.
"""

from jivetalking_tpu.ui.live import LiveModel, clip_to_viewport, handle_key


def _frame(n: int) -> str:
    return "\n".join(f"line {i:03d}" for i in range(n))


class TestScrollIndicatorGating:
    """(ref: TestScrollbarAndHintAbsentWhenContentFits :99,
    ...PresentWhenContentOverflows :124)."""

    def test_absent_when_content_fits(self):
        out = clip_to_viewport(_frame(8), height=10)
        assert "earlier line" not in out
        assert "later line" not in out
        assert out == _frame(8)

    def test_exactly_full_viewport_untouched(self):
        out = clip_to_viewport(_frame(10), height=10)
        assert out == _frame(10)

    def test_present_when_overflowing(self):
        out = clip_to_viewport(_frame(30), height=10)
        assert "earlier line" in out
        # following the tail: the last content line is visible
        assert "line 029" in out

    def test_scrolled_up_shows_later_indicator(self):
        out = clip_to_viewport(_frame(30), height=10, offset=5)
        assert "later line" in out
        assert "line 029" not in out


class TestViewportHeightStable:
    """The visible window never exceeds the viewport height, whatever the
    overflow or offset (ref: TestScrollingViewWidthStableAcrossOverflow,
    scrollbar_test.go:153-182 — the reference pins width because its
    scrollbar column appears/disappears; here the indicator rows rent
    their space from the content rows, so HEIGHT is the stable axis)."""

    def test_height_never_exceeds_viewport(self):
        for total in (5, 10, 11, 20, 100):
            for offset in (0, 1, 5, 50, 1000):
                out = clip_to_viewport(_frame(total), height=10, offset=offset)
                assert len(out.splitlines()) <= 10, (total, offset)

    def test_follow_mode_fills_viewport(self):
        out = clip_to_viewport(_frame(100), height=10, offset=0)
        assert len(out.splitlines()) == 10


class TestScrollOffsetClamp:
    """Offset clamps to the content bounds the way the reference's thumb
    pins to the strip ends (ref: the half/tall top+bottom vectors,
    scrollbar_test.go:24-33)."""

    def test_huge_offset_pins_to_top(self):
        out = clip_to_viewport(_frame(30), height=10, offset=10_000)
        # scrolled to the very top: the first line is visible and no
        # "earlier" indicator renders (nothing is hidden above)
        assert "line 000" in out
        assert "earlier line" not in out
        assert "later line" in out

    def test_mid_offset_shows_both_indicators(self):
        out = clip_to_viewport(_frame(100), height=10, offset=40)
        assert "earlier line" in out
        assert "later line" in out

    def test_model_offset_clamped_by_keys(self):
        m = LiveModel(files=["a"])
        m.scroll_offset = 0
        for _ in range(5):
            handle_key(m, "up")
        assert m.scroll_offset > 0
        for _ in range(50):
            handle_key(m, "down")
        assert m.scroll_offset == 0  # floor at follow-the-tail

    def test_end_key_returns_to_follow(self):
        m = LiveModel(files=["a"])
        m.scroll_offset = 25
        handle_key(m, "end")
        assert m.scroll_offset == 0

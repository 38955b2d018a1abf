"""Console rendering (ref: internal/ui)."""

from .console import (
    render_analysis_summary,
    render_done_box,
    render_final_summary,
    render_progress_line,
    stars_row,
)

__all__ = [
    "render_analysis_summary",
    "render_done_box",
    "render_final_summary",
    "render_progress_line",
    "stars_row",
]

"""CLI orchestration: entry point, worker pool, debug sink
(ref: cmd/jivetalking/*)."""

from .debugsink import DebugSink
from .main import build_parser, main
from .pool import (
    FileOutcome,
    PoolEvents,
    analyse_one_file,
    process_one_file,
    resolve_jobs,
    run_pool,
)

__all__ = [
    "DebugSink",
    "build_parser",
    "main",
    "FileOutcome",
    "PoolEvents",
    "analyse_one_file",
    "process_one_file",
    "resolve_jobs",
    "run_pool",
]

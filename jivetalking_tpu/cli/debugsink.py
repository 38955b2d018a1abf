"""Serialised debug log sink.

Behavioural rebuild of cmd/jivetalking/debugsink.go:14-49: one
mutex-serialised `jivetalking-debug.log` shared by all workers, with a
per-file `[basename]` prefix wrapper."""

from __future__ import annotations

import os
import threading

DEBUG_LOG_PATH = "jivetalking-debug.log"


class DebugSink:
    """Thread-safe append-only log; a None file makes every call a no-op."""

    def __init__(self, file=None):
        self._file = file
        self._lock = threading.Lock()

    @classmethod
    def open(cls, enabled: bool, path: str = DEBUG_LOG_PATH) -> "DebugSink":
        if not enabled:
            return cls(None)
        # truncate per run (ref: createDebugLogFile = os.Create, main.go:36)
        return cls(open(path, "w"))

    def logf(self, fmt: str, *args) -> None:
        if self._file is None:
            return
        line = (fmt % args) if args else fmt
        with self._lock:
            self._file.write(line.rstrip("\n") + "\n")
            self._file.flush()

    def for_file(self, path: str):
        """Per-file logger closure with a `[basename]` prefix
        (ref: debugsink.go prefix wrapper)."""
        base = os.path.basename(path)

        def log(fmt: str, *args) -> None:
            self.logf(f"[{base}] {fmt}", *args)

        return log

    def close(self) -> None:
        if self._file is not None:
            with self._lock:
                self._file.close()
                self._file = None

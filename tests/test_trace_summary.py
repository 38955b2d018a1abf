"""scripts/trace_summary.py — the parser behind every per-pass device
table in BENCH_NOTES.md / docs/PERFORMANCE.md.  Feeds it a synthetic
profiler trace and pins the aggregation contract: module spans summed
per jit program (execution-id suffix stripped), op categories summed by
name prefix, CPU-only traces rejected."""

from __future__ import annotations

import gzip
import json
import subprocess
import sys
from pathlib import Path

SCRIPT = str(Path(__file__).resolve().parents[1] / "scripts" / "trace_summary.py")


def _write_trace(root: Path, events) -> None:
    d = root / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)


def _meta(pid, name, tid=None, tname=None):
    if tid is None:
        return {"ph": "M", "pid": pid, "name": "process_name",
                "args": {"name": name}}
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": tname}}


def _x(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def _run(root: Path):
    return subprocess.run([sys.executable, SCRIPT, str(root)],
                          capture_output=True, text=True)


class TestTraceSummary:
    def test_sums_module_spans_and_op_categories(self, tmp_path):
        events = [
            _meta(3, "/device:TPU:0"),
            _meta(3, None, tid=2, tname="XLA Modules"),
            _meta(3, None, tid=3, tname="XLA Ops"),
            _meta(9, "/host:CPU"),
            # two executions of the same program (id suffix differs)
            _x(3, 2, "jit_master(111)", 0, 2000),
            _x(3, 2, "jit_master(222)", 5000, 3000),
            _x(3, 2, "jit_other(9)", 9000, 500),
            # ops: same prefix aggregates across dotted suffixes
            _x(3, 3, "fusion.1", 0, 800),
            _x(3, 3, "fusion.2", 1000, 200),
            _x(3, 3, "while.35", 2000, 700),
            # host events must be ignored
            _x(9, 1, "hostwork", 0, 99999),
        ]
        _write_trace(tmp_path, events)
        r = _run(tmp_path)
        assert r.returncode == 0, r.stderr
        out = r.stdout
        assert "5.0 ms" in out and "jit_master" in out      # 2000+3000 us
        assert "x2" in out                                   # two executions
        assert "0.5 ms" in out and "jit_other" in out
        assert "total 5.5 ms" in out
        assert "1.0 ms" in out and "fusion" in out           # 800+200 us
        assert "0.7 ms" in out and "while" in out
        assert "hostwork" not in out

    def test_rejects_cpu_only_trace(self, tmp_path):
        _write_trace(tmp_path, [_meta(9, "/host:CPU"),
                                _x(9, 1, "x", 0, 10)])
        r = _run(tmp_path)
        assert r.returncode != 0
        assert "no TPU pid" in r.stderr + r.stdout

    def test_errors_when_no_trace_file(self, tmp_path):
        r = _run(tmp_path)
        assert r.returncode != 0
        assert "no *.trace.json.gz" in r.stderr + r.stdout

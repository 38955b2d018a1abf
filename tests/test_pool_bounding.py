"""Worker-pool concurrency-bound contracts, through a DI fake on the
per-file seam (mirrors the reference's seam-based pool suite: the fake
stands in for processAudio so no audio is decoded and the pool's own
scheduling is what's under test).

Ref: TestRunWorkerPool_InFlightBoundedToOne pool_test.go:121-139,
TestRunWorkerPool_BoundHonouredForN :140-155,
TestRunWorkerPool_SerialParityJobs1 :288-316 (exactly-once dispatch),
TestLaunchWorkerPool_DoneClosesOnPreCancelledContext :381-420.
"""

import threading
import time
from concurrent.futures import Future

import pytest

import jivetalking_tpu.cli.pool as pool_mod
from jivetalking_tpu.cli.pool import FileOutcome, PoolEvents, run_pool


class _Seam:
    """Counts concurrent entries into the per-file worker body."""

    def __init__(self, dwell: float):
        self.dwell = dwell
        self.lock = threading.Lock()
        self.current = 0
        self.max_seen = 0
        self.processed: list[str] = []

    def __call__(self, path, base, events, diagnostics, cancel, finisher=None):
        with self.lock:
            self.current += 1
            self.max_seen = max(self.max_seen, self.current)
            self.processed.append(path)
        time.sleep(self.dwell)
        with self.lock:
            self.current -= 1
        outcome = FileOutcome(path=path, output_lufs=-16.0)
        if finisher is None:
            return outcome
        fut = Future()
        fut.set_result(outcome)
        return fut


@pytest.fixture
def seam(monkeypatch):
    s = _Seam(dwell=0.05)
    monkeypatch.setattr(pool_mod, "process_one_file", s)
    return s


def _fake_files(n: int) -> list[str]:
    return [f"/fake/file{i}.flac" for i in range(n)]


class TestInFlightBounding:
    def test_jobs1_bounds_in_flight_to_one(self, seam):
        """(ref: pool_test.go:121-139) jobs=1 serialises: max in-flight
        must be exactly 1 across 5 files, and all 5 complete."""
        files = _fake_files(5)
        outcomes = run_pool(files, jobs=1)
        assert seam.max_seen == 1
        assert len(outcomes) == 5
        assert [o.path for o in outcomes] == files

    def test_jobs3_bounds_and_permits_parallelism(self, seam):
        """(ref: pool_test.go:140-155) jobs=3 over 8 files caps in-flight
        at 3 while reaching real concurrency (>1): the bound both limits
        and permits."""
        files = _fake_files(8)
        outcomes = run_pool(files, jobs=3)
        assert 1 < seam.max_seen <= 3, seam.max_seen
        assert len(outcomes) == 8

    def test_each_file_dispatched_exactly_once(self, seam):
        """(ref: TestRunWorkerPool_SerialParityJobs1 pool_test.go:288-316)
        no file is processed twice and none is skipped, at any jobs."""
        files = _fake_files(6)
        run_pool(files, jobs=2)
        assert sorted(seam.processed) == sorted(files)
        assert len(seam.processed) == len(set(seam.processed))

    def test_analysis_pool_honours_same_bound(self, monkeypatch):
        """The -a pool shares the bounding contract (ref:
        analysispool_test.go slot model, :11-21)."""
        s = _Seam(dwell=0.05)

        def fake_analyse(path, base, events, diagnostics, cancel):
            return s(path, base, events, diagnostics, cancel, None)

        monkeypatch.setattr(pool_mod, "analyse_one_file", fake_analyse)
        files = _fake_files(5)
        outcomes = run_pool(files, jobs=1, analysis_only=True)
        assert s.max_seen == 1
        assert len(outcomes) == 5


class TestPreCancelledPool:
    """(ref: TestLaunchWorkerPool_DoneClosesOnPreCancelledContext
    pool_test.go:381-420): with cancellation already signalled, the
    PROCESSING pool must unwind promptly — every worker bails at its
    first cancel check, every outcome reports "cancelled", and run_pool
    returns (the wait cannot wedge)."""

    def test_processing_pool_unwinds(self, tmp_path):
        import shutil

        import numpy as np

        from jivetalking_tpu.io.wav import write_wav

        p = str(tmp_path / "tone.wav")
        rng = np.random.default_rng(0)
        write_wav(p, (0.1 * rng.standard_normal(4800)).astype(np.float32),
                  48000)
        files = [p, str(tmp_path / "copy.wav")]
        shutil.copy(p, files[1])

        cancel = threading.Event()
        cancel.set()
        completes = []
        events = PoolEvents(
            on_file_complete=lambda o: completes.append((o.path, o.error)))
        t0 = time.perf_counter()
        outcomes = run_pool(files, events=events, cancel=cancel)
        wall = time.perf_counter() - t0
        assert len(outcomes) == 2
        assert all(o.error == "cancelled" for o in outcomes)
        # prompt unwind: every worker bails at its first cancel check,
        # before any device pass runs
        assert wall < 30.0
        # the completion event still fires exactly once per file, carrying
        # the cancellation (ref: FileCompleteMsg count assertions in every
        # pool_test.go case)
        assert sorted(p for p, _ in completes) == sorted(files)
        assert all(err == "cancelled" for _, err in completes)
        # no-residue-on-cancel: no temp or output artefacts appear
        leftovers = [f for f in tmp_path.iterdir()
                     if f.name not in ("tone.wav", "copy.wav")]
        assert leftovers == []


class TestPerWorkerConfigClones:
    """(ref: TestRunAnalysisOnlyWithDeps_PassesPerWorkerConfigClones,
    main_test.go:295-366): every worker receives its OWN config clone —
    value-equal to the caller's base, object-distinct from it and from
    every sibling, so one worker's adaptation can never bleed sideways."""

    def test_each_file_gets_an_independent_clone(self, monkeypatch):
        from jivetalking_tpu.adaptive import default_filter_config

        seen = []
        lock = threading.Lock()

        def capture(path, base, events, diagnostics, cancel, finisher=None):
            with lock:
                seen.append(base)
            # a worker mutating its clone must not reach the caller's base
            base.loudnorm.target_i = -99.0
            outcome = FileOutcome(path=path)
            if finisher is None:
                return outcome
            fut = Future()
            fut.set_result(outcome)
            return fut

        monkeypatch.setattr(pool_mod, "process_one_file", capture)
        caller_base = default_filter_config()
        caller_base.rumble_highpass.frequency = 95.0
        run_pool(_fake_files(3), base=caller_base, jobs=2)

        assert len(seen) == 3
        ids = {id(c) for c in seen}
        assert len(ids) == 3 and id(caller_base) not in ids
        # clones carried the seed's non-default value in
        assert all(c.rumble_highpass.frequency == 95.0 for c in seen)
        # the caller's base survived every worker's mutation
        assert caller_base.loudnorm.target_i == -16.0


class TestPoolUnwindContracts:
    """(ref: TestLaunchWorkerPool_DoneClosesAfterPoolUnwinds,
    pool_test.go:323-380 and TestRunAnalysisPool_JobsAboveFileCountNoCap,
    analysispool_test.go:164-218)."""

    def test_returns_only_after_every_worker_unwound(self, seam):
        outcomes = run_pool(_fake_files(5), jobs=3)
        # at return no worker body is still executing and every file ran
        assert seam.current == 0
        assert len(seam.processed) == 5
        assert len(outcomes) == 5

    def test_jobs_above_file_count_runs_each_exactly_once(self, monkeypatch):
        s = _Seam(dwell=0.01)
        monkeypatch.setattr(pool_mod, "analyse_one_file", s)
        files = _fake_files(2)
        outcomes = run_pool(files, jobs=8, analysis_only=True)
        assert sorted(s.processed) == sorted(files)
        assert [o.path for o in outcomes] == files  # input order kept

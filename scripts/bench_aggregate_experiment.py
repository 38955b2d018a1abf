#!/usr/bin/env python
"""Aggregate-throughput pipelining experiments (round 3, VERDICT #1b).

Measures N distinct 5-min files through several drivers on the real chip:

  seq        — one file after another (floor)
  pool2/3    — ThreadPoolExecutor over whole process_audio calls
  pipe2/3    — same pool for compute, but delivery pulls DEFERRED to one
               dedicated puller thread (process_audio(defer_output_pull=True)):
               file N's 26 MB downlink overlaps file N+1's upload/compute
               instead of serialising inside the worker

Usage: python scripts/bench_aggregate_experiment.py [modes...]
Env: EXP_FILES (default 4), EXP_DURATION_SECS (default 300).
"""

import os
import queue
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import make_fixture  # noqa: E402
from jivetalking_tpu.pipeline import process_audio  # noqa: E402
from jivetalking_tpu.pipeline.process import finish_output_pull  # noqa: E402


def make_files(n_files, duration, sr, seed0=100):
    out = []
    base = make_fixture(duration, sr)
    for i in range(n_files):
        rng = np.random.default_rng(seed0 + i)
        noisy = base + rng.uniform(-1e-4, 1e-4, size=base.shape).astype(np.float32)
        out.append(np.clip(np.round(noisy * 32768.0), -32768, 32767).astype(np.int16))
    return out


def run_seq(files, sr):
    for f in files:
        process_audio(f, sr)


def run_pool(files, sr, workers):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(lambda f: process_audio(f, sr), files))


def run_pipe(files, sr, workers):
    """Compute pool + one dedicated puller thread."""
    from concurrent.futures import ThreadPoolExecutor

    q: "queue.Queue" = queue.Queue()
    done = []

    def puller():
        while True:
            item = q.get()
            if item is None:
                return
            pcm = finish_output_pull(item)
            done.append(pcm.shape)

    pt = threading.Thread(target=puller)
    pt.start()

    def work(f):
        res = process_audio(f, sr, defer_output_pull=True)
        q.put(res)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(work, files))
    q.put(None)
    pt.join()
    assert len(done) == len(files)


def run_prefetch(files, sr):
    """3-role pipeline: uploader thread forces device_put one file ahead
    (whole-file fused analysis then runs on the already-resident array);
    single compute thread; dedicated puller thread."""
    import jax.numpy as jnp

    upq: "queue.Queue" = queue.Queue(maxsize=1)
    plq: "queue.Queue" = queue.Queue()
    done = []

    def uploader():
        for f in files:
            dev = jax.device_put(f)
            # force the lazy wire transfer now: a dependent execute pays it
            jax.block_until_ready(jnp.sum(dev[:8]))
            upq.put(dev)
        upq.put(None)

    def puller():
        while True:
            item = plq.get()
            if item is None:
                return
            done.append(finish_output_pull(item).shape)

    ut = threading.Thread(target=uploader)
    pt = threading.Thread(target=puller)
    ut.start()
    pt.start()
    while True:
        dev = upq.get()
        if dev is None:
            break
        plq.put(process_audio(dev, sr, defer_output_pull=True))
    plq.put(None)
    ut.join()
    pt.join()
    assert len(done) == len(files)


def main():
    duration = float(os.environ.get("EXP_DURATION_SECS", "300"))
    sr = 48000
    n_files = int(os.environ.get("EXP_FILES", "4"))
    modes = sys.argv[1:] or ["seq", "pool2", "pipe2", "pipe3"]

    files = make_files(n_files, duration, sr)
    # warm compile for this shape
    process_audio(files[0], sr)
    if "prefetch" in modes:
        # the prefetch driver feeds device arrays -> whole-file analysis
        # program (not the streamed one); warm that compile separately
        t0 = time.perf_counter()
        process_audio(jax.device_put(files[0]), sr)
        print(f'{{"warm": "wholefile-analysis", "s": {time.perf_counter() - t0:.1f}}}',
              flush=True)

    total_audio = duration * n_files
    for mode in modes:
        files = make_files(n_files, duration, sr,
                           seed0=int(time.time()) % 100000)  # fresh content
        t0 = time.perf_counter()
        if mode == "seq":
            run_seq(files, sr)
        elif mode.startswith("pool"):
            run_pool(files, sr, int(mode[4:]))
        elif mode == "prefetch":
            run_prefetch(files, sr)
        elif mode.startswith("pipe"):
            run_pipe(files, sr, int(mode[4:]))
        else:
            raise SystemExit(f"unknown mode {mode}")
        wall = time.perf_counter() - t0
        print(f'{{"mode": "{mode}", "files": {n_files}, "wall_s": {wall:.2f}, '
              f'"x_realtime": {total_audio / wall:.1f}}}', flush=True)


if __name__ == "__main__":
    main()

"""BASELINE config-5 SCALE demonstration: a 64-file back catalogue through
`process_back_catalogue` on the virtual dp mesh (VERDICT r3 weak #4 — the
bucketing/memory/isolation logic at catalogue scale, exercised with tiny
rates/lengths so the run fits the CPU suite; the real-TPU aggregate for
the same path is recorded in BENCH_NOTES.md).

Covers: 64 files of mixed lengths and mixed rates (three buckets — no
pad-to-longest), every output within the loudness/TP contract with its
own trimmed length, per-file isolation at scale (one undecodable file
fails alone), and the --resume interaction (the CLI filter skips files
whose outputs exist; a partial catalogue re-run only processes the rest).
"""

import os

import numpy as np
import pytest

from jivetalking_tpu.io.flac import read_flac, write_flac
from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.parallel.batch import make_mesh, process_back_catalogue
from jivetalking_tpu.report.paths import output_audio_path


def _episode(secs, sr, seed):
    from tests.test_parallel_master import _speechlike

    x = _speechlike(int(secs * sr), sr, seed=seed)
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def catalogue(tmp_path_factory):
    """64 episodes: 30 x 4 s @ 8 kHz, 30 x 6 s @ 8 kHz, 4 x 4 s @ 11025 Hz
    — two length buckets at the common rate plus one rate bucket."""
    root = tmp_path_factory.mktemp("catalogue64")
    specs = ([(4.0, 8000)] * 30) + ([(6.0, 8000)] * 30) + ([(4.0, 11025)] * 4)
    paths = []
    for i, (secs, sr) in enumerate(specs):
        p = str(root / f"ep{i:02d}.flac")
        write_flac(p, _episode(secs, sr, seed=900 + i), sr)
        paths.append(p)
    return root, paths, specs


@pytest.fixture(scope="module")
def mastered(catalogue):
    import jax

    root, paths, specs = catalogue
    mesh = make_mesh(len(jax.devices()))
    results = process_back_catalogue(paths, out_dir=str(root), mesh=mesh)
    return root, paths, specs, results


class TestSixtyFourFileCatalogue:
    def test_all_files_master_without_error(self, mastered):
        _, _, _, results = mastered
        assert len(results) == 64
        errs = [r for r in results if "error" in r]
        assert errs == [], errs[:3]

    def test_bucketing_is_three_buckets_no_pad_to_longest(self, catalogue):
        from jivetalking_tpu.parallel.batch_chunked import bucket_files

        _, _, specs = catalogue
        entries = [{"sample_rate": sr, "n_samples": int(secs * sr)}
                   for secs, sr in specs]
        C = {8000: 8000 * 5, 11025: 11025 * 5}
        buckets = bucket_files(entries, C)
        sizes = sorted(len(b) for b in buckets)
        assert sizes == [4, 30, 30]

    def test_every_output_within_contract_and_trimmed(self, mastered):
        _, paths, specs, results = mastered
        by_path = {r["path"]: r for r in results}
        for p, (secs, sr) in zip(paths, specs):
            r = by_path[p]
            samples, rate, _ = read_flac(r["output_path"])
            assert rate == 44100, p
            loud = measure_loudness(samples[0], rate)
            assert loud.integrated_lufs == pytest.approx(
                r["effective_target_i"], abs=0.6), p
            assert loud.true_peak_db <= -0.9, p
            # per-file trim: no shared pad tail leaks into the delivery
            assert abs(samples.shape[1] - int(round(44100 * secs))) < 200, p

    def test_results_ordered_like_input(self, mastered):
        _, paths, _, results = mastered
        assert [r["path"] for r in results] == paths


class TestResumeInteraction:
    """The CLI --resume filter (cli/main.py:93-101) composes with the
    batch master: files whose outputs exist are skipped BEFORE dispatch;
    re-running the filtered remainder completes the catalogue."""

    def test_filter_skips_existing_outputs(self, mastered):
        _, paths, _, _ = mastered
        # every output exists after the full run: resume-filtering the
        # same catalogue leaves nothing to do
        remaining = [f for f in paths
                     if not os.path.exists(output_audio_path(f))]
        assert remaining == []

    def test_partial_rerun_processes_only_missing(self, mastered):
        import jax

        root, paths, specs, _ = mastered
        # simulate an interrupted run: drop two outputs (one per length
        # bucket) and resume
        victims = [paths[3], paths[33]]
        for v in victims:
            os.remove(output_audio_path(v))
        remaining = [f for f in paths
                     if not os.path.exists(output_audio_path(f))]
        assert sorted(remaining) == sorted(victims)

        mesh = make_mesh(len(jax.devices()))
        results = process_back_catalogue(remaining, out_dir=str(root),
                                         mesh=mesh)
        assert len(results) == 2
        assert not any("error" in r for r in results)
        for v in victims:
            assert os.path.exists(output_audio_path(v))


class TestIsolationAtScale:
    def test_one_bad_file_fails_alone(self, tmp_path):
        import jax

        paths = []
        for i in range(3):
            p = str(tmp_path / f"ok{i}.flac")
            write_flac(p, _episode(4.0, 8000, seed=970 + i), 8000)
            paths.append(p)
        bad = str(tmp_path / "bad.flac")
        with open(bad, "wb") as f:
            f.write(b"fLaC but not really")
        paths.insert(1, bad)

        mesh = make_mesh(len(jax.devices()))
        results = process_back_catalogue(paths, out_dir=str(tmp_path),
                                         mesh=mesh)
        assert len(results) == 4
        assert "error" in results[1]
        for i in (0, 2, 3):
            assert "error" not in results[i], results[i]
            assert os.path.isfile(results[i]["output_path"])

"""The batch master's finisher thread (parallel/batch.process_back_catalogue).

Per-file finalize (stage-result assembly + FLAC encode + outcome shaping)
runs on a single finisher thread so multi-slab catalogues overlap host
encode with the next slab's device passes.  These tests pin what the
refactor must preserve: per-file error isolation AT THE FINALIZE STEP
(an encode failure reports that file alone — ref behaviour:
pool.go:210-216 per-file isolation), input-order outcomes across slabs,
and the outcome-dict contract of successful rows.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from jivetalking_tpu.io.flac import read_flac, write_flac
from jivetalking_tpu.parallel.batch import process_back_catalogue


def _episode(secs, sr, seed):
    from tests.test_parallel_master import _speechlike

    x = _speechlike(int(secs * sr), sr, seed=seed)
    return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)


@pytest.fixture(scope="module")
def small_catalogue(tmp_path_factory):
    """Six 4 s / 8 kHz episodes — with JT_MAX_BUCKET_FILES=2 they master
    as three b=2 slabs, so the finisher carries work across slab
    boundaries."""
    root = tmp_path_factory.mktemp("finisher_cat")
    paths = []
    for i in range(6):
        p = str(root / f"fep{i}.flac")
        write_flac(p, _episode(4.0, 8000, seed=700 + i), 8000)
        paths.append(p)
    return root, paths


class TestFinisherIsolation:
    def test_encode_failure_isolates_to_its_file(self, small_catalogue,
                                                 tmp_path, monkeypatch):
        import jivetalking_tpu.io.audio as audio_mod

        root, paths = small_catalogue
        victim_stem = "fep2"
        real_save = audio_mod.save_flac

        def flaky_save(path, pcm, rate):
            if victim_stem in os.path.basename(path):
                raise OSError("simulated encoder failure")
            return real_save(path, pcm, rate)

        monkeypatch.setattr(audio_mod, "save_flac", flaky_save)
        monkeypatch.setenv("JT_MAX_BUCKET_FILES", "2")
        results = process_back_catalogue(paths, out_dir=str(tmp_path))

        assert len(results) == 6
        errs = [r for r in results if "error" in r]
        assert len(errs) == 1
        assert victim_stem in errs[0]["path"]
        assert "simulated encoder failure" in errs[0]["error"]
        for r in results:
            if "error" in r:
                continue
            assert os.path.exists(r["output_path"])
            pcm, rate, _depth = read_flac(r["output_path"])
            assert pcm.size > 0 and rate > 0

    def test_outcomes_in_input_order_across_slabs(self, small_catalogue,
                                                  tmp_path, monkeypatch):
        root, paths = small_catalogue
        monkeypatch.setenv("JT_MAX_BUCKET_FILES", "2")
        results = process_back_catalogue(paths, out_dir=str(tmp_path))
        assert [r["path"] for r in results] == paths

    def test_success_rows_carry_contract_fields(self, small_catalogue,
                                                tmp_path, monkeypatch):
        root, paths = small_catalogue
        monkeypatch.setenv("JT_MAX_BUCKET_FILES", "2")
        results = process_back_catalogue(paths[:2], out_dir=str(tmp_path))
        for r in results:
            assert "error" not in r, r
            for key in ("output_path", "output_lufs", "output_tp_db",
                        "effective_target_i", "offset_db", "result",
                        "wall_secs", "batch_wall_secs"):
                assert key in r, key
            assert r["wall_secs"] > 0 and r["batch_wall_secs"] > 0

"""Parallel/batch layer tests on the virtual 8-device CPU mesh, plus
spectrogram rendering."""

import os

import numpy as np
import pytest

from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.parallel import (
    batched_integrated_loudness,
    make_mesh,
    pad_to_batch,
)
from jivetalking_tpu.report.spectrogram import (
    render_run_spectrograms,
    render_spectrogram_image,
    spectrogram_path,
)
from jivetalking_tpu.analysis.types import Region

SR = 44100


def _tone(freq, dbfs, secs, sr=SR):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestBatchedLoudness:
    def test_matches_reference_meter(self):
        files = [
            _tone(997.0, -23.0, 8.0),
            _tone(440.0, -30.0, 6.0),
            _tone(1500.0, -16.0, 10.0),
        ]
        batch, lengths = pad_to_batch(files)
        batched = batched_integrated_loudness(batch, lengths, SR)
        for i, f in enumerate(files):
            single = measure_loudness(f, SR).integrated_lufs
            assert batched[i] == pytest.approx(single, abs=0.3), i

    def test_sharded_over_mesh(self):
        import jax

        mesh = make_mesh(min(8, len(jax.devices())))
        files = [_tone(997.0, -20.0 - 2 * i, 5.0) for i in range(8)]
        batch, lengths = pad_to_batch(files)
        out = batched_integrated_loudness(batch, lengths, SR, mesh=mesh)
        assert out.shape == (8,)
        # monotone: each file 2 dB quieter
        diffs = np.diff(out)
        assert np.allclose(diffs, -2.0, atol=0.3)

    def test_padding_does_not_leak(self):
        # short file padded against a much longer one: gating must ignore pad
        files = [_tone(997.0, -23.0, 2.0), _tone(997.0, -23.0, 20.0)]
        batch, lengths = pad_to_batch(files)
        out = batched_integrated_loudness(batch, lengths, SR)
        assert out[0] == pytest.approx(out[1], abs=0.3)


class TestMesh:
    def test_make_mesh(self):
        import jax

        n = min(4, len(jax.devices()))
        mesh = make_mesh(n)
        assert mesh.devices.size == n
        assert mesh.axis_names == ("dp",)


class TestSpectrogram:
    def test_render_png(self, tmp_path):
        x = np.concatenate([_tone(440.0, -20.0, 1.0), _tone(5000.0, -30.0, 1.0)])
        path = str(tmp_path / "spec.png")
        render_spectrogram_image(x, SR, path)
        from PIL import Image

        img = Image.open(path)
        assert img.size == (1024 + 56, 512)  # spectrum + legend strip
        # the 440 Hz half must light up low rows; check non-trivial content
        arr = np.asarray(img)
        assert arr.max() > 100
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]

    def test_region_window(self, tmp_path):
        x = np.concatenate([_tone(440.0, -20.0, 2.0), np.zeros(2 * SR, np.float32)])
        p1 = str(tmp_path / "tone.png")
        p2 = str(tmp_path / "silence.png")
        render_spectrogram_image(x, SR, p1, start=0.0, duration=2.0)
        render_spectrogram_image(x, SR, p2, start=2.0, duration=2.0)
        from PIL import Image

        a1 = np.asarray(Image.open(p1))[:, :1024].astype(float).mean()
        a2 = np.asarray(Image.open(p2))[:, :1024].astype(float).mean()
        assert a1 > a2 + 5  # tone window visibly brighter than silence

    def test_run_set_naming(self, tmp_path):
        x = _tone(440.0, -20.0, 3.0)
        stem = str(tmp_path / "ep1")
        rendered = render_run_spectrograms(
            stem,
            {"before": x, "after": x * 0.5},
            SR,
            noise_region=Region(0.5, 1.5),
            speech_region=Region(1.5, 3.0),
        )
        assert len(rendered) == 6  # 3 kinds x 2 stages
        assert spectrogram_path(stem, "whole", "before") in rendered
        assert spectrogram_path(stem, "roomtone", "after") in rendered
        assert spectrogram_path(stem, "speech", "before") in rendered
        for p in rendered:
            assert os.path.exists(p)


class TestBatchedMaster:
    """The back-catalogue shape: the fused pass-2/3/4 master vmapped over a
    dp-sharded batch, per-file adapted params as operand arrays — each row
    must equal the single-file program's output."""

    def test_matches_per_file_master(self):
        import jax
        from jax.sharding import Mesh
        from jivetalking_tpu.adaptive import adapt_config, default_filter_config
        from jivetalking_tpu.analysis import analyse_audio
        from jivetalking_tpu.parallel.batch import batched_master
        from jivetalking_tpu.pipeline.fused import fused_master

        sr = 8000
        n = sr * 3
        rng = np.random.default_rng(11)
        files, cfgs, metas = [], [], []
        for i in range(4):
            x = (0.05 * (1 + i) * rng.standard_normal(n)).astype(np.float32)
            m = analyse_audio(x, sr)
            cfg, _ = adapt_config(default_filter_config(), m)
            cfg.resample.enabled = False   # keep both paths at sr
            if i == 1:
                # per-file afftdn depth must ride the batch (review r3
                # finding #4: the batch path hardcoded 12 dB)
                cfg.noise_reduction.afftdn_noise_reduction = 20.0
            files.append(x)
            cfgs.append(cfg)
            metas.append(m)

        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        z, metrics = batched_master(
            np.stack(files), sr, cfgs, metas, out_rate=sr, mesh=mesh)
        assert z.shape[0] == 4

        for i in range(4):
            zchunks, rate, fm, _t = fused_master(files[i], sr, cfgs[i], metas[i])
            zi = np.concatenate([np.asarray(c) for c in zchunks])
            assert rate == sr
            # s16 outputs: vmap-vs-single float reassociation can flip a
            # sample sitting exactly on a quantisation boundary by 1 LSB
            np.testing.assert_allclose(
                np.asarray(z[i]), zi, rtol=1e-4, atol=1.0)
            assert float(metrics["final_i"][i]) == pytest.approx(
                float(fm["final"]["integrated"]), abs=0.01)


class TestBackCatalogue:
    """BASELINE config 5 end to end: unequal-length episodes -> one padded
    batched master -> per-file trimmed FLAC publishes within target."""

    def test_catalogue_masters_within_target(self, tmp_path):
        import jax
        from jax.sharding import Mesh

        from jivetalking_tpu.io.flac import read_flac, write_flac
        from jivetalking_tpu.metering.ebur128 import measure_loudness
        from jivetalking_tpu.parallel.batch import process_back_catalogue
        from tests.test_parallel_master import _speechlike

        sr = 8000
        paths = []
        for i, secs in enumerate((6.0, 5.0, 4.5)):
            n = int(secs * sr)
            x = _speechlike(n, sr, seed=60 + i)
            xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
            p = str(tmp_path / f"ep{i}.flac")
            write_flac(p, xi, sr)
            paths.append(p)

        mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("dp",))
        # 3 files over a 4-chip dp mesh won't shard evenly; use host batch
        results = process_back_catalogue(paths, out_dir=str(tmp_path))

        assert len(results) == 3
        for r, secs in zip(results, (6.0, 5.0, 4.5)):
            assert r["output_path"].endswith("-processed.flac")
            samples, rate, _ = read_flac(r["output_path"])
            assert rate == 44100
            loud = measure_loudness(samples[0], rate)
            assert loud.integrated_lufs == pytest.approx(
                r["effective_target_i"], abs=0.6)
            assert loud.true_peak_db <= -0.9
            # file lengths trimmed per episode (no shared pad tail)
            assert abs(samples.shape[1] - int(round(44100 * secs))) < 200

    def test_out_dir_created_if_missing(self, tmp_path):
        # regression (found on the real-TPU batch bench 2026-08-18): a
        # non-existent out_dir made every file fail at FLAC encode AFTER
        # its device passes ran; process_back_catalogue must create it
        from jivetalking_tpu.io.flac import write_flac
        from jivetalking_tpu.parallel.batch import process_back_catalogue
        from tests.test_parallel_master import _speechlike

        sr = 8000
        x = _speechlike(int(4.0 * sr), sr, seed=77)
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        p = str(tmp_path / "ep.flac")
        write_flac(p, xi, sr)

        out_dir = tmp_path / "nested" / "out"  # does not exist yet
        results = process_back_catalogue([p], out_dir=str(out_dir))
        assert "error" not in results[0], results[0]
        assert os.path.isfile(results[0]["output_path"])


class TestConfig5BatchChunked:
    """The config-5 composition (VERDICT r2 #2): the chunked fused passes
    vmapped over a length-bucketed file batch on the 8-device mesh — many
    chunks per file (the 45-min episode SHAPE), mixed lengths bucketed
    without pad-to-longest, mixed rates in separate buckets, and the full
    metrics tree per file.  A true-duration 8x45-min run is env-gated
    (JT_CONFIG5_FULL=1) — same code path, more wall."""

    def _episode(self, secs, sr, seed):
        from tests.test_parallel_master import _speechlike

        n = int(secs * sr)
        x = _speechlike(n, sr, seed=seed)
        return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

    def test_eight_episodes_many_chunks_on_mesh(self, tmp_path):
        import os

        import jax

        from jivetalking_tpu.io.flac import read_flac, write_flac
        from jivetalking_tpu.metering.ebur128 import measure_loudness
        from jivetalking_tpu.parallel.batch import make_mesh, process_back_catalogue

        sr = 8000
        full = os.environ.get("JT_CONFIG5_FULL") == "1"
        secs = [2700.0] * 8 if full else [38.0, 40.0, 39.5, 37.0, 41.0, 36.5, 40.5, 38.5]
        paths = []
        for i, s in enumerate(secs):
            p = str(tmp_path / f"ep{i}.flac")
            write_flac(p, self._episode(s, sr, seed=80 + i), sr)
            paths.append(p)

        mesh = make_mesh(len(jax.devices()))
        import jivetalking_tpu.parallel.batch_chunked as BCK

        old = BCK.BATCH_CHUNK_SECS
        BCK.BATCH_CHUNK_SECS = 2700.0 / 16 if full else 5.0
        try:
            results = process_back_catalogue(paths, out_dir=str(tmp_path), mesh=mesh)
        finally:
            BCK.BATCH_CHUNK_SECS = old

        assert len(results) == 8
        assert not any("error" in r for r in results), results
        for r, s in zip(sorted(results, key=lambda r: r["path"]), secs):
            samples, rate, _ = read_flac(r["output_path"])
            assert rate == 44100
            loud = measure_loudness(samples[0], rate)
            assert loud.integrated_lufs == pytest.approx(
                r["effective_target_i"], abs=0.6)
            assert loud.true_peak_db <= -0.9
            assert abs(samples.shape[1] - int(round(44100 * s))) < 200
            # the full metrics tree came back per file (the artefact spine
            # consumes it)
            res = r["result"]
            assert res.filtered.astats is not None
            assert res.final.loudness is not None
            assert res.final.spectral.found

    def test_buckets_by_length_and_rate(self, tmp_path):
        from jivetalking_tpu.parallel.batch import process_back_catalogue
        from jivetalking_tpu.parallel.batch_chunked import bucket_files

        # bucket_files: same rate, lengths 1 chunk apart -> separate buckets
        entries = [
            {"sample_rate": 8000, "n_samples": 8000 * 4},
            {"sample_rate": 8000, "n_samples": 8000 * 41},
            {"sample_rate": 8000, "n_samples": 8000 * 42},
            {"sample_rate": 11025, "n_samples": 11025 * 4},
        ]
        C8 = 8000 * 5
        buckets = bucket_files(entries, {8000: C8, 11025: 11025 * 5})
        # file 0 -> 1 chunk; files 1,2 -> the same 9-chunk bucket (41 s and
        # 42 s both ceil to 9 x 5 s); file 3 -> its own rate bucket
        assert sorted(map(sorted, buckets)) == [[0], [1, 2], [3]]

    def test_buckets_split_on_dsp_flags(self):
        """Files whose adapted configs disable NLM/afftdn/declick must not
        share a bucket with normal files: the flags are STATIC in the
        vmapped chunk programs, and collapsing them let one
        voice_activated file switch off spectral denoising for every
        other file in its bucket (code-review r3 finding #1)."""
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.parallel.batch_chunked import (
            batched_master_chunked,
            bucket_files,
        )

        on = default_filter_config()
        off = default_filter_config()
        off.noise_reduction.afftdn_enabled = False
        entries = [
            {"sample_rate": 8000, "n_samples": 8000 * 4, "eff": on},
            {"sample_rate": 8000, "n_samples": 8000 * 4, "eff": off},
            {"sample_rate": 8000, "n_samples": 8000 * 4, "eff": on},
        ]
        buckets = bucket_files(entries, {8000: 8000 * 5})
        assert sorted(map(sorted, buckets)) == [[0, 2], [1]]

        # and the master refuses a mis-bucketed mixed-flag call outright
        import numpy as np
        import pytest

        from jivetalking_tpu.analysis.analyser import AudioMeasurements

        ms = []
        for _ in range(2):
            m = AudioMeasurements()
            m.device_pcm = np.zeros(8000, np.float32)
            ms.append(m)
        with pytest.raises(ValueError, match="dsp-enable flags"):
            batched_master_chunked(ms, [on, off], 8000)

    def test_mixed_rates_end_to_end(self, tmp_path):
        from jivetalking_tpu.io.flac import read_flac, write_flac
        from jivetalking_tpu.metering.ebur128 import measure_loudness
        from jivetalking_tpu.parallel.batch import process_back_catalogue

        paths = []
        for i, sr in enumerate((8000, 11025)):
            p = str(tmp_path / f"mix{i}.flac")
            write_flac(p, self._episode(5.0, sr, seed=90 + i), sr)
            paths.append(p)
        results = process_back_catalogue(paths, out_dir=str(tmp_path))
        assert len(results) == 2
        assert not any("error" in r for r in results), results
        for r in results:
            samples, rate, _ = read_flac(r["output_path"])
            assert rate == 44100
            loud = measure_loudness(samples[0], rate)
            assert loud.integrated_lufs == pytest.approx(
                r["effective_target_i"], abs=0.6)

    def test_batched_analysis_matches_single_file(self):
        from jivetalking_tpu.analysis.analyser import analyse_audio
        from jivetalking_tpu.parallel.batch_chunked import batched_analysis

        sr = 8000
        files = [self._episode(s, sr, seed=70 + i)
                 for i, s in enumerate((6.0, 5.0, 7.5))]
        ms = batched_analysis(files, sr, chunk_secs=3.0)
        for x, m in zip(files, ms):
            want = analyse_audio(x, sr)
            assert m.loudness.input_i == pytest.approx(want.loudness.input_i, abs=1e-3)
            assert m.loudness.input_tp == pytest.approx(want.loudness.input_tp, abs=1e-3)
            assert m.dynamics.rms_level == pytest.approx(want.dynamics.rms_level, abs=1e-3)
            assert m.dynamics.entropy == pytest.approx(want.dynamics.entropy, abs=1e-3)
            assert m.noise.floor == pytest.approx(want.noise.floor, abs=0.1)
            assert (m.vad.speech_profile is None) == (want.vad.speech_profile is None)
            if m.vad.speech_profile is not None:
                assert m.vad.speech_profile.region.start == pytest.approx(
                    want.vad.speech_profile.region.start, abs=0.3)

    def test_batched_analysis_device_rows_match_host_path(self):
        """The upload-as-ready path: device-resident mono rows analyse to
        the same numbers the host-slab path produces (the slabs become
        device-side dynamic_slices of the resident rows)."""
        import jax.numpy as jnp

        from jivetalking_tpu.parallel.batch_chunked import batched_analysis

        sr = 8000
        files = [self._episode(s, sr, seed=80 + i)
                 for i, s in enumerate((6.0, 5.0))]
        ms_host = batched_analysis(files, sr, chunk_secs=3.0)
        ms_dev = batched_analysis([jnp.asarray(f) for f in files], sr,
                                  chunk_secs=3.0)
        for mh, md in zip(ms_host, ms_dev):
            assert md.loudness.input_i == pytest.approx(
                mh.loudness.input_i, abs=1e-4)
            assert md.loudness.input_tp == pytest.approx(
                mh.loudness.input_tp, abs=1e-4)
            assert md.dynamics.rms_level == pytest.approx(
                mh.dynamics.rms_level, abs=1e-4)
            assert md.noise.floor == pytest.approx(mh.noise.floor, abs=1e-3)

    def test_batched_analysis_mixed_dtype_rows_not_value_promoted(self):
        """A mixed int16/float32 device batch must NOT ride the stacked
        device path: jnp.stack would VALUE-promote the int16 rows
        (100 -> 100.0f, skipping the /32768 scaling that keys on the slab
        dtype).  The guard falls back to the host path; the int16 file's
        loudness must match its float32 rendition of the same signal."""
        import jax.numpy as jnp

        from jivetalking_tpu.parallel.batch_chunked import batched_analysis

        sr = 8000
        raw = self._episode(6.0, sr, seed=91)             # int16
        as_f32 = (raw.astype(np.float32) / 32768.0)       # same signal
        ms = batched_analysis([jnp.asarray(raw), jnp.asarray(as_f32)], sr,
                              chunk_secs=3.0)
        assert ms[0].loudness.input_i == pytest.approx(
            ms[1].loudness.input_i, abs=1e-3)
        assert ms[0].dynamics.peak_level == pytest.approx(
            ms[1].dynamics.peak_level, abs=1e-3)
        # sanity: neither read as a +90 dB int16-valued float signal
        assert ms[0].dynamics.peak_level < 0.5
        assert ms[1].dynamics.peak_level < 0.5


class TestSpectrogramPairContract:
    """Identical bounds yield byte-identical images, so the before/after
    members of a pair (which share their bounds) render the SAME time
    window (ref: TestSpectrogramFilterSpecDeterministic,
    spectrogram_test.go:124-146; the frozen-param single definition :146)."""

    def test_same_bounds_byte_identical(self, tmp_path):
        x = np.concatenate([_tone(440.0, -20.0, 2.0), _tone(2000.0, -25.0, 2.0)])
        cases = [(None, None), (0.0, 2.0), (1.25, 2.5)]
        for i, (start, dur) in enumerate(cases):
            p1 = str(tmp_path / f"a{i}.png")
            p2 = str(tmp_path / f"b{i}.png")
            render_spectrogram_image(x, SR, p1, start=start, duration=dur)
            render_spectrogram_image(x, SR, p2, start=start, duration=dur)
            assert open(p1, "rb").read() == open(p2, "rb").read(), (start, dur)

    def test_frozen_params_single_definition(self):
        # ONE frozen geometry serves every branch (whole + regions)
        from jivetalking_tpu.report import spectrogram as sg

        assert (sg.WIDTH, sg.HEIGHT) == (1024, 512)
        assert sg._WIN == 2048
        # every rendered kind goes through the same render function — the
        # run-set derives from the one KIND_* definition set
        assert {sg.KIND_WHOLE, sg.KIND_ROOMTONE, sg.KIND_SPEECH} == \
            {"whole", "roomtone", "speech"}

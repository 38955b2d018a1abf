"""Chunked fused master parity vs the whole-file fused master.

The chunked form (pipeline/fused_chunked.py) must reproduce
`fused.fused_master`'s delivery audio and metrics: exact carried state for
the followers/limiters, halo'd overlap-discard for the FIR/STFT ops,
window-END-assigned metering partials.  Known divergences: NLM within
patch+research extent of the FILE edges, declick p90-grid seams (no
clicks in these fixtures), float re-association in partial sums.
"""

import numpy as np
import pytest

from tests.test_parallel_master import _speechlike


def _setup(sr, n, seed=21):
    from jivetalking_tpu.adaptive import adapt_config, default_filter_config
    from jivetalking_tpu.analysis import analyse_audio

    x = _speechlike(n, sr, seed=seed)
    m = analyse_audio(x, sr)
    cfg, _ = adapt_config(default_filter_config(), m)
    return x, m, cfg


class TestChunkedParity:
    def _compare(self, sr, n, out_rate):
        import jax.numpy as jnp

        from jivetalking_tpu.pipeline.fused import fused_master
        from jivetalking_tpu.pipeline.fused_chunked import (
            chunk_length,
            fused_master_chunked,
        )

        x, m, cfg = _setup(sr, n)
        if out_rate == sr:
            cfg.resample.enabled = False
        else:
            cfg.resample.enabled = True
            cfg.resample.sample_rate = out_rate

        C = chunk_length(sr, out_rate, target_secs=3.0)
        assert C < n, "fixture must span several chunks"

        zc, rate_c, fm_c, _ = fused_master_chunked(
            jnp.asarray(x), sr, cfg, m, chunk_secs=3.0)
        zw, rate_w, fm_w, _ = fused_master(jnp.asarray(x), sr, cfg, m)

        assert rate_c == rate_w == out_rate
        a = np.concatenate([np.asarray(c) for c in zc]).astype(np.int32)
        b = np.concatenate([np.asarray(c) for c in zw]).astype(np.int32)
        assert a.shape == b.shape
        # interior within 2 LSB; NLM file-edge divergence allowed
        edge = 256
        d = np.abs(a[edge:-edge] - b[edge:-edge])
        assert float(np.mean(d <= 1)) > 0.999
        assert int(d.max()) <= 4
        return fm_c, fm_w

    def test_audio_and_metrics_identity_rate(self):
        sr = 8000
        n = 4 * 25600 + 1234          # partial final chunk exercises masking
        fm_c, fm_w = self._compare(sr, n, sr)

        for stage in ("filtered", "pass3", "final"):
            assert float(fm_c[stage]["integrated"]) == pytest.approx(
                float(fm_w[stage]["integrated"]), abs=0.02)
            assert float(fm_c[stage]["lra"]) == pytest.approx(
                float(fm_w[stage]["lra"]), abs=0.05)
            assert float(fm_c[stage]["true_peak"]) == pytest.approx(
                float(fm_w[stage]["true_peak"]), rel=2e-3)
        for k in ("offset_db", "effective_i", "measured_i", "ceiling_db"):
            assert float(fm_c["plan"][k]) == pytest.approx(
                float(fm_w["plan"][k]), abs=0.02)
        assert bool(fm_c["plan"]["needed"]) == bool(fm_w["plan"]["needed"])

        # astats core dict parity (the assemble_astats inputs)
        af, aw = fm_c["final_astats"], fm_w["final_astats"]
        for k in ("rms_lin", "peak_lin", "dc", "zc", "entropy",
                  "rms_peak", "rms_trough", "noise_floor_lin"):
            assert float(af[k]) == pytest.approx(
                float(aw[k]), rel=2e-3, abs=1e-5), k
        # spectral means
        for k, v in fm_w["final_spectral"].items():
            assert float(fm_c["final_spectral"][k]) == pytest.approx(
                float(v), rel=5e-3, abs=1e-4), k
        # region dicts
        for rk, rv in fm_w["regions"].items():
            for k in ("rms", "peak", "tp", "momentary"):
                assert float(fm_c["regions"][rk][k]) == pytest.approx(
                    float(rv[k]), rel=5e-3, abs=0.05), (rk, k)

    def test_audio_parity_resampled(self):
        sr = 8000
        n = 3 * 25600 + 800
        self._compare(sr, n, 4000)


class TestStreamedAnalysis:
    """fused_analysis_streamed must match the whole-file fused_analysis
    (pipeline/fused.py) metric for metric — it feeds the same interval
    engine / VAD / adaptation stack."""

    def test_parity_vs_whole_file(self):
        import jax.numpy as jnp

        from jivetalking_tpu.pipeline.fused import fused_analysis
        from jivetalking_tpu.pipeline.fused_chunked import (
            fused_analysis_streamed,
        )

        sr = 8000
        n = 3 * 26624 + 997     # several chunks + ragged tail
        x = _speechlike(n, sr, seed=33)
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)

        mono_s, out_s = fused_analysis_streamed(xi, sr, chunk_secs=3.0)
        mono_w, out_w = fused_analysis(jnp.asarray(xi), sr)

        np.testing.assert_allclose(np.asarray(mono_s), np.asarray(mono_w),
                                   atol=1e-7)
        for k in ("integrated", "lra", "rel_thresh"):
            assert float(out_s["loudness"][k]) == pytest.approx(
                float(out_w["loudness"][k]), abs=0.02), k
        for k in ("sample_peak", "true_peak"):
            assert float(out_s["loudness"][k]) == pytest.approx(
                float(out_w["loudness"][k]), rel=2e-3), k
        np.testing.assert_allclose(
            np.asarray(out_s["loudness"]["momentary"]),
            np.asarray(out_w["loudness"]["momentary"]), atol=0.02)
        for k in ("rms_lin", "peak_lin", "dc", "zc", "entropy", "rms_peak",
                  "rms_trough", "noise_floor_lin", "min_count", "max_count"):
            assert float(out_s["astats"][k]) == pytest.approx(
                float(out_w["astats"][k]), rel=2e-3, abs=1e-5), k
        for k, v in out_w["spectral"].items():
            a = np.asarray(out_s["spectral"][k])
            b = np.asarray(v)
            assert a.shape == b.shape, k
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4,
                                       err_msg=k)
        np.testing.assert_allclose(out_s["iv_sumsq"], np.asarray(out_w["iv_sumsq"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(out_s["iv_peak"], np.asarray(out_w["iv_peak"]),
                                   rtol=1e-5)


class TestProcessAudioChunkedRouting:
    """process_audio must route past-threshold files through the chunked
    fused master and keep the full ProcessResult contract (metrics
    assembly, normalisation block, delivery PCM, measured timings)."""

    def test_long_file_routes_through_chunked(self, monkeypatch):
        from jivetalking_tpu.pipeline.process import process_audio

        called = {}
        import jivetalking_tpu.pipeline.fused_chunked as FC

        orig = FC.fused_master_chunked

        def spy(*a, **k):
            called["chunked"] = True
            return orig(*a, **k)

        monkeypatch.setattr(FC, "fused_master_chunked", spy)
        # lower the horizon so a 13 s fixture chunks (several 3.2 s chunks)
        import jivetalking_tpu.pipeline.chunked as CH

        monkeypatch.setattr(CH, "CHUNK_THRESHOLD_SECS", 10.0)

        sr = 8000
        n = 4 * 25600 + 1234
        x = _speechlike(n, sr, seed=5)
        fracs = []
        res = process_audio(x, sr, progress=lambda s, f: fracs.append((s, f)))

        assert called.get("chunked")
        assert res.output_rate == 44100
        assert res.output_audio.dtype.name == "int16"
        assert res.output_audio.size == n * 441 // 80
        assert res.normalisation.output_lufs == pytest.approx(
            res.final.loudness.integrated_lufs)
        assert res.final.loudness.integrated_lufs == pytest.approx(
            res.normalisation.effective_target_i, abs=0.5)
        assert res.pass_timings["processing"] > 0
        assert res.pass_timings["normalising"] > 0
        # in-pass fractional progress moved (the chunked path reports
        # per-chunk fractions, not just 0/1 stage jumps)
        proc_fracs = [f for s, f in fracs if s == "processing"]
        assert any(0.0 < f < 1.0 for f in proc_fracs)
        assert res.filtered.astats is not None
        assert res.final.astats is not None


class TestReaderAnalysis:
    def test_from_reader_matches_array_streamed(self, tmp_path):
        import jax.numpy as jnp

        from jivetalking_tpu.io.flac import FlacStreamReader, write_flac
        from jivetalking_tpu.pipeline.fused_chunked import (
            fused_analysis_from_reader,
            fused_analysis_streamed,
        )

        sr = 8000
        n = 2 * 26624 + 513
        x = _speechlike(n, sr, seed=44)
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        p = str(tmp_path / "long.flac")
        write_flac(p, xi, sr)

        with FlacStreamReader(p) as r:
            mono_r, out_r = fused_analysis_from_reader(r, sr, chunk_secs=3.0)
        mono_a, out_a = fused_analysis_streamed(xi, sr, chunk_secs=3.0)

        np.testing.assert_allclose(np.asarray(mono_r), np.asarray(mono_a),
                                   atol=1e-7)
        assert float(out_r["loudness"]["integrated"]) == pytest.approx(
            float(out_a["loudness"]["integrated"]), abs=1e-3)
        assert float(out_r["astats"]["rms_lin"]) == pytest.approx(
            float(out_a["astats"]["rms_lin"]), rel=1e-5)
        np.testing.assert_allclose(out_r["iv_sumsq"], out_a["iv_sumsq"],
                                   rtol=1e-6)

    def test_process_audio_accepts_reader(self, tmp_path, monkeypatch):
        from jivetalking_tpu.io.flac import FlacStreamReader, write_flac
        from jivetalking_tpu.pipeline.process import process_audio
        import jivetalking_tpu.pipeline.chunked as CH

        monkeypatch.setattr(CH, "CHUNK_THRESHOLD_SECS", 10.0)
        sr = 8000
        n = 2 * 25600 + 800
        x = _speechlike(n, sr, seed=45)
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        p = str(tmp_path / "ep.flac")
        write_flac(p, xi, sr)

        with FlacStreamReader(p) as r:
            res = process_audio(r, sr)
        assert res.output_audio.size == n * 441 // 80
        assert res.final.loudness.integrated_lufs == pytest.approx(
            res.normalisation.effective_target_i, abs=0.5)


class TestChunkedRegionPartials:
    def test_regions_spanning_chunk_boundaries(self):
        """Force elected regions that straddle chunk boundaries and pin the
        chunked region metering against the whole-file fused master."""
        import jax.numpy as jnp

        from jivetalking_tpu.analysis.types import (
            Region,
            RegionSample,
            SpeechCandidate,
        )
        from jivetalking_tpu.pipeline.fused import fused_master
        from jivetalking_tpu.pipeline.fused_chunked import fused_master_chunked

        sr = 8000
        n = 4 * 25600          # C = 25600 at chunk_secs=3.0
        x, m, cfg = _setup(sr, n, seed=77)
        cfg.resample.enabled = False
        # noise region straddles the chunk-0/1 boundary (25600 = 3.2 s);
        # speech region straddles chunks 2/3
        m.vad.noise_region = Region(start=2.0, end=5.0)
        m.vad.speech_profile = SpeechCandidate(
            region=Region(start=8.0, end=11.0), sample=RegionSample())

        _, _, fm_c, _ = fused_master_chunked(jnp.asarray(x), sr, cfg, m,
                                             chunk_secs=3.0)
        _, _, fm_w, _ = fused_master(jnp.asarray(x), sr, cfg, m)

        for rk in ("filtered_noise", "filtered_speech", "final_noise",
                   "final_speech"):
            for k in ("rms", "peak", "tp", "momentary"):
                assert float(fm_c["regions"][rk][k]) == pytest.approx(
                    float(fm_w["regions"][rk][k]), rel=5e-3, abs=1e-4), (rk, k)
            # masked spectral means over the region frames
            for k, v in fm_w["regions"][rk].items():
                if k.startswith("spec_"):
                    assert float(fm_c["regions"][rk][k]) == pytest.approx(
                        float(v), rel=1e-2, abs=1e-3), (rk, k)


class TestProgressCadence:
    def test_stage_cadence_contract(self, monkeypatch):
        """(ref: TestApplyNormalisationProgressCadenceGuard,
        normalise_test.go:937-1020): every pass opens with (pass, 0.0),
        reports monotone in-pass values in [0, 1], and closes with exactly
        (pass, 1.0); 1.0 never appears before the pass has finished; the
        passes arrive in pipeline order."""
        import jivetalking_tpu.pipeline.chunked as CH
        from jivetalking_tpu.pipeline.process import process_audio

        monkeypatch.setattr(CH, "CHUNK_THRESHOLD_SECS", 10.0)
        sr = 8000
        x = _speechlike(4 * 25600, sr, seed=9)

        calls = []
        process_audio(x, sr, progress=lambda s, f: calls.append((s, f)))

        stages = [s for s, _ in calls]
        # pipeline order: analysis strictly before processing before
        # normalising (first appearance)
        order = []
        for s in stages:
            if s not in order:
                order.append(s)
        assert order == ["analysis", "processing", "normalising"]

        for stage in order:
            fr = [f for s, f in calls if s == stage]
            assert fr[0] == 0.0, stage                    # opens at 0.0
            assert fr[-1] == 1.0, stage                   # closes at 1.0
            assert all(0.0 <= f <= 1.0 for f in fr), stage
            assert fr == sorted(fr), stage                # monotone
            # 1.0 only once the pass is complete: after the first 1.0 no
            # later event of this stage reports anything below 1.0
            first_full = fr.index(1.0)
            assert all(f == 1.0 for f in fr[first_full:]), stage
        # no stage event arrives after a LATER stage has begun, except the
        # completion re-reports at exactly 1.0
        seen_norm = False
        for s, f in calls:
            if s == "normalising":
                seen_norm = True
            elif seen_norm:
                assert f == 1.0, (s, f)


class TestChunkedCancellation:
    def test_interrupted_error_propagates_from_progress(self, monkeypatch):
        """The pool cancels by raising from its progress callback; the
        chunked master must let it through (a swallowed InterruptedError
        would run a cancelled hour-scale file to completion)."""
        import jivetalking_tpu.pipeline.chunked as CH
        from jivetalking_tpu.pipeline.process import process_audio

        monkeypatch.setattr(CH, "CHUNK_THRESHOLD_SECS", 10.0)
        sr = 8000
        x = _speechlike(4 * 25600, sr, seed=9)

        calls = []

        def progress(stage, frac):
            calls.append((stage, frac))
            if stage == "processing" and frac > 0.1:
                raise InterruptedError("cancelled")

        with pytest.raises(InterruptedError):
            process_audio(x, sr, progress=progress)
        assert calls  # it got going before the cancel


class TestSingleChunkDegenerate:
    def test_one_chunk_matches_whole_file(self):
        """n < C: every pass runs exactly one chunk with zero carries —
        the degenerate case right at the chunking horizon."""
        import jax.numpy as jnp

        from jivetalking_tpu.pipeline.fused import fused_master
        from jivetalking_tpu.pipeline.fused_chunked import fused_master_chunked

        sr = 8000
        n = 25600 + 4096          # C = 25600*2 at chunk_secs=6.4 -> 1 chunk
        x, m, cfg = _setup(sr, n, seed=88)
        cfg.resample.enabled = False
        zc, _, fm_c, _ = fused_master_chunked(
            jnp.asarray(x), sr, cfg, m, chunk_secs=6.4)
        zw, _, fm_w, _ = fused_master(jnp.asarray(x), sr, cfg, m)
        a = np.concatenate([np.asarray(c) for c in zc]).astype(np.int32)
        b = np.concatenate([np.asarray(c) for c in zw]).astype(np.int32)
        assert a.shape == b.shape
        d = np.abs(a[256:-256] - b[256:-256])
        assert float(np.mean(d <= 1)) > 0.999
        assert float(fm_c["final"]["integrated"]) == pytest.approx(
            float(fm_w["final"]["integrated"]), abs=0.02)


class TestReaderAnalysisStereo:
    def test_stereo_reader_matches_stereo_array(self, tmp_path):
        import jax.numpy as jnp

        from jivetalking_tpu.io.flac import FlacStreamReader, write_flac
        from jivetalking_tpu.pipeline.fused_chunked import (
            fused_analysis_from_reader,
            fused_analysis_streamed,
        )

        sr = 8000
        n = 2 * 26624 + 777
        left = _speechlike(n, sr, seed=91)
        right = 0.7 * _speechlike(n, sr, seed=92)
        x = np.stack([left, right])
        xi = np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
        p = str(tmp_path / "st.flac")
        write_flac(p, xi, sr)

        with FlacStreamReader(p) as r:
            assert r.channels == 2
            mono_r, out_r = fused_analysis_from_reader(r, sr, chunk_secs=3.0)
        mono_a, out_a = fused_analysis_streamed(xi, sr, chunk_secs=3.0)

        np.testing.assert_allclose(np.asarray(mono_r), np.asarray(mono_a),
                                   atol=1e-7)
        assert float(out_r["loudness"]["integrated"]) == pytest.approx(
            float(out_a["loudness"]["integrated"]), abs=1e-3)


class TestRegionTpSeamExact:
    """Adversarial seam pin for the region true peak: an alternating-sign
    oscillation straddling a chunk boundary inside the region.  The old
    per-chunk `_tp_oversampled_max` zero-padded both seam edges and
    overshot by up to +0.175 dB; the window-END form must reproduce the
    whole-file mask-then-oversample EXACTLY."""

    def test_alternating_oscillation_at_chunk_seam(self):
        import jax.numpy as jnp

        from jivetalking_tpu.pipeline.fused import (
            _constants_for_rate,
            _tp_oversampled_max,
        )
        from jivetalking_tpu.pipeline.fused_chunked import _stage_partials_tree

        sr = 8000
        C, hm = 8192, 4096
        n = 2 * C
        w = max(2, int(round(0.05 * sr)))
        _, kw_ir, tp_bank, _ = _constants_for_rate(sr, 80.0, 3500.0)

        rng = np.random.default_rng(5)
        x = (1e-3 * rng.standard_normal(n)).astype(np.float32)
        # alternating full-scale-ish samples right across the chunk seam:
        # the 4x interpolation peaks BETWEEN samples at the boundary
        seam = C
        for j, v in enumerate([0.5, -0.5, 0.5, -0.5, 0.5, -0.5]):
            x[seam - 3 + j] = v

        nb = jnp.asarray([seam - 2000, seam + 2000], jnp.int32)
        sb = jnp.asarray([0, 1], jnp.int32)
        xj = jnp.asarray(x)

        tp_chunks = []
        for k in range(2):
            k0 = k * C
            left = (jnp.zeros(hm, jnp.float32) if k == 0
                    else xj[k0 - hm:k0])
            ext = jnp.concatenate([left, xj[k0:k0 + C]])
            tree = _stage_partials_tree(
                ext, jnp.int32(k0), jnp.int32(n), nb, sb,
                kw_ir, tp_bank, sr, C, hm, w)
            tp_chunks.append(float(tree["r_noise_tp"]))
        got = max(tp_chunks)

        mask = (np.arange(n) >= int(nb[0])) & (np.arange(n) < int(nb[1]))
        xm = jnp.asarray(np.where(mask, x, 0.0).astype(np.float32))
        want = max(float(_tp_oversampled_max(xm, tp_bank)),
                   float(jnp.max(jnp.abs(xm))))
        assert want > 0.5  # the inter-sample excess is actually exercised
        assert got == pytest.approx(want, rel=1e-6)

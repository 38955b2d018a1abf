"""Config defaults + unit-conversion vectors ported from the reference's
filters/processor suites (ref: internal/processor/filters_test.go:80-117,
1297-1389, 1231-1296, 1588-1684; processor_test.go:108-226).  The
production defaults ARE the product's tuning (no config file by design),
so every one is pinned here."""

import copy
import math
import os

import numpy as np
import pytest

from jivetalking_tpu.adaptive.config import (
    PASS2_FILTER_ORDER,
    default_filter_config,
)
from jivetalking_tpu.utils.units import db_to_linear, linear_to_db


class TestDefaultsComposeTypedFamilies:
    """(ref: TestDefaultFilterConfigComposesTypedDefaults,
    filters_test.go:80-117 — every production default pinned to the spec
    strings of SURVEY.md §2.1)."""

    def test_rumble_highpass(self):
        c = default_filter_config().rumble_highpass
        assert (c.enabled, c.frequency, c.poles, c.width, c.transform) == (
            True, 80.0, 2, 0.707, "tdii")

    def test_bandlimit_lowpass(self):
        c = default_filter_config().bandlimit_lowpass
        assert (c.enabled, c.frequency, c.poles, c.width) == (
            True, 20500.0, 2, 0.707)

    def test_noise_reduction(self):
        c = default_filter_config().noise_reduction
        # anlmdn=s=0.00001:p=0.0060:r=0.0020:m=3 (filters.go:95-100)
        assert (c.strength, c.patch_sec, c.research_sec, c.smooth) == (
            0.00001, 0.0060, 0.0020, 3.0)
        # afftdn=nr=12 (filters.go:830-861)
        assert c.afftdn_enabled and c.afftdn_noise_reduction == 12.0
        assert c.afftdn_noise_floor == 0.0      # unset until adapted

    def test_speech_gate(self):
        c = default_filter_config().speech_gate
        # agate=..:attack=5:release=200:range=(-14dB):knee=3:detection=rms:
        # makeup=1 (filters.go:869-894)
        assert (c.attack, c.release, c.knee, c.makeup, c.detection) == (
            5.0, 200.0, 3.0, 1.0, "rms")
        assert 20 * math.log10(c.range) == pytest.approx(-14.0, abs=1e-6)
        assert c.ratio == 2.0

    def test_levelling_compressor(self):
        c = default_filter_config().levelling_compressor
        # acompressor=..:ratio=3:attack=10:release=200:knee=4:mix=1
        assert (c.ratio, c.attack, c.release, c.knee, c.mix) == (
            3.0, 10.0, 200.0, 4.0, 1.0)

    def test_deesser(self):
        c = default_filter_config().deesser
        # deesser=i=..:m=0.50:f=0.80 (filters.go:504-511)
        assert (c.intensity, c.amount, c.frequency) == (0.0, 0.50, 0.80)

    def test_adeclick(self):
        c = default_filter_config().adeclick
        # adeclick=t=1.7:w=55:o=50:m=s (filters.go:938-940)
        assert (c.threshold, c.window, c.overlap, c.method) == (
            1.7, 55.0, 50.0, "s")

    def test_loudnorm(self):
        c = default_filter_config().loudnorm
        # loudnorm=I=-16:TP=-1:LRA=20:..:dual_mono=true:linear=true
        assert (c.target_i, c.target_tp, c.target_lra) == (-16.0, -1.0, 20.0)
        assert c.dual_mono and c.linear

    def test_resample_delivery(self):
        c = default_filter_config().resample
        # aformat=sample_rates=44100:..:s16 (filters.go:706-710)
        assert c.enabled and c.sample_rate == 44100

    def test_pass2_order(self):
        # (ref: TestPass2FilterOrder, filters_test.go:1619)
        assert PASS2_FILTER_ORDER == (
            "downmix", "rumble_highpass", "bandlimit_lowpass",
            "noise_reduction", "speech_gate", "levelling_compressor",
            "deesser", "analysis", "resample")


class TestDbToLinearVectors:
    """(ref: TestDbToLinear + TestDbToLinearFormula,
    filters_test.go:1297-1341)."""

    @pytest.mark.parametrize("db,want,tol", [
        (0.0, 1.0, 1e-4),
        (-6.0, 0.5012, 1e-3),
        (-20.0, 0.1, 1e-3),
        (-40.0, 0.01, 1e-4),
        (-60.0, 0.001, 1e-5),
        (6.0, 1.995, 1e-3),
        (20.0, 10.0, 1e-2),
    ])
    def test_vectors(self, db, want, tol):
        assert db_to_linear(db) == pytest.approx(want, abs=tol)

    @pytest.mark.parametrize("db", [0, -3, -6, -12, -20, -40, -60, 3, 6, 12, 20])
    def test_exact_formula(self, db):
        assert db_to_linear(db) == pytest.approx(10 ** (db / 20.0), abs=1e-7)

    def test_roundtrip(self):
        # (ref: TestDecibelLinearAmplitudeWrappers)
        for db in (-60.0, -14.0, -6.0, 0.0, 6.0):
            assert linear_to_db(db_to_linear(db)) == pytest.approx(db, abs=1e-9)


class TestCloneIsolation:
    """(ref: TestCloneForWorkerIsolatesStateAcrossClones,
    filters_test.go:1231-1296): per-worker config copies share no state —
    mutating one clone's nested lists/fields never leaks."""

    def test_deepcopy_isolates_nested_state(self):
        base = default_filter_config()
        a = copy.deepcopy(base)
        b = copy.deepcopy(base)
        a.noise_reduction.afftdn_band_noise = [1.0] * 15
        a.noise_reduction.afftdn_noise_floor = -62.0
        a.speech_gate.threshold = 0.5
        assert b.noise_reduction.afftdn_band_noise == []
        assert b.noise_reduction.afftdn_noise_floor == 0.0
        assert b.speech_gate.threshold == base.speech_gate.threshold
        assert base.noise_reduction.afftdn_band_noise == []


class TestAtomicPublish:
    """(ref: TestPublishOutputMovesSource / OverwritesExistingDestination,
    processor_test.go:108-174): publishes are dot-temp + rename, replace
    existing outputs, and leave no temp residue."""

    def _pcm(self):
        rng = np.random.default_rng(9)
        return np.clip(rng.standard_normal(2000) * 0.1, -1, 1).astype(np.float32)

    def test_publish_overwrites_and_leaves_no_residue(self, tmp_path):
        from jivetalking_tpu.io.audio import save_flac
        from jivetalking_tpu.io.flac import read_flac

        out = str(tmp_path / "ep-LUFS-16-processed.flac")
        save_flac(out, self._pcm(), 8000)
        first = open(out, "rb").read()
        x2 = self._pcm() * 0.5
        save_flac(out, x2, 8000)
        second = open(out, "rb").read()
        assert second != first                      # really overwritten
        got, rate, _ = read_flac(out)
        assert rate == 8000
        # no dot-temp residue (ref: assertNoProcessingTempFiles)
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]

"""Pure-function tests for quality scoring + gain advice (mirrors the
reference's quality_test.go / advice_test.go tier)."""


import pytest

from jivetalking_tpu.quality import (
    compute_recording_score,
    gain_advice,
    linear_score,
    stars_for_score,
)
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)


class TestLinearScore:
    def test_descending_axis(self):
        # "more negative is better" (noise floor)
        assert linear_score(-75.0, -75.0, -45.0) == 1.0
        assert linear_score(-45.0, -75.0, -45.0) == 0.0
        assert linear_score(-60.0, -75.0, -45.0) == pytest.approx(0.5)

    def test_ascending_axis(self):
        assert linear_score(45.0, 45.0, 16.0) == 1.0
        assert linear_score(16.0, 45.0, 16.0) == 0.0
        assert linear_score(60.0, 45.0, 16.0) == 1.0  # clamped

    def test_degenerate(self):
        assert linear_score(5.0, 5.0, 5.0) == 1.0
        assert linear_score(4.0, 5.0, 5.0) == 0.0


class TestStarBands:
    @pytest.mark.parametrize(
        "score,stars,label",
        [
            (95.0, 5, "Excellent"),
            (90.0, 5, "Excellent"),
            (89.9, 4, "Great"),
            (75.0, 4, "Great"),
            (60.0, 3, "Good"),
            (40.0, 2, "Fair"),
            (10.0, 1, "Poor"),
        ],
    )
    def test_bands(self, score, stars, label):
        assert stars_for_score(score) == (stars, label)


class TestRecordingScore:
    def _m(self, input_tp=-6.0, input_i=-23.0, lra=10.0, floor=-75.0, speech_mom=-25.0):
        m = AudioMeasurements()
        m.loudness.input_tp = input_tp
        m.loudness.input_i = input_i
        m.loudness.input_lra = lra
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=floor)
        m.vad.speech_profile = SpeechCandidate(
            region=Region(0, 60),
            sample=RegionSample(momentary_lufs=speech_mom),
        )
        return m

    def test_clean_capture_scores_high(self):
        # SNR gap 50 dB, perfect headroom, healthy level
        score = compute_recording_score(self._m())
        assert score.stars == 5

    def test_hot_capture_docked(self):
        score = compute_recording_score(self._m(input_tp=-0.5))
        clean = compute_recording_score(self._m())
        assert score.score < clean.score - 20

    def test_nil_worst(self):
        assert compute_recording_score(None).stars == 0

    def test_no_speech_falls_back_to_floor(self):
        m = self._m()
        m.vad.speech_profile = None
        score = compute_recording_score(m)
        assert 0 < score.score <= 100


class TestGainAdvice:
    @pytest.mark.parametrize(
        "tp,kind",
        [
            (0.5, "clipping"),
            (0.0, "clipping"),
            (-0.5, "hot"),
            (-1.0, "fine"),
            (-6.0, "fine"),
            (-12.0, "fine"),
            (-12.5, "quiet"),
            (-30.0, "quiet"),
        ],
    )
    def test_kinds(self, tp, kind):
        assert gain_advice(tp).kind == kind

    def test_deltas(self):
        assert gain_advice(-0.5).delta_db == pytest.approx(-6)  # lower ~6 dB toward -6
        assert gain_advice(-20.0).delta_db == pytest.approx(14)
        assert gain_advice(-6.0).delta_db == 0

    def test_messages(self):
        assert "Clipping" in gain_advice(0.2).message()
        assert "Raise input gain" in gain_advice(-20.0).message()
        assert "No action required" in gain_advice(-6.0).message()


class TestRecordingScoreCorpusAnchors:
    """Corpus sanity anchors from the reference's grounding sweep
    (ref: recording_test.go:29-126 — if these stars drift, the formula or
    its thresholds changed)."""

    def _m(self, input_tp, input_i, lra, floor, speech_mom):
        m = AudioMeasurements()
        m.loudness.input_tp = input_tp
        m.loudness.input_i = input_i
        m.loudness.input_lra = lra
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=floor)
        if speech_mom is not None:
            m.vad.speech_profile = SpeechCandidate(
                region=Region(0, 60),
                sample=RegionSample(momentary_lufs=speech_mom),
            )
        return m

    @pytest.mark.parametrize("name,tp,i,lra,floor,mom,stars,label", [
        ("83-popey hot input", -0.1, -29.8, 12.3, -72.93, -34.79, 2, "Fair"),
        ("83-mark", -6.2, -35.2, 15.0, -78.05, -38.74, 4, "Great"),
        ("83-martin", -4.5, -27.8, 14.7, -70.47, -30.92, 4, "Great"),
        ("clean studio", -9.0, -21.0, 9.0, -80.0, -28.0, 5, "Excellent"),
    ])
    def test_anchors(self, name, tp, i, lra, floor, mom, stars, label):
        got = compute_recording_score(self._m(tp, i, lra, floor, mom))
        assert got.stars == stars, (name, got.score)
        assert got.label == label, (name, got.score)

    def test_popey_composite_pinned(self):
        got = compute_recording_score(self._m(-0.1, -29.8, 12.3, -72.93, -34.79))
        assert got.score == pytest.approx(59.89, abs=0.5)

    def test_headroom_delta_is_full_weight(self):
        from jivetalking_tpu.quality.scores import RECORDING_WEIGHT_HEADROOM

        hot = compute_recording_score(self._m(-0.5, -21.0, 9.0, -78.0, -33.0))
        healthy = compute_recording_score(self._m(-7.0, -21.0, 9.0, -78.0, -33.0))
        assert healthy.score - hot.score == pytest.approx(
            100 * RECORDING_WEIGHT_HEADROOM, abs=1e-9)

    def test_no_speech_cleanliness_equals_floor_score(self):
        from jivetalking_tpu.quality.scores import (
            RECORDING_DEFICIT_FULL,
            RECORDING_DEFICIT_WEIGHT,
            RECORDING_DEFICIT_ZERO,
            RECORDING_FLOOR_FULL,
            RECORDING_FLOOR_ZERO,
            RECORDING_HEADROOM_FULL,
            RECORDING_HEADROOM_ZERO,
            RECORDING_LRA_FULL,
            RECORDING_LRA_WEIGHT,
            RECORDING_LRA_ZERO,
            RECORDING_WEIGHT_CLEANLINESS,
            RECORDING_WEIGHT_HEADROOM,
            RECORDING_WEIGHT_LEVEL,
            linear_score,
        )

        floor = -60.0
        no_speech = compute_recording_score(
            self._m(-9.0, -21.0, 9.0, floor, None))
        floor_score = linear_score(floor, RECORDING_FLOOR_FULL, RECORDING_FLOOR_ZERO)
        headroom = linear_score(-9.0, RECORDING_HEADROOM_FULL, RECORDING_HEADROOM_ZERO)
        deficit = linear_score(max(0.0, -23.0 - (-21.0)),
                               RECORDING_DEFICIT_FULL, RECORDING_DEFICIT_ZERO)
        lra = linear_score(9.0, RECORDING_LRA_FULL, RECORDING_LRA_ZERO)
        level = RECORDING_DEFICIT_WEIGHT * deficit + RECORDING_LRA_WEIGHT * lra
        want = 100 * (RECORDING_WEIGHT_CLEANLINESS * floor_score
                      + RECORDING_WEIGHT_HEADROOM * headroom
                      + RECORDING_WEIGHT_LEVEL * level)
        assert no_speech.score == pytest.approx(want, abs=1e-9)
        # electing a wide-SNR profile must change the cleanliness axis
        with_speech = compute_recording_score(
            self._m(-9.0, -21.0, 9.0, floor, -20.0))
        assert with_speech.score != no_speech.score

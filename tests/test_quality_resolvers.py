"""Mirrors the reference's quality_test.go / recording_test.go / advice_test.go
vectors: the processed-output quality rubric, the axis-discipline resolvers,
the recording-score corpus anchors, and the gain-advice spot values."""

import math

import numpy as np
import pytest

from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.pipeline.normalise import NormalisationResult
from jivetalking_tpu.pipeline.process import OutputMeasurements, ProcessResult
from jivetalking_tpu.quality import (
    compute_quality_score,
    compute_recording_score,
    gain_advice,
)
from jivetalking_tpu.quality.scores import (
    RECORDING_WEIGHT_HEADROOM,
    input_display_noise_floor_db,
    input_room_tone_floor_db,
)


def result_with(output_lufs, output_tp, input_noise_rms, final_noise_rms):
    """(ref: resultWith, quality_test.go:12-26)."""
    m = AudioMeasurements()
    m.vad.noise_profile = NoiseProfile(measured_noise_floor=input_noise_rms)
    return ProcessResult(
        measurements=m,
        effective_config=None,
        diagnostics=None,
        filtered=OutputMeasurements(),
        final=OutputMeasurements(
            room_tone_sample=RegionSample(rms_level=final_noise_rms)
        ),
        normalisation=NormalisationResult(
            output_lufs=output_lufs, output_tp=output_tp, requested_target_i=-16.0
        ),
        output_audio=np.zeros(1, np.int16),
        output_rate=44100,
    )


class TestComputeQualityScore:
    """(ref: quality_test.go:28-122)."""

    def test_excellent(self):
        q = compute_quality_score(result_with(-15.99, -2.18, -60.0, -82.0))
        assert (q.stars, q.label) == (5, "Excellent")

    def test_hot_true_peak_penalised(self):
        # a clipping true peak zeroes the 0.30 weight, capping at 70
        q = compute_quality_score(result_with(-16.0, 0.0, -60.0, -82.0))
        assert q.stars < 5
        assert q.score < 71

    def test_off_target_penalised(self):
        on = compute_quality_score(result_with(-16.0, -2.0, -60.0, -82.0))
        off = compute_quality_score(result_with(-19.0, -2.0, -60.0, -82.0))
        assert off.stars < on.stars
        assert off.score < on.score

    def test_clean_output_scores_full_noise(self):
        # output floor below -75 earns the full 0.20 noise weight even when
        # the input was already clean (little to remove)
        q = compute_quality_score(result_with(-16.0, -2.0, -78.0, -80.0))
        assert (q.stars, q.label) == (5, "Excellent")

    def test_noisy_output_drops_noise_weight(self):
        # floor at -50 zeroes the 0.20 weight: 0.50+0.30 = 0.80 -> 4 stars
        q = compute_quality_score(result_with(-16.0, -2.0, -52.0, -50.0))
        assert (q.stars, q.label) == (4, "Great")

    def test_clean_input_not_penalised(self):
        # the scorer rewards output cleanliness, never the reduction amount
        clean = compute_quality_score(result_with(-16.0, -2.0, -80.0, -80.0))
        noisy = compute_quality_score(result_with(-16.0, -2.0, -67.0, -67.0))
        assert clean.score >= noisy.score
        assert clean.stars >= noisy.stars

    def test_never_constant(self):
        a = compute_quality_score(result_with(-15.99, -2.18, -55.0, -82.0))
        b = compute_quality_score(result_with(-19.0, -0.2, -60.0, -61.0))
        assert a.score != b.score

    def test_nil_safe(self):
        assert compute_quality_score(None).stars == 0

    def test_digital_silence_floor_maximally_clean(self):
        q = compute_quality_score(result_with(-16.0, -2.0, -60.0, -math.inf))
        assert q.stars == 5


class TestInputFloorResolvers:
    """Axis discipline: astats-RMS vs momentary-LUFS must never mix
    (ref: quality_test.go:124-213)."""

    def test_prefers_elected_sample(self):
        m = AudioMeasurements()
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-71.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-64.0)
        floor, ok = input_display_noise_floor_db(m)
        assert ok and floor == -71.0

    def test_no_momentary_leakage(self):
        # no elected sample: must NOT fall back to the momentary-LUFS
        # NoiseProfile floor on the displayed astats axis
        m = AudioMeasurements()
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-64.0)
        _, ok = input_display_noise_floor_db(m)
        assert not ok

    @pytest.mark.parametrize("rms", [0.0, math.nan, -math.inf, math.inf])
    def test_unmeasured_sample(self, rms):
        m = AudioMeasurements()
        m.vad.elected_room_tone_sample = RegionSample(rms_level=rms)
        _, ok = input_room_tone_floor_db(m)
        assert not ok

    def test_absent(self):
        assert input_room_tone_floor_db(AudioMeasurements())[1] is False
        assert input_room_tone_floor_db(None)[1] is False
        assert input_display_noise_floor_db(None)[1] is False

    def test_voice_activated_momentary_override(self):
        # voice-activated: the display shows the VAD momentary floor instead
        # of the astats silence sentinel; the quality score's astats resolver
        # is unchanged
        m = AudioMeasurements()
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-120.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
        m.noise.voice_activated = True
        floor, ok = input_display_noise_floor_db(m)
        assert ok and floor == -62.0
        score_floor, ok = input_room_tone_floor_db(m)
        assert ok and score_floor == -120.0


def rec_input(input_tp, input_i, input_lra, noise_floor, speech_mom):
    """(ref: recInput, recording_test.go:12-24)."""
    m = AudioMeasurements()
    m.loudness.input_tp = input_tp
    m.loudness.input_i = input_i
    m.loudness.input_lra = input_lra
    m.vad.noise_profile = NoiseProfile(measured_noise_floor=noise_floor)
    if not math.isnan(speech_mom):
        m.vad.speech_profile = SpeechCandidate(
            region=Region(0, 60),
            sample=RegionSample(momentary_lufs=speech_mom),
        )
    return m


class TestRecordingScoreCorpusAnchors:
    """(ref: recording_test.go:29-126) — corpus sanity values from the
    grounding sweep; if these stars drift, the formula changed."""

    @pytest.mark.parametrize(
        "name,tp,i,lra,floor,mom,stars,label",
        [
            ("83-popey", -0.1, -29.8, 12.3, -72.93, -34.79, 2, "Fair"),
            ("83-mark", -6.2, -35.2, 15.0, -78.05, -38.74, 4, "Great"),
            ("83-martin", -4.5, -27.8, 14.7, -70.47, -30.92, 4, "Great"),
            ("clean-studio", -9.0, -21.0, 9.0, -80.0, -28.0, 5, "Excellent"),
        ],
    )
    def test_anchors(self, name, tp, i, lra, floor, mom, stars, label):
        got = compute_recording_score(rec_input(tp, i, lra, floor, mom))
        assert (got.stars, got.label) == (stars, label), f"{name}: {got.score:.2f}"

    def test_popey_composite_pinned(self):
        got = compute_recording_score(rec_input(-0.1, -29.8, 12.3, -72.93, -34.79))
        assert got.score == pytest.approx(59.89, abs=0.5)

    def test_no_speech_fallback_is_floor_only(self):
        no_speech = compute_recording_score(rec_input(-9.0, -21.0, 9.0, -60.0, math.nan))
        with_speech = compute_recording_score(rec_input(-9.0, -21.0, 9.0, -60.0, -20.0))
        assert no_speech.score != with_speech.score

    def test_headroom_discriminates_by_exact_weight(self):
        hot = compute_recording_score(rec_input(-0.5, -21.0, 9.0, -78.0, -33.0))
        healthy = compute_recording_score(rec_input(-7.0, -21.0, 9.0, -78.0, -33.0))
        assert healthy.score - hot.score == pytest.approx(
            100 * RECORDING_WEIGHT_HEADROOM, abs=1e-9
        )


class TestGainAdviceSpotValues:
    """(ref: advice_test.go:11-131)."""

    @pytest.mark.parametrize(
        "tp,kind",
        [
            (0.0, "clipping"),
            (0.4, "clipping"),
            (-0.1, "hot"),
            (-0.5, "hot"),
            (-1.0, "fine"),
            (-6.2, "fine"),
            (-12.0, "fine"),
            (-12.1, "quiet"),
            (-21.41, "quiet"),
        ],
    )
    def test_kinds(self, tp, kind):
        assert gain_advice(tp).kind == kind

    @pytest.mark.parametrize(
        "name,tp,kind,delta",
        [
            ("83-popey hot", -0.13, "hot", -6),
            ("68-popey quiet", -21.41, "quiet", 15),
            ("83-mark fine", -6.21, "fine", 0),
            ("78-martin clipping", 0.35, "clipping", -6),
            ("hot boundary fine", -1.0, "fine", 0),
            ("quiet boundary fine", -12.0, "fine", 0),
            ("clip exact zero", 0.0, "clipping", -6),
            # half-away-from-zero rounding parity with Go math.Round
            ("half delta rounds away", 0.5, "clipping", -7),
        ],
    )
    def test_delta_spot_values(self, name, tp, kind, delta):
        got = gain_advice(tp)
        assert got.kind == kind, name
        assert got.delta_db == delta, name
        assert got.input_tp == tp

    def test_non_contradiction_high_crest(self):
        # advice keys ONLY off the peak: healthy peaks + quiet average = fine
        got = gain_advice(-6.2)
        assert got.kind == "fine" and got.delta_db == 0

    @pytest.mark.parametrize(
        "tp,want_subs,not_subs",
        [
            (0.35, ["Clipping.", "Peaks at +0.3 ㏈TP.", "Lower input gain ~6 ㏈."], ["Raise"]),
            (-0.13, ["Hot.", "Peaks at -0.1 ㏈TP.", "Lower input gain ~6 ㏈."], ["Raise"]),
            (-15.0, ["Quiet.", "Peaks at -15.0 ㏈TP.", "Raise input gain ~9 ㏈."], ["Lower"]),
            (-6.2, ["Level well set.", "Peaks at -6.2 ㏈TP.", "No action required."], ["Lower", "Raise"]),
        ],
    )
    def test_messages(self, tp, want_subs, not_subs):
        msg = gain_advice(tp).message()
        for sub in want_subs:
            assert sub in msg, msg
        for sub in not_subs:
            assert sub not in msg, msg

    def test_no_banned_glyphs(self):
        for tp in (0.35, -0.13, -15.0, -6.2):
            msg = gain_advice(tp).message()
            for glyph in ("—", "✓", "(", ")"):
                assert glyph not in msg


class TestGainAdviceCorpusDistribution:
    """51 corpus input true peaks: 11 hot/clipping, 4 quiet, 36 fine
    (ref: advice_test.go:133-172)."""

    CORPUS = [
        -0.13, 0.35, -0.5, -0.9, -0.2, 0.1, -0.7, -0.4, 0.05, -0.8, -0.3,
        -21.41, -14.0, -13.2, -16.5,
        -1.0, -12.0, -6.21, -4.9, -4.5, -2.0, -3.0, -5.0, -6.0, -7.0,
        -8.0, -9.0, -10.0, -11.0, -1.5, -2.5, -3.5, -4.0, -5.5, -6.5,
        -7.5, -8.5, -9.5, -10.5, -11.5, -2.2, -3.3, -4.4, -5.6, -6.7,
        -7.8, -8.9, -9.1, -10.2, -11.3, -2.8,
    ]

    def test_distribution(self):
        assert len(self.CORPUS) == 51
        kinds = [gain_advice(tp).kind for tp in self.CORPUS]
        assert sum(k in ("hot", "clipping") for k in kinds) == 11
        assert sum(k == "quiet" for k in kinds) == 4
        assert sum(k == "fine" for k in kinds) == 36

    def test_delta_is_whole_db(self):
        for tp in self.CORPUS:
            d = gain_advice(tp).delta_db
            assert d == int(d)


class TestOutputFloorResolver:
    """Output-side floor resolution (ref: TestOutputNoiseFloorPresent /
    TestOutputNoiseFloorAbsentNoFallback, quality_test.go:214-237)."""

    def test_present_reads_pass4_room_tone(self):
        from jivetalking_tpu.quality.scores import final_room_tone_rms

        res = result_with(-16.0, -2.0, -64.0, -82.0)
        floor, ok = final_room_tone_rms(res)
        assert ok and floor == -82.0

    def test_absent_no_input_fallback(self):
        # no Pass-4 room-tone sample -> ok=False even when an input floor
        # exists, so the done box never renders a misleading input->input
        # arrow (ref: TestOutputNoiseFloorAbsentNoFallback)
        from jivetalking_tpu.quality.scores import final_room_tone_rms

        res = result_with(-16.0, -2.0, -64.0, -82.0)
        res.final.room_tone_sample = None
        _, ok = final_room_tone_rms(res)
        assert not ok


class TestOutputResolverNilGuards:
    """The output-side display resolvers' nil-guard layers
    (ref: quality_test.go TestOutputNoiseFloorPresent :214,
    TestOutputNoiseFloorAbsentNoFallback :228, TestOutputTP :242,
    TestOutputLRA :272)."""

    def test_output_floor_present(self):
        from jivetalking_tpu.quality.scores import final_room_tone_rms

        floor, ok = final_room_tone_rms(result_with(-16.0, -2.0, -64.0, -82.0))
        assert ok and floor == -82.0

    def test_output_floor_absent_no_input_fallback(self):
        # no Pass-4 room-tone sample -> ok=False even though an INPUT floor
        # exists: the done box must never render an input->input arrow
        from jivetalking_tpu.quality.scores import final_room_tone_rms

        res = result_with(-16.0, -2.0, -64.0, -82.0)
        res.final.room_tone_sample = None
        _, ok = final_room_tone_rms(res)
        assert not ok
        # and the outcome wiring keeps the display side None (the row then
        # shows the single available end, ref doneBoxNoiseFloorRow)
        from jivetalking_tpu.ui.console import _noise_floor_row

        row = _noise_floor_row(-64.0, None)
        assert "→" not in row

    def test_output_tp_is_a_normalisation_field(self):
        # TP reads off the top-level normalisation result — available even
        # with empty final measurements (ref: TestOutputTP's nilFinal leg)
        res = result_with(-16.0, -1.5, -64.0, -82.0)
        res.final = OutputMeasurements()   # nothing measured post-encode
        assert res.normalisation.output_tp == -1.5

    def test_output_lra_requires_final_measurements(self):
        # LRA lives on the FINAL loudness measurement; without it the
        # outcome field stays unset (ref: TestOutputLRA)
        from jivetalking_tpu.metering.ebur128 import LoudnessResult

        res = result_with(-16.0, -2.0, -64.0, -82.0)
        assert res.final.loudness is None   # no final loudness measured
        res.final.loudness = LoudnessResult(
            integrated_lufs=-16.0, lra_lu=7.5, lra_low_lufs=-20.0,
            lra_high_lufs=-12.5, threshold_lufs=-26.0,
            sample_peak_db=-2.1, true_peak_db=-2.0,
            momentary_max_lufs=-12.0, short_term_max_lufs=-13.0,
            momentary_lufs=np.zeros(2), short_term_lufs=np.zeros(2),
            block_starts_sec=np.zeros(2))
        assert res.final.loudness.lra_lu == 7.5

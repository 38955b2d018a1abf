"""Analysis-layer tests: interval engine, VAD split/runs/elections, bands,
and the full Pass-1 analyser.  Mirrors the reference's synthetic-audio
integration tier (ref: internal/processor/analyser_test.go,
analyser_vad_test.go) using in-process fixtures instead of decoded WAVs."""

import numpy as np
import pytest

from jivetalking_tpu.analysis import analyse_audio, build_intervals
from jivetalking_tpu.analysis.bands import (
    AFFTDN_BAND_CENTRES_HZ,
    afftdn_band_edges_hz,
    measure_band_rms_batch,
)
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.analysis.vad import (
    detect_voice_activity,
    estimate_noise_floor_seed,
    gap_tolerance_intervals,
    otsu_split_from_levels,
    percentile_of_sorted,
)
from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.metering.spectral import spectral_frames

SR = 44100


def _tone(freq, dbfs, secs, sr=SR):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _noise(dbfs, secs, sr=SR, seed=0):
    rng = np.random.default_rng(seed)
    amp = 10.0 ** (dbfs / 20.0)
    return (amp * rng.standard_normal(int(secs * sr))).astype(np.float32)


def _speechlike(dbfs, secs, sr=SR, seed=3):
    """Spectrally dynamic tonal signal standing in for speech: 250 ms notes
    hopping around the voice band with level wobble.  A pure sine would be
    maximally room-tone-like (zero flux) and fool the noise-floor seed — real
    speech is dynamic, so the fixture must be."""
    rng = np.random.default_rng(seed)
    n_notes = int(secs / 0.25)
    freqs = rng.choice([400.0, 700.0, 1100.0, 1600.0, 2200.0], size=n_notes)
    levels = dbfs + rng.uniform(-3.0, 1.0, size=n_notes)
    note_len = int(0.25 * sr)
    t = np.arange(note_len, dtype=np.float64) / sr
    out = np.concatenate(
        [
            (10.0 ** (lv / 20.0)) * np.sin(2 * np.pi * f * t)
            for f, lv in zip(freqs, levels)
        ]
    )
    return out[: int(secs * sr)].astype(np.float32)


@pytest.fixture(scope="module")
def speech_fixture():
    """60 s: dynamic tonal 'speech' blocks separated by quiet noise 'room
    tone'.  Notes stay in the voice band (centroid 200-6000 Hz, low entropy
    -> passes the spectral veto); noise floor at -55 dBFS."""
    segs = [
        _speechlike(-20.0, 20.0, seed=3),  # 0-20 speech
        _noise(-55.0, 15.0, seed=1),       # 20-35 room tone
        _speechlike(-20.0, 20.0, seed=4),  # 35-55 speech
        _noise(-55.0, 5.0, seed=2),        # 55-60 room tone
    ]
    return np.concatenate(segs)


@pytest.fixture(scope="module")
def fixture_intervals(speech_fixture):
    r128 = measure_loudness(speech_fixture, SR)
    spec = spectral_frames(speech_fixture, SR)
    return build_intervals(speech_fixture, SR, r128, spec)


class TestIntervals:
    def test_count_and_grid(self, fixture_intervals):
        iv = fixture_intervals
        assert len(iv) == 240  # 60 s / 0.25 s
        assert iv.timestamp[1] - iv.timestamp[0] == pytest.approx(0.25)

    def test_rms_levels_per_segment(self, fixture_intervals):
        iv = fixture_intervals
        # speech notes at -20 dBFS nominal with +-3 dB wobble -> interval
        # RMS lands in a band around -23 dBFS
        tone_mask = iv.slice_range(2.0, 18.0)
        assert np.all(iv.rms_level[tone_mask] > -30)
        assert np.all(iv.rms_level[tone_mask] < -18)
        noise_mask = iv.slice_range(22.0, 34.0)
        assert np.all(iv.rms_level[noise_mask] < -50)

    def test_momentary_tracks_level(self, fixture_intervals):
        iv = fixture_intervals
        tone_mask = iv.slice_range(5.0, 15.0)
        noise_mask = iv.slice_range(25.0, 33.0)
        assert np.mean(iv.momentary_lufs[tone_mask]) > np.mean(iv.momentary_lufs[noise_mask]) + 20

    def test_spectral_attached(self, fixture_intervals):
        iv = fixture_intervals
        tone_mask = iv.slice_range(5.0, 15.0)
        assert np.all(iv.spectral_found[tone_mask])
        # notes hop between 400 and 2200 Hz -> centroids stay in the voice band
        assert np.all(iv.spectral["centroid"][tone_mask] > 250.0)
        assert np.all(iv.spectral["centroid"][tone_mask] < 3000.0)


class TestVADPrimitives:
    def test_percentile_nearest_rank(self):
        v = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        assert percentile_of_sorted(v, 0) == 1.0
        assert percentile_of_sorted(v, 100) == 5.0
        assert percentile_of_sorted(v, 50) == 3.0
        assert percentile_of_sorted(v, 75) == 4.0
        assert percentile_of_sorted(np.zeros(0), 50) == 0.0

    def test_otsu_bimodal(self):
        lo = np.full(100, -60.0) + np.linspace(-0.4, 0.4, 100)
        hi = np.full(100, -20.0) + np.linspace(-0.4, 0.4, 100)
        split = otsu_split_from_levels(np.concatenate([lo, hi]))
        # between-class variance is flat across the empty middle bins and the
        # reference keeps the FIRST maximum, so the split sits just above the
        # low mode (ref: otsuSplit strictly-greater scan)
        assert -60 < split < -25

    def test_gap_tolerance_bounds(self):
        hop = 0.25
        # no speech -> floor (2 s / 0.25 = 8)
        assert gap_tolerance_intervals(np.zeros(100, bool), hop) == 8
        # interior gaps of 12 -> p75 = 12
        flags = np.zeros(100, bool)
        flags[[0, 13, 26, 39]] = True
        assert gap_tolerance_intervals(flags, hop) == 12
        # huge gap clamps to ceiling (10 s / 0.25 = 40)
        flags = np.zeros(200, bool)
        flags[[0, 199]] = True
        assert gap_tolerance_intervals(flags, hop) == 40


class TestVAD:
    def test_detects_speech_and_noise(self, fixture_intervals):
        seed, _, ok = estimate_noise_floor_seed(fixture_intervals)
        assert ok
        vad = detect_voice_activity(fixture_intervals, seed)

        assert len(vad.speech_regions) >= 1
        assert vad.speech_profile is not None
        # elected region inside a tone block
        r = vad.speech_profile.region
        in_first = 0.0 <= r.start <= 20.0
        in_second = 35.0 <= r.start <= 55.0
        assert in_first or in_second

        assert vad.noise_region is not None
        assert vad.noise_profile is not None
        # room tone must come from a quiet span
        assert 20.0 <= vad.noise_region.start <= 35.0 or 55.0 <= vad.noise_region.start

        # split separates the modes
        assert -55 < vad.split < -20
        assert not vad.voice_activated
        assert vad.gate_stats.separation_db > 12.0

    def test_floor_on_momentary_axis(self, fixture_intervals):
        seed, _, ok = estimate_noise_floor_seed(fixture_intervals)
        vad = detect_voice_activity(fixture_intervals, seed)
        # noise at -55 dBFS white; K-weighted momentary sits near -55 (+-5)
        assert -62 < vad.floor < -45

    def test_voice_activated_flag(self):
        # gated capture: true digital silence between utterances
        segs = [
            _tone(1000.0, -20.0, 12.0),
            np.zeros(int(10 * SR), np.float32),
            _tone(1000.0, -20.0, 12.0),
            np.zeros(int(10 * SR), np.float32),
        ]
        x = np.concatenate(segs)
        r128 = measure_loudness(x, SR)
        spec = spectral_frames(x, SR)
        iv = build_intervals(x, SR, r128, spec)
        seed, _, ok = estimate_noise_floor_seed(iv)
        from jivetalking_tpu.analysis.vad import VAD_LEVEL_FLOOR_DB

        vad = detect_voice_activity(iv, seed if ok else VAD_LEVEL_FLOOR_DB)
        assert vad.floored_fraction > 0.2
        assert vad.voice_activated


class TestBands:
    def test_band_edges_geometric(self):
        lo, hi = afftdn_band_edges_hz(1)  # centre 125
        assert lo == pytest.approx(np.sqrt(80 * 125))
        assert hi == pytest.approx(np.sqrt(125 * 195))
        lo0, _ = afftdn_band_edges_hz(0)
        assert lo0 == pytest.approx(80.0 / np.sqrt(125.0 / 80.0))

    def test_band_rms_isolates_tone(self, speech_fixture):
        region = Region(start=2.0, end=12.0)
        rms = measure_band_rms_batch(
            speech_fixture, SR, region, [(500.0, 2000.0), (6000.0, 9000.0)]
        )
        # most note energy inside the 0.5-2 kHz band
        assert rms[0] == pytest.approx(-24.0, abs=3.0)
        # sibilant band: only the 2-pole skirt of the 2.2 kHz notes
        assert rms[1] < rms[0] - 20

    def test_nyquist_band_unmeasurable(self, speech_fixture):
        region = Region(start=20.5, end=30.0)
        bands = [afftdn_band_edges_hz(i) for i in range(len(AFFTDN_BAND_CENTRES_HZ))]
        rms = measure_band_rms_batch(speech_fixture, SR, region, bands)
        # top band's 29.4 kHz edge exceeds the 22.05 kHz Nyquist
        assert not np.isfinite(rms[-1])
        assert sum(1 for v in rms if np.isfinite(v)) >= 10


class TestAnalyseAudio:
    def test_end_to_end(self, speech_fixture):
        m = analyse_audio(speech_fixture, SR)
        assert m.duration == pytest.approx(60.0)
        assert m.noise.floor_source == "vad_percentile"
        assert m.loudness.input_i == pytest.approx(-20.0, abs=3.0)
        assert m.loudness.target_offset == pytest.approx(-16.0 - m.loudness.input_i)

        sp = m.vad.speech_profile
        assert sp is not None
        assert sp.bands_measured
        # note energy is centred 0.4-2.2 kHz; the sibilant band sees only
        # the 2-pole filter skirt
        assert sp.body_band_rms > sp.sib_band_rms + 8

        npf = m.vad.noise_profile
        assert npf is not None
        assert npf.bands_measured
        assert len(npf.band_noise) == 15
        assert m.noise.reduction_headroom > 0


class TestAfftdnBands:
    """The 15 fixed afftdn band centres and geometric-midpoint edges
    (ref: analyser_noise_bands.go:11-56)."""

    def test_centres_pinned(self):
        from jivetalking_tpu.utils.afftdn_bands import AFFTDN_BAND_CENTRES_HZ

        assert AFFTDN_BAND_CENTRES_HZ == (
            80.0, 125.0, 195.0, 290.0, 440.0, 660.0, 1000.0, 1500.0,
            2250.0, 3350.0, 5000.0, 7500.0, 11200.0, 16000.0, 24000.0,
        )

    def test_edges_geometric_midpoints(self):
        import math

        from jivetalking_tpu.utils.afftdn_bands import (
            AFFTDN_BAND_CENTRES_HZ as C,
            afftdn_band_edges_hz,
        )

        # interior: adjacent bands share an edge at the geometric midpoint
        for i in range(1, len(C)):
            lo_i, _ = afftdn_band_edges_hz(i)
            _, hi_prev = afftdn_band_edges_hz(i - 1)
            assert lo_i == pytest.approx(hi_prev)
            assert lo_i == pytest.approx(math.sqrt(C[i - 1] * C[i]))
        # outer bands extend one geometric step
        lo0, _ = afftdn_band_edges_hz(0)
        assert lo0 == pytest.approx(C[0] / math.sqrt(C[1] / C[0]))
        _, hi_last = afftdn_band_edges_hz(len(C) - 1)
        assert hi_last == pytest.approx(C[-1] * math.sqrt(C[-1] / C[-2]))
        # every band has positive width and covers its centre
        for i in range(len(C)):
            lo, hi = afftdn_band_edges_hz(i)
            assert lo < C[i] < hi


class TestMeasureRegion:
    """Region re-measure = slice + the metering kernels — no decode, no
    pre-roll seek (ref: MeasureOutputRegions, analyser_output.go:18-120)."""

    def test_matches_direct_slice_measures(self):
        import math

        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        rng = np.random.default_rng(4)
        sr = 8000
        x = (0.1 * rng.standard_normal(sr * 10)).astype(np.float32)
        x[3 * sr : 6 * sr] *= 0.01  # a quiet middle region

        s = measure_region(x, sr, Region(3.0, 6.0))
        seg = x[3 * sr : 6 * sr].astype(np.float64)
        want_rms = 20 * math.log10(np.sqrt(np.mean(seg ** 2)))
        want_peak = 20 * math.log10(np.max(np.abs(seg)))
        assert s.rms_level == pytest.approx(want_rms, abs=0.05)
        assert s.peak_level == pytest.approx(want_peak, abs=0.05)
        assert s.crest_factor == pytest.approx(want_peak - want_rms, abs=0.1)
        # quiet region is much quieter than the whole file
        whole = measure_region(x, sr, Region(0.0, 10.0))
        assert s.rms_level < whole.rms_level - 20

    def test_edge_cases(self):
        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        x = np.zeros(80000, np.float32)  # 10 s at 8 kHz
        assert measure_region(x, 8000, Region(2.0, 1.0)) is None   # inverted
        assert measure_region(x, 8000, Region(5.0, 14.0)) is not None  # end clamps to n


class TestAnalyseAudioSyntheticTone:
    """(ref: TestAnalyseAudio, analyser_test.go:132-218): the 5 s -23 dBFS
    440 Hz tone with a 0.5 s silence gap and light (-60 dB) noise bed — the
    reference's known-characteristics sanity ranges, via the synth
    generator it uses (io/synth mirrors generateTestAudio)."""

    @pytest.fixture(scope="class")
    def tone_measurements(self, tmp_path_factory):
        from jivetalking_tpu.io.synth import (
            SilenceGap,
            TestAudioOptions,
            generate_test_audio,
        )
        from jivetalking_tpu.io.audio import open_audio_file

        path = str(tmp_path_factory.mktemp("synth") / "tone.wav")
        generate_test_audio(path, TestAudioOptions(
            duration_secs=5.0, sample_rate=44100,
            tone_freq=440.0, tone_level=-23.0, noise_level=-60.0,
            silence_gap=SilenceGap(start=2.0, duration=0.5)))
        samples, meta = open_audio_file(path)
        return analyse_audio(samples, meta.sample_rate)

    def test_loudness_ranges(self, tone_measurements):
        m = tone_measurements
        # input level close to the -23 dBFS tone level
        assert -30.0 < m.loudness.input_i < -20.0
        # true peak within reason (sine TP ~ tone level)
        assert -30.0 < m.loudness.input_tp < 0.0
        # LRA low for a steady tone with one brief gap
        assert 0.0 <= m.loudness.input_lra <= 15.0

    def test_noise_floor_sane(self, tone_measurements):
        m = tone_measurements
        assert -120.0 < m.noise.floor <= 0.0

    def test_target_offset_reaches_target(self, tone_measurements):
        # offset should project the input to ~-16 LUFS
        m = tone_measurements
        projected = m.loudness.input_i + m.loudness.target_offset
        assert abs(projected - (-16.0)) <= 2.0

    def test_duration_and_rate(self, tone_measurements):
        m = tone_measurements
        assert m.duration == pytest.approx(5.0, abs=0.01)
        assert m.sample_rate == 44100


class TestSpectralAccumulatorSemantics:
    """The interval->region spectral averaging rules (ref:
    SpectralAccumulator, analyser_metrics.go; vectors from
    internal/processor/analyser_metrics_test.go:152-254)."""

    _REF_ROW_A = dict(mean=2.0, variance=4.0, centroid=1000.0, spread=200.0,
                      skewness=1.0, kurtosis=2.0, entropy=0.2, flatness=0.4,
                      crest=6.0, flux=0.02, slope=-0.10, decrease=0.06,
                      rolloff=5000.0)
    _REF_ROW_B = dict(mean=6.0, variance=12.0, centroid=3000.0, spread=600.0,
                      skewness=3.0, kurtosis=6.0, entropy=0.6, flatness=0.8,
                      crest=10.0, flux=0.06, slope=-0.30, decrease=0.18,
                      rolloff=9000.0)

    def _intervals(self, rows, found):
        from jivetalking_tpu.analysis.intervals import Intervals
        from jivetalking_tpu.metering.spectral import METRIC_NAMES

        n = len(rows)
        z = np.full(n, -30.0)
        return Intervals(
            timestamp=np.arange(n) * 0.25,
            rms_level=z, peak_level=z + 10.0,
            momentary_lufs=z, short_term_lufs=z,
            true_peak=z, sample_peak=z,
            spectral={k: np.array([r[k] for r in rows]) for k in METRIC_NAMES},
            spectral_found=np.asarray(found, dtype=bool),
        )

    def test_mixed_found_and_unfound(self):
        # an unfound row's values never dilute the average; found survives
        # (ref: TestSpectralAccumulator_MixedFoundAndUnfound)
        garbage = {k: 100.0 for k in self._REF_ROW_A}
        iv = self._intervals([garbage, self._REF_ROW_B], [False, True])
        rs = iv.region_sample(np.array([True, True]))
        assert rs.spectral.found
        assert rs.spectral.mean == pytest.approx(6.0)
        assert rs.spectral.variance == pytest.approx(12.0)

    def test_zero_found_gives_zero_valued_metrics(self):
        # no spectral frames -> zero-value metrics, found=False
        # (ref: TestSpectralAccumulator_ZeroFrameCount)
        garbage = {k: 100.0 for k in self._REF_ROW_A}
        iv = self._intervals([garbage], [False])
        rs = iv.region_sample(np.array([True]))
        assert not rs.spectral.found
        for k in self._REF_ROW_A:
            assert getattr(rs.spectral, k) == 0.0

    def test_averages_all_thirteen_fields(self):
        # two found rows -> midpoint for every field
        # (ref: TestSpectralAccumulator_AveragesAllFields)
        iv = self._intervals([self._REF_ROW_A, self._REF_ROW_B], [True, True])
        rs = iv.region_sample(np.array([True, True]))
        want = dict(mean=4.0, variance=8.0, centroid=2000.0, spread=400.0,
                    skewness=2.0, kurtosis=4.0, entropy=0.4, flatness=0.6,
                    crest=8.0, flux=0.04, slope=-0.20, decrease=0.12,
                    rolloff=7000.0)
        for k, v in want.items():
            assert getattr(rs.spectral, k) == pytest.approx(v), k


class TestMeasureOutputRegions:
    """(ref: TestMeasureOutputRoomToneRegion :1028 and
    Test_measureOutputSpeechRegion :1128, analyser_test.go) — the
    post-pass region re-measure on the known-characteristics fixture:
    a room-tone gap reads quiet/noisy, a tonal speech region reads loud
    and tonal, and degenerate regions return None instead of metrics."""

    @pytest.fixture(scope="class")
    def gap_fixture(self):
        # 5 s, -23 dBFS 440 Hz tone, -60 dB noise bed, a 1 s gap at 1.5 s
        rng = np.random.default_rng(11)
        sr = 44100
        t = np.arange(5 * sr) / sr
        x = (10 ** (-23 / 20)) * np.sin(2 * np.pi * 440.0 * t)
        x += (10 ** (-60 / 20)) * rng.standard_normal(x.size)
        g0, g1 = int(1.5 * sr), int(2.5 * sr)
        x[g0:g1] = (10 ** (-60 / 20)) * rng.standard_normal(g1 - g0)
        return x.astype(np.float32), sr

    def test_room_tone_region_reads_quiet(self, gap_fixture):
        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        x, sr = gap_fixture
        s = measure_region(x, sr, Region(1.5, 2.5))
        assert s is not None
        # -60 dB noise bed: RMS < -40, peak < -30 (the reference's bars)
        assert s.rms_level < -40.0
        assert s.peak_level < -30.0
        # spectral entropy lives in [0, 1] and noise reads entropic
        assert 0.0 <= s.spectral.entropy <= 1.0
        assert s.spectral.centroid >= 0.0
        # LUFS plausible for a near-silent region
        assert -120.0 <= s.momentary_lufs <= 0.0

    def test_speech_region_reads_tonal_and_loud(self, gap_fixture):
        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        x, sr = gap_fixture
        s = measure_region(x, sr, Region(3.0, 5.0))  # pure-tone span
        assert s is not None
        # -23 dBFS sine RMS ~ -26 dBFS; the reference bars are [-30, -10]
        # (only RMS and peak are hard Errorf bars in the reference; the
        # spectral/LUFS/TP checks there are Logf-only observations, so
        # here they pin just the invariant ranges)
        assert -30.0 <= s.rms_level <= -10.0
        assert -25.0 <= s.peak_level <= 0.0
        assert s.crest_factor == pytest.approx(
            s.peak_level - s.rms_level, abs=1e-6)
        # flatness lives in [0, 1] and a tonal signal is not noise-like
        assert 0.0 <= s.spectral.flatness <= 1.0
        assert s.spectral.centroid > 0.0
        # true peak at/above the sample peak, below clipping
        assert s.peak_level - 0.5 <= s.true_peak <= 0.0

    def test_zero_duration_region_returns_none(self, gap_fixture):
        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        x, sr = gap_fixture
        assert measure_region(x, sr, Region(1.0, 1.0)) is None

    def test_out_of_bounds_region_returns_none(self, gap_fixture):
        # the repo has no file paths at this seam (PCM is already
        # resident); the invalid-input analogue is a region fully past
        # the signal end
        from jivetalking_tpu.analysis.regions import measure_region
        from jivetalking_tpu.analysis.types import Region

        x, sr = gap_fixture
        assert measure_region(x, sr, Region(99.0, 120.0)) is None


class TestSliceRangeVectors:
    """The exact interval-range selection table
    (ref: TestGetIntervalsInRange, analyser_test.go:264-335): [start, end)
    on a 250 ms grid — counts, first and last selected timestamps."""

    def _iv(self):
        from tests.test_vad_primitives import make_intervals

        return make_intervals([-30.0] * 80)   # 0..20 s at 250 ms

    @pytest.mark.parametrize("name,start,end,count,first,last", [
        ("full range", 0.0, 20.0, 80, 0.0, 19.750),
        ("middle range", 5.0, 15.0, 40, 5.0, 14.750),
        ("no overlap - after the end", 25.0, 30.0, 0, None, None),
        ("partial overlap at start", 0.0, 2.0, 8, 0.0, 1.750),
    ])
    def test_table(self, name, start, end, count, first, last):
        iv = self._iv()
        mask = iv.slice_range(start, end)
        idx = np.flatnonzero(mask)
        assert idx.size == count, name
        if count:
            assert iv.timestamp[idx[0]] == pytest.approx(first), name
            assert iv.timestamp[idx[-1]] == pytest.approx(last), name

    def test_end_exclusive(self):
        # an interval starting exactly at `end` is NOT selected
        iv = self._iv()
        mask = iv.slice_range(0.0, 0.25)
        assert np.flatnonzero(mask).tolist() == [0]

"""Run-record schema-shape contract tests — the behavioural port of
the reference's runrecord suite (runrecord_test.go:76-480): nested regions
shape with sidecar'd candidate arrays, _s-suffixed second durations,
dB-valued gate fields, analysis-only block dropping, and non-finite
serialisation.
"""

import json

import numpy as np

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    GateStatistics,
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.pipeline.normalise import NormalisationResult
from jivetalking_tpu.pipeline.process import OutputMeasurements, ProcessResult
from jivetalking_tpu.report.runrecord import (
    new_analysis_run_record,
    new_run_record,
)


def populated_measurements() -> AudioMeasurements:
    """(ref: populatedAudioMeasurements, runrecord_test.go fixtures) —
    room tone elected at 2s/10s, speech elected at 30-40s, candidates."""
    m = AudioMeasurements()
    m.duration = 60.0
    m.sample_rate = 44100
    m.loudness.input_i = -24.0
    m.loudness.input_tp = -5.0
    m.noise.floor = -60.0
    m.noise.floor_source = "vad_percentile"
    sample = RegionSample(rms_level=-55.0, peak_level=-45.0, crest_factor=10.0)
    m.vad.noise_profile = NoiseProfile(
        start=2.0, duration=10.0, measured_noise_floor=-60.0,
        peak_level=-45.0, crest_factor=15.0, entropy=0.8)
    m.vad.elected_room_tone_sample = sample
    sp_sample = RegionSample(rms_level=-19.0, peak_level=-2.0, crest_factor=17.0)
    profile = SpeechCandidate(
        region=Region(30.0, 40.0), sample=sp_sample,
        voicing_density=0.9, body_band_rms=-20.0, sib_band_rms=-30.0,
        bands_measured=True, score=0.82)
    m.vad.speech_profile = profile
    m.vad.speech_candidates = [profile]
    m.vad.gate_stats = GateStatistics(
        voiced_low_percentile=-34.0, noise_high_percentile=-55.0,
        separation_db=21.0)
    return m


def populated_result() -> ProcessResult:
    """(ref: populatedProcessingResult) — full record with filtered/final
    region samples on both kinds."""
    m = populated_measurements()
    rt = RegionSample(rms_level=-55.0, peak_level=-45.0, crest_factor=10.0)
    sp = RegionSample(rms_level=-19.0, peak_level=-2.0, crest_factor=17.0)
    eff, diag = adapt_config(default_filter_config(), m)
    return ProcessResult(
        measurements=m,
        effective_config=eff,
        diagnostics=diag,
        filtered=OutputMeasurements(room_tone_sample=rt, speech_sample=sp),
        final=OutputMeasurements(room_tone_sample=rt, speech_sample=sp),
        normalisation=NormalisationResult(
            input_lufs=-18.5, input_tp=-1.2,
            output_lufs=-16.0, output_tp=-1.5,
            gain_applied_db=2.5, within_target=True,
            requested_target_i=-16.0, effective_target_i=-16.0),
        output_audio=np.zeros(4, np.int16),
        output_rate=44100,
    )


def roundtrip(rec: dict) -> dict:
    """The contract is on the SERIALISED tree (ref: marshalRecordTree)."""
    return json.loads(json.dumps(rec))


class TestRegionsNestedShape:
    """(ref: TestRunRecord_RegionsNestedShape, runrecord_test.go:188-307)."""

    def test_nested_shape(self):
        tree = roundtrip(new_run_record("ep.wav", populated_result()))
        regions = tree["regions"]

        # old flat keys must NOT appear directly under regions
        for flat in ("speech_candidates", "noise_profile", "speech_profile",
                     "speech_regions", "interval_samples"):
            assert flat not in regions, flat

        rt, sp = regions["room_tone"], regions["speech"]
        for block, name in ((rt, "room_tone"), (sp, "speech")):
            assert "elected" in block, name
            assert "samples" in block, name
            # full candidate arrays live in the sidecar, never inline
            assert "candidates" not in block, name
        assert "candidates_summary" in sp
        assert "candidates_summary" not in rt

        # input samples populate from the elected profiles, measurement
        # keys only — no election fields
        for block in (rt, sp):
            inp = block["samples"]["input"]
            assert "rms_level_dbfs" in inp
            for key in ("score", "stability_score", "voicing_density",
                        "transient_warning"):
                assert key not in inp, key

        # filtered/final samples present on a full record
        for kind in ("room_tone", "speech"):
            for stage in ("filtered", "final"):
                assert stage in regions[kind]["samples"], (kind, stage)

    def test_analysis_only_drops_filtered_final_samples(self):
        # (ref: TestRunRecord_RegionsAnalysisOnlyDropsSamples :307)
        tree = roundtrip(new_analysis_run_record("ep.wav", populated_measurements()))
        regions = tree["regions"]
        for kind in ("room_tone", "speech"):
            block = regions[kind]
            assert "elected" in block, kind
            samples = block.get("samples", {})
            for stage in ("filtered", "final"):
                assert stage not in samples, (kind, stage)
        # speech input sample still wires from the elected profile
        assert "input" in regions["speech"]["samples"]


class TestRegionDurationsAreSeconds:
    """(ref: TestRunRecord_RegionDurationsAreSeconds,
    runrecord_test.go:340-387) — _s float seconds, raw keys absent."""

    def test_seconds_keys(self):
        tree = roundtrip(new_run_record("ep.wav", populated_result()))
        rt_elected = tree["regions"]["room_tone"]["elected"]
        assert rt_elected["start_s"] == 2.0
        assert rt_elected["duration_s"] == 10.0
        for raw in ("start", "duration"):
            assert raw not in rt_elected, raw

        sp_region = tree["regions"]["speech"]["elected"]["region"]
        assert sp_region["start_s"] == 30.0
        assert sp_region["end_s"] == 40.0
        assert sp_region["duration_s"] == 10.0
        for raw in ("start", "end", "duration"):
            assert raw not in sp_region, raw


class TestGateFieldsAreDecibels:
    """(ref: TestRunRecord_GateThresholdIsDecibels,
    runrecord_test.go:442-480) — the record carries honest dB values, not
    the live config's linear amplitudes."""

    def test_threshold_and_range_in_db(self):
        tree = roundtrip(new_run_record("ep.wav", populated_result()))
        gate = tree["filters"]["speech_gate"]
        thr = gate["threshold_dbfs"]
        # the adapted config stored ~0.01 linear (-40 dB); the record must
        # carry dB, not the tiny linear amplitude
        assert thr < -1.0
        assert -90.0 <= thr <= -20.0
        rng = gate["range_db"]
        assert rng < -1.0
        # the linear keys must be gone
        assert "threshold" not in gate
        assert "range" not in gate


class TestFullShapeAndAnalysisOnly:
    """(ref: TestRunRecord_FullShape :76 +
    TestRunRecord_AnalysisOnlyDropsProcessingBlocks :125)."""

    def test_full_shape(self):
        tree = roundtrip(new_run_record("ep.wav", populated_result()))
        for block in ("run", "loudness", "dynamics", "spectral", "noise",
                      "regions", "filters", "normalisation"):
            assert block in tree, block
        for stage in ("input", "filtered", "final"):
            assert stage in tree["loudness"]["stages"], stage
            assert stage in tree["spectral"]["stages"], stage

    def test_analysis_only_drops_processing_blocks(self):
        tree = roundtrip(new_analysis_run_record("ep.wav", populated_measurements()))
        for block in ("filters", "normalisation"):
            assert block not in tree, block
        assert list(tree["loudness"]["stages"]) == ["input"]


class TestNonFiniteSerialisesAsNull:
    """(ref: TestRunRecord_NonFiniteFloatSerialisesAsNull,
    runrecord_test.go:157-188)."""

    def test_nan_inf_become_null(self):
        m = populated_measurements()
        m.loudness.input_i = float("nan")
        m.loudness.input_tp = float("-inf")
        rec = new_analysis_run_record("ep.wav", m)
        s = json.dumps(rec)
        assert "NaN" not in s and "Infinity" not in s
        tree = json.loads(s)
        inp = tree["loudness"]["stages"]["input"]
        vals = [v for v in inp.values() if v is None]
        assert vals, "non-finite floats must serialise as null"


def intervals_with_rms(vals) -> "Intervals":
    """Interval table with the given RMS series and inert other columns."""
    from jivetalking_tpu.analysis.intervals import Intervals
    from jivetalking_tpu.metering.spectral import METRIC_NAMES

    n = len(vals)
    z = np.zeros(n)
    return Intervals(
        timestamp=np.arange(n) * 0.25,
        rms_level=np.asarray(vals, dtype=np.float64),
        peak_level=z, momentary_lufs=z, short_term_lufs=z,
        true_peak=z, sample_peak=z,
        spectral={k: z for k in METRIC_NAMES},
        spectral_found=np.zeros(n, dtype=bool),
    )


class TestIntervalSummaryMaths:
    """(ref: TestNewIntervalSummary_MatchesReportMaths / _BelowThreshold,
    runrecord_sidecar_test.go:48-91): integer-index percentile selection
    sorted[n*k/d] — NOT interpolation, NOT (n-1)-scaled indices (the two
    differ at P75 for n=11) — and the >=10-non-silent population gate."""

    def test_matches_reference_index_selection(self):
        from jivetalking_tpu.report.runrecord import _interval_summary

        vals = [-70, -68, -66, -64, -62, -40, -38, -36, -34, -32, -30]
        s = _interval_summary(intervals_with_rms([-130.0] + vals))
        assert s["count"] == 12  # silence interval counts toward count
        d = s["rms_distribution"]
        n = 11
        assert d["min_dbfs"] == vals[0]
        assert d["p10_dbfs"] == vals[n // 10]
        assert d["p25_dbfs"] == vals[n // 4]
        assert d["p50_dbfs"] == vals[n // 2]
        assert d["p75_dbfs"] == vals[n * 3 // 4]   # index 8, NOT 7
        assert d["p90_dbfs"] == vals[n * 9 // 10]
        assert d["max_dbfs"] == vals[-1]
        assert s["largest_gap_db"] == 22.0  # -62 -> -40

    def test_below_threshold_drops_distribution(self):
        from jivetalking_tpu.report.runrecord import _interval_summary

        s = _interval_summary(intervals_with_rms([-60, -50, -40, -30, -20]))
        assert s["count"] == 5
        assert "rms_distribution" not in s
        assert "largest_gap_db" not in s

    def test_empty_series_is_none(self):
        from jivetalking_tpu.report.runrecord import _interval_summary

        assert _interval_summary(intervals_with_rms([])) is None
        assert _interval_summary(None) is None


def fully_populated_result() -> ProcessResult:
    """populated_result() with every metric struct filled so the serialised
    tree exercises the COMPLETE §8.4 key vocabulary (the reference pins it
    on a populated marshal, runrecord_tags_test.go:87-164)."""
    from jivetalking_tpu.metering.astats import AstatsResult
    from jivetalking_tpu.metering.ebur128 import LoudnessResult
    from jivetalking_tpu.metering.spectral import METRIC_NAMES, SpectralMetrics

    res = populated_result()
    m = res.measurements
    ast = AstatsResult(
        rms_level=-24.0, peak_level=-6.0, rms_trough=-60.0, rms_peak=-18.0,
        crest_factor=7.9, dynamic_range=54.0, noise_floor=-72.0,
        noise_floor_count=120.0, flat_factor=0.0, peak_count=3.0,
        dc_offset=0.0001, min_level=-0.5, max_level=0.5,
        min_difference=0.0, max_difference=0.2, mean_difference=0.01,
        rms_difference=0.02, zero_crossings=44100.0,
        zero_crossings_rate=0.1, entropy=0.65, bit_depth=16.0,
        number_of_samples=2_646_000.0)
    spec = SpectralMetrics(**{k: 1.0 for k in METRIC_NAMES}, found=True)
    lr = LoudnessResult(
        integrated_lufs=-16.0, lra_lu=6.0, lra_low_lufs=-20.0,
        lra_high_lufs=-14.0, threshold_lufs=-26.0, sample_peak_db=-1.9,
        true_peak_db=-1.2, momentary_max_lufs=-12.0, short_term_max_lufs=-13.0,
        momentary_lufs=np.zeros(4), short_term_lufs=np.zeros(4),
        block_starts_sec=np.zeros(4))
    m.astats = ast
    m.spectral = spec
    m.loudness.momentary_lufs = -12.0
    m.loudness.short_term_lufs = -13.0
    m.loudness.sample_peak_dbfs = -4.5
    m.loudness.input_lra = 9.0
    m.loudness.input_thresh = -34.0
    m.loudness.target_offset = -0.2
    m.vad.noise_profile.band_noise = [-70.0] * 15
    m.vad.noise_profile.bands_measured = True
    for om in (res.filtered, res.final):
        om.loudness = lr
        om.astats = ast
        om.spectral = spec
    return res


def collect_json_keys(tree, keys: set) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            keys.add(k)
            collect_json_keys(v, keys)
    elif isinstance(tree, list):
        for v in tree:
            collect_json_keys(v, keys)


class TestCanonicalKeys:
    """The serialised record must speak the reference's §8.4 key vocabulary
    — dimensioned suffixes present, legacy un-suffixed keys absent
    (ref: TestAudioMeasurementsJSON_HasCanonicalKeys +
    TestRunRecordNoiseProfileSpectralFields, runrecord_tags_test.go:87-283).
    The reference pins the measurement struct's own marshal; here the record
    IS the wire format, so the vocabulary is pinned on the full record."""

    # the reference's wantPresent list, minus the four keys that belong to
    # the AudioMeasurements container marshal (speech_regions/
    # speech_candidates/speech_profile/noise_profile) — this schema nests
    # them as regions.speech/room_tone per the RunRecord layout
    # (runrecord.go:171-173), which the reference's record also uses
    WANT_PRESENT = [
        "loudness", "dynamics", "noise", "regions",
        "integrated_lufs", "true_peak_dbtp", "lra_lu", "thresh_lufs",
        "target_offset_db", "momentary_lufs", "short_term_lufs",
        "sample_peak_dbfs",
        "rms_level_dbfs", "peak_level_dbfs", "dynamic_range_db",
        "crest_factor_astats_db", "rms_trough_dbfs", "rms_peak_dbfs",
        "dc_offset", "flat_factor", "zero_crossings_rate",
        "zero_crossings_count", "min_level_dbfs", "max_level_dbfs",
        "bit_depth", "number_of_samples", "noise_floor_count", "entropy",
        "floor_dbfs", "floor_source", "floor_prescan_dbfs",
        "floor_astats_dbfs", "reduction_headroom_db",
        "room_tone_detect_level_dbfs", "voice_activated",
        "centroid_hz", "spread_hz", "rolloff_hz",
        "voiced_low_percentile_dbfs", "noise_high_percentile_dbfs",
        "gate_separation_db",
        "crest_factor_db", "speech_band_body_rms_dbfs",
        "speech_band_sib_rms_dbfs",
        "measured_floor_dbfs", "spectral_centroid_hz",
        "spectral_mean", "spectral_variance", "spectral_spread_hz",
        "spectral_skewness", "spectral_entropy", "spectral_crest",
        "spectral_flux", "spectral_slope", "spectral_decrease",
        "spectral_rolloff_hz",
    ]

    WANT_ABSENT = [
        "input_i", "input_tp", "input_lra", "input_thresh",
        "rms_level", "peak_level", "dynamic_range", "crest_factor",
        "target_offset", "momentary_loudness", "short_term_loudness",
        "sample_peak",
        "floor", "floor_prescan", "floor_astats", "reduction_headroom",
        "room_tone_detect_level", "min_level", "max_level", "zero_crossings",
        "spectral_centroid", "spectral_spread", "spectral_rolloff",
        "suggested_gate_threshold", "measured_noise_floor",
    ]

    def keys(self):
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        ks: set = set()
        collect_json_keys(tree, ks)
        return ks

    def test_canonical_keys_present(self):
        ks = self.keys()
        missing = [k for k in self.WANT_PRESENT if k not in ks]
        assert not missing, f"missing canonical keys: {missing}"

    def test_legacy_keys_absent(self):
        ks = self.keys()
        legacy = [k for k in self.WANT_ABSENT if k in ks]
        assert not legacy, f"legacy keys must not appear: {legacy}"

    def test_noise_profile_spectral_thirteen(self):
        # all 13 contamination-detection spectral fields reach
        # regions.room_tone.elected (ref: runrecord_tags_test.go:165-283)
        from jivetalking_tpu.metering.spectral import METRIC_NAMES

        res = fully_populated_result()
        res.measurements.vad.noise_profile.spectral = type(
            res.measurements.spectral)(**{k: 2.0 for k in METRIC_NAMES},
                                       found=True)
        tree = roundtrip(new_run_record("ep.wav", res))
        elected = tree["regions"]["room_tone"]["elected"]
        from jivetalking_tpu.report.runrecord import _SPECTRAL_KEY
        for k in METRIC_NAMES:
            key = f"spectral_{_SPECTRAL_KEY[k]}"
            assert key in elected, key
            assert elected[key] == 2.0, key
        assert elected["band_noise_dbfs"] == [-70.0] * 15
        assert elected["band_noise_measured"] is True


class TestIntervalSidecarFlatSpectralKeys:
    """The .intervals.jsonl rows flatten every spectral metric into
    `spectral_*` keys with NO nested spectral object — the reference's
    IntervalSample JSON contract (ref:
    TestIntervalSampleJSON_PreservesFlatSpectralFields,
    analyser_test.go:29-132)."""

    def _intervals(self):
        import numpy as np

        from jivetalking_tpu.analysis.intervals import Intervals
        from jivetalking_tpu.metering.spectral import METRIC_NAMES

        n = 3
        spectral = {k: np.asarray([i + 1.0, 0.0, i + 3.0])
                    for i, k in enumerate(METRIC_NAMES)}
        return Intervals(
            timestamp=np.asarray([0.0, 0.25, 0.5]),
            rms_level=np.full(n, -30.0),
            peak_level=np.full(n, -20.0),
            momentary_lufs=np.full(n, -28.0),
            short_term_lufs=np.full(n, -28.0),
            true_peak=np.full(n, -20.0),
            sample_peak=np.full(n, -20.0),
            spectral=spectral,
            spectral_found=np.asarray([True, False, True]),
            hop=0.25,
        )

    def test_rows_carry_thirteen_flat_keys_no_nested_object(self, tmp_path):
        import json

        from jivetalking_tpu.metering.spectral import METRIC_NAMES
        from jivetalking_tpu.report.runrecord import (
            _SPECTRAL_KEY,
            write_interval_sidecar,
        )

        path = str(tmp_path / "ep.intervals.jsonl")
        write_interval_sidecar(path, self._intervals())
        rows = [json.loads(l) for l in open(path)]
        assert len(rows) == 3
        for row in rows:
            assert "spectral" not in row      # no nested object, ever
            for k in METRIC_NAMES:
                assert f"spectral_{_SPECTRAL_KEY[k]}" in row, k

    def test_values_roundtrip_exactly(self, tmp_path):
        import json

        from jivetalking_tpu.metering.spectral import METRIC_NAMES
        from jivetalking_tpu.report.runrecord import (
            _SPECTRAL_KEY,
            write_interval_sidecar,
        )

        path = str(tmp_path / "ep.intervals.jsonl")
        write_interval_sidecar(path, self._intervals())
        rows = [json.loads(l) for l in open(path)]
        for i, k in enumerate(METRIC_NAMES):
            assert rows[0][f"spectral_{_SPECTRAL_KEY[k]}"] == i + 1.0
            assert rows[2][f"spectral_{_SPECTRAL_KEY[k]}"] == i + 3.0
        # the no-temp-residue publish contract holds for sidecars too
        assert rows[0]["timestamp_s"] == 0.0

    def test_atomic_publish_no_temp_residue(self, tmp_path):
        import os

        from jivetalking_tpu.report.runrecord import write_interval_sidecar

        path = str(tmp_path / "ep.intervals.jsonl")
        write_interval_sidecar(path, self._intervals())
        assert os.path.exists(path)
        assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


class TestZeroValuedSpectralFieldsSurvive:
    """(ref: TestRunRecordNoiseProfileSpectralFieldsZeroValued,
    runrecord_tags_test.go:224-283): zero-valued spectral fields must
    serialise as numeric 0, never drop (the reference's old `,omitempty`
    regression) and never null."""

    def test_zeroed_representative_spread_stays_numeric(self):
        from jivetalking_tpu.metering.spectral import METRIC_NAMES, SpectralMetrics

        res = fully_populated_result()
        vals = {k: 2.0 for k in METRIC_NAMES}
        for z in ("variance", "skewness", "flux", "decrease"):
            vals[z] = 0.0
        res.measurements.vad.noise_profile.spectral = SpectralMetrics(
            **vals, found=True)
        tree = roundtrip(new_run_record("ep.wav", res))
        elected = tree["regions"]["room_tone"]["elected"]
        from jivetalking_tpu.report.runrecord import _SPECTRAL_KEY
        for k in METRIC_NAMES:
            key = f"spectral_{_SPECTRAL_KEY[k]}"
            assert key in elected, key
        for z in ("variance", "skewness", "flux", "decrease"):
            got = elected[f"spectral_{_SPECTRAL_KEY[z]}"]
            assert got == 0 and isinstance(got, (int, float)), z


class TestRegionSampleBlockHasNoElectionKeys:
    """(ref: TestRegionSampleJSON_HasNoElectionFields,
    runrecord_tags_test.go:284-343): the bare per-stage output samples
    (regions.<kind>.samples.<stage>) carry only amplitude/spectral/loudness
    keys — no scoring/voicing/band keys that would read as a real
    measurement when stale-zero."""

    ELECTION_KEYS = [
        "score", "stability_score", "voicing_density",
        "speech_band_body_rms_dbfs", "speech_band_sib_rms_dbfs",
        "speech_bands_measured", "transient_warning",
    ]
    MEASUREMENT_KEYS = [
        "rms_level_dbfs", "peak_level_dbfs", "crest_factor_db",
        "momentary_lufs", "short_term_lufs", "true_peak_dbtp",
        "sample_peak_dbfs",
    ]

    def _sample_blocks(self):
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        for kind in ("room_tone", "speech"):
            for stage, block in tree["regions"][kind]["samples"].items():
                yield f"{kind}.{stage}", block

    def test_no_election_keys(self):
        found_any = False
        for where, block in self._sample_blocks():
            found_any = True
            for key in self.ELECTION_KEYS:
                assert key not in block, f"{where} emits election key {key}"
        assert found_any

    def test_measurement_keys_present(self):
        for where, block in self._sample_blocks():
            for key in self.MEASUREMENT_KEYS:
                assert key in block, f"{where} missing {key}"
            # spectral content nests under one typed block with the
            # dimensioned centroid key (ref asserts centroid_hz present)
            assert "centroid_hz" in block["spectral"], where


class TestFiltersBlockCanonicalKeys:
    """(ref: TestEffectiveFilterConfigJSON_HasCanonicalKeys,
    runrecord_tags_test.go:343-395).  The repo's schema-v1 filters block
    carries the six adaptive families plus adeclick and loudnorm (this
    schema records the FULL effective config — a deliberate widening of the
    reference's block, which assembles loudnorm into `normalisation`
    instead), with the gate threshold/range converted to honest dB."""

    def keys(self):
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        ks: set = set()
        collect_json_keys(tree["filters"], ks)
        return ks, tree["filters"]

    def test_families_and_param_keys_present(self):
        ks, _ = self.keys()
        for key in (
            "rumble_highpass", "bandlimit_lowpass", "noise_reduction",
            "speech_gate", "levelling_compressor", "deesser", "adeclick",
            "loudnorm",
            # gate — dB-converted forms
            "threshold_dbfs", "range_db", "ratio", "attack", "release",
            "knee", "makeup", "detection",
            # biquads
            "frequency", "poles", "width", "mix", "transform",
            # noise reduction
            "strength", "patch_sec", "research_sec", "smooth",
            "afftdn_noise_reduction", "afftdn_noise_type",
            "afftdn_track_noise", "afftdn_band_noise",
            # deesser
            "intensity", "amount",
        ):
            assert key in ks, f"missing filters key {key}"

    def test_raw_linear_gate_fields_absent(self):
        # the linear threshold/range must NOT leak beside the dB forms
        _, block = self.keys()
        g = block["speech_gate"]
        assert "threshold" not in g
        assert "range" not in g

    def test_filter_order_plumbing_excluded(self):
        ks, _ = self.keys()
        assert "filter_order" not in ks
        assert "FilterOrder" not in ks

    def test_diagnostics_nested_with_reason_strings(self):
        # (ref: TestAdaptiveDiagnosticsJSON_HasCanonicalKeys :395-433 —
        # reason/clamp strings are retained processing state)
        _, block = self.keys()
        d = block["diagnostics"]
        for key in (
            "bandlimit_lp_reason", "speech_gate_depth_db",
            "speech_gate_quiet_speech_estimate",
            "speech_gate_speech_separation", "speech_gate_speech_headroom",
            "speech_gate_threshold_unclamped", "speech_gate_clamp_reason",
            "afftdn_enabled", "afftdn_disable_reason",
            "afftdn_noise_floor_db", "afftdn_noise_type",
        ):
            assert key in d, f"missing diagnostics key {key}"
        # legacy aggression vocabulary never existed in this schema
        for key in ("aggression", "aggression_index", "separation"):
            assert key not in d, key


class TestNormalisationBlockCanonicalKeys:
    """(ref: TestNormalisationResultJSON_HasCanonicalKeys,
    runrecord_tags_test.go:433-480): the normalisation block speaks the
    dimensioned vocabulary; final-stage measurements are assembled into the
    per-stage loudness/dynamics/spectral blocks, never duplicated here."""

    WANT_PRESENT = [
        "input_lufs", "input_dbtp", "output_lufs", "output_dbtp",
        "gain_applied_db", "within_target", "skipped",
        "requested_target_lufs", "effective_target_lufs",
        "linear_mode_forced", "limiter_enabled", "ceiling_dbtp",
        "gain_db", "filtered_dbtp", "pre_gain_db", "limiter_clamped",
    ]
    WANT_ABSENT = [
        "final_measurements", "FinalMeasurements",
        "InputLUFS", "LimiterCeiling", "PreGainDB", "EffectiveTargetI",
        "GainApplied", "gain_applied", "limiter_ceiling",
        "effective_target_i",
    ]

    def test_vocabulary(self):
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        block = tree["normalisation"]
        for key in self.WANT_PRESENT:
            assert key in block, f"missing normalisation key {key}"
        for key in self.WANT_ABSENT:
            assert key not in block, f"must not emit {key}"

    def test_final_stage_lands_in_stage_blocks_not_here(self):
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        # the final OutputMeasurements reach the per-stage sample blocks
        assert "final" in tree["regions"]["speech"]["samples"]
        # and nothing measurement-shaped nests inside normalisation
        assert all(not isinstance(v, dict)
                   for v in tree["normalisation"].values())

    def test_measurements_numeric_flags_boolean_no_raw_ffmpeg_keys(self):
        # (ref: TestRunRecord_LoudnormMeasuredNumeric,
        # runrecord_test.go:387-422): every measurement key holds a NUMBER
        # (never a stringified FFmpeg value), flags stay booleans, and the
        # raw FFmpeg stats-file keys are gone
        tree = roundtrip(new_run_record("ep.wav", fully_populated_result()))
        block = tree["normalisation"]
        flags = {"within_target", "skipped", "linear_mode_forced",
                 "limiter_enabled", "limiter_clamped"}
        for key in self.WANT_PRESENT:
            v = block[key]
            if key in flags:
                assert isinstance(v, bool), (key, v)
            else:
                assert isinstance(v, (int, float)) and not isinstance(
                    v, bool), (key, v)
        for raw in ("input_i", "input_tp", "output_i", "output_tp",
                    "target_offset", "normalization_type"):
            assert raw not in block, raw

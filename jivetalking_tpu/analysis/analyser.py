"""Pass-1 analyser: one device pass over the PCM produces every measurement
the adaptation layer consumes.

Behavioural rebuild of `AnalyseAudio` (ref: internal/processor/
analyser.go:319-362) and `buildInputMeasurements` (analyser.go:363-406) with
the fallback ladders of assignInputNoiseFloor (analyser.go:488-528) and
assignInputMeasurementSuggestions.

TPU-first shape: where the reference decodes the file once for the metering
graph and then re-decodes ~17 band regions, this analyser keeps the PCM
resident on device and runs (a) the fused metering kernels (R128 / astats /
aspectralstats), (b) the interval engine, and (c) the batched band-RMS kernel
over elected regions — no re-decode, one host<->device round trip per stage.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..metering.astats import AstatsResult, assemble_astats, measure_astats
from ..metering.ebur128 import LoudnessResult, measure_loudness
from ..metering.spectral import SpectralFrameSeries, SpectralMetrics, spectral_frames
from .bands import measure_noise_bands, measure_speech_bands
from .intervals import Intervals, assemble_intervals, build_intervals
from .types import VADResult
from .vad import (
    VAD_LEVEL_FLOOR_DB,
    adaptive_silence_threshold,
    detect_voice_activity,
    estimate_noise_floor_seed,
)

# Noise-floor fallback anchors (ref: analyser.go:442-455)
NOISE_FLOOR_RMS_ESTIMATE_OFFSET_DB = 15.0
NOISE_FLOOR_THRESH_OFFSET_LOUD_DB = 18.0
NOISE_FLOOR_THRESH_OFFSET_MID_DB = 12.0
NOISE_FLOOR_THRESH_OFFSET_QUIET_DB = 8.0
NOISE_FLOOR_CLAMP_MIN_DB = -90.0
NOISE_FLOOR_CLAMP_MAX_DB = -30.0

# Reduction-headroom fallback tiers (ref: analyser.go:458-462)
REDUCTION_HEADROOM_LOUD_DB = 40.0
REDUCTION_HEADROOM_MID_DB = 25.0
REDUCTION_HEADROOM_QUIET_DB = 15.0

LOUD_TIER_THRESHOLD_LUFS = -20.0
MID_TIER_THRESHOLD_LUFS = -30.0


def _streaming_ok(sample_rate: int) -> bool:
    from ..pipeline.fused_chunked import analysis_streaming_ok

    return analysis_streaming_ok(sample_rate)


@dataclass
class InputLoudness:
    """Pass-1 loudness block (ref: InputLoudnessMetrics, analyser.go:149-158)."""

    momentary_lufs: float = 0.0
    short_term_lufs: float = 0.0
    sample_peak_dbfs: float = 0.0
    input_i: float = 0.0
    input_tp: float = 0.0
    input_lra: float = 0.0
    input_thresh: float = 0.0
    target_offset: float = 0.0


@dataclass
class Dynamics:
    """astats time-domain block (ref: DynamicsMetrics, analyser.go:162-184)."""

    dynamic_range: float = 0.0
    rms_level: float = 0.0
    peak_level: float = 0.0
    rms_trough: float = 0.0
    rms_peak: float = 0.0
    dc_offset: float = 0.0
    flat_factor: float = 0.0
    crest_factor_db: float = 0.0
    zero_crossings_rate: float = 0.0
    zero_crossings: float = 0.0
    max_difference: float = 0.0
    min_difference: float = 0.0
    mean_difference: float = 0.0
    rms_difference: float = 0.0
    entropy: float = 0.0
    min_level_dbfs: float = 0.0
    max_level_dbfs: float = 0.0
    noise_floor_count: float = 0.0
    bit_depth: float = 0.0
    number_of_samples: float = 0.0


@dataclass
class Noise:
    """Input-only noise block (ref: NoiseMetrics, analyser.go:190-204)."""

    floor: float = 0.0
    floor_source: str = ""
    floor_prescan: float = 0.0
    floor_astats: float = 0.0
    room_tone_detect_level: float = 0.0
    voice_activated: bool = False
    floored_fraction: float = 0.0
    reduction_headroom: float = 0.0


@dataclass
class AudioMeasurements:
    """Everything Pass 1 knows (ref: AudioMeasurements, analyser.go:232-249).
    `vad` carries the region metrics block (speech/noise profiles, candidates,
    gate statistics)."""

    loudness: InputLoudness = field(default_factory=InputLoudness)
    dynamics: Dynamics = field(default_factory=Dynamics)
    noise: Noise = field(default_factory=Noise)
    spectral: SpectralMetrics = field(default_factory=SpectralMetrics)
    vad: VADResult = field(default_factory=VADResult)
    intervals: Intervals | None = None
    duration: float = 0.0
    sample_rate: int = 0
    # raw metering results kept for the run record / reports
    r128: LoudnessResult | None = None
    astats: AstatsResult | None = None
    # downmixed f32 PCM left resident on device by the fused analysis
    # program (consumed by the band/master programs; never serialised)
    device_pcm: object = field(default=None, repr=False, compare=False)


def _loudness_tier(input_i: float) -> str:
    if input_i > LOUD_TIER_THRESHOLD_LUFS:
        return "loud"
    if input_i > MID_TIER_THRESHOLD_LUFS:
        return "mid"
    return "quiet"


def _assign_input_noise_floor(m: AudioMeasurements) -> None:
    """astats trough -> rms-15 -> thresh-tier ladder, clamp [-90, -30]
    (ref: assignInputNoiseFloor, analyser.go:490-519)."""
    trough = m.dynamics.rms_trough
    rms = m.dynamics.rms_level
    if trough != 0.0 and not (math.isinf(trough) and trough < 0):
        m.noise.floor = trough
        m.noise.floor_source = "astats"
    elif rms != 0.0 and not (math.isinf(rms) and rms < 0):
        m.noise.floor = rms - NOISE_FLOOR_RMS_ESTIMATE_OFFSET_DB
        m.noise.floor_source = "rms_estimate"
    else:
        tier = _loudness_tier(m.loudness.input_i)
        offset = {
            "loud": NOISE_FLOOR_THRESH_OFFSET_LOUD_DB,
            "mid": NOISE_FLOOR_THRESH_OFFSET_MID_DB,
            "quiet": NOISE_FLOOR_THRESH_OFFSET_QUIET_DB,
        }[tier]
        m.noise.floor = m.loudness.input_thresh - offset
        m.noise.floor_source = "ebur128_estimate"
    m.noise.floor = max(NOISE_FLOOR_CLAMP_MIN_DB, min(NOISE_FLOOR_CLAMP_MAX_DB, m.noise.floor))


def _assign_reduction_headroom(m: AudioMeasurements) -> None:
    """(ref: assignInputMeasurementSuggestions, analyser.go:521-528)."""
    if m.dynamics.rms_level != 0.0 and m.noise.floor != 0.0:
        m.noise.reduction_headroom = max(0.0, min(60.0, m.dynamics.rms_level - m.noise.floor))
        return
    tier = _loudness_tier(m.loudness.input_i)
    m.noise.reduction_headroom = {
        "loud": REDUCTION_HEADROOM_LOUD_DB,
        "mid": REDUCTION_HEADROOM_MID_DB,
        "quiet": REDUCTION_HEADROOM_QUIET_DB,
    }[tier]


def _loudness_from_fused_dict(d: dict, sample_rate: int) -> LoudnessResult:
    mom = np.asarray(d["momentary"], dtype=np.float64)
    st = np.asarray(d["short_term"], dtype=np.float64)
    sp = float(d["sample_peak"])
    tp = float(d["true_peak"])
    hop = max(1, int(round(sample_rate * 0.1))) / sample_rate
    return LoudnessResult(
        integrated_lufs=float(d["integrated"]),
        lra_lu=float(d["lra"]),
        lra_low_lufs=float(d["lra_low"]),
        lra_high_lufs=float(d["lra_high"]),
        threshold_lufs=float(d["rel_thresh"]),
        sample_peak_db=20.0 * math.log10(sp) if sp > 0 else -150.0,
        true_peak_db=20.0 * math.log10(tp) if tp > 0 else -150.0,
        momentary_max_lufs=float(mom.max()) if mom.size else -150.0,
        short_term_max_lufs=float(st.max()) if st.size else -150.0,
        momentary_lufs=mom,
        short_term_lufs=st,
        block_starts_sec=np.arange(mom.size, dtype=np.float64) * hop,
    )


def analyse_audio(
    x,
    sample_rate: int,
    target_i: float = -16.0,
    measure_bands: bool = True,
    fused: bool = True,
) -> AudioMeasurements:
    """Pass 1: full-file metering + interval engine + VAD + band measures.

    `fused=True` (default) runs all device metering as ONE compiled program
    with a single host pull (pipeline/fused.fused_analysis); `x` may then be
    (n,) or (channels, n), int16 or float — the downmix (the reference's
    `aformat=channel_layouts=mono` stage) happens in-graph, and the mono PCM
    is left on device in `AudioMeasurements.device_pcm`.  `fused=False`
    keeps the per-op kernels and requires mono float input."""
    if fused:
        from ..pipeline.fused import fused_analysis

        if hasattr(x, "read") and hasattr(x, "total_samples"):
            if not _streaming_ok(sample_rate):
                # degenerate grid alignment at this rate (see
                # fused_chunked.analysis_streaming_ok): materialise and
                # run the whole-file program instead
                chunks = []
                while True:
                    c = x.read(1 << 20)
                    if c.shape[-1] == 0:
                        break
                    chunks.append(c)
                x = np.concatenate(chunks, axis=-1)
                mono, out = fused_analysis(x, sample_rate)
            else:
                # bounded-memory stream reader (io/flac.FlacStreamReader):
                # decode -> upload -> free, chunk by chunk; the host never
                # holds the whole file (ref: reader.go's O(frame) loop)
                from ..pipeline.fused_chunked import fused_analysis_from_reader

                mono, out = fused_analysis_from_reader(x, sample_rate)
        elif (isinstance(x, np.ndarray)
                and int(np.shape(x)[-1]) >= 60 * sample_rate
                and _streaming_ok(sample_rate)):
            # long host-side input: stream halo-overlapping chunks so the
            # uploads overlap each other AND the per-chunk metering
            # (pipeline/fused_chunked.fused_analysis_streamed)
            from ..pipeline.fused_chunked import fused_analysis_streamed

            mono, out = fused_analysis_streamed(x, sample_rate)
        else:
            mono, out = fused_analysis(x, sample_rate)
        return assemble_measurements(mono, out, sample_rate, target_i,
                                     measure_bands)
    x = jnp.asarray(x, dtype=jnp.float32)
    return _finish_measurements(x, None, sample_rate, target_i,
                                measure_bands, fused=False)


def assemble_measurements(
    mono,
    out: dict,
    sample_rate: int,
    target_i: float = -16.0,
    measure_bands: bool = True,
) -> AudioMeasurements:
    """Host-side Pass-1 assembly from a fused-analysis output tree
    (`{"loudness", "astats", "spectral", "iv_sumsq", "iv_peak"}` + the
    device-resident mono PCM).  Shared by the single-file paths above and
    the batched back-catalogue analysis (parallel/batch_chunked), which
    produces one such tree per file from ONE vmapped device program."""
    return _finish_measurements(mono, out, sample_rate, target_i,
                                measure_bands, fused=True)


def _finish_measurements(
    x,
    out: dict | None,
    sample_rate: int,
    target_i: float,
    measure_bands: bool,
    fused: bool,
) -> AudioMeasurements:
    n = int(x.shape[-1])
    duration = n / sample_rate

    m = AudioMeasurements(duration=duration, sample_rate=sample_rate)

    if fused:
        m.device_pcm = x
        r128 = _loudness_from_fused_dict(out["loudness"], sample_rate)
        w = max(2, int(round(0.05 * sample_rate)))
        ast = assemble_astats(out["astats"], n, w)
        spec_hop = 1024
        n_sframes = int(next(iter(out["spectral"].values())).shape[0])
        spec_series = SpectralFrameSeries(
            metrics={k: np.asarray(v, dtype=np.float64) for k, v in out["spectral"].items()},
            frame_times=np.arange(n_sframes, dtype=np.float64) * spec_hop / sample_rate,
        )
    else:
        # --- per-op metering pass (the unit-tested reference path) ---
        r128 = measure_loudness(x, sample_rate)
        ast = measure_astats(x, sample_rate)
        spec_series = spectral_frames(x, sample_rate)
    m.r128 = r128
    m.astats = ast
    m.spectral = spec_series.average()

    lo = m.loudness
    lo.input_i = r128.integrated_lufs
    lo.input_tp = r128.true_peak_db
    lo.input_lra = r128.lra_lu
    lo.input_thresh = r128.integrated_lufs - 10.0
    lo.target_offset = target_i - r128.integrated_lufs
    lo.momentary_lufs = r128.momentary_max_lufs
    lo.short_term_lufs = r128.short_term_max_lufs
    lo.sample_peak_dbfs = r128.sample_peak_db

    d = m.dynamics
    d.dynamic_range = ast.dynamic_range
    d.rms_level = ast.rms_level
    d.peak_level = ast.peak_level
    d.rms_trough = ast.rms_trough
    d.rms_peak = ast.rms_peak
    d.dc_offset = ast.dc_offset
    d.flat_factor = ast.flat_factor
    d.crest_factor_db = (
        20.0 * math.log10(ast.crest_factor) if ast.crest_factor > 0 else 0.0
    )
    d.zero_crossings_rate = ast.zero_crossings_rate
    d.zero_crossings = ast.zero_crossings
    d.max_difference = ast.max_difference
    d.min_difference = ast.min_difference
    d.mean_difference = ast.mean_difference
    d.rms_difference = ast.rms_difference
    d.entropy = ast.entropy
    d.min_level_dbfs = (
        20.0 * math.log10(abs(ast.min_level)) if ast.min_level != 0 else -150.0
    )
    d.max_level_dbfs = (
        20.0 * math.log10(abs(ast.max_level)) if ast.max_level != 0 else -150.0
    )
    d.noise_floor_count = ast.noise_floor_count
    d.bit_depth = ast.bit_depth
    d.number_of_samples = ast.number_of_samples
    m.noise.floor_astats = ast.noise_floor

    # --- interval engine ---
    if fused:
        iv = assemble_intervals(
            np.asarray(out["iv_sumsq"], dtype=np.float64),
            np.asarray(out["iv_peak"], dtype=np.float64),
            n, sample_rate, r128, spec_series,
        )
    else:
        iv = build_intervals(x, sample_rate, r128, spec_series)
    m.intervals = iv

    # --- pre-scan noise-floor seed (ref: buildInputMeasurements:367-378) ---
    seed, silence_thresh, ok = estimate_noise_floor_seed(iv)
    if not ok:
        # fully gated / voice-activated capture: the low sentinel keeps the
        # split clamp and percentile-floor anchor inert
        seed = VAD_LEVEL_FLOOR_DB
        silence_thresh = adaptive_silence_threshold(VAD_LEVEL_FLOOR_DB)
    m.noise.floor_prescan = seed
    m.noise.room_tone_detect_level = silence_thresh

    # ladder floor (normally overwritten by the VAD percentile floor below)
    _assign_input_noise_floor(m)

    # --- unified VAD ---
    vad = detect_voice_activity(iv, seed)
    m.vad = vad
    m.noise.floor = vad.floor
    m.noise.floor_source = "vad_percentile"
    m.noise.floored_fraction = vad.floored_fraction
    m.noise.voice_activated = vad.voice_activated

    # --- band phase (batched on-device; ref: analyser.go:335-358) ---
    if measure_bands and fused:
        # one dispatch per region with traced bounds (no recompiles); both
        # regions dispatch before either pulls, so they overlap on device
        from ..pipeline.fused import (
            NOISE_PAD_SECS,
            SPEECH_PAD_SECS,
            band_rms_collect,
            band_rms_dispatch,
        )

        speech_h = noise_h = None
        if vad.speech_profile is not None and vad.speech_profile.region.duration > 0:
            speech_h = band_rms_dispatch(
                x, sample_rate, vad.speech_profile.region, SPEECH_PAD_SECS
            )
        if vad.noise_profile is not None and vad.noise_region is not None and vad.noise_profile.duration > 0:
            noise_h = band_rms_dispatch(x, sample_rate, vad.noise_region, NOISE_PAD_SECS)
        if speech_h is not None:
            rms = band_rms_collect(speech_h)
            body, sib = rms[15], rms[16]
            body_ok = math.isfinite(body)
            sib_ok = math.isfinite(sib)
            vad.speech_profile.body_band_rms = body if body_ok else 0.0
            vad.speech_profile.sib_band_rms = sib if sib_ok else 0.0
            vad.speech_profile.bands_measured = body_ok and sib_ok
        if noise_h is not None:
            band_noise = band_rms_collect(noise_h)[:15]
            finite = sum(1 for v in band_noise if math.isfinite(v))
            vad.noise_profile.band_noise = band_noise
            vad.noise_profile.bands_measured = finite >= 10
    elif measure_bands:
        if vad.speech_profile is not None and vad.speech_profile.region.duration > 0:
            body, sib, measured = measure_speech_bands(x, sample_rate, vad.speech_profile.region)
            vad.speech_profile.body_band_rms = body
            vad.speech_profile.sib_band_rms = sib
            vad.speech_profile.bands_measured = measured
        if vad.noise_profile is not None and vad.noise_region is not None and vad.noise_profile.duration > 0:
            band_noise, measured = measure_noise_bands(x, sample_rate, vad.noise_region)
            vad.noise_profile.band_noise = band_noise
            vad.noise_profile.bands_measured = measured

    _assign_reduction_headroom(m)
    return m

"""Unified voice-activity detector — the core Pass-1 algorithm.

Behavioural rebuild of the reference's `detectVoiceActivity`
(ref: internal/processor/analyser_vad.go:728-783) plus its satellite
machinery: the pre-scan noise-floor seed (analyser_noise_seed.go), the
Otsu histogram split, hysteresis run-building, the low-cluster room-tone
picker with golden refinement, speech-candidate election with the grounded
scorer (analyser_candidates_shared.go / _speech.go), and the gate-window
statistics (analyser_vad.go:220-252).

One bimodal split on a per-interval momentary-LUFS histogram feeds both
outputs the adaptive filters consume: the elected SpeechProfile and the
NoiseProfile / Noise.Floor.

The histogram / percentile maths is vector numpy over the ~N/0.25s interval
table (a few thousand rows for an hour of audio); the run-builders are tiny
sequential host loops, mirroring the reference's design of keeping the
decision logic on the host between device passes.
"""

from __future__ import annotations

import math

import numpy as np

from .intervals import Intervals
from .types import (
    GateStatistics,
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
    VADResult,
)

# --- run-formation bounds (ref: analyser_vad.go:21-32) ---
MIN_SPEECH_DURATION = 10.0          # vadMinSpeechDuration
GAP_TOLERANCE_FLOOR = 2.0           # vadGapToleranceFloor
GAP_TOLERANCE_CEILING = 10.0        # vadGapToleranceCeiling

VAD_LEVEL_FLOOR_DB = -115.0         # vadLevelFloorDB (analyser_vad.go:63)
HISTOGRAM_BIN_WIDTH_DB = 1.0        # analyser_vad.go:729

# --- spectral veto constants (ref: analyser_candidates_speech.go:10-26) ---
SPEECH_CENTROID_MIN = 200.0
SPEECH_CENTROID_MAX = 6000.0
SPEECH_MIN_NOISE_MARGIN_DB = 2.0    # speechMinimumNoiseMarginDB
SPEECH_ENTROPY_MAX = 0.70

# --- hysteresis (ref: analyser_vad.go:359-369) ---
HYSTERESIS_FRACTION = 0.25
HYSTERESIS_FALLBACK_DB = 1.0

# --- percentiles (ref: analyser_vad.go:182-189, 307-311) ---
GATE_VOICED_LOW_PCT = 10.0
GATE_NOISE_HIGH_PCT = 95.0
NOISE_FLOOR_PCT = 10.0

VOICE_ACTIVATED_FRACTION = 0.20     # vadVoiceActivatedFraction (analyser_vad.go:698)

# --- golden windows (ref: analyser_noise_seed.go:20-24, _speech.go:108-114) ---
GOLDEN_WINDOW_DURATION = 10.0       # room tone target
GOLDEN_WINDOW_MINIMUM = 8.0
GOLDEN_SPEECH_WINDOW_DURATION = 60.0
GOLDEN_SPEECH_WINDOW_MINIMUM = 30.0

IDEAL_NOISE_DURATION_MIN = 8.0      # idealDurationMin (analyser_vad.go:554)
IDEAL_NOISE_DURATION_MAX = 18.0

# --- speech-window stability scoring (ref: analyser_candidates_speech.go) ---
VOICING_DENSITY_THRESHOLD = 0.6
VOICED_KURTOSIS_THRESHOLD = 4.5
ROLLOFF_IDEAL_MIN, ROLLOFF_IDEAL_MAX = 4000.0, 8000.0
ROLLOFF_ACCEPTABLE_MIN, ROLLOFF_ACCEPTABLE_MAX = 2500.0, 10000.0
FLUX_STABLE, FLUX_NORMAL, FLUX_TRANSIENT, FLUX_ACCEPTABLE = 0.004, 0.010, 0.020, 0.030
MIN_SNR_MARGIN = 20.0
SNR_SATURATION_MARGIN = 40.0

W_KURTOSIS, W_FLATNESS, W_CENTROID, W_RMS = 0.15, 0.10, 0.10, 0.10
W_CONSISTENCY, W_VOICING, W_ROLLOFF, W_FLUX = 0.10, 0.15, 0.15, 0.15

GROUNDED_SNR_WEIGHT = 0.6
GROUNDED_DURATION_WEIGHT = 0.4
GROUNDED_TIEBREAK_MAX = 0.02
GROUNDED_VARIANCE_CAP = 25.0
SPEECH_DURATION_ADEQUACY_MIN = GOLDEN_SPEECH_WINDOW_MINIMUM
MIN_VIABLE_SPEECH_SCORE = 0.3

# --- noise-floor seed (ref: analyser_noise_seed.go:26-66) ---
ROOMTONE_AMPLITUDE_DECAY_DB = 6.0
ROOMTONE_AMPLITUDE_WEIGHT = 0.6
ROOMTONE_FLUX_WEIGHT = 0.4
SILENCE_THRESHOLD_MIN_INTERVALS = 10
FLOOR_SEED_TOP_DIVISOR = 5          # top 20%
FLOOR_SEED_MIN_COUNT = 8
SILENCE_THRESHOLD_HEADROOM_DB = 1.0
SILENCE_FALLBACK_HEADROOM = 6.0
SILENCE_MIN_THRESHOLD = -70.0
SILENCE_MAX_THRESHOLD = -35.0


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def intervals_for_duration(duration: float, hop: float) -> int:
    """Duration -> nearest whole interval count (ref: analyser_vad.go:38-43)."""
    if hop <= 0:
        return 0
    return int((duration + hop / 2.0) / hop)


def is_floored(levels: np.ndarray) -> np.ndarray:
    """Floored = non-finite or at/below the -115 dB measurement floor
    (ref: isFlooredLevel, analyser_vad.go:72-74)."""
    return ~np.isfinite(levels) | (levels <= VAD_LEVEL_FLOOR_DB)


def percentile_of_sorted(sorted_vals: np.ndarray, pct: float) -> float:
    """Nearest-rank percentile: idx = int(pct/100*(n-1)), reference convention
    (ref: percentileOfSorted, analyser_vad.go:169-176)."""
    n = sorted_vals.size
    if n == 0:
        return 0.0
    pct = max(0.0, min(100.0, pct))
    return float(sorted_vals[int(pct / 100.0 * (n - 1))])


def interval_levels(iv: Intervals, axis: str = "momentary") -> np.ndarray:
    return iv.rms_level if axis == "rms" else iv.momentary_lufs


def passes_spectral_veto(iv: Intervals) -> np.ndarray:
    """Vectorised per-interval speech veto: centroid inside the voice band and
    entropy under the ceiling (ref: passesSpectralVeto, analyser_vad.go:345-349)."""
    c = iv.spectral["centroid"]
    e = iv.spectral["entropy"]
    return (c >= SPEECH_CENTROID_MIN) & (c <= SPEECH_CENTROID_MAX) & (e < SPEECH_ENTROPY_MAX)


# ---------------------------------------------------------------------------
# pre-scan noise-floor seed (analyser_noise_seed.go)
# ---------------------------------------------------------------------------

def room_tone_scores(iv: Intervals, level_p50: float, flux_p50: float) -> np.ndarray:
    """0-1 room-tone likelihood per interval: amplitude 0.6 + flux-stability 0.4
    (ref: roomToneScore, analyser_noise_seed.go:78-104)."""
    level = iv.momentary_lufs
    amp = np.where(
        level > level_p50,
        np.maximum(0.0, 1.0 - (level - level_p50) / ROOMTONE_AMPLITUDE_DECAY_DB),
        1.0,
    )
    flux = iv.spectral["flux"]
    if flux_p50 > 0:
        ratio = flux / flux_p50
        fscore = np.where(ratio > 1.0, 1.0 / np.maximum(ratio, 1e-30), 1.0)
    else:
        fscore = np.ones_like(flux)
    return ROOMTONE_AMPLITUDE_WEIGHT * amp + ROOMTONE_FLUX_WEIGHT * fscore


def estimate_noise_floor_seed(iv: Intervals) -> tuple[float, float, bool]:
    """(noise_floor_seed, silence_threshold, ok) pre-scan estimate on the
    momentary-LUFS axis (ref: estimateNoiseFloorAndThreshold,
    analyser_noise_seed.go:154-222).  Index-of-go-median convention preserved:
    sorted[len/2]."""
    n = len(iv)
    if n < SILENCE_THRESHOLD_MIN_INTERVALS:
        return 0.0, 0.0, False

    levels = np.sort(iv.momentary_lufs)
    flux = np.sort(iv.spectral["flux"])
    level_p50 = float(levels[n // 2])
    flux_p50 = float(flux[n // 2])

    scores = room_tone_scores(iv, level_p50, flux_p50)
    lv = iv.momentary_lufs
    # sort by score desc, then level asc, then index asc (deterministic ties)
    order = np.lexsort((np.arange(n), lv, -scores))

    count = max(n // FLOOR_SEED_TOP_DIVISOR, FLOOR_SEED_MIN_COUNT)
    count = min(count, n)
    top_levels = lv[order[:count]]
    usable = top_levels[~is_floored(top_levels)]
    if usable.size == 0:
        return 0.0, 0.0, False
    seed = float(np.max(usable))
    return seed, seed + SILENCE_THRESHOLD_HEADROOM_DB, True


def adaptive_silence_threshold(noise_floor: float) -> float:
    """Fallback room-tone threshold (ref: calculateAdaptiveSilenceThreshold,
    analyser_noise_seed.go:227-241)."""
    return max(SILENCE_MIN_THRESHOLD, min(SILENCE_MAX_THRESHOLD, noise_floor + SILENCE_FALLBACK_HEADROOM))


# ---------------------------------------------------------------------------
# histogram + Otsu split (analyser_vad.go:86-305)
# ---------------------------------------------------------------------------

def otsu_split_from_levels(levels: np.ndarray, bin_width: float = HISTOGRAM_BIN_WIDTH_DB) -> float:
    """Otsu's between-class-variance threshold over a fixed-width level
    histogram; returns the upper edge of the background bin
    (ref: buildLevelHistogram + otsuSplit, analyser_vad.go:108-305)."""
    if levels.size == 0 or bin_width <= 0:
        return 0.0
    lo, hi = float(np.min(levels)), float(np.max(levels))
    n_bins = int((hi - lo) / bin_width) + 1
    idx = np.minimum(((levels - lo) / bin_width).astype(np.int64), n_bins - 1)
    bins = np.bincount(idx, minlength=n_bins).astype(np.float64)

    if n_bins < 2:
        return (lo + hi) / 2.0

    centres = lo + (np.arange(n_bins) + 0.5) * bin_width
    total = bins.sum()
    sum_all = float(np.sum(centres * bins))

    w_bg = np.cumsum(bins)[:-1]                 # background weight after bin i
    s_bg = np.cumsum(centres * bins)[:-1]
    w_fg = total - w_bg
    valid = (w_bg > 0) & (w_fg > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_bg = s_bg / w_bg
        mean_fg = (sum_all - s_bg) / w_fg
        var = w_bg * w_fg * (mean_bg - mean_fg) ** 2
    var = np.where(valid, var, 0.0)
    if not (var > 0.0).any():
        return (lo + hi) / 2.0
    # np.argmax returns the FIRST maximal index, matching the reference's
    # strictly-greater scan order
    best_idx = int(np.argmax(var))
    return lo + (best_idx + 1) * bin_width


def clamp_split(split: float, noise_floor_seed: float, p75: float) -> float:
    """Clamp to [seed + 2 dB, p75]; lower bound wins on inversion
    (ref: clampSplit, analyser_vad.go:332-338)."""
    lower = noise_floor_seed + SPEECH_MIN_NOISE_MARGIN_DB
    if p75 < lower:
        return lower
    return max(lower, min(p75, split))


def percentile_floor(sorted_levels: np.ndarray, noise_floor_seed: float) -> float:
    """p10 of the non-floored level set, clamped not below seed + 2 dB
    (ref: percentileFloor, analyser_vad.go:320-324)."""
    floor = percentile_of_sorted(sorted_levels, NOISE_FLOOR_PCT)
    return max(floor, noise_floor_seed + SPEECH_MIN_NOISE_MARGIN_DB)


def upper_mode_centre(levels: np.ndarray, split: float, bin_width: float = HISTOGRAM_BIN_WIDTH_DB) -> float:
    """Mean level of foreground-class bins (centre >= split)
    (ref: upperModeCentre, analyser_vad.go:374-387)."""
    if levels.size == 0:
        return split
    lo, hi = float(np.min(levels)), float(np.max(levels))
    n_bins = int((hi - lo) / bin_width) + 1
    idx = np.minimum(((levels - lo) / bin_width).astype(np.int64), n_bins - 1)
    bins = np.bincount(idx, minlength=n_bins).astype(np.float64)
    centres = lo + (np.arange(n_bins) + 0.5) * bin_width
    mask = centres >= split
    count = bins[mask].sum()
    if count == 0:
        return split
    return float(np.sum(centres[mask] * bins[mask]) / count)


def hysteresis_margin(levels: np.ndarray, split: float) -> float:
    """margin = 0.25 x (upper-mode - split), fallback 1 dB
    (ref: hysteresisMargin, analyser_vad.go:392-398)."""
    distance = upper_mode_centre(levels, split) - split
    if distance <= 0:
        return HYSTERESIS_FALLBACK_DB
    return distance * HYSTERESIS_FRACTION


# ---------------------------------------------------------------------------
# speech flags, gap tolerance, run builder (analyser_vad.go:400-548)
# ---------------------------------------------------------------------------

def speech_flags(iv: Intervals, split: float, axis: str = "momentary") -> np.ndarray:
    level = interval_levels(iv, axis)
    return (~is_floored(level)) & (level >= split) & passes_spectral_veto(iv)


def gap_tolerance_intervals(flags: np.ndarray, hop: float) -> int:
    """p75 of interior inter-speech gap lengths, clamped [2 s, 10 s] in hops
    (ref: gapToleranceIntervals, analyser_vad.go:405-444)."""
    floor = intervals_for_duration(GAP_TOLERANCE_FLOOR, hop)
    ceiling = intervals_for_duration(GAP_TOLERANCE_CEILING, hop)
    speech_idx = np.flatnonzero(flags)
    if speech_idx.size == 0:
        return floor
    gaps = np.diff(speech_idx) - 1
    gaps = gaps[gaps > 0].astype(np.float64)
    if gaps.size == 0:
        return floor
    p75 = int(round(percentile_of_sorted(np.sort(gaps), 75)))
    return max(floor, min(ceiling, p75))


def build_speech_runs(
    iv: Intervals, split: float, margin: float, tol: int, axis: str = "momentary"
) -> list[Region]:
    """Two-threshold hysteresis run builder with loud-gap guard
    (ref: buildSpeechRuns, analyser_vad.go:473-548)."""
    hop = iv.hop
    min_intervals = intervals_for_duration(MIN_SPEECH_DURATION, hop)
    n = len(iv)
    if n < min_intervals or min_intervals <= 0:
        return []

    level = interval_levels(iv, axis)
    veto = passes_spectral_veto(iv)
    floored = is_floored(level)
    high = split + margin
    low = split - margin

    runs: list[Region] = []
    run_start = 0.0
    run_speech_count = 0
    last_speech_idx = 0
    pending_gap = 0
    in_run = False

    def flush(end_idx: int):
        nonlocal in_run, run_speech_count, pending_gap
        if in_run and run_speech_count >= min_intervals:
            end_time = iv.timestamp[end_idx] + hop
            runs.append(Region(start=run_start, end=float(end_time)))
        in_run = False
        run_speech_count = 0
        pending_gap = 0

    for i in range(n):
        lvl = level[i]
        v = bool(veto[i]) and not bool(floored[i])
        is_speech = (not floored[i]) and lvl >= split and v

        if not in_run:
            if (not floored[i]) and lvl >= high and v:
                run_start = float(iv.timestamp[i])
                run_speech_count = 1
                last_speech_idx = i
                pending_gap = 0
                in_run = True
            continue

        if is_speech:
            run_speech_count += 1
            last_speech_idx = i
            pending_gap = 0
            continue

        # loud-gap guard: loud but veto-failing interval ends the run
        if (not floored[i]) and lvl >= split and not v:
            flush(last_speech_idx)
            continue

        # only below-low intervals count as bridgeable gaps
        if floored[i] or lvl < low:
            pending_gap += 1
            if pending_gap > tol:
                flush(last_speech_idx)

    flush(last_speech_idx)
    return runs


# ---------------------------------------------------------------------------
# golden refinement (analyser_candidates_shared.go:29-82)
# ---------------------------------------------------------------------------

def refine_to_subregion(
    region: Region,
    iv: Intervals,
    window_duration: float,
    window_minimum: float,
    score_fn,
    better,
) -> tuple[Region, bool]:
    """Sliding-window best-scoring sub-region (ref: refineToSubregion)."""
    if region.duration <= window_duration:
        return region, False
    mask = iv.slice_range(region.start, region.end)
    idx = np.flatnonzero(mask)
    if idx.size == 0:
        return region, False
    window_intervals = int(window_duration / iv.hop)
    minimum_intervals = int(window_minimum / iv.hop)
    if idx.size < minimum_intervals:
        return region, False
    window_intervals = min(window_intervals, int(idx.size))

    best_start = 0
    best_score = score_fn(iv, idx[:window_intervals])
    for s in range(1, idx.size - window_intervals + 1):
        sc = score_fn(iv, idx[s : s + window_intervals])
        if better(sc, best_score):
            best_score = sc
            best_start = s
    start = float(iv.timestamp[idx[best_start]])
    dur = window_intervals * iv.hop
    return Region(start=start, end=start + dur), True


def score_interval_window_rms(iv: Intervals, idx: np.ndarray) -> float:
    """Average astats-RMS of a window; lower = quieter = better room tone
    (ref: scoreIntervalWindow, analyser_candidates_shared.go:163-173)."""
    if idx.size == 0:
        return 0.0
    return float(np.mean(iv.rms_level[idx]))


def _rolloff_score(r: float) -> float:
    if ROLLOFF_IDEAL_MIN <= r <= ROLLOFF_IDEAL_MAX:
        return 1.0
    if ROLLOFF_ACCEPTABLE_MIN <= r < ROLLOFF_IDEAL_MIN:
        return 0.5 + 0.5 * (r - ROLLOFF_ACCEPTABLE_MIN) / (ROLLOFF_IDEAL_MIN - ROLLOFF_ACCEPTABLE_MIN)
    if ROLLOFF_IDEAL_MAX < r <= ROLLOFF_ACCEPTABLE_MAX:
        return 0.5 + 0.5 * (ROLLOFF_ACCEPTABLE_MAX - r) / (ROLLOFF_ACCEPTABLE_MAX - ROLLOFF_IDEAL_MAX)
    return 0.0


def _flux_score(f: float) -> float:
    if f <= FLUX_STABLE:
        return 1.0
    if f <= FLUX_NORMAL:
        return 1.0 - (f - FLUX_STABLE) / (FLUX_NORMAL - FLUX_STABLE) * 0.3
    if f <= FLUX_TRANSIENT:
        return 0.7 - (f - FLUX_NORMAL) / (FLUX_TRANSIENT - FLUX_NORMAL) * 0.3
    if f <= FLUX_ACCEPTABLE:
        return 0.4 - (f - FLUX_TRANSIENT) / (FLUX_ACCEPTABLE - FLUX_TRANSIENT) * 0.2
    return 0.2


def _voicing_score(density: float) -> float:
    return max(0.0, min(density / VOICING_DENSITY_THRESHOLD, 1.0))


def score_speech_interval_window(iv: Intervals, idx: np.ndarray) -> float:
    """8-term weighted speech-window quality score
    (ref: scoreSpeechIntervalWindow, analyser_candidates_shared.go:191-292)."""
    if idx.size == 0:
        return 0.0
    kurt = iv.spectral["kurtosis"][idx]
    avg_kurt = float(np.mean(kurt))
    avg_flat = float(np.mean(iv.spectral["flatness"][idx]))
    avg_cent = float(np.mean(iv.spectral["centroid"][idx]))
    avg_rms = float(np.mean(iv.rms_level[idx]))
    avg_roll = float(np.mean(iv.spectral["rolloff"][idx]))
    avg_flux = float(np.mean(iv.spectral["flux"][idx]))
    kurt_var = float(np.mean((kurt - avg_kurt) ** 2))
    voicing_density = float(np.mean(kurt > VOICED_KURTOSIS_THRESHOLD))

    kurtosis_score = max(0.0, min(avg_kurt / 7.5, 1.0))
    flatness_score = max(0.0, min(1.0 - avg_flat, 1.0))
    centroid_score = 0.0
    if SPEECH_CENTROID_MIN <= avg_cent <= SPEECH_CENTROID_MAX:
        mid = (SPEECH_CENTROID_MIN + SPEECH_CENTROID_MAX) / 2.0
        half = (SPEECH_CENTROID_MAX - SPEECH_CENTROID_MIN) / 2.0
        centroid_score = 1.0 - (abs(avg_cent - mid) / half) * 0.5
    consistency_score = max(0.0, min(1.0 - kurt_var / 100.0, 1.0))
    rms_score = 0.0
    if avg_rms > -30.0:
        rms_score = max(0.0, min((avg_rms + 30.0) / 18.0, 1.0))

    return (
        kurtosis_score * W_KURTOSIS
        + flatness_score * W_FLATNESS
        + centroid_score * W_CENTROID
        + consistency_score * W_CONSISTENCY
        + rms_score * W_RMS
        + _voicing_score(voicing_density) * W_VOICING
        + _rolloff_score(avg_roll) * W_ROLLOFF
        + _flux_score(avg_flux) * W_FLUX
    )


# ---------------------------------------------------------------------------
# region measurement + grounded election (analyser_candidates_*.go)
# ---------------------------------------------------------------------------

def measure_region_sample(iv: Intervals, region: Region) -> RegionSample | None:
    """Average a region's intervals into a RegionSample
    (ref: accumulateIntervalMetrics / measureSpeechCandidateFromIntervals)."""
    mask = iv.slice_range(region.start, region.end)
    return iv.region_sample(mask)


def measure_speech_candidate(iv: Intervals, region: Region) -> SpeechCandidate | None:
    mask = iv.slice_range(region.start, region.end)
    sample = iv.region_sample(mask)
    if sample is None:
        return None
    kurt = iv.spectral["kurtosis"][mask]
    density = float(np.mean(kurt > VOICED_KURTOSIS_THRESHOLD)) if kurt.size else 0.0
    return SpeechCandidate(region=region, sample=sample, voicing_density=density)


def level_variance(iv: Intervals, region: Region, axis: str = "momentary") -> float:
    """Population variance of the region's level-axis values
    (ref: levelVariance, analyser_candidates_shared.go:301-320)."""
    mask = iv.slice_range(region.start, region.end)
    vals = interval_levels(iv, axis)[mask]
    if vals.size == 0:
        return 0.0
    return float(np.mean((vals - np.mean(vals)) ** 2))


def grounded_snr_score(snr: float) -> float:
    """Rising, saturating SNR score (ref: groundedSNRScore)."""
    if snr <= 0:
        return 0.0
    if snr < MIN_SNR_MARGIN:
        return 0.5 * (snr / MIN_SNR_MARGIN)
    if snr >= SNR_SATURATION_MARGIN:
        return 1.0
    return 0.5 + 0.5 * (snr - MIN_SNR_MARGIN) / (SNR_SATURATION_MARGIN - MIN_SNR_MARGIN)


def grounded_duration_score(duration: float) -> float:
    if duration >= SPEECH_DURATION_ADEQUACY_MIN:
        return 1.0
    return max(0.0, min(duration / SPEECH_DURATION_ADEQUACY_MIN, 1.0))


def grounded_tiebreak(level_var: float) -> float:
    steadiness = max(0.0, min(1.0 - level_var / GROUNDED_VARIANCE_CAP, 1.0))
    return steadiness * GROUNDED_TIEBREAK_MAX


def score_speech_candidate_grounded(c: SpeechCandidate, noise_floor_db: float, level_var: float) -> float:
    """SNR 0.6 + saturating duration 0.4 + consistency tie-break <= 0.02
    (ref: scoreSpeechCandidateGrounded, analyser_candidates_speech.go:362-372)."""
    snr = grounded_snr_score(c.sample.rms_level - noise_floor_db)
    dur = grounded_duration_score(c.region.duration)
    return snr * GROUNDED_SNR_WEIGHT + dur * GROUNDED_DURATION_WEIGHT + grounded_tiebreak(level_var)


def find_best_speech_region(
    runs: list[Region], iv: Intervals, noise_floor_db: float | None
) -> tuple[Region | None, list[SpeechCandidate]]:
    """Grounded election with min-viable fallback + golden 60 s refinement
    (ref: findBestSpeechRegion, analyser_candidates_speech.go:216-320)."""
    candidates: list[SpeechCandidate] = []
    if not runs:
        return None, candidates

    floor = noise_floor_db if noise_floor_db is not None else -math.inf

    best: Region | None = None
    best_score = 0.0
    fallback: Region | None = None
    fallback_score = 0.0

    for run in runs:
        c = measure_speech_candidate(iv, run)
        if c is None:
            continue
        lvar = level_variance(iv, run)
        c.score = score_speech_candidate_grounded(c, floor, lvar)
        candidates.append(c)
        if fallback is None or c.score > fallback_score:
            fallback = c.region
            fallback_score = c.score
        if c.score >= MIN_VIABLE_SPEECH_SCORE and (best is None or c.score > best_score):
            best = run
            best_score = c.score

    if best is None and fallback is not None:
        best = fallback

    if best is not None and best.duration > GOLDEN_SPEECH_WINDOW_DURATION:
        original = best
        refined, ok = refine_to_subregion(
            best, iv, GOLDEN_SPEECH_WINDOW_DURATION, GOLDEN_SPEECH_WINDOW_MINIMUM,
            score_speech_interval_window, lambda a, b: a > b,
        )
        if ok and (refined.start != original.start or refined.duration != original.duration):
            rc = measure_speech_candidate(iv, refined)
            if rc is not None:
                rc.score = score_speech_candidate_grounded(
                    rc, floor, level_variance(iv, refined)
                )
                rc.was_refined = True
                rc.original_start = original.start
                rc.original_duration = original.duration
                for i, c in enumerate(candidates):
                    if c.region.start == original.start:
                        candidates[i] = rc
                        break
                best = refined

    return best, candidates


def elect_speech_profile(
    runs: list[Region], iv: Intervals, noise_floor_db: float | None
) -> tuple[SpeechCandidate | None, list[SpeechCandidate]]:
    """(ref: electSpeechProfile, analyser_vad.go:610-622)."""
    best, candidates = find_best_speech_region(runs, iv, noise_floor_db)
    if best is None:
        return None, candidates
    for c in candidates:
        if c.region.start == best.start:
            return c, candidates
    return None, candidates


# ---------------------------------------------------------------------------
# room tone (analyser_vad.go:630-685, 558-603)
# ---------------------------------------------------------------------------

def pick_low_cluster_region(iv: Intervals, split: float, axis: str = "momentary") -> Region | None:
    """Longest below-split run, golden-refined to its quietest 10 s window
    (ref: pickLowClusterRegion, analyser_vad.go:630-685)."""
    level = interval_levels(iv, axis)
    below = level < split
    if not below.any():
        return None
    # longest run of True
    padded = np.concatenate([[False], below, [False]])
    starts = np.flatnonzero(padded[1:] & ~padded[:-1])
    ends = np.flatnonzero(~padded[1:] & padded[:-1])  # exclusive
    lengths = ends - starts
    k = int(np.argmax(lengths))
    s, e = int(starts[k]), int(ends[k]) - 1
    best = Region(start=float(iv.timestamp[s]), end=float(iv.timestamp[e]) + iv.hop)

    refined, ok = refine_to_subregion(
        best, iv, GOLDEN_WINDOW_DURATION, GOLDEN_WINDOW_MINIMUM,
        score_interval_window_rms, lambda a, b: a < b,
    )
    return refined if ok else best


def extract_noise_profile(region: Region, iv: Intervals) -> NoiseProfile | None:
    """NoiseProfile from pre-collected intervals (ref:
    extractNoiseProfileFromIntervals, analyser_vad.go:561-603)."""
    mask = iv.slice_range(region.start, region.end)
    sample = iv.region_sample(mask)
    if sample is None:
        return None
    profile = NoiseProfile(
        start=region.start,
        duration=region.duration,
        measured_noise_floor=sample.rms_level,  # overwritten by caller with VAD floor
        peak_level=sample.peak_level,
        crest_factor=sample.peak_level - sample.rms_level,
        entropy=sample.spectral.entropy,
        spectral=sample.spectral,
    )
    if region.duration < IDEAL_NOISE_DURATION_MIN:
        profile.extraction_warning = (
            f"using short room tone region ({region.duration:.1f}s) - ideally need >={int(IDEAL_NOISE_DURATION_MIN)}s"
        )
    elif region.duration > IDEAL_NOISE_DURATION_MAX:
        profile.extraction_warning = (
            f"using long room tone region ({region.duration:.1f}s) - ideally <={int(IDEAL_NOISE_DURATION_MAX)}s"
        )
    return profile


# ---------------------------------------------------------------------------
# gate statistics + floored fraction (analyser_vad.go:220-252, 708-721)
# ---------------------------------------------------------------------------

def derive_gate_statistics(
    iv: Intervals, split: float, speech_region: Region | None, axis: str = "momentary"
) -> GateStatistics:
    """voiced-p10 / noise-p95 / separation (ref: deriveGateStatistics)."""
    level = interval_levels(iv, axis)
    ok = ~is_floored(level)
    noise = np.sort(level[ok & (level < split)])

    voiced = np.zeros(0)
    if speech_region is not None:
        mask = iv.slice_range(speech_region.start, speech_region.end)
        flags = speech_flags(iv, split, axis)
        voiced = np.sort(level[mask & flags])

    voiced_low = percentile_of_sorted(voiced, GATE_VOICED_LOW_PCT)
    noise_high = percentile_of_sorted(noise, GATE_NOISE_HIGH_PCT)
    return GateStatistics(
        voiced_low_percentile=voiced_low,
        noise_high_percentile=noise_high,
        separation_db=voiced_low - noise_high,
    )


def floored_fraction(iv: Intervals, axis: str = "momentary") -> float:
    """Fraction of intervals pinned at digital silence (NaN or <= -115 dB);
    every interval counts in the denominator (ref: flooredFraction)."""
    level = interval_levels(iv, axis)
    if level.size == 0:
        return 0.0
    floored = np.isnan(level) | (level <= VAD_LEVEL_FLOOR_DB)
    return float(np.mean(floored))


# ---------------------------------------------------------------------------
# the unified detector (analyser_vad.go:728-783)
# ---------------------------------------------------------------------------

def detect_voice_activity(
    iv: Intervals, noise_floor_seed: float, axis: str = "momentary"
) -> VADResult:
    """One bimodal split feeding speech election, room-tone profile, noise
    floor, and gate statistics (ref: detectVoiceActivity,
    analyser_vad.go:728-783)."""
    level = interval_levels(iv, axis)
    levels = np.sort(level[~is_floored(level)])
    p75 = percentile_of_sorted(levels, 75)

    split = clamp_split(otsu_split_from_levels(levels), noise_floor_seed, p75)
    floor = percentile_floor(levels, noise_floor_seed)

    flags = speech_flags(iv, split, axis)
    margin = hysteresis_margin(levels, split)
    tol = gap_tolerance_intervals(flags, iv.hop)

    runs = build_speech_runs(iv, split, margin, tol, axis)

    noise_region = pick_low_cluster_region(iv, split, axis)
    noise_profile = None
    room_tone_sample = None
    if noise_region is not None:
        noise_profile = extract_noise_profile(noise_region, iv)
        if noise_profile is not None:
            noise_profile.measured_noise_floor = floor
            room_tone_sample = measure_region_sample(iv, noise_region)

    profile, candidates = elect_speech_profile(
        runs, iv, noise_profile.measured_noise_floor if noise_profile else None
    )

    speech_region = profile.region if profile is not None else None
    gate_stats = derive_gate_statistics(iv, split, speech_region, axis)

    frac = floored_fraction(iv, axis)
    return VADResult(
        split=split,
        floor=floor,
        margin=margin,
        gap_tolerance_intervals=tol,
        speech_regions=runs,
        speech_candidates=candidates,
        speech_profile=profile,
        noise_region=noise_region,
        noise_profile=noise_profile if noise_profile is not None else None,
        elected_room_tone_sample=room_tone_sample,
        gate_stats=gate_stats,
        floored_fraction=frac,
        voice_activated=frac >= VOICE_ACTIVATED_FRACTION,
    )

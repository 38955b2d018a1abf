"""250 ms interval engine.

The reference accumulates per-frame decoder output into ~250 ms interval
samples inside its Pass-1 hot loop (ref: internal/processor/
analyser_metrics.go intervalAccumulator, analyser.go:588-630).  The rebuild
computes the same quantities on an *exact* 250 ms grid from three
device-side series:

  * raw per-interval RMS / sample-peak — blocked reductions over PCM
  * momentary / short-term LUFS — mean of the 100 ms-hop loudness windows
    ENDING inside each interval (FFmpeg emits `lavfi.r128.M` for the window
    ending at each frame; intervals average those per-frame values)
  * aspectralstats metrics — mean of the 2048/1024 STFT frames STARTING
    inside each interval

Grid alignment note: the reference's intervals close on decoder frame
boundaries (~3 x 4096-sample frames ≈ 250-279 ms depending on rate); this
rebuild uses the exact hop.  All downstream VAD bounds are expressed in
seconds so behaviour is preserved.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..metering.ebur128 import LoudnessResult
from ..metering.spectral import METRIC_NAMES, SpectralFrameSeries, SpectralMetrics
from .types import RegionSample

INTERVAL_HOP_SECS = 0.25  # ref: analyser_vad.go analysisIntervalHop
LEVEL_FLOOR_DB = -120.0


@dataclass
class Intervals:
    """Struct-of-arrays interval table (one row per 250 ms window)."""

    timestamp: np.ndarray       # window start, seconds
    rms_level: np.ndarray       # dBFS from raw samples
    peak_level: np.ndarray      # dBFS from raw samples
    momentary_lufs: np.ndarray
    short_term_lufs: np.ndarray
    true_peak: np.ndarray       # dBTP (per-interval max)
    sample_peak: np.ndarray     # dBFS (per-interval max)
    spectral: dict              # name -> np.ndarray
    spectral_found: np.ndarray  # bool per interval
    hop: float = INTERVAL_HOP_SECS

    def __len__(self) -> int:
        return int(self.timestamp.size)

    def slice_range(self, start: float, end: float) -> np.ndarray:
        """Boolean mask of intervals whose timestamp is in [start, end)
        (ref getIntervalsInRange semantics)."""
        return (self.timestamp >= start - 1e-9) & (self.timestamp < end - 1e-9)

    def region_sample(self, mask: np.ndarray) -> RegionSample | None:
        """Average a region's intervals into a RegionSample
        (ref: analyser_candidates_shared.go accumulateIntervalMetrics)."""
        if not mask.any():
            return None
        # spectral averages use only intervals that HAVE spectral frames —
        # unfound rows never dilute the mean.  DELIBERATE DIVERGENCE from
        # the reference's region-level accumulateIntervalMetrics
        # (analyser_candidates_shared.go:132-158), which zero-dilutes:
        # Found=false rows contribute zero-valued fields to a sum divided
        # by the FULL count.  This rebuild extends the reference's own
        # frame-level convention (SpectralAccumulator skips Found=false
        # frames, analyser_metrics.go:249-258) to the region level; on
        # all-found regions both conventions agree exactly.  Pinned by
        # tests/test_vad_primitives.py::TestExtractNoiseProfileSpectralFields
        # ::test_mixed_found_unfound_uses_found_only_mean.  With none found
        # the metrics stay zero-valued, found=False.
        smask = mask & self.spectral_found
        if smask.any():
            spectral = {k: float(np.mean(self.spectral[k][smask])) for k in METRIC_NAMES}
        else:
            spectral = {k: 0.0 for k in METRIC_NAMES}
        rms = float(np.mean(self.rms_level[mask]))
        peak = float(np.max(self.peak_level[mask]))
        return RegionSample(
            rms_level=rms,
            peak_level=peak,
            crest_factor=peak - rms,
            spectral=SpectralMetrics(**spectral, found=bool(smask.any())),
            momentary_lufs=float(np.mean(self.momentary_lufs[mask])),
            short_term_lufs=float(np.mean(self.short_term_lufs[mask])),
            true_peak=float(np.max(self.true_peak[mask])),
            sample_peak=float(np.max(self.sample_peak[mask])),
        )


@functools.partial(jax.jit, static_argnames=("ilen", "n_int"))
def _interval_raw_stats(x: jnp.ndarray, ilen: int, n_int: int):
    total = ilen * n_int
    padded = jnp.zeros(total, x.dtype).at[: x.shape[0]].set(x[:total])
    blocks = padded.reshape(n_int, ilen)
    sumsq = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=1)
    peak = jnp.max(jnp.abs(blocks), axis=1)
    # trailing partial interval: scale by true count
    return sumsq, peak


def _scatter_mean(values: np.ndarray, idx: np.ndarray, n: int, fill: float) -> np.ndarray:
    sums = np.zeros(n)
    counts = np.zeros(n)
    valid = (idx >= 0) & (idx < n)
    np.add.at(sums, idx[valid], values[valid])
    np.add.at(counts, idx[valid], 1.0)
    out = np.full(n, fill)
    nz = counts > 0
    out[nz] = sums[nz] / counts[nz]
    return out


def _scatter_max(values: np.ndarray, idx: np.ndarray, n: int, fill: float) -> np.ndarray:
    out = np.full(n, fill)
    valid = (idx >= 0) & (idx < n)
    np.maximum.at(out, idx[valid], values[valid])
    return out


def build_intervals(
    x,
    sample_rate: int,
    loudness: LoudnessResult,
    spectral: SpectralFrameSeries,
    hop_secs: float = INTERVAL_HOP_SECS,
) -> Intervals:
    x = jnp.asarray(x)
    n = int(x.shape[0])
    ilen = max(1, int(round(hop_secs * sample_rate)))
    n_int = max(1, -(-n // ilen))

    sumsq, peak = _interval_raw_stats(x, ilen, n_int)
    return assemble_intervals(
        np.asarray(sumsq, dtype=np.float64), np.asarray(peak, dtype=np.float64),
        n, sample_rate, loudness, spectral, hop_secs,
    )


def assemble_intervals(
    sumsq: np.ndarray,
    peak: np.ndarray,
    n: int,
    sample_rate: int,
    loudness: LoudnessResult,
    spectral: SpectralFrameSeries,
    hop_secs: float = INTERVAL_HOP_SECS,
) -> Intervals:
    """Host-side interval-table assembly from precomputed per-interval raw
    stats (shared with the fused whole-pass analysis program)."""
    ilen = max(1, int(round(hop_secs * sample_rate)))
    n_int = int(sumsq.shape[0])
    counts = np.full(n_int, ilen, dtype=np.float64)
    if n % ilen:
        counts[-1] = n % ilen
    rms = np.sqrt(sumsq / counts)
    rms_db = np.where(rms < 1e-5, LEVEL_FLOOR_DB, 20.0 * np.log10(np.maximum(rms, 1e-30)))
    peak_db = np.where(peak > 0, 20.0 * np.log10(np.maximum(peak, 1e-30)), LEVEL_FLOOR_DB)

    # per-interval sample peak in dBFS doubles as the per-interval true peak
    # proxy at interval granularity; the global oversampled TP is measured by
    # the metering layer.  (Reference reads the running ebur128 metadata.)
    ts = np.arange(n_int, dtype=np.float64) * hop_secs

    # momentary / short-term windows END at block_start + window
    m = loudness.momentary_lufs
    m_end = loudness.block_starts_sec + 0.4
    m_idx = np.floor((m_end - 1e-9) / hop_secs).astype(np.int64)
    mom = _scatter_mean(m, m_idx, n_int, LEVEL_FLOOR_DB)

    s = loudness.short_term_lufs
    s_end = np.arange(s.size, dtype=np.float64) * 0.1 + 3.0
    s_idx = np.floor((s_end - 1e-9) / hop_secs).astype(np.int64)
    st = _scatter_mean(s, s_idx, n_int, LEVEL_FLOOR_DB)

    f_idx = np.floor(spectral.frame_times / hop_secs + 1e-9).astype(np.int64)
    spec = {
        k: _scatter_mean(spectral.metrics[k], f_idx, n_int, 0.0) for k in METRIC_NAMES
    }
    found = np.zeros(n_int, dtype=bool)
    valid = (f_idx >= 0) & (f_idx < n_int)
    found[np.unique(f_idx[valid])] = True

    return Intervals(
        timestamp=ts,
        rms_level=rms_db,
        peak_level=peak_db,
        momentary_lufs=mom,
        short_term_lufs=st,
        true_peak=peak_db,  # refined below by the analyser when TP series exists
        sample_peak=peak_db,
        spectral=spec,
        spectral_found=found,
        hop=hop_secs,
    )

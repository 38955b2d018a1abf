"""Metric definitions catalogue for the Markdown report.

Behavioural rebuild of internal/report/definitions.go: every rendered row
carries a one-line definition so the report is self-describing.  Keyed by
the record's JSON field names."""

DEFINITIONS = {
    # loudness
    "integrated_lufs": ("Integrated loudness", "Gated programme loudness over the whole input, BS.1770 K-weighted mean-square with two-stage gating.", "LUFS"),
    "true_peak_dbtp": ("True peak", "Inter-sample peak of the 4x-oversampled signal.", "dBTP"),
    "lra_lu": ("Loudness range", "Statistical spread of the 3 s short-term loudness distribution (lra_high minus lra_low).", "LU"),
    "thresh_lufs": ("Gating threshold", "Relative gating threshold, -10 LU below the absolute-gated loudness mean.", "LUFS"),
    "momentary_lufs": ("Momentary loudness", "BS.1770 loudness over a 400 ms sliding window.", "LUFS"),
    "short_term_lufs": ("Short-term loudness", "BS.1770 loudness over a 3 s sliding window.", "LUFS"),
    "sample_peak_dbfs": ("Sample peak", "Largest digital sample without oversampling, 20*log10(sample_peak).", "dBFS"),
    "target_offset_db": ("Target offset", "Residual gap to the target integrated loudness, target_i minus output_i.", "LU"),
    # dynamics
    "rms_level_dbfs": ("RMS level", "RMS amplitude of the samples, 20*log10(sqrt(sum(x^2)/N)).", "dBFS"),
    "peak_level_dbfs": ("Peak level", "Largest absolute sample, 20*log10(max(|min|,|max|)).", "dBFS"),
    "crest_factor_astats_db": ("Crest factor", "Time-domain peak-to-RMS ratio (peak/RMS), converted linear to dB.", "dB"),
    "dynamic_range_db": ("Dynamic range", "Span between loudest and quietest non-zero sample.", "dB"),
    "min_level_dbfs": ("Min level", "Smallest signed sample, converted to dBFS.", "dBFS"),
    "max_level_dbfs": ("Max level", "Largest signed sample, converted to dBFS.", "dBFS"),
    "rms_peak_dbfs": ("RMS peak", "Maximum per-window RMS over the short measurement window.", "dBFS"),
    "rms_trough_dbfs": ("RMS trough", "Minimum per-window RMS over the short measurement window.", "dBFS"),
    "flat_factor": ("Flat factor", "Run-length flatness at the min/max levels.", ""),
    "dc_offset": ("DC offset", "Mean sample amplitude, sum(x)/N.", ""),
    "zero_crossings_rate": ("Zero-crossings rate", "Fraction of sample pairs that change sign.", ""),
    "bit_depth": ("Bit depth", "Effective bit depth estimated from the sample data.", "bits"),
    "entropy": ("Entropy", "Magnitude-weighted spectral entropy; for astats stages, the sample-value distribution entropy.", ""),
    # spectral
    "mean": ("Spectral mean", "Arithmetic mean of the magnitude bins, sum(mag[n])/size.", ""),
    "variance": ("Spectral variance", "Population variance of the magnitudes about the mean.", ""),
    "centroid_hz": ("Spectral centroid", "Magnitude-weighted mean frequency of the spectrum.", "Hz"),
    "spread_hz": ("Spectral spread", "Magnitude-weighted standard deviation of frequency about the centroid.", "Hz"),
    "skewness": ("Spectral skewness", "Third standardised spectral moment about the centroid.", ""),
    "kurtosis": ("Spectral kurtosis", "Fourth standardised (Pearson) spectral moment about the centroid; not excess kurtosis.", ""),
    "flatness": ("Spectral flatness", "Geometric mean over arithmetic mean of the magnitudes, a 0-1 linear ratio.", ""),
    "crest": ("Spectral crest", "Peak magnitude bin over mean magnitude bin.", ""),
    "flux": ("Spectral flux", "L2 distance between this frame's and the previous frame's magnitude spectrum.", ""),
    "slope": ("Spectral slope", "Linear-regression slope of magnitude against normalised bin index.", ""),
    "decrease": ("Spectral decrease", "Relative spectral decrease from the first bin.", ""),
    "rolloff_hz": ("Spectral roll-off", "Frequency below which 85% of the cumulative magnitude lies.", "Hz"),
    # noise
    "floor_dbfs": ("Noise floor", "Input VAD noise floor on the K-weighted momentary-LUFS axis (the afftdn seed); a low percentile of the per-interval level set.", "dBFS"),
    "floor_source": ("Floor source", "Origin of the elected floor: astats, rms_estimate, ebur128_estimate, or vad_percentile.", ""),
    "floor_prescan_dbfs": ("Pre-scan floor", "Noise floor estimated from the per-interval data, feeding room-tone detection.", "dBFS"),
    "floor_astats_dbfs": ("astats floor", "astats noise-floor estimate, the minimum local peak over the sliding window.", "dBFS"),
    "room_tone_detect_level_dbfs": ("Room-tone detect level", "Adaptive threshold below which an interval is treated as a room-tone candidate.", "dBFS"),
    "voice_activated": ("Voice activated", "True when the floored (digital-silence) interval fraction is high, the platform-gated capture signature.", ""),
    "floored_fraction": ("Floored fraction", "Fraction (0..1) of intervals sitting at the digital-silence floor.", ""),
    "reduction_headroom_db": ("Reduction headroom", "Gap in dB between the noise floor and quiet speech.", "dB"),
    # regions
    "start_s": ("Start", "Start time of the elected region from the input origin.", "s"),
    "duration_s": ("Duration", "Length of the elected region.", "s"),
    "measured_floor_dbfs": ("Measured floor", "Input room-tone RMS (dBFS) on the astats RMS axis; a different axis from the VAD noise floor.", "dBFS"),
    "crest_factor_db": ("Crest factor", "Region-scoped time-domain peak-to-RMS ratio, in dB.", "dB"),
    "speech_band_body_rms_dbfs": ("Body-band RMS", "RMS over the 1-3 kHz vocal-presence band of the elected speech region.", "dBFS"),
    "speech_band_sib_rms_dbfs": ("Sibilant-band RMS", "RMS over the 6-9 kHz sibilant band of the elected speech region.", "dBFS"),
    "voicing_density": ("Voicing density", "Proportion of voiced intervals over the elected speech region, 0-1.", ""),
    "score": ("Score", "Composite candidate-ranking score of the elected region.", ""),
    # interval summary (per-250ms RMS distribution + gap; ref definitions.go:331-374)
    "interval_count": ("Interval count", "Number of 250 ms intervals sampled over the input.", "count"),
    "largest_gap_db": ("Largest gap", "Biggest jump between adjacent sorted interval RMS values, the room-tone/speech boundary signal.", "dB"),
    "rms_dist_min_dbfs": ("RMS min", "Lowest interval RMS above digital silence.", "dBFS"),
    "rms_dist_p10_dbfs": ("RMS p10", "10th-percentile interval RMS above digital silence.", "dBFS"),
    "rms_dist_p25_dbfs": ("RMS p25", "25th-percentile interval RMS above digital silence.", "dBFS"),
    "rms_dist_p50_dbfs": ("RMS p50", "Median interval RMS above digital silence.", "dBFS"),
    "rms_dist_p75_dbfs": ("RMS p75", "75th-percentile interval RMS above digital silence.", "dBFS"),
    "rms_dist_p90_dbfs": ("RMS p90", "90th-percentile interval RMS above digital silence.", "dBFS"),
    "rms_dist_max_dbfs": ("RMS max", "Highest interval RMS above digital silence.", "dBFS"),
    "voiced_low_percentile_dbfs": ("Voiced low percentile", "p10 of in-region voiced levels on the VAD level axis.", "dBFS"),
    "noise_high_percentile_dbfs": ("Noise high percentile", "p95 of below-split levels on the VAD level axis.", "dBFS"),
    "gate_separation_db": ("Gate separation", "Voiced low percentile minus noise high percentile.", "dB"),
    # normalisation
    "gain_applied_db": ("Gain applied", "Linear makeup gain applied by loudnorm (effective target minus measured input).", "dB"),
    "within_target": ("Within target", "True when the final loudness is within +-0.5 LU of the effective target.", ""),
    "requested_target_lufs": ("Requested target", "The target integrated loudness requested.", "LUFS"),
    "effective_target_lufs": ("Effective target", "The target actually used (may be lower to preserve linear mode).", "LUFS"),
    "linear_mode_forced": ("Linear mode forced", "True when the target was lowered to keep loudnorm in linear mode.", ""),
    "ceiling_dbtp": ("Limiter ceiling", "Pre-limiter ceiling creating true-peak headroom for linear-mode loudnorm.", "dBTP"),
    "pre_gain_db": ("Pre-gain", "Gain applied before the limiter when the ceiling clamped at its -24 dBTP minimum.", "dB"),
}


def define(key: str) -> tuple[str, str, str]:
    """(label, definition, unit) for a record key; falls back to the key."""
    return DEFINITIONS.get(key, (key, "", ""))

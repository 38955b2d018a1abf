"""jivetalking_tpu — TPU-native podcast mastering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
linuxmatters/jivetalking (reference: /root/reference): a four-pass adaptive
mastering pipeline that measures a raw voice recording (EBU R128 K-weighted
LUFS, 4x-oversampled true peak, noise floor, room tone, speech/sibilance
detection), derives per-file filter parameters, runs a cleanup chain
(downmix -> 80 Hz rumble high-pass -> 20.5 kHz band-limit -> NLM +
spectral-gate noise reduction -> speech gate -> levelling compressor ->
de-esser) and normalises to -16 LUFS / -1 dBTP.

Layer map (bottom-up), mirroring SURVEY.md section 1:

    io/        host audio I/O: WAV/AIFF (numpy) + FLAC (native C++ codec, chunk
               streaming) + MP3/Vorbis/Opus (system codec ctypes bindings) +
               a generic FFmpeg-library fallback for every other container
    ops/       DSP kernels: biquads (associative-scan IIR), STFT, spectral gate,
               NLM denoise, envelope-follower dynamics, limiters, resampler
    metering/  ground-truth measurement: EBU R128, true peak, astats, spectral stats
    analysis/  pass-1 analyser: 250ms intervals, VAD (Otsu split), elections, bands
    adaptive/  pass-1.5: measurement -> effective filter config (pure function)
    pipeline/  pass-2/3/4 drivers: filter chain, normalisation contract, publish
    quality/   star scores + gain advice
    report/    run record (JSON schema v1), markdown report renderer
    ui/        console progress / summary rendering
    parallel/  batch axis + device-mesh sharding for multi-file mastering
"""

__version__ = "0.1.0"

TARGET_LUFS = -16.0
TARGET_TRUE_PEAK_DB = -1.0


def __getattr__(name):
    """Lazy top-level API (keeps `import jivetalking_tpu` cheap)."""
    api = {
        "process_audio": ("jivetalking_tpu.pipeline", "process_audio"),
        "analyse_only": ("jivetalking_tpu.pipeline", "analyse_only"),
        "adapt_config": ("jivetalking_tpu.adaptive", "adapt_config"),
        "default_filter_config": ("jivetalking_tpu.adaptive", "default_filter_config"),
        "analyse_audio": ("jivetalking_tpu.analysis", "analyse_audio"),
        "open_audio_file": ("jivetalking_tpu.io.audio", "open_audio_file"),
        "save_flac": ("jivetalking_tpu.io.audio", "save_flac"),
        "measure_loudness": ("jivetalking_tpu.metering", "measure_loudness"),
    }
    if name in api:
        import importlib

        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)

"""Diagnostic spectrogram PNG rendering.

Behavioural rebuild of internal/processor/spectrogram.go: the frozen spec
`s=1024x512:scale=log:fscale=log:start=20:stop=20000:gain=1:
color=intensity:legend=1` (ref: spectrogram.go:45) and the
whole/roomtone/speech x before/after(/input) naming convention
(ref: spectrogram_paths.go:8-30, 92).

TPU-first: the STFT magnitude runs on device (one batched rFFT); the
log-frequency remap, dB intensity map, and PNG encode happen on host (PIL).
Renders are ctx-cancellable at the call level (each render is one call) and
use atomic dot-temp publishes so a cancelled run leaves no partial PNG
(ref: spectrogram.go partial-PNG cleanup).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# frozen spec (ref: spectrogram.go:45)
WIDTH, HEIGHT = 1024, 512
FREQ_START, FREQ_STOP = 20.0, 20000.0
_WIN = 2048
_DB_RANGE = 90.0  # intensity dynamic range shown
_LEGEND_W = 56    # legend strip width (dB key)

KIND_WHOLE = "whole"
KIND_ROOMTONE = "roomtone"
KIND_SPEECH = "speech"
STAGE_BEFORE = "before"
STAGE_AFTER = "after"
STAGE_INPUT = "input"

PROCESSING_STAGES = (STAGE_BEFORE, STAGE_AFTER)
ANALYSIS_STAGES = (STAGE_INPUT,)


def spectrogram_path(stem: str, kind: str, stage: str) -> str:
    """<stem>.spectrogram-<kind>-<stage>.png (ref: spectrogram_paths.go:92).
    For processing runs the stem is the OUTPUT stem
    (episode-LUFS-16-processed); for analysis-only it is the analysis
    report stem (episode-wav-analysis) — ref: pool.go:370, main.go:466."""
    return f"{stem}.spectrogram-{kind}-{stage}.png"


def derive_spectrogram_images(
    stem: str, stages, has_room_tone: bool, has_speech: bool
) -> list[dict]:
    """Deterministic record-carried image list: whole always, elected
    regions when present, one entry per stage per kind; Path is the
    RELATIVE basename (ref: deriveSpectrogramImages,
    spectrogram_paths.go:64-90)."""
    import os

    base = os.path.basename(stem)
    kinds = [KIND_WHOLE]
    if has_room_tone:
        kinds.append(KIND_ROOMTONE)
    if has_speech:
        kinds.append(KIND_SPEECH)
    return [
        {"kind": kind, "stage": stage,
         "path": spectrogram_path(base, kind, stage)}
        for kind in kinds
        for stage in stages
    ]


@functools.partial(jax.jit, static_argnames=("n_frames", "win", "hop"))
def _stft_mag(x: jnp.ndarray, n_frames: int, win: int, hop: int) -> jnp.ndarray:
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    window = (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(win) / win)).astype(jnp.float32)
    frames = x[idx] * window[None, :]
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.abs(spec) / (win / 2)


def _intensity_rgb(v: np.ndarray) -> np.ndarray:
    """FFmpeg 'intensity' colour ramp approximation: black -> blue -> cyan ->
    green -> yellow -> red -> white over v in [0, 1]."""
    stops = np.array([
        [0, 0, 0], [0, 0, 160], [0, 160, 224], [0, 192, 0],
        [224, 224, 0], [240, 0, 0], [255, 255, 255],
    ], dtype=np.float64)
    pos = np.linspace(0.0, 1.0, len(stops))
    v = np.clip(v, 0.0, 1.0)
    rgb = np.stack([np.interp(v, pos, stops[:, c]) for c in range(3)], axis=-1)
    return rgb.astype(np.uint8)


def render_spectrogram_image(
    x,
    sample_rate: int,
    path: str,
    start: float | None = None,
    duration: float | None = None,
) -> str:
    """Render a 1024x512 log-log spectrogram PNG of `x` (optionally a
    [start, start+duration) window) with a dB legend strip; atomic write."""
    from PIL import Image

    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    if start is not None:
        s = max(0, int(round(start * sample_rate)))
        e = min(n, int(round((start + (duration or 0.0)) * sample_rate))) if duration else n
        x = x[s:e]
        n = int(x.shape[0])
    if n < _WIN:
        x = jnp.zeros(_WIN, x.dtype).at[:n].set(x)
        n = _WIN

    # hop so the STFT spans the signal in ~WIDTH columns
    hop = max(1, (n - _WIN) // WIDTH + 1)
    n_frames = 1 + (n - _WIN) // hop
    mag = np.asarray(_stft_mag(x, n_frames, _WIN, hop), dtype=np.float64)  # (t, f)

    # time axis -> WIDTH columns (mean over frame groups)
    t_idx = np.linspace(0, mag.shape[0], WIDTH + 1).astype(int)
    cols = np.add.reduceat(mag, t_idx[:-1], axis=0)
    counts = np.maximum(np.diff(t_idx), 1)[:, None]
    cols = cols / counts  # (WIDTH, n_bins)

    # log-frequency remap: HEIGHT rows from FREQ_START..FREQ_STOP
    freqs = np.fft.rfftfreq(_WIN, 1.0 / sample_rate)
    targets = np.geomspace(FREQ_START, min(FREQ_STOP, sample_rate / 2 * 0.999), HEIGHT)
    col_db = 20.0 * np.log10(np.maximum(cols, 1e-10))
    rows = np.empty((HEIGHT, WIDTH))
    bin_idx = np.searchsorted(freqs, targets)
    bin_idx = np.clip(bin_idx, 1, len(freqs) - 1)
    # linear interp between neighbouring bins in dB
    f0 = freqs[bin_idx - 1]
    f1 = freqs[bin_idx]
    w = (targets - f0) / np.maximum(f1 - f0, 1e-9)
    rows = (1 - w)[:, None] * col_db[:, bin_idx - 1].T + w[:, None] * col_db[:, bin_idx].T
    rows = rows[::-1]  # high frequency at top

    v = (rows + _DB_RANGE) / _DB_RANGE  # 0 dBFS -> 1.0, -90 dB -> 0.0
    img = _intensity_rgb(v)

    # legend strip: vertical dB ramp + tick rows every 10 dB
    ramp = np.linspace(1.0, 0.0, HEIGHT)
    legend = np.tile(_intensity_rgb(ramp)[:, None, :], (1, _LEGEND_W, 1))
    for db in range(0, int(_DB_RANGE) + 1, 10):
        r = int((db / _DB_RANGE) * (HEIGHT - 1))
        legend[r, :12] = 255
    out = np.concatenate([img, legend], axis=1)

    from ..io.atomic import atomic_publish

    with atomic_publish(path, "png") as tmp:
        Image.fromarray(out, "RGB").save(tmp, "PNG")
    return path


def render_run_spectrograms(
    stem: str,
    stage_audio: dict,
    sample_rate: int,
    noise_region=None,
    speech_region=None,
) -> list[str]:
    """Render the deterministic image set: whole + elected regions per stage
    (ref: deriveSpectrogramImages, spectrogram_paths.go:64-90).

    `stage_audio` maps stage name (before/after/input) -> PCM array, or
    (PCM, rate) when a stage's sample rate differs from `sample_rate` (the
    final stage is delivered at 44.1 kHz regardless of source rate)."""
    rendered = []
    kinds: list[tuple[str, float | None, float | None]] = [(KIND_WHOLE, None, None)]
    if noise_region is not None:
        kinds.append((KIND_ROOMTONE, noise_region.start, noise_region.duration))
    if speech_region is not None:
        kinds.append((KIND_SPEECH, speech_region.start, speech_region.duration))
    for kind, start, duration in kinds:
        for stage, audio in stage_audio.items():
            rate = sample_rate
            if isinstance(audio, tuple):
                audio, rate = audio
            path = spectrogram_path(stem, kind, stage)
            render_spectrogram_image(audio, rate, path, start, duration)
            rendered.append(path)
    return rendered

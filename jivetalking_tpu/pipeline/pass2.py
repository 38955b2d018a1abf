"""Pass 2: the processing filter chain.

Behavioural rebuild of `processWithFilters` + `CreateProcessingFilterGraph`
(ref: internal/processor/processor.go:255-373, filters.go:993,
Pass2FilterOrder filters.go:58-68).  The chain runs entirely on device as a
sequence of fused kernels over the resident PCM — no frame loop, no
decode/encode between filters:

    downmix -> 80 Hz rumble high-pass -> 20.5 kHz band-limit -> anlmdn NLM
    -> afftdn spectral gate -> speech gate -> levelling compressor ->
    de-esser -> (output metering happens in the driver) -> resample 44.1 kHz
"""

from __future__ import annotations

import jax.numpy as jnp

from ..adaptive.config import FilterConfig
from ..ops.deesser import apply_deesser
from ..ops.dynamics import apply_compressor, apply_gate
from ..ops.iir import cascade, chain_ir_len, design_highpass, design_lowpass, sosfilt_fir
from ..ops.nlm import apply_nlm
from ..ops.resample import resample
from ..ops.spectral_gate import apply_spectral_gate


def downmix(x) -> jnp.ndarray:
    """Mean over the channel axis (ref: `aformat=channel_layouts=mono`,
    filters.go:607-615).  Accepts (n,) or (channels, n); int16 input is
    converted to float ON DEVICE (host->device transfers over a remote
    tunnel cost ~2x less at 16 bits, and s16-sourced PCM is exact)."""
    x = jnp.asarray(x)
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if x.ndim == 2:
        return jnp.mean(x, axis=0)
    return x


def apply_filter_chain(x, sample_rate: int, cfg: FilterConfig) -> jnp.ndarray:
    """Run the Pass-2 cleanup chain (everything before the output resample)
    on mono PCM.  Returns audio at the input rate; the driver resamples to
    the output rate after output metering, mirroring the reference's
    analysis-before-resample order (filters.go:58-68)."""
    y = downmix(x)

    # rumble high-pass + band-limit low-pass: one fused SOS cascade applied
    # as a single overlap-save FFT convolution
    sos_list = []
    if cfg.rumble_highpass.enabled:
        sos_list.append(
            design_highpass(cfg.rumble_highpass.frequency, sample_rate, q=cfg.rumble_highpass.width)
        )
    if cfg.bandlimit_lowpass.enabled and cfg.bandlimit_lowpass.frequency < sample_rate / 2.0:
        sos_list.append(
            design_lowpass(cfg.bandlimit_lowpass.frequency, sample_rate, q=cfg.bandlimit_lowpass.width)
        )
    if sos_list:
        ir_len = (chain_ir_len(cfg.rumble_highpass.frequency, sample_rate)
                  if cfg.rumble_highpass.enabled else 1024)
        y = sosfilt_fir(cascade(*sos_list), y, ir_len=ir_len)

    nr = cfg.noise_reduction
    if nr.enabled:
        y = apply_nlm(
            y, sample_rate,
            strength=nr.strength, patch_sec=nr.patch_sec,
            research_sec=nr.research_sec, smooth=nr.smooth,
        )
        if nr.afftdn_enabled:
            y = apply_spectral_gate(
                y, sample_rate,
                nr_db=nr.afftdn_noise_reduction,
                nf_db=nr.afftdn_noise_floor if nr.afftdn_noise_floor != 0.0 else -50.0,
                band_shape_db=nr.afftdn_band_noise if nr.afftdn_noise_type == "custom" else None,
                track_noise=nr.afftdn_track_noise,
            )

    g = cfg.speech_gate
    if g.enabled:
        y = apply_gate(
            y, sample_rate,
            threshold=g.threshold, ratio=g.ratio,
            attack_ms=g.attack, release_ms=g.release,
            range_lin=g.range, knee=g.knee, makeup=g.makeup,
            detection_rms=(g.detection == "rms"),
        )

    c = cfg.levelling_compressor
    if c.enabled:
        y = apply_compressor(
            y, sample_rate,
            threshold_db=c.threshold, ratio=c.ratio,
            attack_ms=c.attack, release_ms=c.release,
            knee=c.knee, makeup=10.0 ** (c.makeup / 20.0), mix=c.mix,
        )

    d = cfg.deesser
    if d.enabled and d.intensity > 0.0:
        y = apply_deesser(y, sample_rate, intensity=d.intensity,
                          amount=d.amount, frequency=d.frequency)

    return y


def output_resample(x, src_rate: int, cfg: FilterConfig) -> tuple[jnp.ndarray, int]:
    """The chain-final rate conversion (ref: FilterResample,
    filters.go:706-710 `aformat=sample_rates=44100:...:s16`)."""
    if not cfg.resample.enabled or src_rate == cfg.resample.sample_rate:
        return jnp.asarray(x), src_rate
    return resample(x, src_rate, cfg.resample.sample_rate), cfg.resample.sample_rate

"""Fused device programs: the whole-pass kernels that make the pipeline
TPU-fast.

The naive pipeline issues ~80-100 separate device dispatches per file, each
with a host sync; on a remote-attached TPU every sync costs dispatch
latency that dwarfs the compute.  These fused programs collapse the
pipeline to a handful of host-sync points per file (analysis pull, two
band-RMS pulls, and the master's packed-metrics pulls — the master's A/B
stages chain on device without a sync between them):

  1. `fused_analysis(x)`  — every Pass-1 device quantity in one jit:
     K-weighted block powers, momentary/short-term series, gated
     integrated loudness, sample/true peak, the astats core, the 13-metric
     spectral frame series, and the 250 ms interval raw stats.  One
     device_get returns the whole pytree; the host then runs the
     (tiny, sequential) VAD/election logic.
  2. `fused_band_rms(x, bounds)` — the 17 region-band RMS measures with
     TRACED region bounds (static pad sizes), so electing different
     regions never recompiles.
  3. `fused_master(x, params)` — passes 2+3+4 end to end as TWO chained
     device programs (stage A: cleanup chain + filtered metering +
     limiter plan + prefix limiter + pass-3 metering; stage B: linear
     gain + declick + brickwall + final metering + delivery resample).
     Stage B consumes stage A's device outputs (audio + offset scalar)
     directly, so the host never syncs between the dispatches — the
     split exists because the monolithic program OOM-kills the local
     AOT compile helper, not for the host's benefit.  One compile per
     (length, sample_rate) serves every file.

Numerical contract preserved from the unfused modules (see normalise.py /
pass2.py provenance comments); the unfused per-op kernels remain the unit
of testing and the reference for parity.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..adaptive.config import FilterConfig
from ..metering.astats import _astats_core
from ..metering.kweight import k_weighting_sos
from ..metering.spectral import _spectral_core
from ..metering.truepeak import _polyphase_bank
from ..ops.declick import _declick_impl
from ..ops.dynamics import (
    attack_release_follower,
    compressor_gain,
    envelope_coeff,
    gate_gain,
)
from ..ops.iir import (
    cascade,
    chain_ir_len,
    design_highpass,
    design_lowpass,
    sos_impulse_response,
)
from ..ops.limiter import limiter_core
from ..ops.nlm import _nlm_core
from ..ops.spectral_gate import afftdn_ext, noise_profile_ingraph
from ..utils.afftdn_bands import AFFTDN_BAND_CENTRES_HZ, afftdn_band_edges_hz
from .normalise import (
    BRICKWALL_TRUE_PEAK_HEADROOM_DB,
    limiter_plan_scalars,
    linear_mode_scalars,
)

_LOG_FLOOR = 1e-15
ABS_GATE = -70.0

# speech regions are golden-refined to <= 60 s, room tone to <= 18 s ideal
# (ref: analyser_candidates_speech.go goldenSpeechWindowDuration,
# analyser_vad.go idealDurationMax); the fused band/region measures use
# fixed-size padded windows so traced bounds never recompile.
SPEECH_PAD_SECS = 64.0
NOISE_PAD_SECS = 20.0


# ---------------------------------------------------------------------------
# in-graph metering primitives
# ---------------------------------------------------------------------------

def _p2l(p):
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(p, _LOG_FLOOR))


def _fft_convolve_full(x: jnp.ndarray, ir: jnp.ndarray, n: int,
                       precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """Causal linear convolution, first n samples (streaming-IIR semantics).

    Computed as overlap-save frames x an in-graph (S+K-1, S) banded kernel
    matrix on the MXU: a single ~16M-point f32 FFT lowers poorly on the TPU
    (multi-stage transposed 2D FFTs; measured ~2x slower than the banded
    matmul and with ~1e-4 spectral round-off the exact direct sums avoid).
    The band is built from `ir` inside the graph gather-free (`_conv_band`
    tile trick), so no multi-MB kernel constant is baked into the
    executable and no slow TPU gather runs per call.

    `precision`: HIGH (3-pass bf16, ~1.3e-5) for metering-only convs;
    audio-path applications (the cleanup-chain IR, the de-esser split)
    pass HIGHEST per the repo-wide audio-path precision rule."""
    K = int(ir.shape[0])
    S = 1024
    if K > 8192 or n <= 2 * S:
        fft_len = 1 << int(math.ceil(math.log2(n + K - 1)))
        spec = jnp.fft.rfft(x, n=fft_len) * jnp.fft.rfft(ir, n=fft_len)
        return jnp.fft.irfft(spec, n=fft_len)[:n]

    head = -(-(K - 1) // S) * S            # zero history, multiple of S
    m = -(-n // S)
    xp = jnp.zeros(head + m * S, jnp.float32).at[head : head + n].set(x[:n])
    blocks = xp.reshape(-1, S)             # (head/S + m, S)
    nb = head // S
    f = jnp.concatenate([blocks[j : j + m] for j in range(nb + 1)], axis=1)
    W = S + K - 1
    frames = f[:, (nb + 1) * S - W :]      # frame b = x[b*S - (K-1), b*S + S)
    band = _conv_band(ir, K, S)
    y = jax.lax.dot_general(frames, band, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
    return y.reshape(-1)[:n]


def _conv_band(ir: jnp.ndarray, K: int, S: int) -> jnp.ndarray:
    """(S+K-1, S) banded kernel matrix band[j, i] = ir[i + K - 1 - j]
    (zero outside [0, K)), built WITHOUT a gather.

    The rows of the band are stride-1 windows of the zero-padded IR, so
    the whole matrix falls out of the classic Toeplitz tile-and-reshape
    trick: tiling a length-(N+1) vector W times and reshaping to (W, N)
    shifts each row right by one.  The previous `ir[jnp.clip(idx, ...)]`
    formulation lowered to an s32[W*S] gather running at ~1.7 GB/s on the
    TPU backend — 37 ms PER kw-conv CALL (band size is independent of the
    signal), the single largest device term across the fused programs
    (299 ms of the 346 ms analysis-chunk device time, profiled
    2026-08-17).  The tile form is pure data movement, ~0.3 ms.

    Derivation: with v = [zeros(S-1), ir, zeros(S-1)] (length N = W+S-1)
    and r = [v, 0] (length N+1), element (j, m) of
    tile(r, W)[:W*N].reshape(W, N) equals r[(m - j) mod (N+1)]; over the
    column slice m = W-1+i (i in [0, S)) the offset m - j stays in
    [0, N-1], so it reads v[W-1+i-j] = ir[(i + K - 1 - j) clipped to the
    zero pads] with no wraparound ever reaching real IR values."""
    W = S + K - 1
    N = W + S - 1
    v = jnp.concatenate(
        [jnp.zeros(S - 1, ir.dtype), ir, jnp.zeros(S - 1, ir.dtype)])  # len N
    r = jnp.concatenate([v, jnp.zeros(1, ir.dtype)])                   # len N+1
    mat = jnp.tile(r, W)[: W * N].reshape(W, N)
    return mat[:, W - 1 : W - 1 + S].astype(jnp.float32)


def _tp_oversampled_max(x: jnp.ndarray, tp_bank: jnp.ndarray) -> jnp.ndarray:
    """max |4x-oversampled interpolation| via explicit per-tap f32 FMAs on
    the VPU.  conv_general_dilated with a 12-tap kernel paid either bf16
    operand truncation (DEFAULT, ~0.4% true-peak error) or 6-pass HIGHEST
    (~36 ms); 12 shifted fused multiply-adds are exact f32 and ~4 ms."""
    taps = int(tp_bank.shape[1])
    xp = jnp.pad(x, (taps - 1, taps - 1))
    n_out = xp.shape[0] - taps + 1
    acc = jnp.zeros((int(tp_bank.shape[0]), n_out), jnp.float32)
    for k in range(taps):
        acc = acc + tp_bank[:, k][:, None] * xp[k : k + n_out][None, :]
    return jnp.max(jnp.abs(acc))


def _loudness_ingraph(x: jnp.ndarray, kw_ir: jnp.ndarray, tp_bank: jnp.ndarray,
                      sr: int, dual_mono: bool = True):
    """R128 metering entirely in-graph -> dict of arrays/scalars
    (momentary/short series, gated I, LRA, sample/true peak)."""
    n = int(x.shape[0])
    block_len = max(1, int(round(sr * 0.1)))
    n_blocks = max(1, n // block_len)

    kx = _fft_convolve_full(x, kw_ir, n)
    blocks = kx[: n_blocks * block_len].reshape(n_blocks, block_len)
    bp = jnp.mean(blocks.astype(jnp.float32) ** 2, axis=1)
    if dual_mono:
        bp = bp * 2.0

    out = _loudness_from_bp(bp)
    sample_peak = jnp.max(jnp.abs(x))
    true_peak = jnp.maximum(_tp_oversampled_max(x, tp_bank), sample_peak)
    out["sample_peak"] = sample_peak
    out["true_peak"] = true_peak
    return out


def _loudness_from_bp(bp: jnp.ndarray) -> dict:
    """R128 gating/LRA/series maths from dual-mono-scaled 100 ms block
    powers.  Split out so the sequence-parallel master (parallel/master.py)
    can all_gather its shards' block powers and run EXACTLY this math —
    parity by construction."""
    c = jnp.concatenate([jnp.zeros(1, bp.dtype), jnp.cumsum(bp)])
    n_blocks = int(bp.shape[0])
    if n_blocks >= 4:
        mp = (c[4:] - c[:-4]) / 4.0
    else:
        mp = jnp.mean(bp, keepdims=True)
    ml = _p2l(mp)
    if n_blocks >= 30:
        sp = (c[30:] - c[:-30]) / 30.0
    else:
        sp = jnp.mean(bp, keepdims=True)
    sl = _p2l(sp)

    abs_mask = ml > ABS_GATE
    cnt = jnp.maximum(jnp.sum(abs_mask), 1)
    mean_p = jnp.sum(jnp.where(abs_mask, mp, 0.0)) / cnt
    rel_thresh = _p2l(mean_p) - 10.0
    rel_mask = abs_mask & (ml > rel_thresh)
    cnt2 = jnp.maximum(jnp.sum(rel_mask), 1)
    gated = jnp.sum(jnp.where(rel_mask, mp, 0.0)) / cnt2
    gated = jnp.where(jnp.sum(rel_mask) > 0, gated, _LOG_FLOOR)
    integrated = _p2l(gated)

    # LRA (EBU Tech 3342): -70 abs gate, -20 LU relative, p10..p95
    st_mask = sl > ABS_GATE
    st_cnt = jnp.maximum(jnp.sum(st_mask), 1)
    st_mean = jnp.sum(jnp.where(st_mask, sp, 0.0)) / st_cnt
    st_rel = _p2l(st_mean) - 20.0
    g_mask = st_mask & (sl > st_rel)
    # masked percentiles: sort with +inf fill, integer-rank pick
    g_cnt = jnp.sum(g_mask)
    sorted_sl = jnp.sort(jnp.where(g_mask, sl, jnp.inf))
    def _pick(pct):
        idx = jnp.clip((pct / 100.0 * jnp.maximum(g_cnt - 1, 0)).astype(jnp.int32), 0, sl.shape[0] - 1)
        return sorted_sl[idx]
    lra_low = jnp.where(g_cnt > 0, _pick(10.0), ABS_GATE)
    lra_high = jnp.where(g_cnt > 0, _pick(95.0), ABS_GATE)

    return {
        "integrated": integrated,
        "lra": lra_high - lra_low,
        "lra_low": lra_low,
        "lra_high": lra_high,
        "rel_thresh": rel_thresh,
        "momentary": ml,
        "short_term": sl,
    }


def _region_sample_ingraph(x: jnp.ndarray, loud: dict, spec_avg_fn, sr: int,
                           start: jnp.ndarray, end: jnp.ndarray,
                           tp_bank: jnp.ndarray,
                           tp_window: int | None = None):
    """Masked region metering: RMS/peak/true-peak over [start, end) samples,
    momentary mean over blocks ending in the region, spectral mean over
    frames starting in it.  start/end are traced sample indices;
    zero-length -> zeros.  True peak is the real 4x-oversampled maximum of
    the masked signal (ref: analyser_output.go's ebur128 peak=true region
    measure) — the mask lands before the polyphase conv, so the only
    divergence from a sliced measure is the 12-tap boundary ring.

    `tp_window` (static, samples): when given, the 12-tap x 4-phase
    oversampling FMAs run over a dynamic_slice window of that size around
    the region instead of the whole masked signal — the elected regions are
    golden-refined to <= 60 s speech / <= 18 s room tone, so a padded
    window covers them entirely and the 4 region TPs stop costing ~4 ms of
    full-signal passes each (round-5 trace).  For regions longer than
    the window only the OVERSAMPLED term clamps its support to the
    window (matching the fused band-RMS pad clamp); the sample-peak max
    stays a full-region measure, so tp >= region sample peak always."""
    n = x.shape[0]
    idx = jnp.arange(n)
    mask = (idx >= start) & (idx < end)
    cnt = jnp.maximum(jnp.sum(mask), 1)
    xm = jnp.where(mask, x, 0.0)
    rms = jnp.sqrt(jnp.sum(xm ** 2) / cnt)
    peak = jnp.max(jnp.abs(xm))
    if tp_window is not None and tp_window < n:
        margin = int(tp_bank.shape[1]) + 4
        wlen = tp_window + 2 * margin
        if wlen < n:
            s0 = jnp.clip(start - margin, 0, n - wlen)
            idx_w = s0 + jnp.arange(wlen)
            seg = jax.lax.dynamic_slice(x, (s0,), (wlen,))
            seg = jnp.where((idx_w >= start) & (idx_w < end), seg, 0.0)
            tp_src = seg
        else:
            tp_src = xm
    else:
        tp_src = xm
    tp = jnp.maximum(_tp_oversampled_max(tp_src, tp_bank), peak)

    block_len = max(1, int(round(sr * 0.1)))
    m = loud["momentary"]
    m_end_sample = (jnp.arange(m.shape[0]) + 4) * block_len
    m_mask = (m_end_sample >= start) & (m_end_sample < end)
    m_cnt = jnp.maximum(jnp.sum(m_mask), 1)
    mom = jnp.sum(jnp.where(m_mask, m, 0.0)) / m_cnt

    spec = spec_avg_fn(start, end)
    return {"rms": rms, "peak": peak, "tp": tp, "momentary": mom, **spec}


# ---------------------------------------------------------------------------
# the fused pass-2/3/4 master program
# ---------------------------------------------------------------------------

def _to_mono_f32(x: jnp.ndarray) -> jnp.ndarray:
    """In-graph downmix + dtype conversion (mirrors pass2.downmix exactly):
    int16 -> f32/32768, (channels, n) -> mean over channels."""
    if x.dtype == jnp.int16:
        x = x.astype(jnp.float32) / 32768.0
    else:
        x = x.astype(jnp.float32)
    if x.ndim == 2:
        x = jnp.mean(x, axis=0)
    return x


def _stage_metrics_fns(n: int, sr: int, kw_ir, tp_bank):
    """Shared filtered/final stage-metering builder: loudness + astats +
    spectral means + a masked-region average closure."""
    w_astats = max(2, int(round(0.05 * sr)))
    spec_win, spec_hop = 2048, 1024
    n_sframes = max(1, 1 + (n - spec_win) // spec_hop)

    def stage_metrics(sig):
        loud = _loudness_ingraph(sig, kw_ir, tp_bank, sr)
        ast = _astats_core(sig, w_astats)
        spec_frames = _spectral_core(sig, n_sframes, spec_win, spec_hop, float(sr))
        spec_mean = {k: jnp.mean(v) for k, v in spec_frames.items()}

        def spec_avg(start, end):
            f_start = jnp.arange(n_sframes) * spec_hop
            fm = (f_start >= start) & (f_start < end)
            cnt = jnp.maximum(jnp.sum(fm), 1)
            return {f"spec_{k}": jnp.sum(jnp.where(fm, v, 0.0)) / cnt
                    for k, v in spec_frames.items()}

        return loud, ast, spec_mean, spec_avg

    return stage_metrics


# The pass-2/3/4 master is TWO chained device programs (the monolithic
# single program exceeds what the local AOT compile helper can build —
# it gets OOM-killed; each half compiles comfortably):
#
#   stage A: cleanup chain -> filtered metering + regions -> limiter plan
#            -> prefix limiter -> pass-3 metering -> linear-mode offset.
#            Returns (prefixed_audio, offset_db) as DEVICE values plus the
#            packed stage-A metrics.
#   stage B: offset gain -> adeclick -> brickwall -> final metering +
#            regions -> delivery resample + s16 quantise.
#            Consumes stage A's device outputs directly — the host never
#            syncs between the two dispatches, so the latency profile
#            matches the monolith.

def _master_stage_a_tree(
    x: jnp.ndarray,
    # traced per-file parameters
    gate_threshold: jnp.ndarray,     # linear
    gate_ratio: jnp.ndarray,
    gate_range: jnp.ndarray,         # linear
    comp_threshold_lin: jnp.ndarray,
    deess_intensity: jnp.ndarray,
    nf_db: jnp.ndarray,
    nr_db: jnp.ndarray,              # afftdn noise-reduction depth (dB)
    band_shape_db: jnp.ndarray,      # (15,) dB offsets, zeros = white
    target_i: jnp.ndarray,
    target_tp_lin: jnp.ndarray,      # linear
    noise_bounds: jnp.ndarray,       # (2,) samples
    speech_bounds: jnp.ndarray,      # (2,) samples
    # constants baked per sample rate
    chain_ir: jnp.ndarray,
    kw_ir: jnp.ndarray,
    tp_bank: jnp.ndarray,
    deess_kernel: jnp.ndarray,
    sr: int,
    nlm_enabled: bool,
    afftdn_enabled: bool,
):
    n = int(x.shape[0])
    x = x.astype(jnp.float32)

    # --- rumble HP + band-limit LP (one fused FIR; HIGHEST — this conv
    # IS the delivery audio, not a meter) ---
    y = _fft_convolve_full(x, chain_ir, n, precision=jax.lax.Precision.HIGHEST)

    # --- anlmdn NLM (production constants; near-transparent) ---
    if nlm_enabled:
        patch_radius = max(1, int(round(0.0060 * sr / 2.0)))
        research_radius = max(1, int(round(0.0020 * sr / 2.0)))
        h = 0.00001 * 10000.0
        h2 = jnp.float32(h * h / 3.0)
        y = _nlm_core(y, h2, patch_radius, research_radius)

    # --- afftdn spectral gate (traced nf/nr + band shape; the gain law and
    # noise model live in ops/spectral_gate — one definition, four users) ---
    if afftdn_enabled:
        win, hop = 1024, 256
        n_frames = 1 + -(-(n + 2 * win - win) // hop)
        pad_total = win + n + 2 * win
        xp = jnp.zeros(pad_total, jnp.float32).at[win : win + n].set(y)
        noise = noise_profile_ingraph(nf_db, band_shape_db, sr, win)
        y = afftdn_ext(xp, n_frames, noise, win, hop, nr_db)[win : win + n]

    # --- speech gate (traced threshold/ratio/range) ---
    d = y * y
    env = attack_release_follower(d, envelope_coeff(5.0, sr), envelope_coeff(200.0, sr))
    y = y * gate_gain(env, gate_threshold, gate_ratio, 3.0, gate_range)

    # --- levelling compressor (traced threshold) ---
    env2 = attack_release_follower(y * y, envelope_coeff(10.0, sr), envelope_coeff(200.0, sr))
    y = y * compressor_gain(env2, comp_threshold_lin, 3.0, 4.0)

    # --- de-esser (traced intensity; i=0 -> unity blend) ---
    delay = (deess_kernel.shape[0] - 1) // 2
    hf = _fft_convolve_full(
        jnp.concatenate([y, jnp.zeros(delay, y.dtype)]), deess_kernel, n + delay,
        precision=jax.lax.Precision.HIGHEST,
    )[delay:]
    lf = y - hf
    ca = envelope_coeff(1.0, sr)
    cr = envelope_coeff(30.0, sr)
    envs = attack_release_follower(jnp.stack([jnp.abs(hf), jnp.abs(y)]), ca, cr)
    env_hf, env_all = envs[0], envs[1]
    sens = deess_intensity ** 5
    ratio_hf = env_hf / jnp.maximum(env_all, 1e-9)
    excess = jnp.maximum(0.0, ratio_hf - (1.0 - sens))
    depth = jnp.clip(excess / jnp.maximum(0.5 * sens, 1e-6), 0.0, 1.0)
    min_gain = 10.0 ** (-12.0 / 20.0)
    de_gain = 1.0 - depth * (1.0 - min_gain)
    de_gain = jnp.where(deess_intensity > 0.0, de_gain, 1.0)
    y = lf + hf * de_gain

    # --- filtered-stage metering (loudness + astats + spectral in-graph) ---
    stage_metrics = _stage_metrics_fns(n, sr, kw_ir, tp_bank)
    loud_f, ast_f, spec_f, spec_avg_f = stage_metrics(y)
    region_f_noise = _region_sample_ingraph(y, loud_f, spec_avg_f, sr,
                                            noise_bounds[0], noise_bounds[1],
                                            tp_bank,
                                            tp_window=int(NOISE_PAD_SECS * sr))
    region_f_speech = _region_sample_ingraph(y, loud_f, spec_avg_f, sr,
                                             speech_bounds[0], speech_bounds[1],
                                             tp_bank,
                                             tp_window=int(SPEECH_PAD_SECS * sr))

    # --- normalisation plan (the shared scalar law from pipeline.normalise;
    # jnp.where in place of host branches) ---
    measured_i = loud_f["integrated"]
    measured_tp_db = 20.0 * jnp.log10(jnp.maximum(loud_f["true_peak"], 1e-12))
    target_tp_db = 20.0 * jnp.log10(jnp.maximum(target_tp_lin, 1e-12))
    plan = limiter_plan_scalars(measured_i, measured_tp_db, target_i,
                                target_tp_db, xp=jnp)
    needed, clamped = plan["needed"], plan["clamped"]
    pre_gain_db, ceiling_db = plan["pre_gain_db"], plan["ceiling_db"]
    gain_required = plan["gain_db"]

    # prefix: pre-gain + levelling limiter (5/100 ms); inert when not needed
    pre = y * jnp.where(needed, 10.0 ** (pre_gain_db / 20.0), 1.0)
    limit_lin = jnp.where(needed, 10.0 ** (ceiling_db / 20.0), 1e9)
    lookahead = max(1, int(round(5.0 * sr / 1000.0)))
    release = max(1.0, 100.0 * sr / 1000.0)
    prefixed = limiter_core(pre, limit_lin, lookahead, release)

    # PASS 3 measurement through the prefix
    loud_m = _loudness_ingraph(prefixed, kw_ir, tp_bank, sr)
    m_i = loud_m["integrated"]
    m_tp_db = 20.0 * jnp.log10(jnp.maximum(loud_m["true_peak"], 1e-12))
    _, effective_i, offset_db = linear_mode_scalars(m_i, m_tp_db, target_i, xp=jnp)

    metrics = {
        "filtered": loud_f,
        "filtered_astats": ast_f,
        "filtered_spectral": spec_f,
        "pass3": loud_m,
        "regions": {
            "filtered_noise": region_f_noise,
            "filtered_speech": region_f_speech,
        },
        "plan": {
            "needed": needed,
            "clamped": clamped,
            "ceiling_db": ceiling_db,
            "pre_gain_db": pre_gain_db,
            "gain_db": gain_required,
            "measured_i": m_i,
            "measured_tp_db": m_tp_db,
            "effective_i": effective_i,
            "offset_db": offset_db,
        },
    }
    return prefixed, offset_db, metrics


def _master_stage_b_tree(
    prefixed: jnp.ndarray,
    offset_db: jnp.ndarray,          # device scalar from stage A
    target_tp_lin: jnp.ndarray,
    noise_bounds: jnp.ndarray,
    speech_bounds: jnp.ndarray,
    kw_ir: jnp.ndarray,
    tp_bank: jnp.ndarray,
    sr: int,
    out_rate: int,
    declick_enabled: bool,
):
    n = int(prefixed.shape[0])
    target_tp_db = 20.0 * jnp.log10(jnp.maximum(target_tp_lin, 1e-12))

    z = prefixed * 10.0 ** (offset_db / 20.0)
    if declick_enabled:
        window = max(8, int(round(55.0 * sr / 1000.0)))
        z = _declick_impl(z, window, 1.7)
    brick_lin = 10.0 ** ((target_tp_db - BRICKWALL_TRUE_PEAK_HEADROOM_DB) / 20.0)
    z = limiter_core(z, brick_lin, max(1, int(round(sr / 1000.0))),
                     max(1.0, 50.0 * sr / 1000.0))

    # --- final-stage metering ---
    stage_metrics = _stage_metrics_fns(n, sr, kw_ir, tp_bank)
    loud_z, ast_z, spec_z, spec_avg_z = stage_metrics(z)
    region_z_noise = _region_sample_ingraph(z, loud_z, spec_avg_z, sr,
                                            noise_bounds[0], noise_bounds[1],
                                            tp_bank,
                                            tp_window=int(NOISE_PAD_SECS * sr))
    region_z_speech = _region_sample_ingraph(z, loud_z, spec_avg_z, sr,
                                             speech_bounds[0], speech_bounds[1],
                                             tp_bank,
                                             tp_window=int(SPEECH_PAD_SECS * sr))

    metrics = {
        "final": loud_z,
        "final_astats": ast_z,
        "final_spectral": spec_z,
        "regions": {
            "final_noise": region_z_noise,
            "final_speech": region_z_speech,
        },
    }

    # --- chain-final delivery format: resample + s16 quantise in-graph
    # (ref: FilterResample `aformat=sample_rates=44100:...:s16`,
    # filters.go:706-710) — no separate dispatch, half the pull bytes.
    # The delivery PCM leaves the program as SEPARATE chunk buffers so the
    # host can start overlapping async pulls directly — no per-length
    # host-side slice programs queueing through the AOT compile helper ---
    from ..ops.resample import resample

    zr = resample(z, sr, out_rate)
    out_i16 = jnp.clip(jnp.round(zr * 32767.0), -32768.0, 32767.0).astype(jnp.int16)
    n_out = int(out_i16.shape[0])
    k = 4 if n_out >= (1 << 21) else 1
    bounds = [(i * n_out) // k for i in range(k + 1)]
    chunks = tuple(
        jax.lax.slice(out_i16, (bounds[i],), (bounds[i + 1],)) for i in range(k)
    )
    return chunks, metrics


# --- scalar packing: the remote tunnel charges a round trip per SCALAR
# leaf pulled (hundreds of ms each); packing every scalar output into one
# vector makes the whole metrics pull 2 transfers ---

def _pack_all(flat):
    """Serialise EVERY leaf into one flat f32 vector: float/bool scalars as
    one slot, integer scalars as two exact 16-bit halves, float arrays
    raveled.  One leaf out == one tunnel transfer; per-leaf pulls cost a
    ~30 ms round trip each on the remote backend."""
    parts = []
    for l in flat:
        dt = l.dtype
        if jnp.ndim(l) == 0:
            if jnp.issubdtype(dt, jnp.integer):
                v = l.astype(jnp.uint32)
                parts.append(jnp.stack([
                    (v & 0xFFFF).astype(jnp.float32),
                    (v >> 16).astype(jnp.float32),
                ]))
            else:
                parts.append(jnp.asarray(l, jnp.float32)[None])
        else:
            parts.append(jnp.ravel(l).astype(jnp.float32))
    return jnp.concatenate(parts)


def _unpack_all(buf: np.ndarray, shapes, dtypes, treedef):
    flat = []
    pos = 0
    for shape, dt in zip(shapes, dtypes):
        if len(shape) == 0:
            if np.issubdtype(dt, np.integer):
                lo, hi = buf[pos], buf[pos + 1]
                pos += 2
                flat.append(dt.type(int(lo) | (int(hi) << 16)))
            elif dt == np.bool_:
                flat.append(np.bool_(buf[pos] > 0.5)); pos += 1
            else:
                flat.append(dt.type(buf[pos])); pos += 1
        else:
            size = int(np.prod(shape))
            flat.append(buf[pos : pos + size].reshape(shape).astype(dt))
            pos += size
    return jax.tree_util.tree_unflatten(treedef, flat)

# Per-file parameters cross the tunnel as ONE packed f32 vector plus one
# int32 bounds vector: on the remote backend every distinct host scalar
# argument costs its own upload round trip (~30 ms each), and the master
# dispatches carry ~14 of them — profiled 2026-08-17 as the bulk of ~860 ms
# of per-file "unaccounted" wall.  The constants (chain_ir/kw_ir/...) are
# content-memoized by the client, so they stay separate args.

def _pack_master_params(cfg_vals: list[float]) -> jnp.ndarray:
    return jnp.asarray(np.asarray(cfg_vals, dtype=np.float32))


@functools.partial(
    jax.jit,
    static_argnames=("sr", "nlm_enabled", "afftdn_enabled"),
)
def _fused_master_a_packed(x, params, bounds, chain_ir, kw_ir, tp_bank,
                           deess_k, *, sr, nlm_enabled, afftdn_enabled):
    prefixed, offset_db, tree = _master_stage_a_tree(
        x,
        params[0], params[1], params[2], params[3], params[4], params[5],
        params[23], params[8:23], params[6], params[7],
        bounds[0:2], bounds[2:4],
        chain_ir, kw_ir, tp_bank, deess_k,
        sr=sr, nlm_enabled=nlm_enabled, afftdn_enabled=afftdn_enabled,
    )
    flat, _ = jax.tree_util.tree_flatten(tree)
    return prefixed, offset_db, _pack_all(flat)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "out_rate", "declick_enabled"),
)
def _fused_master_b_packed(prefixed, offset_db, params, bounds, kw_ir,
                           tp_bank, *, sr, out_rate, declick_enabled):
    out_chunks, tree = _master_stage_b_tree(
        prefixed, offset_db, params[7], bounds[0:2], bounds[2:4],
        kw_ir, tp_bank,
        sr=sr, out_rate=out_rate, declick_enabled=declick_enabled,
    )
    flat, _ = jax.tree_util.tree_flatten(tree)
    return out_chunks, _pack_all(flat)


def _meta_from(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [l.shape for l in flat], [np.dtype(l.dtype) for l in flat]


@functools.lru_cache(maxsize=32)
def _master_a_meta(n: int, sr: int, nlm_enabled: bool, afftdn_enabled: bool):
    """Stage-A metrics treedef/shapes via eval_shape (no compile)."""
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    i32 = jax.ShapeDtypeStruct((2,), jnp.int32)
    xs = jax.ShapeDtypeStruct((n,), jnp.float32)
    shape15 = jax.ShapeDtypeStruct((15,), jnp.float32)
    chain_ir = jax.ShapeDtypeStruct((chain_ir_len(80.0, sr),), jnp.float32)
    kw_ir = jax.ShapeDtypeStruct((4096,), jnp.float32)
    tp_bank = jax.ShapeDtypeStruct((4, 12), jnp.float32)
    deess = jax.ShapeDtypeStruct((255,), jnp.float32)
    _, _, tree = jax.eval_shape(
        functools.partial(_master_stage_a_tree, sr=sr,
                          nlm_enabled=nlm_enabled,
                          afftdn_enabled=afftdn_enabled),
        xs, f32, f32, f32, f32, f32, f32, f32, shape15, f32, f32, i32, i32,
        chain_ir, kw_ir, tp_bank, deess,
    )
    return _meta_from(tree)


@functools.lru_cache(maxsize=32)
def _master_b_meta(n: int, sr: int, out_rate: int, declick_enabled: bool):
    f32 = jax.ShapeDtypeStruct((), jnp.float32)
    i32 = jax.ShapeDtypeStruct((2,), jnp.int32)
    xs = jax.ShapeDtypeStruct((n,), jnp.float32)
    kw_ir = jax.ShapeDtypeStruct((4096,), jnp.float32)
    tp_bank = jax.ShapeDtypeStruct((4, 12), jnp.float32)
    _, tree = jax.eval_shape(
        functools.partial(_master_stage_b_tree, sr=sr, out_rate=out_rate,
                          declick_enabled=declick_enabled),
        xs, f32, f32, i32, i32, kw_ir, tp_bank,
    )
    return _meta_from(tree)





@functools.lru_cache(maxsize=8)
def _constants_for_rate(sr: int, hp_hz: float, lp_hz: float):
    """Per-sample-rate baked filter constants (host-designed).  The chain
    IR truncates at `chain_ir_len` (decay-derived; 2048 taps at the
    default 80 Hz / 48 kHz) — this conv runs at HIGHEST precision, so its
    tap count is the single largest stage-A matmul term."""
    chain_sos = cascade(design_highpass(hp_hz, sr), design_lowpass(lp_hz, sr))
    chain_ir = sos_impulse_response(chain_sos, chain_ir_len(hp_hz, sr)).astype(np.float32)
    kw_ir = sos_impulse_response(k_weighting_sos(sr), 4096).astype(np.float32)
    tp_bank = _polyphase_bank().astype(np.float32)

    # linear-phase de-esser split kernel (corner as in ops/deesser.py)
    corner_hz = min(0.80 * sr / 2.0 * 0.34, sr * 0.45)
    taps = 255
    m = np.arange(taps) - (taps - 1) / 2.0
    fc = corner_hz / sr
    lp = 2.0 * fc * np.sinc(2.0 * fc * m) * np.hamming(taps)
    lp /= lp.sum()
    hp = -lp
    hp[(taps - 1) // 2] += 1.0
    return (
        jnp.asarray(chain_ir),
        jnp.asarray(kw_ir),
        jnp.asarray(tp_bank),
        jnp.asarray(hp.astype(np.float32)),
    )


def fused_master(
    x, sample_rate: int, cfg: FilterConfig, measurements,
    on_stage_a_done=None, on_filtered_levels=None, on_limiter_plan=None,
) -> tuple[tuple, int, dict, dict]:
    """Run the fused pass-2/3/4 master (two chained device programs, no
    host sync between them) with per-file parameters drawn from the
    adapted config.  Returns (output_i16_chunk_tuple, out_rate,
    metrics_host, timings) — the delivery-format resample + s16 quantise
    happen inside stage B, and the output leaves as chunk buffers whose
    async host pulls are already in flight on return.

    `timings` holds MEASURED per-stage walls: "stage_a" = dispatch to
    stage-A completion (pass 2 chain + filtered metering + limiter plan +
    prefix limiter + pass-3 measure), "stage_b" = stage-B execution
    (linear gain + declick + brickwall + final metering + delivery
    resample), plus "pre" (arg prep + dispatch latency before t0) and
    "post" (packed-metrics pulls + host unpack).  `on_stage_a_done`, when
    given, fires the moment stage A's outputs are ready (stage B already
    executing)."""
    import time as _time

    t_enter = _time.perf_counter()
    m = measurements
    nr = cfg.noise_reduction
    shape = np.zeros(15, dtype=np.float32)
    if nr.afftdn_noise_type == "custom" and nr.afftdn_band_noise:
        shape = np.asarray(nr.afftdn_band_noise, dtype=np.float32)
    nf = nr.afftdn_noise_floor if nr.afftdn_noise_floor != 0.0 else -50.0

    def region_bounds(region):
        if region is None:
            return np.zeros(2, dtype=np.int32)
        s = int(round(region.start * sample_rate))
        e = int(round(region.end * sample_rate))
        return np.asarray([s, e], dtype=np.int32)

    noise_b = region_bounds(m.vad.noise_region if m is not None else None)
    speech_b = region_bounds(
        m.vad.speech_profile.region if (m is not None and m.vad.speech_profile) else None
    )

    chain_ir, kw_ir, tp_bank, deess_k = _constants_for_rate(
        sample_rate, cfg.rumble_highpass.frequency, cfg.bandlimit_lowpass.frequency
    )

    x = jnp.asarray(x)
    n = int(x.shape[0])
    out_rate = (
        cfg.resample.sample_rate
        if cfg.resample.enabled and cfg.resample.sample_rate != sample_rate
        else sample_rate
    )
    nlm_enabled = nr.enabled
    afftdn_enabled = nr.enabled and nr.afftdn_enabled
    declick_enabled = cfg.adeclick.enabled
    target_tp_lin = 10.0 ** (cfg.loudnorm.target_tp / 20.0)

    # one packed params vector + one bounds vector per file (2 uploads
    # instead of ~14 scalar round trips; stage B reuses the same buffers)
    params = _pack_master_params([
        cfg.speech_gate.threshold,
        cfg.speech_gate.ratio,
        cfg.speech_gate.range,
        10.0 ** (cfg.levelling_compressor.threshold / 20.0),
        cfg.deesser.intensity if cfg.deesser.enabled else 0.0,
        nf,
        cfg.loudnorm.target_i,
        float(target_tp_lin),
        *np.asarray(shape, dtype=np.float32).tolist(),
        nr.afftdn_noise_reduction,
    ])
    bounds = jnp.asarray(np.concatenate([noise_b, speech_b]).astype(np.int32))

    # stage A dispatch
    t0 = _time.perf_counter()
    prefixed, offset_db, packed_a = _fused_master_a_packed(
        x.astype(jnp.float32) if x.dtype != jnp.float32 else x,
        params, bounds, chain_ir, kw_ir, tp_bank, deess_k,
        sr=sample_rate, nlm_enabled=nlm_enabled, afftdn_enabled=afftdn_enabled,
    )

    # stage B dispatch — consumes A's device outputs, no host sync between
    out_chunks, packed_b = _fused_master_b_packed(
        prefixed, offset_db, params, bounds, kw_ir, tp_bank,
        sr=sample_rate, out_rate=out_rate, declick_enabled=declick_enabled,
    )

    # stage A completes while B (already queued) starts — blocking on
    # packed_a here measures the real stage-A wall without stalling B
    packed_a.block_until_ready()
    t_a = _time.perf_counter() - t0
    if on_stage_a_done is not None:
        try:
            on_stage_a_done()
        except Exception:
            pass

    treedef_a, shapes_a, dtypes_a = _master_a_meta(
        n, sample_rate, nlm_enabled, afftdn_enabled
    )
    treedef_b, shapes_b, dtypes_b = _master_b_meta(
        n, sample_rate, out_rate, declick_enabled
    )
    # pull stage A's packed metrics WHILE stage B runs: the ~100 KB
    # transfer overlaps the B compute, and the filtered momentary series
    # can feed a truthful VU meter for the remaining normalising stage
    # (ref: the per-frame level the encoder streams, encoder.go:235-257)
    packed_a.copy_to_host_async()
    ma = _unpack_all(np.asarray(packed_a), shapes_a, dtypes_a, treedef_a)
    if on_limiter_plan is not None:
        # the Pass-4 limiter snapshot as soon as the plan metrics land, so
        # the TUI's Limiter row lights DURING processing (ref: the
        # LimiterProgressMsg path, WithLimiterProgress)
        try:
            _needed = bool(ma["plan"]["needed"])
            on_limiter_plan(
                _needed,
                float(ma["plan"]["ceiling_db"]) if _needed else 0.0)
        except Exception:
            pass
    if on_filtered_levels is not None:
        try:
            # anchor at the FINAL encode level: filtered momentary + the
            # pre-limiter gain (when the plan engaged) + the linear-mode
            # offset — one convention shared with fused_master_chunked so
            # the meter reads the same whichever master route a file takes
            anchor = float(ma["plan"]["offset_db"]) + (
                float(ma["plan"]["pre_gain_db"])
                if bool(ma["plan"]["needed"]) else 0.0)
            on_filtered_levels(
                np.asarray(ma["filtered"]["momentary"], dtype=np.float64)
                + anchor,
                0.1,
            )
        except Exception:
            pass
    packed_b.block_until_ready()
    t_b = _time.perf_counter() - t0 - t_a

    # the small B metrics still pull BEFORE the multi-MB delivery chunks:
    # queued the other way round they wait ~1 s behind the PCM (profiled
    # 2026-08-17 as "master_post")
    t_b_done = _time.perf_counter()
    packed_b.copy_to_host_async()
    mb = _unpack_all(np.asarray(packed_b), shapes_b, dtypes_b, treedef_b)
    for c in out_chunks:
        c.copy_to_host_async()
    metrics = {**ma, **mb,
               "regions": {**ma["regions"], **mb["regions"]}}
    return out_chunks, out_rate, metrics, {
        "stage_a": t_a, "stage_b": t_b,
        "pre": t0 - t_enter,
        "post": _time.perf_counter() - t_b_done,
    }


# ---------------------------------------------------------------------------
# fused pass-1 analysis program
# ---------------------------------------------------------------------------

def _analysis_tree(
    x: jnp.ndarray,
    kw_ir: jnp.ndarray,
    tp_bank: jnp.ndarray,
    sr: int,
    interval_len: int,
    n_intervals: int,
):
    n = int(x.shape[0])
    x = x.astype(jnp.float32)

    loud = _loudness_ingraph(x, kw_ir, tp_bank, sr)

    w_astats = max(2, int(round(0.05 * sr)))
    ast = _astats_core(x, w_astats)

    spec_win, spec_hop = 2048, 1024
    xs = x
    ns = n
    if ns < spec_win:
        xs = jnp.zeros(spec_win, x.dtype).at[:ns].set(x)
        ns = spec_win
    n_sframes = 1 + (ns - spec_win) // spec_hop
    spec_frames = _spectral_core(xs, n_sframes, spec_win, spec_hop, float(sr))

    # 250 ms interval raw stats (blocked reductions)
    total = interval_len * n_intervals
    padded = jnp.zeros(total, x.dtype).at[: min(n, total)].set(x[:total])
    blocks = padded.reshape(n_intervals, interval_len)
    iv_sumsq = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=1)
    iv_peak = jnp.max(jnp.abs(blocks), axis=1)

    return {
        "loudness": loud,
        "astats": ast,
        "spectral": spec_frames,
        "iv_sumsq": iv_sumsq,
        "iv_peak": iv_peak,
    }


@functools.partial(jax.jit, static_argnames=("sr", "interval_len", "n_intervals"))
def _fused_analysis_packed(x, kw_ir, tp_bank, sr, interval_len, n_intervals):
    mono = _to_mono_f32(x)
    tree = _analysis_tree(mono, kw_ir, tp_bank, sr, interval_len, n_intervals)
    flat, _ = jax.tree_util.tree_flatten(tree)
    return mono, _pack_all(flat)


@functools.lru_cache(maxsize=32)
def _analysis_meta(n: int, sr: int, interval_len: int, n_intervals: int):
    xs = jax.ShapeDtypeStruct((n,), jnp.float32)
    kw = jax.ShapeDtypeStruct((4096,), jnp.float32)
    tp = jax.ShapeDtypeStruct((4, 12), jnp.float32)
    tree = jax.eval_shape(
        functools.partial(_analysis_tree, sr=sr, interval_len=interval_len,
                          n_intervals=n_intervals),
        xs, kw, tp,
    )
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [l.shape for l in flat], [np.dtype(l.dtype) for l in flat]


def fused_analysis(x, sample_rate: int):
    """One-dispatch Pass-1 device program.  `x` may be (n,) or
    (channels, n), int16 or float — downmix + conversion happen in-graph
    (int16 input crosses the tunnel at half the bytes).  Returns
    (mono_f32_device_array, metrics_tree): the mono PCM stays on device for
    the band/master programs; the metrics pull is one packed transfer
    (per-scalar pulls cost a tunnel round trip each)."""
    x = jnp.asarray(x)
    n = int(x.shape[-1])
    _, kw_ir, tp_bank, _ = _constants_for_rate(sample_rate, 80.0, 20500.0)
    interval_len = max(1, int(round(0.25 * sample_rate)))
    n_intervals = max(1, -(-n // interval_len))
    mono, packed = _fused_analysis_packed(
        x, kw_ir, tp_bank, sample_rate, interval_len, n_intervals
    )
    treedef, shapes, dtypes = _analysis_meta(n, sample_rate, interval_len, n_intervals)
    return mono, _unpack_all(np.asarray(packed), shapes, dtypes, treedef)


# ---------------------------------------------------------------------------
# recompile-free region band RMS (traced bounds, padded windows)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("pad_len", "fft_len"))
def _fused_band_rms_impl(
    x: jnp.ndarray,
    start: jnp.ndarray,
    length: jnp.ndarray,
    irs: jnp.ndarray,        # (n_bands, ir_len) REAL impulse responses
    pad_len: int,
    fft_len: int,
):
    # the band IR spectra are computed ON DEVICE: the remote TPU backend
    # cannot device_put complex64 host arrays (UNIMPLEMENTED), so only real
    # arrays cross the host boundary
    ir_ffts = jnp.fft.rfft(irs, n=fft_len, axis=-1)
    seg = jax.lax.dynamic_slice(
        jnp.concatenate([x, jnp.zeros(pad_len, x.dtype)]), (start,), (pad_len,)
    )
    idx = jnp.arange(pad_len)
    seg = jnp.where(idx < length, seg, 0.0)
    spec = jnp.fft.rfft(seg, n=fft_len)
    y = jnp.fft.irfft(spec[None, :] * ir_ffts, n=fft_len, axis=-1)[:, :pad_len]
    cnt = jnp.maximum(length, 1)
    # no post-irfft mask: the segment is zeroed beyond `length` BEFORE the
    # FFT, so the filtered signal past the region is only the <=4096-sample
    # filter ring tail (<0.01 dB on >=8 s regions).  A broadcast mask fused
    # into the batched irfft hits an UNIMPLEMENTED path on the TPU backend.
    return jnp.sum(y.astype(jnp.float32) ** 2, axis=-1) / cnt


@functools.lru_cache(maxsize=8)
def _band_irs(sample_rate: int, pad_len: int):
    """(n_live_bands, ir_len) real IRs of the 15 afftdn + 2 speech
    band-limit filters at this rate; NaN-marked bands (edge >= Nyquist)
    excluded.  FFTs happen on device (complex host transfer unsupported)."""
    from ..analysis.bands import _band_ir

    bands = [afftdn_band_edges_hz(i) for i in range(len(AFFTDN_BAND_CENTRES_HZ))]
    bands += [(1000.0, 3000.0), (6000.0, 9000.0)]  # body, sibilant
    irs = [_band_ir(lo, hi, sample_rate) for lo, hi in bands]
    live = [i for i, ir in enumerate(irs) if ir is not None]
    ir_len = 4096
    fft_len = 1 << int(math.ceil(math.log2(pad_len + ir_len - 1)))
    mat = np.stack([irs[i] for i in live]).astype(np.float32)
    return jnp.asarray(mat), fft_len, tuple(live), len(bands)


def band_rms_dispatch(x, sample_rate: int, region, pad_secs: float):
    """Dispatch the 17-band region-RMS program; returns an opaque handle.
    Pull with `band_rms_collect` — dispatching BOTH regions before pulling
    either overlaps their device execution (one sync instead of two)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    pad_len = int(pad_secs * sample_rate)
    s = max(0, min(n, int(round(region.start * sample_rate))))
    e = max(s, min(n, int(round(region.end * sample_rate))))
    length = min(e - s, pad_len)

    irs, fft_len, live, n_bands = _band_irs(sample_rate, pad_len)
    dev = _fused_band_rms_impl(
        x, jnp.int32(s), jnp.int32(length), irs, pad_len, fft_len
    )
    return dev, live, n_bands


def band_rms_collect(handle) -> list[float]:
    dev, live, n_bands = handle
    ms = np.asarray(dev, dtype=np.float64)
    out = [math.nan] * n_bands
    for k, i in enumerate(live):
        v = float(ms[k])
        out[i] = 10.0 * math.log10(v) if v > 0 and math.isfinite(v) else -math.inf
    return out


def fused_band_rms(x, sample_rate: int, region, pad_secs: float) -> list[float]:
    """All 17 band RMS values over one region in one dispatch with traced
    bounds (no per-region recompiles).  Returns dB values; NaN for
    unmeasurable bands; region windows clamp at `pad_secs`."""
    return band_rms_collect(band_rms_dispatch(x, sample_rate, region, pad_secs))

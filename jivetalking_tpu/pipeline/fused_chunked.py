"""Chunked fused master: the hour-scale workload through the fused design.

Round 1 dropped files past 20 minutes to the per-op unfused path
(`process.py` fused=False cliff) because the whole-file fused master
materialises multi-GB STFT/NLM intermediates.  This module runs the SAME
pass-2/3/4 maths as `pipeline.fused` over fixed-shape chunks with exact
carried state, so a 45-minute episode (the reference's real workload,
ref: README.md:105-127) masters through the fused design with:

  * ONE compile per program (fixed chunk shape serves every chunk of
    every long file at a given rate);
  * bounded HBM (the big intermediates exist one chunk at a time; the
    audio streams stay resident as chunk lists);
  * NO host sync inside the pass chain (the plan + offset scalars are
    traced on device); the metric pulls ride the wire while the device
    grinds the limit/B queue — per-chunk dispatches are async;
  * per-chunk progress callbacks (the long-file in-pass progress the
    live UI animates).

Chunk passes and their carried state (all exact unless noted):

  CHAIN   halo'd chain FIR + NLM + afftdn (overlap-discard) -> speech
          gate -> compressor; carries the two envelope-follower states
          (the follower's fixed point equals the sequential recurrence,
          so an end-state carry is exact).  NLM is approximate within
          patch+research extent of the FILE edges only (same as the
          whole-file kernel's own edge masking semantics).
  DEESS   centred-FIR band split from neighbour-chunk halos + carried
          split-band follower states; emits the filtered-stage metering
          partials (K-weighted 100 ms block powers, masked-window astats
          partials, spectral-frame sums, region partials) assigned by
          window END so only LEFT halos are needed.
  (plan)  limiter plan TRACED ON DEVICE from the packed stage partials
          (`_plan_scalars_device` — the same shared scalar law the
          whole-file master traces, fused.py:421-443), so the limit pass
          enqueues with no host sync; the host pulls the same metrics
          in parallel for reports/diagnostics.
  LIMIT   pre-gain + levelling limiter: lookahead needs the next chunk's
          head (available — the whole stream is resident), release is a
          max-plus prefix whose end state carries; emits pass-3 loudness
          partials.
  (offs)  linear-mode offset traced on device from the pass-3 rows
          (`_offset_scalar_device`); host copy pulled later for reports.
  B       offset gain + adeclick (halo'd; the p90 window grid restarts
          per chunk — approximate at window-grid seams, clicks are
          local) + brickwall (carried release; the lookahead halo is
          declicked on the CHUNK-LOCAL window grid, so it differs from
          the neighbour chunk's own declick only at grid seams — each
          chunk enforces `needed` over its own samples, so the ceiling
          holds regardless) + final metering
          partials + exact chunk-aligned polyphase resample (C % M == 0
          keeps the output phase grid global) -> s16 delivery chunks.
  FLAT    tiny per-chunk pass counting flat-factor runs at the GLOBAL
          min/max (known only after the stage partials combine).

Numerical contract: equals `fused_master` within NLM-file-edge and
declick-window-seam tolerance; pinned by tests/test_fused_chunked.py.
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..adaptive.config import FilterConfig
from ..metering.astats import _sliding_max, _sliding_sumsq, histogram_8192
from ..metering.spectral import _spectral_core
from ..ops.declick import _declick_impl
from ..ops.dynamics import (
    attack_release_follower,
    compressor_gain,
    envelope_coeff,
    gate_gain,
)
from ..ops.limiter import _EPS, _LOG_FLOOR, _maxplus_prefix, _sliding_min_lookahead
from ..ops.nlm import _nlm_core
from ..ops.resample import _banded_bank
from ..ops.spectral_gate import afftdn_ext, noise_profile_ingraph
from .fused import (
    _constants_for_rate,
    _fft_convolve_full,
    _loudness_from_bp,
    _pack_all,
    _unpack_all,
)
from .normalise import (
    BRICKWALL_TRUE_PEAK_HEADROOM_DB,
    limiter_plan_scalars,
    linear_mode_scalars,
)

_ENTROPY_BINS = 8192
SPEC_WIN, SPEC_HOP = 2048, 1024
AFFTDN_WIN, AFFTDN_HOP = 1024, 256


# ---------------------------------------------------------------------------
# chunk geometry
# ---------------------------------------------------------------------------

def chunk_length(sample_rate: int, out_rate: int, target_secs: float = 240.0) -> int:
    """Smallest chunk length >= target that aligns every grid the chunked
    master relies on: the 100 ms loudness block, both STFT hops, and the
    resampler's M (so each chunk emits a whole number of output samples on
    the global phase grid)."""
    block_len = max(1, int(round(sample_rate * 0.1)))
    g = math.gcd(sample_rate, out_rate)
    M = sample_rate // g
    base = math.lcm(block_len, SPEC_HOP, AFFTDN_HOP, M)
    k = max(1, int(round(target_secs * sample_rate / base)))
    return base * k


def should_chunk(n: int, sample_rate: int, threshold_secs: float = 1200.0) -> bool:
    """Past ~20 minutes the whole-file fused master's transient
    intermediates stop fitting comfortably; switch to the chunked form."""
    return n > threshold_secs * sample_rate


# ---------------------------------------------------------------------------
# jitted chunk programs (one compile per (sr, C) each)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("hl", "hr", "C"))
def _slice_ext(padded: jnp.ndarray, start: jnp.ndarray, hl: int, C: int, hr: int):
    """ext chunk [start - hl, start + C + hr) of the hl-left-padded signal
    (one executable serves every chunk: traced start, static sizes)."""
    return jax.lax.dynamic_slice(padded, (start,), (hl + C + hr,))


@functools.partial(
    jax.jit,
    static_argnames=("sr", "C", "hl", "hr", "nlm_enabled", "afftdn_enabled",
                     "nlm_block"),
)
def _chain_chunk(
    ext, envg_in, envc_in,
    gate_thr, gate_ratio, gate_range, comp_thr_lin, nf_db, nr_db,
    band_shape_db, chain_ir,
    sr: int, C: int, hl: int, hr: int, nlm_enabled: bool, afftdn_enabled: bool,
    nlm_block: int | None = None,
):
    """Cleanup chain on one halo'd chunk: HP/LP FIR, NLM, afftdn (overlap-
    discard via the halos; noise model + gain law shared with every other
    afftdn call site via ops/spectral_gate), then gate + compressor with
    carried follower state.  Mirrors fused._master_stage_a_tree's chain
    section."""
    n_ext = hl + C + hr
    y = _fft_convolve_full(ext, chain_ir, n_ext,
                           precision=jax.lax.Precision.HIGHEST)

    if nlm_enabled:
        patch_radius = max(1, int(round(0.0060 * sr / 2.0)))
        research_radius = max(1, int(round(0.0020 * sr / 2.0)))
        h = 0.00001 * 10000.0
        h2 = jnp.float32(h * h / 3.0)
        y = _nlm_core(y, h2, patch_radius, research_radius, block=nlm_block)

    if afftdn_enabled:
        win, hop = AFFTDN_WIN, AFFTDN_HOP
        n_frames = (n_ext - win) // hop + 1
        noise = noise_profile_ingraph(nf_db, band_shape_db, sr, win)
        y = afftdn_ext(y, n_frames, noise, win, hop, nr_db)

    yc = y[hl : hl + C]

    envg = attack_release_follower(yc * yc, envelope_coeff(5.0, sr),
                                   envelope_coeff(200.0, sr), init=envg_in)
    g = yc * gate_gain(envg, gate_thr, gate_ratio, 3.0, gate_range)

    envc = attack_release_follower(g * g, envelope_coeff(10.0, sr),
                                   envelope_coeff(200.0, sr), init=envc_in)
    c = g * compressor_gain(envc, comp_thr_lin, 3.0, 4.0)
    return c, envg[-1], envc[-1]


@functools.partial(jax.jit, static_argnames=("sr", "C"))
def _deess_chunk(
    c_left, c_k, c_right,          # (delay,), (C,), (delay,)
    envhf_in, envall_in,           # (,) carried follower states
    deess_intensity, deess_kernel,
    sr: int, C: int,
):
    """De-esser on one chunk: centred FIR split from neighbour halos,
    split-band followers with carried state (fused stage A's de-esser)."""
    k = int(deess_kernel.shape[0])
    delay = (k - 1) // 2
    ext = jnp.concatenate([c_left, c_k, c_right])
    n_ext = int(ext.shape[0])
    conv = _fft_convolve_full(ext, deess_kernel, n_ext,
                              precision=jax.lax.Precision.HIGHEST)
    hf = conv[2 * delay : 2 * delay + C]
    lf = c_k - hf
    ca = envelope_coeff(1.0, sr)
    cr = envelope_coeff(30.0, sr)
    init = jnp.stack([envhf_in, envall_in])
    envs = attack_release_follower(jnp.stack([jnp.abs(hf), jnp.abs(c_k)]),
                                   ca, cr, init=init)
    env_hf, env_all = envs[0], envs[1]
    sens = deess_intensity ** 5
    ratio_hf = env_hf / jnp.maximum(env_all, 1e-9)
    excess = jnp.maximum(0.0, ratio_hf - (1.0 - sens))
    depth = jnp.clip(excess / jnp.maximum(0.5 * sens, 1e-6), 0.0, 1.0)
    min_gain = 10.0 ** (-12.0 / 20.0)
    de_gain = 1.0 - depth * (1.0 - min_gain)
    de_gain = jnp.where(deess_intensity > 0.0, de_gain, 1.0)
    y = lf + hf * de_gain
    return y, envs[0][-1], envs[1][-1]


def _tp_window_end_max(tp_ext_tail, tp_bank, C: int, k0, n_total):
    """max |4x-oversampled interpolation| over the 12-tap windows ENDING in
    this chunk's span [k0, k0+C), plus the file-end zero-pad ring when the
    span reaches n_total.

    `_tp_oversampled_max` zero-pads BOTH edges of whatever it is given, so
    calling it per chunk manufactured interpolation values that do not
    exist in the whole-file oversampling — a truncated window of a real
    oscillation at a chunk seam overshot the true peak by up to +0.175 dB
    (measured 2026-08-17), past the +-0.1 dBTP metering contract.  This
    valid-window form reproduces the whole-file `_tp_oversampled_max`
    EXACTLY: chunk 0's left zeros are the file-start pad, interior seams
    use real halo samples, and the final ring windows are admitted only
    once the span covers the signal end."""
    taps = int(tp_bank.shape[1])
    xe = jnp.concatenate(
        [tp_ext_tail, jnp.zeros(taps - 1, tp_ext_tail.dtype)])
    n_out = C + taps - 1
    acc = jnp.zeros((int(tp_bank.shape[0]), n_out), jnp.float32)
    for k in range(taps):
        acc = acc + tp_bank[:, k][:, None] * xe[k : k + n_out][None, :]
    ok = (jnp.arange(n_out) < C) | (k0 + C >= n_total)
    return jnp.max(jnp.abs(acc) * ok[None, :])


def _stage_partials_tree(
    ext,                     # (hm + C,) stage signal with LEFT halo
    k0,                      # traced: global sample index of ext[hm]
    n_total,                 # traced: real signal length (pad masking)
    noise_bounds, speech_bounds,   # traced (2,) sample bounds
    kw_ir, tp_bank,
    sr: int, C: int, hm: int, w: int,
    with_regions: bool = True,
    spec_series: bool = False,
):
    """Everything the filtered/final stage metering needs from one chunk,
    as combinable partials.  Windowed quantities are assigned by window
    END, so only the left halo is required and every window is counted
    exactly once across chunks.

    `spec_series=True` additionally emits the raw per-frame spectral
    metric rows (the Pass-1 interval engine consumes the series, not the
    means); `with_regions=False` drops the region partials (Pass 1 has no
    elected regions yet)."""
    x = ext[hm:]                             # the chunk proper
    gpos = k0 + jnp.arange(C)                # global positions
    valid = gpos < n_total
    xv = jnp.where(valid, x, 0.0)
    nv = jnp.sum(valid)

    out = {}

    # ---- loudness block powers (grid-aligned: C % block_len == 0) ----
    block_len = max(1, int(round(sr * 0.1)))
    kx = _fft_convolve_full(ext, kw_ir, hm + C)[hm:]
    nb = C // block_len
    out["bp"] = 2.0 * jnp.mean(
        kx[: nb * block_len].reshape(nb, block_len).astype(jnp.float32) ** 2,
        axis=1,
    )

    # ---- peaks (tp windows assigned by END, valid-window only) ----
    tp_ext = jnp.where(k0 + jnp.arange(-hm, C) < n_total, ext, 0.0)
    taps = int(tp_bank.shape[1])
    out["tp_max"] = _tp_window_end_max(
        tp_ext[hm - (taps - 1):], tp_bank, C, k0, n_total)
    out["speak_max"] = jnp.max(jnp.abs(xv))

    # ---- astats partials ----
    out["sum"] = jnp.sum(xv)
    out["sum_sq"] = jnp.sum(xv * xv)
    out["n_valid"] = nv
    big = jnp.where(valid, x, jnp.inf)
    out["min_level"] = jnp.min(big)
    out["max_level"] = jnp.max(jnp.where(valid, x, -jnp.inf))
    absv = jnp.abs(xv)
    out["min_nonzero"] = jnp.min(jnp.where(valid & (absv > 0), absv, jnp.inf))

    # difference/zero-crossing pairs assigned by their second sample
    prev = ext[hm - 1 : hm + C - 1]
    pair_valid = valid & (gpos >= 1)
    d = jnp.abs(x - prev)
    out["d_max"] = jnp.max(jnp.where(pair_valid, d, -jnp.inf))
    out["d_min"] = jnp.min(jnp.where(pair_valid, d, jnp.inf))
    out["d_sum"] = jnp.sum(jnp.where(pair_valid, d, 0.0))
    out["d_sumsq"] = jnp.sum(jnp.where(pair_valid, d * d, 0.0))
    out["d_count"] = jnp.sum(pair_valid)
    zc = (x < 0) != (prev < 0)
    out["zc"] = jnp.sum(zc & pair_valid).astype(jnp.float32)

    # entropy histogram (scatter- and sort-free one-hot int8 contraction);
    # padded samples get the == bins sentinel so they count nowhere
    bins = _ENTROPY_BINS
    idx = jnp.clip(((x + 1.0) * (bins / 2.0)).astype(jnp.int32), 0, bins - 1)
    idx = jnp.where(valid, idx, bins)
    out["hist"] = histogram_8192(idx).astype(jnp.float32)

    # bit depth mask
    q = jnp.clip(jnp.abs(xv) * (2.0**31), 0, 2.0**31 - 1).astype(jnp.uint32)
    out["bit_mask"] = jax.lax.reduce(q, jnp.uint32(0), jax.lax.bitwise_or, (0,))

    # sliding 50 ms windows by END position e in [k0, k0+C): valid ends are
    # [w-1, n_total-1] globally
    win_ext = ext[hm - (w - 1):]
    sumsq_w = _sliding_sumsq(jnp.where(
        k0 + jnp.arange(-(w - 1), C) < n_total, win_ext, 0.0) ** 2, w)[:C]
    wmax = _sliding_max(jnp.abs(jnp.where(
        k0 + jnp.arange(-(w - 1), C) < n_total, win_ext, 0.0)), w)[:C]
    wend_valid = (gpos >= w - 1) & valid
    out["win_sumsq_max"] = jnp.max(jnp.where(wend_valid, sumsq_w, -jnp.inf))
    out["win_sumsq_min"] = jnp.min(jnp.where(wend_valid, sumsq_w, jnp.inf))
    out["win_peak_min"] = jnp.min(jnp.where(wend_valid, wmax, jnp.inf))

    # ---- spectral frame partials (frames by END; left halo SPEC_HOP) ----
    # frames handled here start at s = k0 - SPEC_HOP, ..., k0 + C - SPEC_WIN
    # (C/SPEC_HOP of them); one extra WARM-UP frame feeds the flux metric's
    # previous-frame reference, and frames before the signal start are
    # masked so flux's zero-prev convention matches the whole-file grid
    F = C // SPEC_HOP
    first_s = k0 - SPEC_HOP
    s_all = first_s - SPEC_HOP + jnp.arange(F + 1) * SPEC_HOP
    spec_all = _spectral_core(ext[hm - 2 * SPEC_HOP:], F + 1, SPEC_WIN,
                              SPEC_HOP, float(sr), row_valid=s_all >= 0)
    spec = {k: v[1:] for k, v in spec_all.items()}
    s_global = first_s + jnp.arange(F) * SPEC_HOP
    n_sf_total = 1 + (n_total - SPEC_WIN) // SPEC_HOP
    f_valid = (s_global >= 0) & (s_global < n_sf_total * SPEC_HOP)
    out["spec_sums"] = {
        k: jnp.sum(jnp.where(f_valid, v, 0.0)) for k, v in spec.items()
    }
    out["spec_count"] = jnp.sum(f_valid)
    if spec_series:
        out["spec_frames"] = {k: v for k, v in spec.items()}
        out["spec_frame_valid"] = f_valid

    if not with_regions:
        return out

    # region masked partials (regions are small; they just span chunks)
    taps = int(tp_bank.shape[1])
    tp_tail_gpos = k0 + jnp.arange(-(taps - 1), C)
    tp_tail = ext[hm - (taps - 1):]

    def region(bounds, tag):
        rmask = valid & (gpos >= bounds[0]) & (gpos < bounds[1])
        xm = jnp.where(rmask, x, 0.0)
        out[f"r_{tag}_sumsq"] = jnp.sum(xm * xm)
        out[f"r_{tag}_count"] = jnp.sum(rmask)
        out[f"r_{tag}_peak"] = jnp.max(jnp.abs(xm))
        # region tp must reproduce the whole-file mask-then-oversample
        # (fused._region_sample_ingraph): mask the HALO'D tail by global
        # position and take only the windows ENDING in this chunk —
        # running _tp_oversampled_max on the chunk-masked body zero-padded
        # both seam edges and overshot by up to +0.175 dB for an
        # oscillation crossing a chunk boundary inside the region
        tmask = ((tp_tail_gpos >= bounds[0]) & (tp_tail_gpos < bounds[1])
                 & (tp_tail_gpos < n_total))
        out[f"r_{tag}_tp"] = jnp.maximum(
            _tp_window_end_max(jnp.where(tmask, tp_tail, 0.0), tp_bank,
                               C, k0, n_total),
            out[f"r_{tag}_peak"])
        fmask = f_valid & (s_global >= bounds[0]) & (s_global < bounds[1])
        out[f"r_{tag}_spec"] = {
            k: jnp.sum(jnp.where(fmask, v, 0.0)) for k, v in spec.items()
        }
        out[f"r_{tag}_spec_count"] = jnp.sum(fmask)

    region(noise_bounds, "noise")
    region(speech_bounds, "speech")
    return out


@functools.partial(jax.jit, static_argnames=("sr", "C", "hm", "w"))
def _stage_partials_packed(ext, k0, n_total, noise_bounds, speech_bounds,
                           kw_ir, tp_bank, sr, C, hm, w):
    tree = _stage_partials_tree(ext, k0, n_total, noise_bounds, speech_bounds,
                                kw_ir, tp_bank, sr, C, hm, w)
    flat, _ = jax.tree_util.tree_flatten(tree)
    return _pack_all(flat)


@functools.lru_cache(maxsize=16)
def _stage_partials_meta(sr: int, C: int, hm: int, w: int,
                         with_regions: bool = True, spec_series: bool = False):
    ext = jax.ShapeDtypeStruct((hm + C,), jnp.float32)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    b2 = jax.ShapeDtypeStruct((2,), jnp.int32)
    kw = jax.ShapeDtypeStruct((4096,), jnp.float32)
    tp = jax.ShapeDtypeStruct((4, 12), jnp.float32)
    tree = jax.eval_shape(
        functools.partial(_stage_partials_tree, sr=sr, C=C, hm=hm, w=w,
                          with_regions=with_regions, spec_series=spec_series),
        ext, i32, i32, b2, b2, kw, tp,
    )
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [l.shape for l in flat], [np.dtype(l.dtype) for l in flat]


@functools.partial(jax.jit, static_argnames=("sr", "C", "hm"))
def _loudness_partials(ext, k0, n_total, kw_ir, tp_bank, sr: int, C: int, hm: int):
    """bp + peaks only (the pass-3 measurement), as ONE packed vector
    [bp..., tp, speak] — per-chunk pulls cost a ~30 ms tunnel round trip
    each, so chunks gather into a single buffer before the host reads."""
    block_len = max(1, int(round(sr * 0.1)))
    kx = _fft_convolve_full(ext, kw_ir, hm + C)[hm:]
    nb = C // block_len
    bp = 2.0 * jnp.mean(
        kx[: nb * block_len].reshape(nb, block_len).astype(jnp.float32) ** 2,
        axis=1,
    )
    gpos = k0 + jnp.arange(-hm, C)
    xv = jnp.where(gpos < n_total, ext, 0.0)
    taps = int(tp_bank.shape[1])
    tp = _tp_window_end_max(xv[hm - (taps - 1):], tp_bank, C, k0, n_total)
    speak = jnp.max(jnp.abs(xv[hm:]))
    return jnp.concatenate([bp, tp[None], speak[None]])


@functools.partial(jax.jit, static_argnames=("sr", "C", "lookahead"))
def _limit_chunk(y_k, y_next_head, pre_gain_lin, limit_lin, w_in,
                 sr: int, C: int, lookahead: int):
    """Levelling limiter on one chunk: lookahead from the next chunk's
    head, carried max-plus release state (fused stage A's prefix limiter)."""
    release = max(1.0, 100.0 * sr / 1000.0)
    x = jnp.concatenate([y_k, y_next_head]) * pre_gain_lin
    needed = jnp.minimum(1.0, limit_lin / jnp.maximum(jnp.abs(x), _EPS))
    target = _sliding_min_lookahead(needed, lookahead)[:C]
    c = -1.0 / release
    v = 1.0 - target
    wv = jnp.log(jnp.maximum(v, jnp.exp(_LOG_FLOOR)))
    w_local = _maxplus_prefix(wv, c)
    steps = (jnp.arange(C, dtype=jnp.float32) + 1.0) * c
    w = jnp.maximum(w_local, w_in + steps)
    u = jnp.exp(jnp.minimum(w, 0.0))
    gain = jnp.minimum(1.0 - u, target)
    return x[:C] * gain, w[-1]


@functools.partial(
    jax.jit, static_argnames=("sr", "C", "declick_enabled", "brick_lookahead"),
)
def _b_chunk(p_left, p_k, p_right, offset_lin, brick_lin, w_in,
             sr: int, C: int, declick_enabled: bool, brick_lookahead: int):
    """Stage-B audio on one chunk: offset gain, halo'd declick, brickwall
    with carried release.  The brickwall lookahead (`tailh`) is sliced
    from z_ext AFTER `_declick_impl` ran over the whole ext, i.e. it is
    declicked on the chunk-LOCAL p90 window grid — differing from the
    neighbour chunk's own declick only at grid seams.  Ceiling safety
    does not rest on that halo: each chunk enforces `needed` over its own
    samples, so the output never exceeds the limit regardless of what the
    lookahead saw."""
    release = max(1.0, 50.0 * sr / 1000.0)
    h = int(p_left.shape[0])
    z_ext = jnp.concatenate([p_left, p_k, p_right]) * offset_lin
    if declick_enabled:
        window = max(8, int(round(55.0 * sr / 1000.0)))
        z_ext = _declick_impl(z_ext, window, 1.7)
    z = z_ext[h : h + C]
    tailh = z_ext[h + C : h + C + brick_lookahead]
    x = jnp.concatenate([z, tailh])
    needed = jnp.minimum(1.0, brick_lin / jnp.maximum(jnp.abs(x), _EPS))
    target = _sliding_min_lookahead(needed, brick_lookahead)[:C]
    c = -1.0 / release
    wv = jnp.log(jnp.maximum(1.0 - target, jnp.exp(_LOG_FLOOR)))
    w_local = _maxplus_prefix(wv, c)
    steps = (jnp.arange(C, dtype=jnp.float32) + 1.0) * c
    w = jnp.maximum(w_local, w_in + steps)
    u = jnp.exp(jnp.minimum(w, 0.0))
    gain = jnp.minimum(1.0 - u, target)
    return z * gain, w[-1]


@functools.partial(jax.jit, static_argnames=("L", "M", "taps", "C"))
def _resample_chunk(left, z_k, right, B, L: int, M: int, taps: int, C: int):
    """Exact chunk of the global polyphase resample: C % M == 0 keeps the
    output phase grid global, so xp = [left taps//2 | chunk | right slack]
    reproduces fused's whole-file `resample` for this output span."""
    n_out = C * L // M
    r_rows = int(B.shape[0])
    nq = -(-n_out // L)
    need = (nq + r_rows) * M
    xp = jnp.concatenate([left, z_k, right])
    xp = xp[:need] if int(xp.shape[0]) >= need else jnp.concatenate(
        [xp, jnp.zeros(need - int(xp.shape[0]), xp.dtype)])
    X = xp.reshape(nq + r_rows, M)
    out = jnp.zeros((nq, L), jnp.float32)
    for r in range(r_rows):
        out = out + jnp.matmul(X[r : r + nq], B[r],
                               precision=jax.lax.Precision.HIGHEST)
    y = out.reshape(-1)[:n_out]
    return jnp.clip(jnp.round(y * 32767.0), -32768.0, 32767.0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("C",))
def _flat_chunk(x_k, state, k0, n_total, gmin, gmax, C: int):
    """Flat-factor runs/counts at the global min/max with cross-chunk run
    continuation; `state` = (min_count, max_count, min_runs, max_runs,
    prev_at_min, prev_at_max) accumulates on device (one pull at the end)."""
    mc, mxc, mr, mxr, prev_at_min, prev_at_max = state
    gpos = k0 + jnp.arange(C)
    valid = gpos < n_total
    at_min = (x_k == gmin) & valid
    at_max = (x_k == gmax) & valid
    mc = mc + jnp.sum(at_min).astype(jnp.float32)
    mxc = mxc + jnp.sum(at_max).astype(jnp.float32)
    mr = mr + jnp.sum(at_min[1:] & ~at_min[:-1]) + (at_min[0] & ~prev_at_min)
    mxr = mxr + jnp.sum(at_max[1:] & ~at_max[:-1]) + (at_max[0] & ~prev_at_max)
    return (mc, mxc, mr, mxr, at_min[-1], at_max[-1])


@jax.jit
def _bp_loudness(bp):
    return _loudness_from_bp(bp)


def _packed_leaf_slots(treedef, shapes, dtypes):
    """(offset, length) of every flat leaf inside a `_pack_all` vector
    (float/bool scalars take one slot, integer scalars two, arrays ravel),
    plus the name->flat-index tree for locating leaves by key."""
    slots, off = [], 0
    for shp, dt in zip(shapes, dtypes):
        if len(shp) == 0:
            ln = 2 if np.issubdtype(dt, np.integer) else 1
        else:
            ln = int(np.prod(shp))
        slots.append((off, ln))
        off += ln
    idx_tree = jax.tree_util.tree_unflatten(treedef, list(range(len(shapes))))
    return slots, idx_tree


@functools.partial(jax.jit, static_argnames=(
    "slot_bp", "slot_tp", "slot_sp", "n_blocks", "target_i", "target_tp_db"))
def _plan_scalars_device(packed, slot_bp, slot_tp, slot_sp, n_blocks,
                         target_i, target_tp_db):
    """The limiter plan traced on DEVICE straight from the packed stage-A
    partials, so the limit/B chunk passes enqueue behind the deess chunks
    with no host sync — the device queue flows chain -> deess -> plan ->
    limit -> B while the host pulls metrics in parallel.  Same shared law
    the whole-file master already traces in-graph (fused.py:421-443), so
    this also closes the f64-host/f32-device plan asymmetry between the
    two master routes."""
    o, ln = slot_bp
    bp = jnp.concatenate([c[o:o + ln] for c in packed])[:n_blocks]
    integrated = _loudness_from_bp(bp)["integrated"]
    tp = jnp.maximum(
        jnp.max(jnp.stack([c[slot_tp[0]] for c in packed])),
        jnp.max(jnp.stack([c[slot_sp[0]] for c in packed])))
    tp_db = 20.0 * jnp.log10(jnp.maximum(tp, 1e-12))
    hp = limiter_plan_scalars(integrated, tp_db, target_i, target_tp_db,
                              xp=jnp)
    pre_lin = jnp.where(hp["needed"],
                        10.0 ** (hp["pre_gain_db"] / 20.0), 1.0)
    limit_lin = jnp.where(hp["needed"],
                          10.0 ** (hp["ceiling_db"] / 20.0), 1e9)
    return pre_lin.astype(jnp.float32), limit_lin.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_blocks", "target_i"))
def _offset_scalar_device(rows, n_blocks, target_i):
    """The linear-mode offset traced on DEVICE from the packed pass-3 rows
    ([bp..., tp, speak] per chunk) — see `_plan_scalars_device`."""
    bp = jnp.concatenate([r[:-2] for r in rows])[:n_blocks]
    integrated = _loudness_from_bp(bp)["integrated"]
    tp = jnp.max(jnp.stack([jnp.maximum(r[-2], r[-1]) for r in rows]))
    m_tp_db = 20.0 * jnp.log10(jnp.maximum(tp, 1e-12))
    _, _, offset_db = linear_mode_scalars(integrated, m_tp_db, target_i,
                                          xp=jnp)
    return (10.0 ** (offset_db / 20.0)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# streamed Pass-1 analysis (overlapped chunk uploads)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("sr", "C", "hm", "w", "il"))
def _analysis_chunk_packed(ext_raw, k0, n_total, kw_ir, tp_bank,
                           sr: int, C: int, hm: int, w: int, il: int):
    """Pass-1 metering partials for one raw chunk: in-graph downmix/f32,
    the stage partials WITH the spectral frame series (the interval engine
    consumes it), plus the 250 ms interval raw stats.  Returns the mono
    chunk (stays device-resident for the master) + one packed vector."""
    from .fused import _to_mono_f32

    mono_ext = _to_mono_f32(ext_raw)
    zero_b = jnp.zeros(2, jnp.int32)
    tree = _stage_partials_tree(
        mono_ext, k0, n_total, zero_b, zero_b, kw_ir, tp_bank,
        sr=sr, C=C, hm=hm, w=w, with_regions=False, spec_series=True,
    )
    x = mono_ext[hm:]
    gpos = k0 + jnp.arange(C)
    xv = jnp.where(gpos < n_total, x, 0.0)
    blocks = xv.reshape(C // il, il)
    tree["iv_sumsq"] = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=1)
    tree["iv_peak"] = jnp.max(jnp.abs(blocks), axis=1)
    flat, _ = jax.tree_util.tree_flatten(tree)
    return x, _pack_all(flat)


@functools.lru_cache(maxsize=16)
def _analysis_chunk_meta(sr: int, C: int, hm: int, w: int, il: int):
    # derive with the interval rows appended (eval_shape on the packer)
    ext = jax.ShapeDtypeStruct((hm + C,), jnp.float32)
    i32 = jax.ShapeDtypeStruct((), jnp.int32)
    kw = jax.ShapeDtypeStruct((4096,), jnp.float32)
    tp = jax.ShapeDtypeStruct((4, 12), jnp.float32)

    def shape_fn(ext_raw, k0, n_total, kw_ir, tp_bank):
        from .fused import _to_mono_f32

        mono_ext = _to_mono_f32(ext_raw)
        zero_b = jnp.zeros(2, jnp.int32)
        tree = _stage_partials_tree(
            mono_ext, k0, n_total, zero_b, zero_b, kw_ir, tp_bank,
            sr=sr, C=C, hm=hm, w=w, with_regions=False, spec_series=True,
        )
        x = mono_ext[hm:]
        blocks = x.reshape(C // il, il)
        tree["iv_sumsq"] = jnp.sum(blocks.astype(jnp.float32) ** 2, axis=1)
        tree["iv_peak"] = jnp.max(jnp.abs(blocks), axis=1)
        return tree

    tree = jax.eval_shape(shape_fn, ext, i32, i32, kw, tp)
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return treedef, [l.shape for l in flat], [np.dtype(l.dtype) for l in flat]


@functools.partial(jax.jit, static_argnames=("k",))
def _concat_chunks(chunks, k: int):
    return jnp.concatenate(chunks)


def analysis_chunk_length(sample_rate: int, target_secs: float = 40.0) -> int:
    """Chunk length aligning the 100 ms block, STFT hop, astats window grid
    and the 250 ms interval grid."""
    block_len = max(1, int(round(sample_rate * 0.1)))
    il = max(1, int(round(0.25 * sample_rate)))
    base = math.lcm(block_len, SPEC_HOP, il)
    k = max(1, int(round(target_secs * sample_rate / base)))
    return base * k


def analysis_streaming_ok(sample_rate: int) -> bool:
    """The chunked analysis needs one chunk to align the 100 ms block, the
    STFT hop AND the 250 ms interval grid — at rates where those rounds
    share no small lcm (e.g. 11025: block 1102, interval 2756) the aligned
    chunk would be hours long and the partial program unbuildable (a
    337 GB allocation, found 2026-08-17).  Callers fall back to the
    whole-file fused analysis at such rates."""
    return analysis_chunk_length(sample_rate) <= 300 * sample_rate


def fused_analysis_streamed(x: np.ndarray, sample_rate: int,
                            chunk_secs: float = 40.0):
    """Pass-1 analysis with OVERLAPPED chunk uploads: the host input is
    device_put as K independent halo-overlapping chunks whose transfers
    run concurrently, and each chunk's partial-metering program starts the
    moment its buffer lands — the remote tunnel's ~1 s whole-file upload
    stops serialising in front of the compute (profiled 2026-08-17: upload
    was 26-40% of the 5-min master's wall).  Same output contract as
    `fused.fused_analysis`: (mono_device, metrics_tree)."""
    x = np.asarray(x)
    n = int(x.shape[-1])
    C, hm, il, w = _analysis_geometry(sample_rate, chunk_secs)
    n_chunks = max(1, -(-n // C))

    def host_ext(k):
        s = k * C - hm
        e = min(n, (k + 1) * C)
        left_pad = max(0, -s)
        body = x[..., max(0, s) : e]
        pad_tail = (hm + C) - left_pad - int(body.shape[-1])
        pads = [(0, 0)] * (x.ndim - 1) + [(left_pad, pad_tail)]
        return np.pad(body, pads)

    return _streamed_analysis_core(
        (host_ext(k) for k in range(n_chunks)), n, sample_rate, C, hm, il, w)


def fused_analysis_from_reader(reader, sample_rate: int,
                               chunk_secs: float = 40.0):
    """Pass-1 analysis straight off a bounded-memory stream reader
    (io/flac.FlacStreamReader): the host never materialises the whole
    file — each chunk decodes, uploads, and frees while the previous
    chunk's partial program runs.  The decoded mono PCM accumulates ONLY
    on device (the master consumes it there)."""
    n = int(reader.total_samples)
    sr = sample_rate
    C, hm, il, w = _analysis_geometry(sr, chunk_secs)
    n_chunks = max(1, -(-n // C))
    raw = getattr(reader, "bit_depth", 0) == 16

    def gen():
        tail = None
        for k in range(n_chunks):
            chunk = reader.read(C, raw_int16=raw) if raw else reader.read(C)
            lead_shape = chunk.shape[:-1]
            if tail is None:
                tail = np.zeros((*lead_shape, hm), chunk.dtype)
            m = int(chunk.shape[-1])
            if m < C:
                pads = [(0, 0)] * (chunk.ndim - 1) + [(0, C - m)]
                chunk = np.pad(chunk, pads)
            ext = np.concatenate([tail, chunk], axis=-1)
            tail = chunk[..., -hm:]
            yield ext

    return _streamed_analysis_core(gen(), n, sr, C, hm, il, w)


def _analysis_geometry(sr: int, chunk_secs: float):
    il = max(1, int(round(0.25 * sr)))
    w = max(2, int(round(0.05 * sr)))
    C = analysis_chunk_length(sr, chunk_secs)
    hm = max(4096, w - 1, SPEC_HOP)
    hm = -(-hm // SPEC_HOP) * SPEC_HOP
    return C, hm, il, w


def _streamed_analysis_core(ext_iter, n: int, sr: int, C: int, hm: int,
                            il: int, w: int):
    from .fused import _constants_for_rate

    _, kw_ir, tp_bank, _ = _constants_for_rate(sr, 80.0, 20500.0)
    n_chunks = max(1, -(-n // C))

    import jax as _jax

    mono_chunks, packed = [], []
    for k, ext in enumerate(ext_iter):
        dev = _jax.device_put(jnp.asarray(ext))
        mc, p = _analysis_chunk_packed(
            dev, jnp.int32(k * C), jnp.int32(n), kw_ir, tp_bank,
            sr=sr, C=C, hm=hm, w=w, il=il)
        mono_chunks.append(mc)
        packed.append(p)

    # gather every chunk's packed vector into ONE device buffer first: a
    # single pull instead of n_chunks ~30 ms round trips
    gathered = np.asarray(_concat_chunks(tuple(packed), k=n_chunks))
    L = gathered.size // n_chunks
    treedef, shapes, dtypes = _analysis_chunk_meta(sr, C, hm, w, il)
    parts = [_unpack_all(gathered[k * L : (k + 1) * L], shapes, dtypes, treedef)
             for k in range(n_chunks)]
    return _combine_analysis_parts(parts, mono_chunks, n, sr, C, il, w)


def _combine_analysis_parts(parts: list[dict], mono_chunks: list, n: int,
                            sr: int, C: int, il: int, w: int):
    """Combine per-chunk Pass-1 partials (unpacked `_analysis_chunk_packed`
    trees, chunk order) + device mono chunks into the
    `fused.fused_analysis` output contract: (mono_device, metrics_tree).
    Shared by the streamed single-file core above and the batched
    back-catalogue analysis (one vmapped program, per-file rows)."""
    n_chunks = len(parts)
    block_len = max(1, int(round(sr * 0.1)))
    n_blocks = max(1, n // block_len)
    loud = _combine_loudness([p["bp"] for p in parts], n_blocks,
                             [float(p["tp_max"]) for p in parts],
                             [float(p["speak_max"]) for p in parts])

    ast = _combine_astats(parts, n, w)
    ast = _run_flat_over(mono_chunks, ast, n, C)

    # spectral frame series: valid frames in chunk order ARE the global
    # frame order (window-END assignment keeps starts consecutive)
    n_sf = max(1, 1 + (max(n, SPEC_WIN) - SPEC_WIN) // SPEC_HOP)
    spec_keys = parts[0]["spec_frames"].keys()
    series = {}
    for key in spec_keys:
        rows = [np.asarray(p["spec_frames"][key])[
            np.asarray(p["spec_frame_valid"]).astype(bool)] for p in parts]
        series[key] = np.concatenate(rows)[:n_sf]

    n_intervals = max(1, -(-n // il))
    iv_sumsq = np.concatenate([np.asarray(p["iv_sumsq"]) for p in parts])[:n_intervals]
    iv_peak = np.concatenate([np.asarray(p["iv_peak"]) for p in parts])[:n_intervals]

    mono = _concat_chunks(tuple(mono_chunks), k=n_chunks)[:n]
    out = {
        "loudness": loud,
        "astats": ast,
        "spectral": series,
        "iv_sumsq": iv_sumsq,
        "iv_peak": iv_peak,
    }
    return mono, out


def _run_flat_over(chunks, ast: dict, n: int, C: int) -> dict:
    gmin, gmax = float(ast["min_level"]), float(ast["max_level"])
    state = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0),
             jnp.float32(0.0), jnp.asarray(False), jnp.asarray(False))
    for k in range(len(chunks)):
        state = _flat_chunk(chunks[k], state, jnp.int32(k * C),
                            jnp.int32(n), jnp.float32(gmin),
                            jnp.float32(gmax), C=C)
    ast["min_count"] = np.float32(float(state[0]))
    ast["max_count"] = np.float32(float(state[1]))
    ast["min_runs"] = np.float32(max(1.0, float(state[2])))
    ast["max_runs"] = np.float32(max(1.0, float(state[3])))
    return ast


# ---------------------------------------------------------------------------
# host-side combination
# ---------------------------------------------------------------------------

def _combine_astats(parts: list[dict], n: int, w: int) -> dict:
    """Combine per-chunk stage partials into the `_astats_core` output-dict
    shape `assemble_astats` consumes (flat-factor fields patched in later)."""
    n_f = float(n)
    sum_sq = float(sum(p["sum_sq"] for p in parts))
    total = float(sum(p["sum"] for p in parts))
    d_count = max(1.0, float(sum(p["d_count"] for p in parts)))
    # float64: per-bin counts stay integer-exact past float32's 2^24 on
    # hour-scale files
    hist = np.sum(np.asarray([p["hist"] for p in parts], dtype=np.float64),
                  axis=0)
    pdist = hist / max(1.0, hist.sum())
    ent = float(-np.sum(np.where(pdist > 0, pdist * np.log2(np.maximum(pdist, 1e-30)), 0.0))
                / math.log2(_ENTROPY_BINS))
    mask = 0
    for p in parts:
        mask |= int(p["bit_mask"])
    min_level = min(float(p["min_level"]) for p in parts)
    max_level = max(float(p["max_level"]) for p in parts)
    return dict(
        rms_lin=np.float32(math.sqrt(sum_sq / n_f)),
        peak_lin=np.float32(max(-min_level, max_level)),
        min_level=np.float32(min_level),
        max_level=np.float32(max_level),
        dc=np.float32(total / n_f),
        max_diff=np.float32(max(float(p["d_max"]) for p in parts)),
        min_diff=np.float32(min(float(p["d_min"]) for p in parts)),
        mean_diff=np.float32(sum(float(p["d_sum"]) for p in parts) / d_count),
        rms_diff=np.float32(math.sqrt(sum(float(p["d_sumsq"]) for p in parts) / d_count)),
        zc=np.float32(sum(float(p["zc"]) for p in parts)),
        min_nonzero=np.float32(min(float(p["min_nonzero"]) for p in parts)),
        min_count=np.float32(0.0), max_count=np.float32(0.0),
        min_runs=np.float32(1.0), max_runs=np.float32(1.0),
        entropy=np.float32(ent),
        rms_peak=np.float32(math.sqrt(max(0.0, max(float(p["win_sumsq_max"]) for p in parts)) / w)),
        rms_trough=np.float32(math.sqrt(max(0.0, min(float(p["win_sumsq_min"]) for p in parts)) / w)),
        noise_floor_lin=np.float32(min(float(p["win_peak_min"]) for p in parts)),
        bit_mask=np.uint32(mask),
    )


def _combine_loudness(bp_parts, n_blocks, tp_parts, sp_parts):
    bp = np.concatenate(bp_parts)[:n_blocks].astype(np.float32)
    loud = {k: np.asarray(v) for k, v in _bp_loudness(jnp.asarray(bp)).items()}
    loud["true_peak"] = np.float32(max(max(tp_parts), max(sp_parts)))
    loud["sample_peak"] = np.float32(max(sp_parts))
    return loud


def _combine_region(parts, tag, loud, bounds, sr):
    sumsq = sum(float(p[f"r_{tag}_sumsq"]) for p in parts)
    count = max(1, int(sum(int(p[f"r_{tag}_count"]) for p in parts)))
    peak = max(float(p[f"r_{tag}_peak"]) for p in parts)
    tp = max(float(p[f"r_{tag}_tp"]) for p in parts)
    spec_keys = parts[0][f"r_{tag}_spec"].keys()
    scount = max(1, int(sum(int(p[f"r_{tag}_spec_count"]) for p in parts)))
    spec = {f"spec_{k}": np.float32(
        sum(float(p[f"r_{tag}_spec"][k]) for p in parts) / scount)
        for k in spec_keys}
    block_len = max(1, int(round(sr * 0.1)))
    ml = np.asarray(loud["momentary"], dtype=np.float64)
    m_end = (np.arange(ml.size) + 4) * block_len
    m_mask = (m_end >= bounds[0]) & (m_end < bounds[1])
    mom = float(ml[m_mask].mean()) if m_mask.any() else 0.0
    return {
        "rms": np.float32(math.sqrt(sumsq / count)),
        "peak": np.float32(peak),
        "tp": np.float32(tp),
        "momentary": np.float32(mom),
        **spec,
    }


# ---------------------------------------------------------------------------
# the driver
# ---------------------------------------------------------------------------

# Fine-grained host walls of the last fused_master_chunked call, for
# scripts/profile_master.py --chunked (filled unconditionally: a dozen
# perf_counter() reads per ~25 s run).  Keys mark where the host blocked:
# *_loop = dispatch loops (async enqueue + trace), gather_* = blocking
# metric pulls, flat_* = the carried-state astats min/max pass.
LAST_PHASE_WALLS: dict = {}


def fused_master_chunked(
    x, sample_rate: int, cfg: FilterConfig, measurements,
    progress=None, chunk_secs: float = 240.0, on_filtered_levels=None,
    on_limiter_plan=None,
) -> tuple[tuple, int, dict, dict]:
    """Chunked fused pass-2/3/4 master.  Same signature/contract as
    `fused.fused_master`; use for files past the `should_chunk` horizon."""
    t0 = time.perf_counter()
    _pw = LAST_PHASE_WALLS
    _pw.clear()
    _last = [t0]

    def _mark(key):
        now = time.perf_counter()
        _pw[key] = _pw.get(key, 0.0) + (now - _last[0])
        _last[0] = now
    m = measurements
    nr = cfg.noise_reduction
    shape = np.zeros(15, dtype=np.float32)
    if nr.afftdn_noise_type == "custom" and nr.afftdn_band_noise:
        shape = np.asarray(nr.afftdn_band_noise, dtype=np.float32)
    nf = nr.afftdn_noise_floor if nr.afftdn_noise_floor != 0.0 else -50.0

    def region_bounds(region):
        if region is None:
            return np.zeros(2, dtype=np.int32)
        return np.asarray([int(round(region.start * sample_rate)),
                           int(round(region.end * sample_rate))], np.int32)

    noise_b = jnp.asarray(region_bounds(m.vad.noise_region if m else None))
    speech_b = jnp.asarray(region_bounds(
        m.vad.speech_profile.region if (m and m.vad.speech_profile) else None))

    chain_ir, kw_ir, tp_bank, deess_k = _constants_for_rate(
        sample_rate, cfg.rumble_highpass.frequency, cfg.bandlimit_lowpass.frequency
    )
    sr = sample_rate
    out_rate = (cfg.resample.sample_rate
                if cfg.resample.enabled and cfg.resample.sample_rate != sr
                else sr)
    nlm_enabled = nr.enabled
    afftdn_enabled = nr.enabled and nr.afftdn_enabled
    declick_enabled = cfg.adeclick.enabled
    target_i = float(cfg.loudnorm.target_i)
    target_tp = float(cfg.loudnorm.target_tp)

    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    C = chunk_length(sr, out_rate, chunk_secs)
    n_chunks = max(1, -(-n // C))
    block_len = max(1, int(round(sr * 0.1)))
    n_blocks = max(1, n // block_len)
    w = max(2, int(round(0.05 * sr)))

    # chain halos: causal chain FIR (8191) + NLM extent + afftdn win, left;
    # NLM extent + afftdn win + margin, right — all multiples of the hop
    hl = 16384
    hr = 4096
    padded = jnp.concatenate(
        [jnp.zeros(hl, jnp.float32), x,
         jnp.zeros(hr + n_chunks * C - n, jnp.float32)]
    )

    def report(frac):
        # progress MUST propagate exceptions: the CLI pool cancels a file
        # by raising InterruptedError from its progress callback
        # (cli/pool.py progress(); ref: ctx-per-frame cancellation,
        # frame_processor.go:116) — swallowing it here would leave a
        # cancelled hour-scale master running to completion
        if progress is not None:
            progress(frac)

    # ---- PASS CHAIN ----
    cchunks = []
    envg = jnp.float32(0.0)
    envc = jnp.float32(0.0)
    gp = (jnp.float32(cfg.speech_gate.threshold),
          jnp.float32(cfg.speech_gate.ratio),
          jnp.float32(cfg.speech_gate.range),
          jnp.float32(10.0 ** (cfg.levelling_compressor.threshold / 20.0)))
    for k in range(n_chunks):
        ext = _slice_ext(padded, jnp.int32(k * C), hl, C, hr)
        c_k, envg, envc = _chain_chunk(
            ext, envg, envc, *gp, jnp.float32(nf),
            jnp.float32(nr.afftdn_noise_reduction), jnp.asarray(shape),
            chain_ir, sr=sr, C=C, hl=hl, hr=hr,
            nlm_enabled=nlm_enabled, afftdn_enabled=afftdn_enabled,
        )
        cchunks.append(c_k)
        report(0.30 * (k + 1) / n_chunks)
    _mark("chain_loop")

    # ---- PASS DEESS + filtered metering ----
    delay = (int(deess_k.shape[0]) - 1) // 2
    hm = max(4096, w - 1, SPEC_WIN)
    hm = -(-hm // SPEC_HOP) * SPEC_HOP          # frame-grid aligned halo
    zeros_delay = jnp.zeros(delay, jnp.float32)
    ychunks, packed_f = [], []
    envhf = jnp.float32(0.0)
    envall = jnp.float32(0.0)
    d_i = jnp.float32(cfg.deesser.intensity if cfg.deesser.enabled else 0.0)
    for k in range(n_chunks):
        left = cchunks[k - 1][-delay:] if k > 0 else zeros_delay
        right = cchunks[k + 1][:delay] if k + 1 < n_chunks else zeros_delay
        y_k, envhf, envall = _deess_chunk(
            left, cchunks[k], right, envhf, envall, d_i, deess_k, sr=sr, C=C)
        ychunks.append(y_k)
        yl = ychunks[k - 1][-hm:] if k > 0 else jnp.zeros(hm, jnp.float32)
        packed_f.append(_stage_partials_packed(
            jnp.concatenate([yl, y_k]), jnp.int32(k * C), jnp.int32(n),
            noise_b, speech_b, kw_ir, tp_bank, sr=sr, C=C, hm=hm, w=w))
        report(0.30 + 0.25 * (k + 1) / n_chunks)
    _mark("deess_loop")
    cchunks = None

    # ---- DEVICE-side plan: the limit chunks take their scalars from a
    # traced plan program over the packed partials, so the limit/B passes
    # enqueue with NO host sync and the device queue flows
    # chain -> deess -> plan -> limit -> offset -> B while the host pulls
    # metrics in parallel (measured 2026-08-19: plan_host + offset_host +
    # the flat_f exposure were ~0.6 s of device-idle wall on the 45-min
    # workload) ----
    treedef, shapes, dtypes = _stage_partials_meta(sr, C, hm, w)
    slots, idx_tree = _packed_leaf_slots(treedef, shapes, dtypes)
    target_tp_db = target_tp
    pre_lin, limit_lin = _plan_scalars_device(
        tuple(packed_f), slots[idx_tree["bp"]], slots[idx_tree["tp_max"]],
        slots[idx_tree["speak_max"]], n_blocks, target_i, target_tp_db)
    _mark("plan_dev")

    # ---- PASS LIMIT + pass-3 measurement ----
    t1 = time.perf_counter()
    lookahead = max(1, int(round(5.0 * sr / 1000.0)))
    w_carry = jnp.float32(-3.0e38)
    pchunks, p3 = [], []
    zeros_la = jnp.zeros(lookahead, jnp.float32)
    for k in range(n_chunks):
        head = ychunks[k + 1][:lookahead] if k + 1 < n_chunks else zeros_la
        p_k, w_carry = _limit_chunk(ychunks[k], head, pre_lin, limit_lin,
                                    w_carry, sr=sr, C=C, lookahead=lookahead)
        pchunks.append(p_k)
        pl = pchunks[k - 1][-4096:] if k > 0 else jnp.zeros(4096, jnp.float32)
        p3.append(_loudness_partials(
            jnp.concatenate([pl, p_k]), jnp.int32(k * C), jnp.int32(n),
            kw_ir, tp_bank, sr=sr, C=C, hm=4096))
        report(0.55 + 0.15 * (k + 1) / n_chunks)
    _mark("limit_loop")

    # ---- DEVICE-side linear-mode offset (same on-device law) ----
    offset_lin = _offset_scalar_device(tuple(p3), n_blocks, target_i)
    _mark("offset_dev")

    # ---- stage-A metrics: ONE gathered pull for all chunks' packed
    # partials (per-chunk pulls cost a ~30 ms tunnel round trip each).
    # Issued while the device grinds the limit pass and BEFORE the
    # delivery pulls exist, so the small transfer rides the wire first ----
    gathered_f = np.asarray(_concat_chunks(tuple(packed_f), k=n_chunks))
    _mark("gather_f")
    Lp = gathered_f.size // n_chunks
    parts_f = [_unpack_all(gathered_f[k * Lp : (k + 1) * Lp], shapes, dtypes,
                           treedef) for k in range(n_chunks)]
    t_stage_a = time.perf_counter() - t0

    # host copies of the plan (metrics dict / meter anchor / reports):
    # the same shared scalar law, xp=np over the pulled metrics
    loud_f = _combine_loudness([p["bp"] for p in parts_f], n_blocks,
                               [float(p["tp_max"]) for p in parts_f],
                               [float(p["speak_max"]) for p in parts_f])
    measured_i = float(loud_f["integrated"])
    measured_tp_db = 20.0 * math.log10(max(float(loud_f["true_peak"]), 1e-12))
    hp = limiter_plan_scalars(measured_i, measured_tp_db, target_i,
                              target_tp_db, xp=np)
    needed = bool(hp["needed"])
    clamped = bool(hp["clamped"])
    pre_gain_db = float(hp["pre_gain_db"])
    ceiling_db = float(hp["ceiling_db"])
    gain_required = float(hp["gain_db"])
    _mark("plan_host")
    if on_limiter_plan is not None:
        # the Pass-4 limiter snapshot the moment the plan resolves, so the
        # TUI's Limiter row lights DURING processing (ref: the
        # LimiterProgressMsg path, WithLimiterProgress)
        try:
            on_limiter_plan(needed, ceiling_db if needed else 0.0)
        except Exception:
            pass

    # ---- PASS B + final metering + delivery ----
    g = math.gcd(sr, out_rate)
    L, M = out_rate // g, sr // g
    B, taps = (None, 0)
    if out_rate != sr:
        B_np, taps = _banded_bank(L, M)
        B = jnp.asarray(B_np)
    brick_lin = jnp.float32(10.0 ** ((target_tp_db - BRICKWALL_TRUE_PEAK_HEADROOM_DB) / 20.0))
    b_look = max(1, int(round(sr / 1000.0)))
    hb = max(8, int(round(55.0 * sr / 1000.0)))
    w_carry = jnp.float32(-3.0e38)
    zchunks, packed_z, out_chunks = [], [], []
    zeros_hb = jnp.zeros(hb, jnp.float32)
    half = taps // 2 if out_rate != sr else 0
    slack = taps + 2 * M if out_rate != sr else 0

    def emit_delivery(j):
        # delivery for chunk j (one behind the B stream when resampling —
        # it needs the right neighbour); the host pull starts IMMEDIATELY
        # so the multi-MB downlink overlaps the remaining B/partials
        # compute instead of queueing after it (the exposed tail is then
        # only the final chunk's pull)
        if out_rate != sr:
            left = zchunks[j - 1][-half:] if j > 0 else jnp.zeros(half, jnp.float32)
            right = (zchunks[j + 1][:slack] if j + 1 < n_chunks
                     else jnp.zeros(slack, jnp.float32))
            c = _resample_chunk(left, zchunks[j], right, B,
                                L=L, M=M, taps=taps, C=C)
        else:
            c = jnp.clip(jnp.round(zchunks[j] * 32767.0),
                         -32768.0, 32767.0).astype(jnp.int16)
        c.copy_to_host_async()
        out_chunks.append(c)

    for k in range(n_chunks):
        left = pchunks[k - 1][-hb:] if k > 0 else zeros_hb
        right = pchunks[k + 1][:hb] if k + 1 < n_chunks else zeros_hb
        z_k, w_carry = _b_chunk(left, pchunks[k], right, offset_lin, brick_lin,
                                w_carry, sr=sr, C=C,
                                declick_enabled=declick_enabled,
                                brick_lookahead=b_look)
        zchunks.append(z_k)
        zl = zchunks[k - 1][-hm:] if k > 0 else jnp.zeros(hm, jnp.float32)
        packed_z.append(_stage_partials_packed(
            jnp.concatenate([zl, z_k]), jnp.int32(k * C), jnp.int32(n),
            noise_b, speech_b, kw_ir, tp_bank, sr=sr, C=C, hm=hm, w=w))
        if k >= 1:
            emit_delivery(k - 1)
        report(0.70 + 0.20 * (k + 1) / n_chunks)
    emit_delivery(n_chunks - 1)
    _mark("b_loop")
    n_out = n * L // M if out_rate != sr else n

    # ---- filtered astats (+ flat pass over the live y stream; its device
    # dispatches queue behind the B chunks so the deliveries lead) ----
    ast_f = _run_flat_over(ychunks, _combine_astats(parts_f, n, w), n, C)
    _mark("flat_f")
    ychunks = None

    # ---- pass-3 host metrics (reports/diagnostics; the B chunks already
    # took the offset from the traced device law) ----
    gathered_p3 = np.asarray(_concat_chunks(tuple(p3), k=n_chunks))
    _mark("gather_p3")
    L3 = gathered_p3.size // n_chunks
    rows3 = [gathered_p3[k * L3 : (k + 1) * L3] for k in range(n_chunks)]
    loud_m = _combine_loudness([r[:-2] for r in rows3], n_blocks,
                               [float(r[-2]) for r in rows3],
                               [float(r[-1]) for r in rows3])
    m_i = float(loud_m["integrated"])
    m_tp_db = 20.0 * math.log10(max(float(loud_m["true_peak"]), 1e-12))
    _, effective_i, offset_db = linear_mode_scalars(m_i, m_tp_db, target_i, xp=np)
    effective_i = float(effective_i)
    offset_db = float(offset_db)
    _mark("offset_host")

    # truthful VU meter for the remaining delivery stream (the downlink is
    # most of the residual wall): filtered momentary anchored at the FINAL
    # encode level — pre-limiter gain (when the plan engaged) + the
    # linear-mode offset, the same convention as fused_master's emission so
    # the meter reads the same whichever master route a file takes
    if on_filtered_levels is not None:
        try:
            on_filtered_levels(
                np.asarray(loud_f["momentary"], dtype=np.float64)
                + offset_db + (pre_gain_db if needed else 0.0),
                0.1,
            )
        except Exception:
            pass

    gathered_z = np.asarray(_concat_chunks(tuple(packed_z), k=n_chunks))
    _mark("gather_z")
    parts_z = [_unpack_all(gathered_z[k * Lp : (k + 1) * Lp], shapes, dtypes,
                           treedef) for k in range(n_chunks)]

    loud_z = _combine_loudness([p["bp"] for p in parts_z], n_blocks,
                               [float(p["tp_max"]) for p in parts_z],
                               [float(p["speak_max"]) for p in parts_z])

    # ---- FLAT pass over z (needs the combined global min/max) ----
    ast_z = _run_flat_over(zchunks, _combine_astats(parts_z, n, w), n, C)
    _mark("flat_z")

    def spec_means(parts):
        cnt = max(1, int(sum(int(p["spec_count"]) for p in parts)))
        keys = parts[0]["spec_sums"].keys()
        return {k: np.float32(sum(float(p["spec_sums"][k]) for p in parts) / cnt)
                for k in keys}

    nb_np = np.asarray(noise_b)
    sb_np = np.asarray(speech_b)
    metrics = {
        "filtered": loud_f,
        "filtered_astats": ast_f,
        "filtered_spectral": spec_means(parts_f),
        "pass3": loud_m,
        "final": loud_z,
        "final_astats": ast_z,
        "final_spectral": spec_means(parts_z),
        "regions": {
            "filtered_noise": _combine_region(parts_f, "noise", loud_f, nb_np, sr),
            "filtered_speech": _combine_region(parts_f, "speech", loud_f, sb_np, sr),
            "final_noise": _combine_region(parts_z, "noise", loud_z, nb_np, sr),
            "final_speech": _combine_region(parts_z, "speech", loud_z, sb_np, sr),
        },
        "plan": {
            "needed": np.bool_(needed),
            "clamped": np.bool_(clamped),
            "ceiling_db": np.float32(ceiling_db),
            "pre_gain_db": np.float32(pre_gain_db),
            "gain_db": np.float32(gain_required),
            "measured_i": np.float32(m_i),
            "measured_tp_db": np.float32(m_tp_db),
            "effective_i": np.float32(effective_i),
            "offset_db": np.float32(offset_db),
        },
    }

    # delivery pulls are already in flight (emit_delivery); trim the pad
    # tail off the final chunk
    full = np.concatenate([np.asarray(c) for c in out_chunks])[:n_out]
    _mark("final_pull")
    out_final = (full,)

    t_stage_b = time.perf_counter() - t1
    report(1.0)
    return out_final, out_rate, metrics, {
        "stage_a": t_stage_a, "stage_b": t_stage_b,
    }

"""Non-local-means time-domain denoiser (anlmdn equivalent).

TPU-native replacement for FFmpeg's `anlmdn` (ref spec:
internal/processor/filters.go:804-825 `anlmdn=s=0.00001:p=0.0060:r=0.0020:
m=3`; constants filters.go:95-100 — the production settings are the MINIMUM
strength with a tight research radius, validated by the reference's matrix
spike as ~transparent cleanup).

TPU-first formulation: the patch distance
    dist(t, d) = sum_{k in patch} (x[t+k] - x[t+d+k])^2
is, per offset d, a box filter over the elementwise series
(x - shift(x, d))^2.  Box filters become two-level blocked cumsums, so the
whole O(T * R) distance field is batched vector work: R = research offsets
as a leading batch axis, T along the lane axis — no gather-per-sample, no
sequential loop.  Weights w = exp(-max(0, dist - 2*sigma^2*P) / h^2) follow
the classic NLM form; the weighted average runs over the same batched axis.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def _box_filter_same(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over [t-radius, t+radius] with zero padding, via cumsum (f32 is
    fine at these patch lengths)."""
    w = 2 * radius + 1
    pad = jnp.concatenate([jnp.zeros(radius + 1, x.dtype), x, jnp.zeros(radius, x.dtype)])
    c = jnp.cumsum(pad)
    return c[w:] - c[:-w]


@functools.lru_cache(maxsize=8)
def _band_matrix(w: int) -> np.ndarray:
    """(2w, w) ones-band: column i covers rows [i, i+w)."""
    j = np.arange(2 * w)[:, None]
    i = np.arange(w)[None, :]
    return ((i <= j) & (j < i + w)).astype(np.float32)


def _sliding_sum_matmul(x: jnp.ndarray, w: int,
                        out_dtype=jnp.float32) -> jnp.ndarray:
    """Valid sliding-window sum along the last axis (leading axes batch) as
    a banded matmul: frames of 2w consecutive samples x (2w, w) ones-band.

    A flat `jnp.cumsum` along a 512k-sample axis lowers to ~log2(n)
    full-array passes (the NLM block's distance filter spent ~0.3 s there,
    profiled 2026-08-16); the banded matmul is ONE pass whose reduction
    runs on the MXU.  `out_dtype=bfloat16` keeps the f32 MXU accumulation
    and rounds only the STORE — the NLM distance path uses it to halve the
    dist field's HBM write+re-read (204.4 -> 190.1 ms on the 300 s fixture,
    output bit-identical on device; scripts/bench_nlm_r5.py 2026-08-19)."""
    *lead, n = x.shape
    n_out = n - w + 1
    n_frames = -(-n_out // w)
    pad_to = n_frames * w + w
    if pad_to != n:
        xp = jnp.zeros((*lead, pad_to), x.dtype).at[..., :n].set(x)
    else:
        xp = x
    blocks = xp.reshape(*lead, n_frames + 1, w)
    frames = jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)
    band = jnp.asarray(_band_matrix(w))
    sums = jax.lax.dot_general(
        frames, band,
        dimension_numbers=(((frames.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype,
        # DEFAULT (single-pass bf16): this sum only feeds the similarity
        # weights exp(-dist/h^2), not the delivery audio — the weighted
        # average over `mid` below stays exact f32 vector work.  The NLM
        # block scan was HALF of stage A's device time at HIGH (3-pass);
        # bf16's ~0.4% distance error moves near-transparent NLM weights
        # imperceptibly (profiled 2026-08-17, while.36 350 ms -> MXU 1-pass).
        precision=jax.lax.Precision.DEFAULT,
    )
    return sums.reshape(*lead, n_frames * w)[..., :n_out]


# 512k blocks: the body's work per block (~n_offsets * block vector ops) is
# large enough to amortise the ~1 ms/iteration TPU while-loop dispatch
# overhead (28 iterations for a 5-min file), while the (n_offsets,
# block + 2P) intermediates stay ~200 MB — comfortably in HBM.  Raising to
# 2M pushed them to ~800 MB and XLA broke the block body into serialized
# windowed while-loops with dynamic-update-slice staging (stage A 612 ms
# -> 1862 ms, traced 2026-08-17) — do NOT enlarge without a trace.
_NLM_BLOCK = 524288

# Symmetric-distance formulation (default ON; JT_NLM_SYMMETRIC=0 reverts to
# the direct form): the patch-distance field is computed for non-negative
# offsets only and the negative rows are shifted READS of it —
# D(t, -d) = D(t-d, +d) — halving the diff^2 traffic and the banded-matmul
# MXU passes.  History: measured a WASH ungrouped (2026-08-18 — full-width
# (97, block) fields dominated both forms), then a clear win once the
# positive rows compute in ~17-offset GROUPS with bf16 stores: 190.0 ->
# 167.6 ms on the 300 s fixture, output bit-identical on device
# (scripts/bench_nlm_r5.py, 2026-08-19).
_NLM_SYMMETRIC = os.environ.get("JT_NLM_SYMMETRIC", "1") != "0"

# group widths for the symmetric path, swept on the real chip
# (scripts/bench_nlm_r5.py 2026-08-19: pos/out 17/14 -> 166.8 ms,
# 25/14 -> 175.9, 49/14 -> 173.1, 17/20 -> 166.4, 25/25 -> 162.8):
# 25 positive-offset rows per distance-matmul piece, 25 offsets per
# weight-accumulation group
_NLM_POS_GROUP = 25
_NLM_SYM_OUT_GROUP = 25


def _nlm_core(
    x: jnp.ndarray,
    h2: jnp.ndarray,
    patch_radius: int,
    research_radius: int,
    block: int | None = None,
) -> jnp.ndarray:
    """`lax.scan` over 512k time blocks; within a block ALL research offsets
    are static slices of one halo'd window, so each block is one pass of
    batched (n_offsets, block) vector work.

    The previous offsets-scan ran a full-signal cumsum per offset — ~97
    log-depth passes over the whole file (~2.3 s of the 300 s fixture's
    device time) — and the per-offset `roll` kept the whole signal hot in
    HBM.  Blocked, the distance cumsums run over 66k-sample windows and
    the whole op is one streaming pass; program size is O(n_offsets), not
    O(n_offsets * log n)."""
    n = int(x.shape[0])
    P, R = patch_radius, research_radius
    halo = (P + 2 * R) if _NLM_SYMMETRIC else (P + R)
    # callers that vmap this over a file batch pass a smaller block so the
    # (batch, n_offsets, block) intermediates stay within HBM
    block = block or _NLM_BLOCK
    m = -(-n // block)
    total = m * block
    xp = jnp.zeros(total + 2 * halo, x.dtype).at[halo : halo + n].set(x)
    width = block + 2 * P
    w_box = 2 * P + 1
    offs = np.arange(-R, R + 1)

    def _distance_field_pos(win):
        """The non-negative-offset distance rows over the widened range
        [s-R, s+block+R), computed in ~17-offset groups with bf16 stores.
        The full field follows from D(t, -d) = D(t-d, +d): negative rows
        are shifted reads of these."""
        ext = block + 2 * R + 2 * P                       # [s-R-P, s+block+R+P)
        centre = win[R : R + ext]
        pieces = []
        for g0 in range(0, R + 1, _NLM_POS_GROUP):
            gs = range(g0, min(R + 1, g0 + _NLM_POS_GROUP))
            shifted_pos = jnp.stack([win[R + d : R + d + ext] for d in gs])
            # bf16 diff^2 + bf16 dist STORE, exactly as the direct grouped
            # path — both formulations quantise the field identically
            diff2 = ((centre[None, :] - shifted_pos) ** 2).astype(jnp.bfloat16)
            pieces.append(_sliding_sum_matmul(diff2, w_box, jnp.bfloat16))
        return jnp.concatenate(pieces, axis=0)            # (R+1, block + 2R)

    # offset GROUPS: the (n_offs, block) dist/weight/mid fields never
    # materialise at full offset width — an unrolled loop over ~14-offset
    # groups keeps (G, block) intermediates and accumulates (num, den)
    # running sums.  Measured 2026-08-19 (scripts/bench_nlm_variants.py,
    # real chip, 300 s fixture): 226.6 -> 200.1 ms with diff^2 stored
    # bf16, max|err| = 0 vs the ungrouped form (the banded matmul already
    # truncates operands to bf16 under DEFAULT precision, so the bf16
    # store changes no bits); 13 groups of ~7 regressed to 326 ms (groups
    # too small for the MXU) — keep groups >= ~14 offsets.
    n_groups = max(1, (len(offs) + 13) // 14)
    groups = np.array_split(offs, n_groups)
    og = _NLM_SYM_OUT_GROUP
    sym_groups = np.array_split(offs, max(1, (len(offs) + og - 1) // og))

    def body(_, i):
        s = i * block
        win = jax.lax.dynamic_slice(xp, (s,), (block + 2 * halo,))
        t_global = s + jnp.arange(block)
        if _NLM_SYMMETRIC:
            dist_pos = _distance_field_pos(win)
            num = jnp.zeros(block, jnp.float32)
            den = jnp.zeros(block, jnp.float32)
            for goffs in sym_groups:
                rows = [
                    dist_pos[d, R : R + block]
                    if d >= 0
                    else dist_pos[-d, R + d : R + d + block]
                    for d in goffs
                ]
                dist = jnp.stack(rows)
                mid = jnp.stack([win[halo + d : halo + d + block] for d in goffs])
                valid = ((t_global[None, :] + goffs[:, None]) >= 0) & (
                    (t_global[None, :] + goffs[:, None]) < n
                )
                w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
                num = num + jnp.sum(w * mid, axis=0)
                den = den + jnp.sum(w, axis=0)
            return None, num / jnp.maximum(den, 1e-12)
        centre = win[R : R + width]                       # [s-P, s+block+P)
        num = jnp.zeros(block, jnp.float32)
        den = jnp.zeros(block, jnp.float32)
        for goffs in groups:
            shifted = jnp.stack([win[R + d : R + d + width] for d in goffs])
            diff2 = ((centre[None, :] - shifted) ** 2).astype(jnp.bfloat16)
            # bf16 STORE of the f32-accumulated dist field: halves its HBM
            # write + re-read; exp(-dist/h2) upcasts right back.  Measured
            # 204.4 -> 190.1 ms, output bit-identical (bench_nlm_r5.py).
            dist = _sliding_sum_matmul(diff2, w_box, jnp.bfloat16)  # (G, block)
            valid = ((t_global[None, :] + goffs[:, None]) >= 0) & (
                (t_global[None, :] + goffs[:, None]) < n
            )
            w = jnp.exp(-dist.astype(jnp.float32) / h2) * valid
            mid = shifted[:, P : P + block]
            num = num + jnp.sum(w * mid, axis=0)
            den = den + jnp.sum(w, axis=0)
        return None, num / jnp.maximum(den, 1e-12)

    _, ys = jax.lax.scan(body, None, jnp.arange(m))
    return ys.reshape(-1)[:n]


@functools.partial(jax.jit, static_argnames=("patch_radius", "research_radius"))
def _nlm_impl(
    x: jnp.ndarray,
    h2: jnp.ndarray,
    patch_radius: int,
    research_radius: int,
) -> jnp.ndarray:
    return _nlm_core(x, h2, patch_radius, research_radius)


def apply_nlm(
    x,
    sample_rate: int,
    strength: float = 0.00001,
    patch_sec: float = 0.0060,
    research_sec: float = 0.0020,
    smooth: float = 3.0,
) -> jnp.ndarray:
    """NLM-denoise `x`.  Parameters mirror the anlmdn options: `patch_sec` /
    `research_sec` are full window durations; `strength` scales the weight
    bandwidth (the reference's s=1e-5 minimum is near-transparent); `smooth`
    sharpens the weight falloff (the reference's m=3 `m_strict`)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    patch_radius = max(1, int(round(patch_sec * sample_rate / 2.0)))
    research_radius = max(1, int(round(research_sec * sample_rate / 2.0)))
    # anlmdn-style bandwidth: h scales with strength on a wide log range
    # (s=1e-5 -> h ~ 0.1 -> only near-identical patches average, i.e. the
    # reference's near-transparent production setting; s ~ 1e-2 -> broad
    # averaging).  `smooth` sharpens the falloff (m_strict=3).
    h = max(strength, 1e-7) * 10000.0
    h2 = jnp.float32(h * h / max(smooth, 1.0))
    return _nlm_impl(x, h2, patch_radius, research_radius)

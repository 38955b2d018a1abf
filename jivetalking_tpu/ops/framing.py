"""Gather/scatter-free STFT framing and overlap-add.

TPU scatters serialise (XLA lowers colliding scatter-adds to sorted or
sequential updates) and giant gathers burn HBM bandwidth on index traffic.
When `hop` divides `win` — every STFT in this framework (1024/256 afftdn,
2048/1024 aspectralstats) — framing and OLA decompose into `win//hop`
*phases*, each a contiguous reshape:

  frame i (start i*hop) with i ≡ p (mod k), k = win//hop, starts at
  p*hop + (i//k)*win — so phase p's frames tile the signal contiguously
  with stride exactly `win`: a reshape, no gather.

OLA is the transpose: each phase's output frames concatenate back to a
contiguous strip added at offset p*hop — k dynamic-slice adds, no scatter.

Parity with the gather/scatter formulation is exact (float-sum order
within one output sample is unchanged: each sample still receives k
window contributions added in phase order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_signal(xp: jnp.ndarray, n_frames: int, win: int, hop: int) -> jnp.ndarray:
    """(n_frames, win) frames of `xp`, frame i starting at i*hop.

    Requires win % hop == 0.  `xp` must be long enough for the last frame
    ((n_frames-1)*hop + win <= len + internal zero pad handles slack)."""
    assert win % hop == 0, "frame_signal requires hop | win"
    k = win // hop
    per = -(-n_frames // k)                       # frames per phase
    need = (k - 1) * hop + per * win
    slack = max(0, need - int(xp.shape[0]))
    if slack:
        xp = jnp.concatenate([xp, jnp.zeros(slack, xp.dtype)])
    phases = [
        jax.lax.dynamic_slice(xp, (p * hop,), (per * win,)).reshape(per, win)
        for p in range(k)
    ]
    # interleave phases back into frame order: (per, k, win) -> (per*k, win)
    stacked = jnp.stack(phases, axis=1).reshape(per * k, win)
    return stacked[:n_frames]


def overlap_add(out_frames: jnp.ndarray, n_frames: int, win: int, hop: int,
                total: int) -> jnp.ndarray:
    """Overlap-add `out_frames` (n_frames, win) at starts i*hop into a
    length-`total` buffer.  Requires win % hop == 0."""
    assert win % hop == 0, "overlap_add requires hop | win"
    k = win // hop
    per = -(-n_frames // k)
    full = per * k
    if full != n_frames:
        out_frames = jnp.concatenate(
            [out_frames, jnp.zeros((full - n_frames, win), out_frames.dtype)]
        )
    deint = out_frames.reshape(per, k, win)
    acc = jnp.zeros(total + (k - 1) * hop + win, out_frames.dtype)
    for p in range(k):
        strip = deint[:, p, :].reshape(-1)        # contiguous, stride win
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (p * hop,), (per * win,)) + strip,
            (p * hop,),
        )
    return acc[:total]


def sliding_frames_2w(xp_blocks: jnp.ndarray) -> jnp.ndarray:
    """(n_frames, 2w) windows [i*w, i*w + 2w) from (n_frames+1, w) blocks —
    the astats sliding-window layout without its (n_frames, 2w) gather."""
    return jnp.concatenate([xp_blocks[:-1], xp_blocks[1:]], axis=1)

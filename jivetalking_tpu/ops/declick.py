"""Click detection + repair (adeclick equivalent).

TPU-native replacement for FFmpeg's `adeclick=t=1.7:w=55:o=50:m=s` (ref
spec: internal/processor/filters.go:947-962; the reference applies it
post-loudnorm on mastered speech, where genuine clicks are rare and the
contract is transparency at metric parity, filters.go:938-940).

Design: fully vectorised detect-and-interpolate —
  * detection: second-difference of the signal against a per-window robust
    scale (median-absolute style, computed as a blocked quantile over `w`-ms
    windows); a sample is a click when |d2| > t * scale with a generous
    absolute floor so programme transients are not flagged.
  * repair: flagged samples (dilated by 1) are replaced by a masked
    diffusion — a few Jacobi passes of neighbour averaging over the flagged
    span, which converges to linear interpolation for the short (<1 ms)
    gaps clicks produce.  Every pass is an elementwise stencil, no scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_JACOBI_PASSES = 12
_ABS_FLOOR = 1e-3


@functools.partial(jax.jit, static_argnames=("window", "threshold"))
def _declick_impl(x: jnp.ndarray, window: int, threshold: float) -> jnp.ndarray:
    n = x.shape[0]
    d2 = jnp.concatenate([jnp.zeros(1, x.dtype), x[2:] - 2 * x[1:-1] + x[:-2], jnp.zeros(1, x.dtype)])
    ad2 = jnp.abs(d2)

    # robust per-window scale: p90 of |d2| per window (blocked), held flat
    n_win = -(-n // window)
    padded = jnp.zeros(n_win * window, x.dtype).at[:n].set(ad2)
    blocks = padded.reshape(n_win, window)
    scale = jnp.percentile(blocks, 90.0, axis=1)
    scale_full = jnp.repeat(scale, window)[:n]

    thresh = jnp.maximum(threshold * 4.0 * scale_full, _ABS_FLOOR)
    clicked = ad2 > thresh
    # dilate by one sample each side
    clicked = clicked | jnp.roll(clicked, 1) | jnp.roll(clicked, -1)

    # masked Jacobi diffusion: clicked samples relax toward neighbour mean
    y = jnp.where(clicked, 0.0, x)
    keep = ~clicked

    def body(_, y):
        left = jnp.concatenate([y[:1], y[:-1]])
        right = jnp.concatenate([y[1:], y[-1:]])
        avg = 0.5 * (left + right)
        return jnp.where(keep, x, avg)

    y = jax.lax.fori_loop(0, _JACOBI_PASSES, body, y)
    return y


def apply_declick(
    x,
    sample_rate: int,
    threshold: float = 1.7,
    window_ms: float = 55.0,
    overlap: float = 50.0,
    method: str = "s",
) -> jnp.ndarray:
    """Repair clicks in `x`.  `overlap`/`method` are accepted for parameter
    parity with the reference spec; the vectorised repair has no
    windowed-solver overlap to configure."""
    x = jnp.asarray(x, dtype=jnp.float32)
    window = max(8, int(round(window_ms * sample_rate / 1000.0)))
    return _declick_impl(x, window, float(threshold))

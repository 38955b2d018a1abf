"""Chunked sequence streaming for hour-scale files.

The reference streams frames with O(frame) memory (SURVEY.md §5
"long-context"); the TPU equivalent is block-wise processing with carried
filter state.  The fused whole-file master materialises several
full-length intermediates (the spectral-gate frame matrix alone is
~5.5 GB for an hour of 48 kHz audio), so beyond `CHUNK_THRESHOLD_SECS`
the Pass-2 chain runs CHUNKED:

  * chunks of `chunk_secs` with `overlap_secs` of context on each side;
  * every filter in the chain has effectively finite memory (FIR tails
    <= 8192 samples, envelope releases <= 200 ms, NLM research +-2 ms,
    spectral-gate OLA window 23 ms), so a 4 s overlap makes the
    discarded-edge output equal to the whole-file result to float
    tolerance — overlap-discard IS the carried state, re-derived from
    context instead of threaded through;
  * each chunk reuses ONE compiled program (fixed chunk length), so an
    hour-long file costs the same compiles as a five-minute one;
  * passes 1/3/4 stay whole-file: their intermediates are O(n/4800)
    block grids and a few full-length vectors (~GB, well inside HBM).

Memory ceiling: peak live set ~ 4 chunk-length arrays + the assembled
output — ~1.5 GB for any file length at the default 300 s chunks.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..adaptive.config import FilterConfig
from .pass2 import apply_filter_chain

CHUNK_THRESHOLD_SECS = 1200.0   # chunk the chain beyond 20 minutes
DEFAULT_CHUNK_SECS = 300.0
DEFAULT_OVERLAP_SECS = 4.0


def apply_filter_chain_chunked(
    x,
    sample_rate: int,
    cfg: FilterConfig,
    chunk_secs: float = DEFAULT_CHUNK_SECS,
    overlap_secs: float = DEFAULT_OVERLAP_SECS,
) -> jnp.ndarray:
    """Overlap-discard chunked Pass-2 chain; output length == input length.

    All chunks share one compiled program: interior chunks are exactly
    `chunk + 2*overlap` long, and the edge chunks are zero-padded to the
    same length (the pad is discarded with the overlap)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    # snap chunk/overlap to the spectral-gate OLA grid (hop 256, win 1024)
    # so every chunk sees the same absolute STFT frame grid as the
    # whole-file run — otherwise the per-frame gain pattern (and thus the
    # denoised noise floor) differs chunk to chunk
    grid = 1024
    chunk = max(grid, int(chunk_secs * sample_rate) // grid * grid)
    overlap = max(grid, int(overlap_secs * sample_rate) // grid * grid)
    if n <= chunk + 2 * overlap:
        return apply_filter_chain(x, sample_rate, cfg)

    padded = jnp.concatenate(
        [jnp.zeros(overlap, x.dtype), x, jnp.zeros(chunk + overlap, x.dtype)]
    )
    pieces = []
    pos = 0
    while pos < n:
        seg = padded[pos : pos + chunk + 2 * overlap]
        y = apply_filter_chain(seg, sample_rate, cfg)
        take = min(chunk, n - pos)
        pieces.append(y[overlap : overlap + take])
        pos += chunk
    return jnp.concatenate(pieces)[:n]


def should_chunk(n_samples: int, sample_rate: int) -> bool:
    return n_samples / sample_rate > CHUNK_THRESHOLD_SECS

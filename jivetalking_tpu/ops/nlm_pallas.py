"""Pallas TPU kernel for the NLM denoiser inner loop.

The XLA formulation (ops/nlm.py) scans the ~193 research offsets with a
full HBM traversal per offset: ~190 reads of the whole signal.  This
kernel tiles the signal into VMEM once and computes ALL offsets against
the resident tile — one HBM pass total, the remaining work on the VPU —
which is the memory-bound op's speed-of-light shape.

Per tile of T samples the kernel holds x[tile - halo, tile + T + halo)
in VMEM (halo = research + patch radius), and for each offset d:
    diff2 = (centre - shifted(d))^2
    dist  = box_filter(diff2, patch)        (two cumsum passes in VMEM)
    w     = exp(-dist / h2)
    num  += w * shifted;  den += w

`apply_nlm_pallas` falls back to the XLA path on non-TPU backends (the
kernel also runs under `interpret=True` for CPU tests).

CAVEAT (2026-08-16): the current Mosaic toolchain in this environment
cannot lower the kernel (1D `dynamic_slice`/`cumsum` are unimplemented
for KernelType.TC, and the chipless AOT compile helper 500s on
`pallas_call` programs), so compiled mode raises at trace/compile time.
`apply_nlm_pallas` therefore catches lowering/compile failures and falls
back to the XLA formulation (ops/nlm.py) — which profiling shows is
memory-bound at ~0.36 s for a 5-min 48 kHz file, the #2 op in the fused
master after the transfers.  Revisit when Mosaic grows 1D window
primitives."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8192  # samples per grid step (multiple of 128 lanes)


def _nlm_tile_kernel(h2_ref, x_ref, out_ref, *, patch_radius: int,
                     research_radius: int, halo: int):
    """One tile: x_ref holds (1, TILE + 2*halo); out (1, TILE)."""
    seg = x_ref[0, :]                       # (TILE + 2*halo,)
    width = TILE + 2 * patch_radius        # centre window + patch margins
    centre = jax.lax.dynamic_slice(seg, (halo - patch_radius,), (width,))
    h2 = h2_ref[0]

    def body(k, carry):
        num, den = carry
        # offset d = k - research_radius; shifted window aligned to centre
        start = halo - patch_radius - research_radius + k
        shifted = jax.lax.dynamic_slice(seg, (start,), (width,))
        diff2 = (centre - shifted) ** 2
        # box filter over [t-P, t+P]: cumsum then difference, valid part
        c = jnp.cumsum(diff2)
        zero = jnp.zeros((1,), c.dtype)
        c = jnp.concatenate([zero, c])
        w_len = 2 * patch_radius + 1
        dist = c[w_len:] - c[:-w_len]       # (TILE,) window sums
        w = jnp.exp(-dist / h2)
        mid = shifted[patch_radius:patch_radius + TILE]
        return num + w * mid, den + w

    n_offsets = 2 * research_radius + 1
    num0 = jnp.zeros((TILE,), jnp.float32)
    den0 = jnp.zeros((TILE,), jnp.float32)
    num, den = jax.lax.fori_loop(0, n_offsets, body, (num0, den0))
    out_ref[0, :] = num / jnp.maximum(den, 1e-12)


@functools.partial(
    jax.jit,
    static_argnames=("patch_radius", "research_radius", "n_tiles", "interpret"),
)
def _nlm_pallas_impl(x_padded, h2, patch_radius, research_radius, n_tiles, interpret):
    halo = research_radius + patch_radius
    kernel = functools.partial(
        _nlm_tile_kernel,
        patch_radius=patch_radius,
        research_radius=research_radius,
        halo=halo,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, TILE + 2 * halo),
                lambda i: (0, i),   # block-index convention: offset = i*TILE
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_tiles * TILE), jnp.float32),
        interpret=interpret,
    )(h2, x_padded)


def apply_nlm_pallas(
    x,
    sample_rate: int,
    strength: float = 0.00001,
    patch_sec: float = 0.0060,
    research_sec: float = 0.0020,
    smooth: float = 3.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """NLM via the Pallas tile kernel; parameters as in ops/nlm.apply_nlm.

    `interpret=None` auto-selects: compiled on TPU, interpreter elsewhere
    (the interpreter is for correctness tests, not speed)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n = int(x.shape[0])
    patch_radius = max(1, int(round(patch_sec * sample_rate / 2.0)))
    research_radius = max(1, int(round(research_sec * sample_rate / 2.0)))
    h = max(strength, 1e-7) * 10000.0
    h2 = jnp.asarray([h * h / max(smooth, 1.0)], dtype=jnp.float32)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    halo = research_radius + patch_radius
    n_tiles = -(-n // TILE)
    # layout: [halo zeros | x | pad-to-tiles + halo zeros], as (1, L) 2D.
    # BlockSpec index maps use BLOCK indices, so the halo'd input blocks
    # overlap: block i covers [i*TILE, i*TILE + TILE + 2*halo) of this
    # padded layout == x[i*TILE - halo, ...) in signal coordinates.
    total = n_tiles * TILE
    xp = jnp.zeros((1, total + 2 * halo), jnp.float32).at[0, halo : halo + n].set(x)

    # overlapping blocks need an element-indexed spec; emulate by gathering
    # the overlapped view once (cheap: one HBM pass) into (n_tiles, T+2h)
    starts = jnp.arange(n_tiles) * TILE
    idx = starts[:, None] + jnp.arange(TILE + 2 * halo)[None, :]
    tiles = xp[0][idx]                                    # (n_tiles, T+2h)

    try:
        out = _nlm_pallas_impl(
            tiles.reshape(1, -1), h2, patch_radius, research_radius, n_tiles,
            interpret,
        )
    except Exception:
        # Mosaic lowering unavailable (see module caveat): use the XLA path
        from .nlm import apply_nlm

        return apply_nlm(x, sample_rate, strength=strength,
                         patch_sec=patch_sec, research_sec=research_sec,
                         smooth=smooth)
    # _nlm_pallas_impl's in_spec block (1, TILE+2h) at block-offset i*(TILE+2h)
    return out[0, :n]

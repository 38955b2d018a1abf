"""Phase-reshape framing/OLA must match the gather/scatter formulation
exactly (ops/framing.py is the scatter-free core the fused programs use)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jivetalking_tpu.ops.framing import frame_signal, overlap_add, sliding_frames_2w


def _gather_frames(xp, n_frames, win, hop):
    fidx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    return np.asarray(xp)[fidx]


@pytest.mark.parametrize("win,hop,n", [(1024, 256, 50000), (2048, 1024, 30001),
                                       (8, 4, 40), (16, 16, 70)])
def test_frame_signal_matches_gather(win, hop, n):
    rng = np.random.default_rng(1)
    n_frames = 1 + (n - win) // hop if n >= win else 1
    need = (n_frames - 1) * hop + win
    xp = rng.standard_normal(max(n, need)).astype(np.float32)
    got = np.asarray(frame_signal(jnp.asarray(xp), n_frames, win, hop))
    want = _gather_frames(xp, n_frames, win, hop)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("win,hop", [(1024, 256), (2048, 1024), (8, 2)])
def test_overlap_add_matches_scatter(win, hop):
    rng = np.random.default_rng(2)
    n_frames, total = 37, 37 * hop + win + 13
    frames = rng.standard_normal((n_frames, win)).astype(np.float32)
    got = np.asarray(overlap_add(jnp.asarray(frames), n_frames, win, hop, total))
    want = np.zeros(total, np.float32)
    for i in range(n_frames):
        want[i * hop : i * hop + win] += frames[i]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sliding_frames_2w():
    rng = np.random.default_rng(3)
    w, n_frames = 16, 9
    blocks = rng.standard_normal((n_frames + 1, w)).astype(np.float32)
    got = np.asarray(sliding_frames_2w(jnp.asarray(blocks)))
    flat = blocks.reshape(-1)
    want = np.stack([flat[i * w : i * w + 2 * w] for i in range(n_frames)])
    np.testing.assert_array_equal(got, want)

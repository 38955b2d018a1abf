"""The fused master's windowed region true-peak contract
(pipeline/fused._region_sample_ingraph `tp_window`).

The 4 region TPs used to run the 12-tap x 4-phase oversampling FMAs over
the whole masked signal (~4 ms of full-signal passes each, round-5
trace); they now run over a dynamic_slice window sized to the region
pads.  Contract pinned here: identical values for regions inside the
window (the ring margin covers the 12-tap interpolation tail), clamped
support for oversized regions (matching the band-RMS pad clamp), and
unchanged rms/peak/momentary (those stay full-signal)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jivetalking_tpu.pipeline.fused import (
    _loudness_ingraph,
    _region_sample_ingraph,
    _tp_oversampled_max,
)
from jivetalking_tpu.metering.truepeak import _polyphase_bank

SR = 8000


def _fixture(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 997.0 * t) + 0.05 * rng.standard_normal(n)
    return x.astype(np.float32)


def _regions(x, start, end, tp_window):
    tp_bank = jnp.asarray(_polyphase_bank().astype(np.float32))
    kw_ir = jnp.zeros(64, jnp.float32).at[0].set(1.0)  # identity weighting
    loud = _loudness_ingraph(jnp.asarray(x), kw_ir, tp_bank, SR)
    spec_avg = lambda s, e: {}
    return _region_sample_ingraph(
        jnp.asarray(x), loud, spec_avg, SR,
        jnp.int32(start), jnp.int32(end), tp_bank, tp_window=tp_window)


class TestWindowedRegionTP:
    def test_in_window_region_matches_unwindowed(self):
        n = SR * 6
        x = _fixture(n)
        s, e = SR * 2, SR * 3          # 1 s region, window 2 s
        win = _regions(x, s, e, tp_window=SR * 2)
        full = _regions(x, s, e, tp_window=None)
        assert float(win["tp"]) == pytest.approx(float(full["tp"]), abs=0)
        assert float(win["rms"]) == pytest.approx(float(full["rms"]), abs=0)
        assert float(win["peak"]) == pytest.approx(float(full["peak"]), abs=0)

    def test_region_at_file_edges(self):
        n = SR * 6
        x = _fixture(n, seed=3)
        for s, e in [(0, SR), (n - SR, n), (0, n)]:
            win = _regions(x, s, e, tp_window=SR * 2)
            full = _regions(x, s, e, tp_window=None)
            if e - s <= SR * 2:        # fits the window: identical
                assert float(win["tp"]) == pytest.approx(
                    float(full["tp"]), abs=0), (s, e)
            else:                      # oversized: clamped support, <= full
                assert float(win["tp"]) <= float(full["tp"]) + 1e-7

    def test_oversized_region_clamps_to_window_head(self):
        n = SR * 6
        x = _fixture(n, seed=5)
        # plant the loudest sample OUTSIDE the clamped window
        s, e = SR, SR * 5              # 4 s region, window 1 s
        x[SR * 4] = 0.99               # near region end, outside window
        win = _regions(x, s, e, tp_window=SR)
        full = _regions(x, s, e, tp_window=None)
        # the sample peak stays a FULL-region measure (tp = max(window
        # oversample, region sample peak)) so the spike still registers...
        assert float(win["tp"]) >= np.float32(0.99) - 1e-6
        assert float(win["peak"]) == pytest.approx(np.float32(0.99), abs=0)
        # ...but the oversampled inter-sample term is clamped to the
        # window: the full measure (which sees the spike's interpolation
        # overshoot) reads at least as high
        assert float(win["tp"]) <= float(full["tp"]) + 1e-7

    def test_empty_region_reads_zero(self):
        n = SR * 4
        x = _fixture(n, seed=7)
        win = _regions(x, 0, 0, tp_window=SR)
        assert float(win["tp"]) == 0.0
        assert float(win["peak"]) == 0.0

    def test_window_ring_margin_covers_interpolation_tail(self):
        # a full-scale sample AT the region's last index: its 12-tap
        # interpolation ring must land inside the window margin and count
        n = SR * 6
        x = np.zeros(n, np.float32)
        s, e = SR * 2, SR * 3
        x[e - 1] = 0.9
        win = _regions(x, s, e, tp_window=SR * 2)
        tp_bank = jnp.asarray(_polyphase_bank().astype(np.float32))
        ref = float(_tp_oversampled_max(
            jnp.asarray(np.where((np.arange(n) >= s) & (np.arange(n) < e),
                                 x, 0.0)), tp_bank))
        assert float(win["tp"]) == pytest.approx(max(ref, float(np.float32(0.9))), abs=0)

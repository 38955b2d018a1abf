"""Lane-major prefix helpers (ops/prefix.py) and their astats wiring.

The flat `lax.cummax`/`jnp.cumsum` lowerings cost ~log2(L) full-array
passes; the lane-major two-level forms are the shipping replacement for
the astats windowed stats (ref behaviour: FFmpeg astats 50 ms windowed
RMS peak/trough + noise floor, internal/processor/filters.go:624).
These tests pin exact-selection equality for max/min, tolerance for sum
association, and old-vs-new astats parity."""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from jivetalking_tpu.metering.astats import _sliding_max, _sliding_sumsq
from jivetalking_tpu.ops.prefix import lane_cummax, lane_cummin, lane_cumsum

SHAPES = [(1,), (7,), (128,), (129,), (255,), (2400,), (300, 2400), (3, 5, 700)]


class TestLanePrefixMatchesNumpy:
    @pytest.mark.parametrize("shape", SHAPES, ids=str)
    def test_cummax_exact(self, shape):
        x = np.random.default_rng(7).standard_normal(shape).astype(np.float32)
        got = np.asarray(lane_cummax(jnp.asarray(x)))
        assert np.array_equal(got, np.maximum.accumulate(x, axis=-1))

    @pytest.mark.parametrize("shape", SHAPES, ids=str)
    def test_cummin_exact(self, shape):
        x = np.random.default_rng(8).standard_normal(shape).astype(np.float32)
        got = np.asarray(lane_cummin(jnp.asarray(x)))
        assert np.array_equal(got, np.minimum.accumulate(x, axis=-1))

    @pytest.mark.parametrize("shape", SHAPES, ids=str)
    def test_cumsum_tolerance(self, shape):
        # association differs from sequential cumsum; compare against f64
        x = np.random.default_rng(9).standard_normal(shape).astype(np.float32)
        got = np.asarray(lane_cumsum(jnp.asarray(x)))
        want = np.cumsum(x.astype(np.float64), axis=-1)
        assert np.allclose(got, want, rtol=3e-5, atol=3e-5)

    def test_negative_infinities_survive_padding(self):
        # identity padding must not leak into real outputs at ragged tails
        x = np.full(200, -1e30, np.float32)
        x[50] = 2.0
        got = np.asarray(lane_cummax(jnp.asarray(x)))
        assert got[49] == -1e30 and got[50] == 2.0 and got[-1] == 2.0

    def test_integer_dtypes_use_iinfo_identity(self):
        # the identity derivation branches on floating vs integer dtypes
        x = np.random.default_rng(11).integers(-1000, 1000, 500).astype(np.int32)
        assert np.array_equal(np.asarray(lane_cummax(jnp.asarray(x))),
                              np.maximum.accumulate(x))
        assert np.array_equal(np.asarray(lane_cummin(jnp.asarray(x))),
                              np.minimum.accumulate(x))


class TestAstatsWindowedParity:
    """The astats windowed stats must read the same through the lane-major
    prefixes as through the flat forms (exact for the van Herk max; f32
    association only for the local window sums)."""

    def _signal(self, n=480_000):
        rng = np.random.default_rng(3)
        t = np.arange(n)
        return (0.1 * np.sin(t * 0.01)
                + 0.01 * rng.standard_normal(n)).astype(np.float32)

    def test_sliding_max_equals_direct_oracle(self):
        x = np.abs(self._signal(20_000))
        w = 2400
        got = np.asarray(_sliding_max(jnp.asarray(x), w))
        # stride-tricks oracle
        sw = np.lib.stride_tricks.sliding_window_view(x, w)
        assert np.array_equal(got, sw.max(axis=1))

    def test_limiter_sliding_min_equals_direct_oracle(self):
        from jivetalking_tpu.ops.limiter import _sliding_min_lookahead

        x = self._signal(20_000)
        w = 240
        got = np.asarray(_sliding_min_lookahead(jnp.asarray(x), w))
        xp = np.concatenate([x, np.full(w, np.inf, np.float32)])
        want = np.lib.stride_tricks.sliding_window_view(xp, w)[:20_000].min(axis=1)
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("n,w", [(100, 1), (64, 64), (65, 64), (7, 4)],
                             ids=str)
    def test_limiter_sliding_min_edge_windows(self, n, w):
        # w=1 (no lookahead), w==n, w just under/over block boundaries
        from jivetalking_tpu.ops.limiter import _sliding_min_lookahead

        x = self._signal(n)
        got = np.asarray(_sliding_min_lookahead(jnp.asarray(x), w))
        xp = np.concatenate([x, np.full(w, np.inf, np.float32)])
        want = np.lib.stride_tricks.sliding_window_view(xp, w)[:n].min(axis=1)
        assert np.array_equal(got, want)

    @pytest.mark.parametrize("n,w", [(4800, 2400), (4801, 2400), (2400, 2400)],
                             ids=str)
    def test_sliding_max_edge_lengths(self, n, w):
        x = np.abs(self._signal(n))
        got = np.asarray(_sliding_max(jnp.asarray(x), w))
        sw = np.lib.stride_tricks.sliding_window_view(x, w)
        assert np.array_equal(got, sw.max(axis=1))

    def test_sliding_sumsq_matches_f64_oracle(self):
        x = self._signal(20_000)
        w = 2400
        x2 = (x * x).astype(np.float32)
        got = np.asarray(_sliding_sumsq(jnp.asarray(x2), w))
        sw = np.lib.stride_tricks.sliding_window_view(x2.astype(np.float64), w)
        want = sw.sum(axis=1)
        assert np.allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_astats_core_parity_flat_vs_lane(self, monkeypatch):
        from jivetalking_tpu.metering import astats as A

        x = jnp.asarray(self._signal())
        r_lane = {k: np.asarray(v) for k, v in A._astats_core(x, 2400).items()}

        # flat-form references (the pre-round-5 formulation)
        monkeypatch.setattr(A, "_LANE_PREFIX", False)
        r_flat = {k: np.asarray(v)
                  for k, v in A._astats_core.__wrapped__(x, 2400).items()}
        for k in r_flat:
            d = np.abs(r_flat[k].astype(np.float64)
                       - r_lane[k].astype(np.float64)).max()
            scale = max(1.0, float(np.abs(r_flat[k].astype(np.float64)).max()))
            assert d <= 1e-5 * scale, (k, d)

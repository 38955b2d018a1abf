"""Pallas NLM kernel vs the XLA formulation (interpret mode on CPU).

The kernels agree exactly in the interior; the first/last research-radius
samples (+-2 ms) differ in edge semantics (zero-padding vs offset
exclusion), which is inaudible and inside every metering tolerance."""

import numpy as np

from jivetalking_tpu.ops.nlm import apply_nlm
from jivetalking_tpu.ops.nlm_pallas import apply_nlm_pallas

SR = 44100


class TestPallasNLM:
    def test_matches_xla_interior(self):
        rng = np.random.default_rng(0)
        x = (
            0.1 * np.sin(2 * np.pi * 100 * np.arange(SR) / SR)
            + 0.001 * rng.standard_normal(SR)
        ).astype(np.float32)
        a = np.asarray(apply_nlm(x, SR, strength=0.01))
        b = np.asarray(apply_nlm_pallas(x, SR, strength=0.01, interpret=True))
        edge = int(0.002 * SR / 2) + 2
        np.testing.assert_allclose(b[edge:-edge], a[edge:-edge], atol=1e-6)

    def test_production_strength_transparent(self):
        x = (0.1 * np.sin(2 * np.pi * 440 * np.arange(SR // 2) / SR)).astype(np.float32)
        y = np.asarray(apply_nlm_pallas(x, SR, interpret=True))
        # s=1e-5 minimum strength is near-transparent (edges excluded:
        # the zero-padding boundary semantics bite the outer +-2 ms)
        edge = 64
        assert np.max(np.abs(y[edge:-edge] - x[edge:-edge])) < 1e-3

    def test_tile_boundary_continuity(self):
        # signal longer than one 8192 tile: no seams at tile boundaries
        n = 20000
        rng = np.random.default_rng(1)
        x = (0.05 * rng.standard_normal(n)).astype(np.float32)
        a = np.asarray(apply_nlm(x, SR, strength=0.01))
        b = np.asarray(apply_nlm_pallas(x, SR, strength=0.01, interpret=True))
        seam = slice(8192 - 50, 8192 + 50)
        np.testing.assert_allclose(b[seam], a[seam], atol=1e-6)

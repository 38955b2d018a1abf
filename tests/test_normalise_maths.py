"""Table tests for the Pass-3/4 planning arithmetic, mirroring the
reference's deepest pure-maths suite (normalise_test.go:1064-2270).

Every vector here is reproduced from the reference's tables with its
documented arithmetic, so the numerical contract of SURVEY.md §3.3 is
pinned independently of any audio.
"""


import pytest

from jivetalking_tpu.adaptive import default_filter_config
from jivetalking_tpu.pipeline.normalise import (
    LINEAR_SAFETY_MARGIN,
    MEASUREMENT_CUSHION_DB,
    MIN_LIMITER_CEILING_DB,
    calculate_limiter_ceiling,
    calculate_linear_mode_target,
    calculate_pre_gain,
    loudnorm_internal_target_tp,
    plan_limiter,
)

MARGIN = 0.1


class TestCalculateLinearModeTarget:
    """(ref: normalise_test.go:1064-1203)."""

    CASES = [
        # (measured_i, measured_tp, desired_i, target_tp,
        #  want_effective_i, want_offset, want_linear_possible)
        ("peak limited", -20.0, -5.0, -16.0, -1.5, -16.5 - MARGIN, 3.5 - MARGIN, False),
        ("severely peak limited", -20.0, -2.0, -16.0, -1.5, -19.5 - MARGIN, 0.5 - MARGIN, False),
        ("already at target with headroom", -16.0, -3.0, -16.0, -1.5, -16.0, 0.0, True),
        ("needs attenuation - always achievable", -12.0, -1.0, -16.0, -1.5, -16.0, -4.0, True),
        ("large boost with headroom", -26.0, -10.0, -16.0, -1.5, -17.5 - MARGIN, 8.5 - MARGIN, False),
        ("typical podcast", -24.88, -5.04, -16.0, -2.0, -21.84 - MARGIN, 3.04 - MARGIN, False),
        ("generous headroom allows full target", -30.0, -18.0, -16.0, -1.5, -16.0, 14.0, True),
        ("post-gain I with clamped ceiling", -36.5, -24.0, -16.0, -2.0, -16.0, 20.5, True),
        ("extremely quiet, cannot reach target", -40.0, -24.0, -16.0, -2.0, -18.0 - MARGIN, 22.0 - MARGIN, False),
    ]

    @pytest.mark.parametrize("name,mi,mtp,di,ttp,want_i,want_off,want_lin", CASES)
    def test_vectors(self, name, mi, mtp, di, ttp, want_i, want_off, want_lin):
        eff_i, offset, linear_possible = calculate_linear_mode_target(mi, mtp, di, ttp)
        assert eff_i == pytest.approx(want_i, abs=0.01), name
        assert offset == pytest.approx(want_off, abs=0.01), name
        assert linear_possible is want_lin, name

    def test_offset_is_effective_minus_measured(self):
        for _, mi, mtp, di, ttp, *_ in self.CASES:
            eff_i, offset, _ = calculate_linear_mode_target(mi, mtp, di, ttp)
            assert offset == pytest.approx(eff_i - mi, abs=1e-9)

    def test_cap_inert_by_construction(self):
        # effective target projects the TP to at most target_tp - margin,
        # which keeps loudnorm's internal TP cap from ever engaging
        for _, mi, mtp, di, ttp, *_ in self.CASES:
            eff_i, offset, _ = calculate_linear_mode_target(mi, mtp, di, ttp)
            assert mtp + offset <= ttp + 1e-9


class TestCalculateLimiterCeiling:
    """(ref: normalise_test.go:1204-1389)."""

    CASES = [
        ("typical podcast", -24.9, -5.0, -16.0, -2.0, -10.9, True, False),
        ("loud peaks", -20.0, -3.0, -16.0, -2.0, -6.0, True, False),
        ("quiet peaks - no limiting", -20.0, -10.0, -16.0, -2.0, 0.0, False, False),
        ("needs attenuation - no limiting", -12.0, -1.0, -16.0, -2.0, 0.0, False, False),
        ("exactly at boundary - no limiting", -20.0, -6.0, -16.0, -2.0, 0.0, False, False),
        ("very quiet - clamped", -43.0, -20.0, -16.0, -2.0, MIN_LIMITER_CEILING_DB, True, True),
        ("just under minimum - clamped", -40.0, -15.0, -16.0, -2.0, MIN_LIMITER_CEILING_DB, True, True),
        ("just above minimum - not clamped", -33.5, -15.0, -16.0, -2.0, -19.5, True, False),
        ("Anna exact values - clamped", -43.2, -18.6, -16.0, -2.0, MIN_LIMITER_CEILING_DB, True, True),
        ("near clamp boundary - not clamped", -36.6, -15.0, -16.0, -2.0, -22.6, True, False),
    ]

    @pytest.mark.parametrize("name,mi,mtp,ti,ttp,want_ceiling,want_needed,want_clamped", CASES)
    def test_vectors(self, name, mi, mtp, ti, ttp, want_ceiling, want_needed, want_clamped):
        ceiling, needed, clamped = calculate_limiter_ceiling(mi, mtp, ti, ttp)
        assert needed is want_needed, name
        assert clamped is want_clamped, name
        if needed:
            assert ceiling == pytest.approx(want_ceiling, abs=0.01), name

    def test_clamped_deficit_arithmetic(self):
        # deficit = min ceiling - ideal ceiling must be positive iff clamped
        for _, mi, mtp, ti, ttp, _, needed, clamped in self.CASES:
            if not clamped:
                continue
            gain_required = ti - mi
            ideal = ttp - gain_required
            assert MIN_LIMITER_CEILING_DB - ideal > 0
            assert ideal < MIN_LIMITER_CEILING_DB

    def test_derived_ceiling_closed_form(self):
        # ceiling = targetTP - gainRequired == measuredI + (targetTP - targetI):
        # the crest budget above the pre-limiter loudness
        # (ref: TestDerivedCeilingFormula, normalise_test.go:1390-1435)
        for _, mi, mtp, ti, ttp, _, needed, clamped in self.CASES:
            ceiling, _, was_clamped = calculate_limiter_ceiling(mi, mtp, ti, ttp)
            if needed and not was_clamped:
                assert ceiling == pytest.approx(mi + (ttp - ti), abs=1e-9)


class TestCalculatePreGain:
    """(ref: normalise_test.go:1987-2045)."""

    @pytest.mark.parametrize(
        "name,mi,ti,ttp,want_pre,want_rederived",
        [
            ("clamped - positive deficit", -43.2, -16.0, -2.0, 5.2, -24.0),
            ("not clamped - zeros", -24.9, -16.0, -2.0, 0.0, 0.0),
            ("boundary - ideal equals minimum", -38.0, -16.0, -2.0, 0.0, 0.0),
        ],
    )
    def test_vectors(self, name, mi, ti, ttp, want_pre, want_rederived):
        pre, rederived = calculate_pre_gain(mi, ti, ttp)
        assert pre == pytest.approx(want_pre, abs=0.01), name
        assert rederived == pytest.approx(want_rederived, abs=0.01), name

    def test_rederived_ceiling_never_below_minimum(self):
        for mi in (-60.0, -50.0, -43.2, -38.0, -30.0):
            pre, rederived = calculate_pre_gain(mi, -16.0, -2.0)
            if pre > 0:
                assert rederived >= MIN_LIMITER_CEILING_DB - 1e-9


class TestPlanLimiter:
    """plan_limiter composes ceiling + pre-gain + clamp propagation
    (ref: TestPlanLimiterForLoudnormMatchesInlineCalculation,
    normalise_test.go:2225-2270; TestPreGainCeilingRederivation :1764)."""

    def test_matches_inline_calculation(self):
        cfg = default_filter_config()
        ti, ttp = cfg.loudnorm.target_i, cfg.loudnorm.target_tp
        for mi, mtp in [(-24.9, -5.0), (-43.2, -18.6), (-20.0, -10.0), (-33.5, -15.0)]:
            plan = plan_limiter(mi, mtp, cfg)
            ceiling, needed, clamped = calculate_limiter_ceiling(mi, mtp, ti, ttp)
            pre, rederived = calculate_pre_gain(mi, ti, ttp)
            assert plan.needed is needed
            assert plan.clamped is clamped
            assert plan.pre_gain_db == pytest.approx(pre)
            assert plan.ceiling_db == pytest.approx(rederived if clamped else ceiling)
            assert plan.gain_db == pytest.approx(ti - mi)
            assert plan.filtered_tp == mtp

    def test_clamped_plan_rederives_ceiling(self):
        cfg = default_filter_config()
        plan = plan_limiter(-43.2, -18.6, cfg)
        assert plan.clamped
        assert plan.pre_gain_db > 0
        # the re-derived ceiling sits exactly at the floor
        assert plan.ceiling_db == pytest.approx(MIN_LIMITER_CEILING_DB, abs=0.01)

    def test_unneeded_plan_is_identity(self):
        cfg = default_filter_config()
        plan = plan_limiter(-20.0, -10.0, cfg)
        assert not plan.needed and not plan.clamped
        assert plan.pre_gain_db == 0.0


class TestInternalTargetTP:
    """internalTP = measuredTP + gain + 0.1 + 0.2 (ref: normalise.go:583-585,
    TestLoudnormInternalTargetTP* at normalise_test.go:1029)."""

    def test_formula(self):
        got = loudnorm_internal_target_tp(-16.0, -5.0, -24.0)
        assert got == pytest.approx(-5.0 + 8.0 + LINEAR_SAFETY_MARGIN + MEASUREMENT_CUSHION_DB)

    def test_attenuation_case(self):
        got = loudnorm_internal_target_tp(-16.0, -1.0, -12.0)
        assert got == pytest.approx(-1.0 - 4.0 + 0.3)

    def test_margin_constants_pinned(self):
        # 0.1 float-precision margin + 0.2 measurement cushion
        # (ref: docs/Normalisation-Tuning.md:27-49)
        assert LINEAR_SAFETY_MARGIN == 0.1
        assert MEASUREMENT_CUSHION_DB == 0.2
        assert MIN_LIMITER_CEILING_DB == -24.0


class TestBindingGainCapOnHighCrest:
    """(ref: TestBindingGainCapOnHighCrestInput, normalise_test.go:1436):
    the linear-mode cap must bind on a high-crest post-limiter measurement
    and the realised gain must land the projected TP at/under target."""

    def test_cap_binds_and_tp_safe(self):
        mi, mtp, di, ttp = -19.0, -3.0, -16.0, -2.0
        eff_i, offset, linear_possible = calculate_linear_mode_target(mi, mtp, di, ttp)
        assert not linear_possible
        assert eff_i == pytest.approx(mi + (ttp - mtp) - 0.1, abs=0.01)
        assert eff_i < di
        assert mtp + offset <= ttp + 0.001
        assert offset == pytest.approx(eff_i - mi, abs=0.001)


class TestClampedTargetPropagation:
    """(ref: TestClampedTargetPropagation_Arithmetic, normalise_test.go:1854):
    the full clamped chain — ceiling clamp -> deficit -> post-gain I ->
    linear-mode target — pins the effective target at -16.1 for the Anna
    corpus shapes."""

    @pytest.mark.parametrize(
        "name,mi,mtp",
        [
            ("anna", -43.4, -19.2),
            ("anna-like", -43.2, -18.6),
            ("extreme quiet", -55.0, -30.0),
        ],
    )
    def test_propagation(self, name, mi, mtp):
        ti, ttp = -16.0, -2.0
        _, needed, clamped = calculate_limiter_ceiling(mi, mtp, ti, ttp)
        assert needed and clamped, name
        pre_gain, rederived = calculate_pre_gain(mi, ti, ttp)
        post_gain_i = mi + pre_gain
        assert post_gain_i == pytest.approx(-38.0, abs=0.001), name
        assert rederived == pytest.approx(MIN_LIMITER_CEILING_DB, abs=0.001)
        eff_i, _, linear = calculate_linear_mode_target(post_gain_i, rederived, ti, ttp)
        assert not linear, name
        assert eff_i == pytest.approx(-16.1, abs=0.01), name

"""Seed/effective config ownership boundaries, ported from the reference's
reflection suites (ref: filters_test.go TestDefaultFilterConfigSeedOwnershipBoundary
:431-467, TestDeriveAdaptiveFilterResultDeepCopiesFilterOrder :1021,
TestCloneFilterDefaultsCopiesTypedFamilies :1048, TestAssembleEffectiveFilterConfig
:1068, TestDeriveEffectiveFilterConfig :1107; adaptive_test.go
TestAdaptConfigSeedParameterOwnershipBoundary :147).

The Go build assembles an EffectiveFilterConfig from the base seed plus the
adaptation result and uses reflection to prove neither type owns the other's
state.  The repo's split is Base (seed, caller-owned) -> derive_effective_config
(per-file deep copy) -> adapt_config mutates the copy and returns diagnostics
in a separate AdaptiveDiagnostics value; the same ownership laws hold:

- per-file DIAGNOSTIC state (clamp reasons, depths, estimates) must live on
  AdaptiveDiagnostics, never on the seed config type;
- the derived copy must be isolated from the seed across EVERY typed family
  (mutating any nested field of the copy leaves the base untouched);
- seed-owned families (loudnorm targets, resample, adeclick) survive
  adaptation unchanged.
"""

import dataclasses

import pytest

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.adaptive.adapt import AdaptiveDiagnostics
from jivetalking_tpu.adaptive.config import FilterConfig, derive_effective_config
from tests.test_adaptive import _measurements

# per-file diagnostic state the seed type must NOT own
# (ref: perFileStateFieldNames, filters_test.go:452-467)
PER_FILE_STATE_FIELDS = [
    "bandlimit_lp_reason",
    "speech_gate_depth_db",
    "speech_gate_quiet_speech_estimate",
    "speech_gate_speech_separation",
    "speech_gate_speech_headroom",
    "speech_gate_threshold_unclamped",
    "speech_gate_clamp_reason",
    "measurements",
    "pass_number",
]


class TestSeedOwnershipBoundary:
    def test_seed_type_owns_no_per_file_state(self):
        field_names = {f.name for f in dataclasses.fields(FilterConfig)}
        for name in PER_FILE_STATE_FIELDS:
            assert name not in field_names, (
                f"seed config type owns per-file state field {name}")

    def test_nested_families_own_no_diagnostics(self):
        # the reason/depth diagnostics must not hide inside a typed family
        for f in dataclasses.fields(FilterConfig):
            sub = f.default_factory() if f.default_factory is not dataclasses.MISSING else None
            if not dataclasses.is_dataclass(sub):
                continue
            sub_names = {sf.name for sf in dataclasses.fields(sub)}
            for name in ("clamp_reason", "depth_db", "disable_reason"):
                assert not any(n.endswith(name) for n in sub_names), (
                    f"family {f.name} owns diagnostic suffix {name}")

    def test_diagnostics_type_owns_the_per_file_state(self):
        diag_names = {f.name for f in dataclasses.fields(AdaptiveDiagnostics)}
        for name in (
            "bandlimit_lp_reason",
            "speech_gate_depth_db",
            "speech_gate_quiet_speech_estimate",
            "speech_gate_speech_separation",
            "speech_gate_speech_headroom",
            "speech_gate_threshold_unclamped",
            "speech_gate_clamp_reason",
        ):
            assert name in diag_names, name


def _leaf_fields(cfg):
    """Yield (family_name, field_name, current_value) for every numeric/bool
    leaf of every typed family on the config."""
    for fam in dataclasses.fields(cfg):
        sub = getattr(cfg, fam.name)
        if not dataclasses.is_dataclass(sub):
            continue
        for leaf in dataclasses.fields(sub):
            val = getattr(sub, leaf.name)
            if isinstance(val, (int, float, bool, str)):
                yield fam.name, leaf.name, val


class TestDeriveIsolation:
    """(ref: TestDeriveEffectiveFilterConfig :1107 /
    TestCloneForWorkerIsolatesStateAcrossClones :1231): mutating ANY leaf of
    the derived copy leaves the seed untouched, family by family."""

    def test_every_leaf_isolated(self):
        base = default_filter_config()
        derived = derive_effective_config(base)
        mutated = 0
        for fam, leaf, val in list(_leaf_fields(derived)):
            sub = getattr(derived, fam)
            if isinstance(val, bool):
                setattr(sub, leaf, not val)
            elif isinstance(val, (int, float)):
                setattr(sub, leaf, type(val)(val + 7))
            else:
                setattr(sub, leaf, val + "-mutated")
            mutated += 1
        assert mutated > 40  # the families are really being walked
        fresh = default_filter_config()
        for fam, leaf, val in _leaf_fields(base):
            assert val == getattr(getattr(fresh, fam), leaf), (
                f"derived mutation leaked into base {fam}.{leaf}")

    def test_derived_preserves_seed_values(self):
        # a non-default seed value carries into the copy (ref: the
        # AfftdnNoiseReduction carry in TestDeriveEffectiveFilterConfig)
        base = default_filter_config()
        base.loudnorm.target_i = -18.0
        base.noise_reduction.afftdn_noise_reduction = 9.0
        derived = derive_effective_config(base)
        assert derived.loudnorm.target_i == -18.0
        assert derived.noise_reduction.afftdn_noise_reduction == 9.0
        # and the seed keeps them after the copy is mutated
        derived.loudnorm.target_i = -10.0
        derived.noise_reduction.afftdn_noise_reduction = 3.0
        assert base.loudnorm.target_i == -18.0
        assert base.noise_reduction.afftdn_noise_reduction == 9.0

    def test_band_noise_list_isolated(self):
        # the one mutable-sequence field: the custom afftdn band shape
        base = default_filter_config()
        base.noise_reduction.afftdn_band_noise = [-1.0, 0.0, 1.0]
        derived = derive_effective_config(base)
        derived.noise_reduction.afftdn_band_noise.append(99.0)
        assert base.noise_reduction.afftdn_band_noise == [-1.0, 0.0, 1.0]


class TestSeedOwnedFamiliesSurviveAdaptation:
    """(ref: TestAssembleEffectiveFilterConfig :1068 — Loudnorm.TargetI comes
    from the SEED, not the adaptation result; SURVEY §3.2 ownership table)."""

    @pytest.mark.parametrize("family,field,value", [
        ("loudnorm", "target_i", -18.0),
        ("loudnorm", "target_tp", -1.0),
        ("loudnorm", "target_lra", 9.0),
        ("resample", "sample_rate", 48000),
        ("resample", "format", "s32"),
        ("adeclick", "window", 61.0),
    ])
    def test_family_survives(self, family, field, value):
        base = default_filter_config()
        setattr(getattr(base, family), field, value)
        eff, _ = adapt_config(base, _measurements())
        assert getattr(getattr(eff, family), field) == value
        # and the base itself is still caller-owned after adaptation
        assert getattr(getattr(base, family), field) == value

    def test_filter_order_comes_from_seed(self):
        base = default_filter_config()
        eff, _ = adapt_config(base, _measurements())
        assert eff.filter_order == base.filter_order

    def test_custom_filter_order_isolated_across_clones(self):
        # (ref: TestEffectiveConfigFilterOrderIsolation,
        # processor_test.go:257-285): a CUSTOM order propagates to every
        # derived clone, and rebinding one clone's order leaks to neither
        # the seed nor a sibling clone
        base = default_filter_config()
        base.filter_order = ("analysis", "deesser")
        first, d1 = adapt_config(base, _measurements())
        second, d2 = adapt_config(base, _measurements())
        assert d1 is not None and d2 is not None
        assert first.filter_order == ("analysis", "deesser")
        first.filter_order = ("downmix", "deesser")
        assert base.filter_order == ("analysis", "deesser")
        assert second.filter_order == ("analysis", "deesser")


class TestAnalyseOnlyDoesNotMutateCallerConfig:
    """(ref: TestAnalyseAudioDoesNotMutateCallerConfig, analyser_test.go:218
    and TestAnalyseOnlyDetailedTimings' base-untouched asserts,
    processor_test.go:629): the -a path adapts a COPY; the caller's base
    config — including its non-default values — survives verbatim."""

    def test_base_survives_analysis_and_adaptation(self):
        import numpy as np

        from jivetalking_tpu.pipeline.process import analyse_only

        base = default_filter_config()
        base.rumble_highpass.frequency = 95.0
        base.loudnorm.target_i = -18.0
        order_before = base.filter_order

        rng = np.random.default_rng(3)
        sr = 8000
        x = (0.05 * rng.standard_normal(4 * sr)).astype(np.float32)
        m, eff, diag = analyse_only(x, sr, base)

        assert m is not None and eff is not None and diag is not None
        # the copy carries the seed values...
        assert eff.rumble_highpass.frequency == 95.0
        assert eff.loudnorm.target_i == -18.0
        # ...and the seed is untouched even where adaptation tunes the copy
        assert base.rumble_highpass.frequency == 95.0
        assert base.loudnorm.target_i == -18.0
        assert base.filter_order == order_before
        fresh = default_filter_config()
        assert base.speech_gate.threshold == fresh.speech_gate.threshold
        assert base.levelling_compressor.threshold == \
            fresh.levelling_compressor.threshold
        assert base.noise_reduction.afftdn_noise_floor == \
            fresh.noise_reduction.afftdn_noise_floor

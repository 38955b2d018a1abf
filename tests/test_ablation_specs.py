"""Ablation-harness spec contracts (ref:
internal/processor/filter_ablation_benchmark_test.go:419-747 —
TestFullbenchPass2AblationSpecs, TestFullbenchPass2WithoutAnlmdnPreservesOrder,
TestFullbenchLoudnormClauseMatchesProduction,
TestRunFullbenchFilterSpecSyntheticSmoke): each ablation disables exactly
ONE production filter and nothing else, the ablated chain still runs end
to end, and the harness measures exactly what production would do with
that filter off (the loudnorm/limiter clause parity is structural here —
the harness calls the production `apply_filter_chain` on the production
config object, so there is no second spec language to drift)."""

import dataclasses

import numpy as np
import pytest

from bench_ablation import ABLATIONS, ablate
from jivetalking_tpu.adaptive import adapt_config, default_filter_config

SR = 8000


@pytest.fixture(scope="module")
def adapted_cfg():
    from tests.test_parallel_master import _speechlike

    from jivetalking_tpu.analysis import analyse_audio

    x = _speechlike(SR * 4, SR, seed=3)
    m = analyse_audio(np.asarray(x, dtype=np.float32), SR)
    cfg, _ = adapt_config(default_filter_config(), m)
    return cfg


def _flat(cfg, prefix=""):
    """Flatten a (nested-dataclass) config to {dotted_field: value}."""
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out.update(_flat(v, prefix + f.name + "."))
        else:
            out[prefix + f.name] = v
    return out


class TestAblationSpecs:
    def test_each_ablation_changes_exactly_one_field(self, adapted_cfg):
        # (ref: TestFullbenchPass2AblationSpecs :419) — minus_X is the
        # production config with X's enable flag (alone) flipped
        base = _flat(adapted_cfg)
        for name in ABLATIONS:
            ab = _flat(ablate(adapted_cfg, name))
            diffs = [k for k in base
                     if not (base[k] == ab[k]
                             or (isinstance(base[k], float)
                                 and np.isnan(base[k]) and np.isnan(ab[k])))]
            assert len(diffs) == 1, (name, diffs)
            assert diffs[0].endswith("enabled"), (name, diffs)
            assert base[diffs[0]] is True and ab[diffs[0]] is False, name

    def test_ablate_never_mutates_the_base(self, adapted_cfg):
        # (ref: the spec-isolation property behind
        # TestFullbenchPass2WithoutAnlmdnPreservesOrder :509)
        before = _flat(adapted_cfg)
        for name in ABLATIONS:
            ablate(adapted_cfg, name)
        assert _flat(adapted_cfg) == before

    def test_unknown_ablation_rejected(self, adapted_cfg):
        with pytest.raises(ValueError, match="unknown ablation"):
            ablate(adapted_cfg, "loudnorm")

    def test_matrix_covers_every_optional_pass2_stage(self):
        # the ablation matrix names each optional pass-2 stage once
        assert ABLATIONS == ("rumble_highpass", "bandlimit_lowpass", "nlm",
                             "afftdn", "speech_gate", "compressor",
                             "deesser")


class TestAblationSmoke:
    def test_ablated_chains_run_and_differ_from_full(self, adapted_cfg):
        # (ref: TestRunFullbenchFilterSpecSyntheticSmoke :747) — every
        # ablated chain executes, and ablating an ENABLED filter changes
        # the output (the filter measurably did something)
        from tests.test_parallel_master import _speechlike

        from jivetalking_tpu.pipeline.pass2 import apply_filter_chain

        x = np.asarray(_speechlike(SR * 2, SR, seed=7), dtype=np.float32)
        full = np.asarray(apply_filter_chain(x, SR, adapted_cfg))
        assert np.isfinite(full).all()
        fields = {"nlm": "noise_reduction",
                  "compressor": "levelling_compressor"}
        for name in ("rumble_highpass", "nlm", "speech_gate", "compressor"):
            if not getattr(adapted_cfg, fields.get(name, name)).enabled:
                continue
            y = np.asarray(apply_filter_chain(x, SR, ablate(adapted_cfg,
                                                            name)))
            assert np.isfinite(y).all(), name
            assert not np.array_equal(y, full), name

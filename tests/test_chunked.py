"""Chunked-streaming tests: overlap-discard chain output must match the
whole-file chain to float tolerance (the carried-state contract)."""

import numpy as np

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.analysis import analyse_audio
from jivetalking_tpu.pipeline.chunked import (
    apply_filter_chain_chunked,
    should_chunk,
)
from jivetalking_tpu.pipeline.pass2 import apply_filter_chain

SR = 44100


def _fixture(secs=40.0, seed=3):
    rng = np.random.default_rng(seed)
    n_notes = int(secs / 0.25)
    note = int(0.25 * SR)
    t = np.arange(note) / SR
    segs = [
        (10 ** ((-24 + rng.uniform(-3, 1)) / 20)) * np.sin(2 * np.pi * f * t)
        for f in rng.choice([400, 700, 1100, 1600, 2200], n_notes)
    ]
    x = np.concatenate(segs)[: int(secs * SR)].astype(np.float32)
    if secs >= 30:
        x[int(12 * SR) : int(24 * SR)] = (
            10 ** (-56 / 20) * rng.standard_normal(int(12 * SR))
        ).astype(np.float32)
    return x


class TestChunkedChain:
    def test_matches_whole_file(self):
        x = _fixture(40.0)
        m = analyse_audio(x, SR)
        cfg, _ = adapt_config(default_filter_config(), m)
        whole = np.asarray(apply_filter_chain(x, SR, cfg))
        chunked = np.asarray(
            apply_filter_chain_chunked(x, SR, cfg, chunk_secs=10.0, overlap_secs=4.0)
        )
        assert chunked.shape == whole.shape
        # interior must match to float tolerance; the first/last overlap may
        # differ by the warm-up transient of the envelope followers
        s, e = 5 * SR, 35 * SR
        err = np.abs(chunked[s:e] - whole[s:e])
        ref = np.sqrt(np.mean(whole[s:e] ** 2))
        # max deviation bounded at 1% of programme RMS (float32 reduction-
        # order noise through the exp/log gain laws); RMS of the error must
        # be far tighter — this is what the +-0.1 LU metering contract sees
        assert np.max(err) < max(1e-2 * ref, 5e-5), np.max(err)
        err_rms = np.sqrt(np.mean(err**2))
        assert err_rms < 2e-3 * ref, err_rms
        # loudness of the two outputs agrees well inside the metering budget
        from jivetalking_tpu.metering.ebur128 import measure_loudness

        iw = measure_loudness(whole, SR).integrated_lufs
        ic = measure_loudness(chunked, SR).integrated_lufs
        assert abs(iw - ic) < 0.01

    def test_short_file_passthrough(self):
        x = _fixture(6.0)
        m = analyse_audio(x, SR)
        cfg, _ = adapt_config(default_filter_config(), m)
        whole = np.asarray(apply_filter_chain(x, SR, cfg))
        chunked = np.asarray(
            apply_filter_chain_chunked(x, SR, cfg, chunk_secs=10.0, overlap_secs=2.0)
        )
        np.testing.assert_array_equal(chunked, whole)

    def test_should_chunk_threshold(self):
        assert not should_chunk(10 * 60 * SR, SR)
        assert should_chunk(25 * 60 * SR, SR)

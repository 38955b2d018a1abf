"""The REAL master under shard_map: parity pins vs the single-device fused
stages (VERDICT r1 #3).

The sharded stage A/B (parallel/master.py) must reproduce the single-device
`_master_stage_a_tree` / `_master_stage_b_tree` output row for row on the
dp x sp CPU mesh.  NLM is pinned separately (its file-edge samples diverge
by design — the halo'd edge shards see zeros where the single-device kernel
masks out-of-range offsets); adeclick separately at a window-aligned shard
length.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh(dp, sp):
    devs = jax.devices()
    if len(devs) < dp * sp:
        pytest.skip(f"needs {dp * sp} devices")
    return Mesh(np.array(devs[: dp * sp]).reshape(dp, sp), ("dp", "sp"))


def _speechlike(n, sr, seed=0, amp=0.08):
    rng = np.random.default_rng(seed)
    note = max(1, int(0.25 * sr))
    x = np.zeros(n, dtype=np.float64)
    t = np.arange(note) / sr
    pos = 0
    while pos < n:
        f = rng.choice([400.0, 700.0, 1100.0, 1600.0, 2200.0])
        seg = amp * np.sin(2 * np.pi * f * t)
        m = min(note, n - pos)
        x[pos : pos + m] = seg[:m]
        pos += note
    x += 10.0 ** (-55.0 / 20.0) * rng.standard_normal(n)
    return x.astype(np.float32)


class TestShardedNLM:
    def test_interior_exact(self):
        from jivetalking_tpu.ops.nlm import _nlm_core
        from jivetalking_tpu.parallel.master import sharded_nlm

        mesh = _mesh(2, 4)
        sr = 8000
        n_local = 4096
        n = 4 * n_local
        P_r = max(1, int(round(0.0060 * sr / 2.0)))
        R_r = max(1, int(round(0.0020 * sr / 2.0)))
        h2 = jnp.float32((0.00001 * 10000.0) ** 2 / 3.0)
        x = np.stack([_speechlike(n, sr, seed=i) for i in range(2)])

        f = jax.jit(functools.partial(
            shard_map,
            mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"),
        )(lambda b: sharded_nlm(b, h2, P_r, R_r, "sp")))
        got = np.asarray(f(jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("dp", "sp")))))

        ext = P_r + R_r
        for i in range(2):
            want = np.asarray(_nlm_core(jnp.asarray(x[i]), h2, P_r, R_r))
            # interior (away from FILE edges): exact across shard boundaries
            np.testing.assert_allclose(
                got[i, ext:-ext], want[ext:-ext], rtol=2e-5, atol=2e-6)


class TestShardedDeclick:
    def test_window_aligned_exact(self):
        from jivetalking_tpu.ops.declick import _declick_impl
        from jivetalking_tpu.parallel.master import sharded_declick

        mesh = _mesh(2, 4)
        sr = 8000
        window = max(8, int(round(55.0 * sr / 1000.0)))   # 440
        n_local = window * 8
        n = 4 * n_local
        rng = np.random.default_rng(3)
        x = np.stack([_speechlike(n, sr, seed=i) for i in range(2)])
        # inject clicks, including one near a shard boundary
        for i in range(2):
            for pos in (1000, n_local - 2, 2 * n_local + 7, n - 500):
                x[i, pos] += 0.5 * (1 if rng.uniform() > 0.5 else -1)

        f = jax.jit(functools.partial(
            shard_map,
            mesh=mesh, in_specs=P("dp", "sp"), out_specs=P("dp", "sp"),
        )(lambda b: sharded_declick(b, sr, "sp")))
        got = np.asarray(f(jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("dp", "sp")))))

        for i in range(2):
            want = np.asarray(_declick_impl(jnp.asarray(x[i]), window, 1.7))
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


class TestShardedMaster:
    """Full stage A+B parity on the dp x sp mesh.  sr=12800 makes the 55 ms
    declick window (704), STFT hop (256) and 100 ms block (1280) all divide
    n_local=14080, so every grid aligns and the pin is exact-tolerance.
    NLM off (edge divergence pinned separately above)."""

    def _run(self):
        import jivetalking_tpu.pipeline.fused as F
        from jivetalking_tpu.parallel.master import (
            sharded_master_stage_a,
            sharded_master_stage_b,
        )

        mesh = _mesh(2, 4)
        sr = 12800
        n_local = 14080
        sp = 4
        n = sp * n_local
        batch = 2
        chain_ir, kw_ir, tp_bank, deess_k = F._constants_for_rate(sr, 80.0, 5000.0)

        params = dict(
            g_thr=np.asarray([1e-4, 3e-4], np.float32),
            g_ratio=np.asarray([2.0, 1.5], np.float32),
            g_range=np.asarray([0.2, 0.4], np.float32),
            c_thr=np.asarray([0.1, 0.05], np.float32),
            d_i=np.asarray([0.5, 0.0], np.float32),
            nf=np.asarray([-50.0, -60.0], np.float32),
            t_i=np.asarray([-16.0, -16.0], np.float32),
            t_tp=np.asarray([10 ** (-1.0 / 20.0)] * 2, np.float32),
        )
        shape = np.zeros((batch, 15), np.float32)
        shape[1, :] = np.linspace(-3.0, 3.0, 15)

        x = np.stack([_speechlike(n, sr, seed=10 + i) for i in range(batch)])

        @jax.jit
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P("dp", "sp"),) + (P("dp"),) * 9
            + (P(), P(), P(), P()),
            out_specs=(P("dp", "sp"), P("dp"), P("dp"), P("dp"), P("dp")),
            check_vma=False,
        )
        def run_sharded(pcm, g_thr, g_ratio, g_range, c_thr, d_i, nf, shp,
                        t_i, t_tp, c_ir, k_ir, t_bank, d_k):
            prefixed, offset_db, plan = sharded_master_stage_a(
                pcm, g_thr, g_ratio, g_range, c_thr, d_i, nf, shp, t_i, t_tp,
                c_ir, k_ir, t_bank, d_k,
                sr=sr, axis_name="sp", nlm_enabled=False, afftdn_enabled=True,
            )
            z, final = sharded_master_stage_b(
                prefixed, offset_db, t_tp, k_ir, t_bank,
                sr=sr, axis_name="sp", declick_enabled=True,
            )
            return (z, offset_db, plan["measured_i"], plan["effective_i"],
                    final["final_i"])

        args = [jnp.asarray(x)] + [jnp.asarray(params[k]) for k in
                                   ("g_thr", "g_ratio", "g_range", "c_thr",
                                    "d_i", "nf")] + [jnp.asarray(shape)] + \
               [jnp.asarray(params[k]) for k in ("t_i", "t_tp")] + \
               [chain_ir, kw_ir, tp_bank, deess_k]
        args[0] = jax.device_put(args[0], NamedSharding(mesh, P("dp", "sp")))
        z, offset_db, m_i, eff_i, final_i = run_sharded(*args)

        # single-device reference: the fused master stages themselves
        refs = []
        for i in range(2):
            prefixed1, offset1, ma = F._master_stage_a_tree(
                jnp.asarray(x[i]),
                jnp.float32(params["g_thr"][i]), jnp.float32(params["g_ratio"][i]),
                jnp.float32(params["g_range"][i]), jnp.float32(params["c_thr"][i]),
                jnp.float32(params["d_i"][i]), jnp.float32(params["nf"][i]),
                jnp.float32(12.0), jnp.asarray(shape[i]), jnp.float32(params["t_i"][i]),
                jnp.float32(params["t_tp"][i]),
                jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                chain_ir, kw_ir, tp_bank, deess_k,
                sr=sr, nlm_enabled=False, afftdn_enabled=True,
            )
            zc, mb = F._master_stage_b_tree(
                prefixed1, offset1, jnp.float32(params["t_tp"][i]),
                jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                kw_ir, tp_bank, sr=sr, out_rate=sr, declick_enabled=True,
            )
            refs.append(dict(
                # stage B delivers s16 chunks; compare in float amplitude
                z=np.concatenate([np.asarray(c) for c in zc]).astype(np.float32)
                / 32767.0,
                offset=float(offset1),
                m_i=float(ma["plan"]["measured_i"]),
                eff_i=float(ma["plan"]["effective_i"]),
                final_i=float(mb["final"]["integrated"]),
            ))
        return (np.asarray(z), np.asarray(offset_db), np.asarray(m_i),
                np.asarray(eff_i), np.asarray(final_i), refs)

    def test_stage_a_b_parity(self):
        z, offset_db, m_i, eff_i, final_i, refs = self._run()
        for i, ref in enumerate(refs):
            assert offset_db[i] == pytest.approx(ref["offset"], abs=2e-3)
            assert m_i[i] == pytest.approx(ref["m_i"], abs=2e-3)
            assert eff_i[i] == pytest.approx(ref["eff_i"], abs=2e-3)
            assert final_i[i] == pytest.approx(ref["final_i"], abs=2e-3)
            # sharded stage B returns float audio; the single-device ref is
            # s16-quantised — match within one LSB plus float slack
            np.testing.assert_allclose(z[i], ref["z"], atol=4e-5)


class TestShardedResample:
    def test_matches_whole_file_resample(self):
        from jivetalking_tpu.ops.resample import resample
        from jivetalking_tpu.parallel.master import sharded_resample

        mesh = _mesh(2, 4)
        sr, out = 8000, 4000          # M = 2
        n_local = 4096
        n = 4 * n_local
        x = np.stack([_speechlike(n, sr, seed=i) for i in range(2)])

        f = jax.jit(functools.partial(
            shard_map, mesh=mesh, in_specs=P("dp", "sp"),
            out_specs=P("dp", "sp"),
        )(lambda b: sharded_resample(b, sr, out, "sp")))
        got = np.asarray(f(jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("dp", "sp")))))

        for i in range(2):
            want = np.asarray(resample(jnp.asarray(x[i]), sr, out))
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)

    def test_rational_147_160(self):
        from jivetalking_tpu.ops.resample import resample
        from jivetalking_tpu.parallel.master import sharded_resample

        mesh = _mesh(2, 4)
        sr, out = 48000, 44100        # L/M = 147/160
        n_local = 160 * 64
        n = 4 * n_local
        x = np.stack([_speechlike(n, sr, seed=3 + i) for i in range(2)])

        f = jax.jit(functools.partial(
            shard_map, mesh=mesh, in_specs=P("dp", "sp"),
            out_specs=P("dp", "sp"),
        )(lambda b: sharded_resample(b, sr, out, "sp")))
        got = np.asarray(f(jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("dp", "sp")))))
        for i in range(2):
            want = np.asarray(resample(jnp.asarray(x[i]), sr, out))
            assert got[i].size == want.size
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


class TestShardedMasterMultiRow:
    """b_local > 1: two files PER dp shard (the dryrun shape that caught a
    (b,) vs (b,n) broadcasting bug in stage B's brickwall)."""

    def test_batch_rows_match_single_device(self):
        import jivetalking_tpu.pipeline.fused as F
        from jivetalking_tpu.parallel.master import (
            sharded_master_stage_a,
            sharded_master_stage_b,
        )

        mesh = _mesh(2, 2)
        sr = 12800
        n_local = 14080
        n = 2 * n_local
        batch = 4                     # 2 rows per dp shard
        chain_ir, kw_ir, tp_bank, deess_k = F._constants_for_rate(sr, 80.0, 5000.0)

        g_thr = np.asarray([1e-4, 3e-4, 2e-4, 1e-4], np.float32)
        g_ratio = np.asarray([2.0, 1.5, 2.0, 1.5], np.float32)
        g_range = np.asarray([0.2, 0.4, 0.3, 0.2], np.float32)
        c_thr = np.asarray([0.1, 0.05, 0.08, 0.1], np.float32)
        d_i = np.asarray([0.5, 0.0, 0.7, 0.3], np.float32)
        nf = np.asarray([-50.0, -60.0, -55.0, -45.0], np.float32)
        t_i = np.full(4, -16.0, np.float32)
        t_tp = np.full(4, 10 ** (-1.0 / 20.0), np.float32)
        shape = np.zeros((batch, 15), np.float32)
        x = np.stack([_speechlike(n, sr, seed=50 + i) for i in range(batch)])

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("dp", "sp"),) + (P("dp"),) * 9 + (P(), P(), P(), P()),
            out_specs=(P("dp", "sp"), P("dp")),
            check_vma=False,
        )
        def run(pcm, gt, gr, grg, ct, di, nfv, shp, ti, ttp,
                c_ir, k_ir, t_bank, d_k):
            prefixed, offset_db, _plan = sharded_master_stage_a(
                pcm, gt, gr, grg, ct, di, nfv, shp, ti, ttp,
                c_ir, k_ir, t_bank, d_k,
                sr=sr, axis_name="sp", nlm_enabled=False, afftdn_enabled=True)
            z, _final = sharded_master_stage_b(
                prefixed, offset_db, ttp, k_ir, t_bank,
                sr=sr, axis_name="sp", declick_enabled=True)
            return z, offset_db

        args = [jnp.asarray(v) for v in
                (x, g_thr, g_ratio, g_range, c_thr, d_i, nf, shape, t_i, t_tp)]
        args[0] = jax.device_put(args[0], NamedSharding(mesh, P("dp", "sp")))
        z, offset = run(*args, chain_ir, kw_ir, tp_bank, deess_k)

        for i in range(batch):
            p1, o1, _ = F._master_stage_a_tree(
                jnp.asarray(x[i]), jnp.float32(g_thr[i]), jnp.float32(g_ratio[i]),
                jnp.float32(g_range[i]), jnp.float32(c_thr[i]),
                jnp.float32(d_i[i]), jnp.float32(nf[i]), jnp.float32(12.0),
                jnp.asarray(shape[i]),
                jnp.float32(t_i[i]), jnp.float32(t_tp[i]),
                jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                chain_ir, kw_ir, tp_bank, deess_k,
                sr=sr, nlm_enabled=False, afftdn_enabled=True)
            zc, _ = F._master_stage_b_tree(
                p1, o1, jnp.float32(t_tp[i]),
                jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
                kw_ir, tp_bank, sr=sr, out_rate=sr, declick_enabled=True)
            want = np.concatenate([np.asarray(c) for c in zc]).astype(np.float32) / 32767.0
            assert float(offset[i]) == pytest.approx(float(o1), abs=2e-3)
            # ref is s16-quantised (+-1 LSB = 3.1e-5) plus cross-shard float
            # association slack
            np.testing.assert_allclose(np.asarray(z[i]), want, atol=8e-5)


class TestShardedStageMetrics:
    """The sp-sharded diagnostics (VERDICT r2 weak #4): astats core +
    spectral means + loudness + region metrics from collectivised
    window-END partials must match the single-device metering."""

    def test_matches_single_device_metering(self):
    
        from jivetalking_tpu.metering.astats import _astats_core
        from jivetalking_tpu.metering.spectral import _spectral_core
        from jivetalking_tpu.parallel.master import sharded_stage_metrics
        from jivetalking_tpu.pipeline.fused import (
            _constants_for_rate,
            _loudness_ingraph,
        )

        mesh = _mesh(2, 4)
        sr = 8000
        n_local = 4 * 1024
        n = 4 * n_local
        _, kw_ir, tp_bank, _ = _constants_for_rate(sr, 80.0, 3500.0)
        x = np.stack([_speechlike(n, sr, seed=31), _speechlike(n, sr, seed=32)])
        nb = np.asarray([[sr // 2, sr], [0, sr // 2]], np.int32)
        sb = np.asarray([[sr, 3 * sr], [sr, 2 * sr]], np.int32)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("dp", "sp"), P("dp", None), P("dp", None)),
            out_specs=P("dp"),
            check_vma=False,
        )
        def run(xs, nbs, sbs):
            return sharded_stage_metrics(
                xs, n, nbs, sbs, kw_ir, tp_bank, sr, "sp")

        got = run(jnp.asarray(x), jnp.asarray(nb), jnp.asarray(sb))

        w = max(2, int(round(0.05 * sr)))
        for i in range(2):
            xi = jnp.asarray(x[i])
            ast = {k: np.asarray(v) for k, v in _astats_core(xi, w).items()}
            for key in ("rms_lin", "peak_lin", "min_level", "max_level",
                        "dc", "max_diff", "min_diff", "mean_diff",
                        "rms_diff", "min_nonzero", "rms_peak",
                        "rms_trough", "noise_floor_lin"):
                assert float(got["astats"][key][i]) == pytest.approx(
                    float(ast[key]), rel=2e-4, abs=2e-6), key
            for key in ("zc", "min_count", "max_count", "min_runs",
                        "max_runs"):
                assert float(got["astats"][key][i]) == pytest.approx(
                    float(ast[key]), abs=0.5), key
            assert float(got["astats"]["entropy"][i]) == pytest.approx(
                float(ast["entropy"]), abs=1e-3)
            assert int(got["astats"]["bit_mask"][i]) == int(ast["bit_mask"])

            loud = _loudness_ingraph(xi, kw_ir, tp_bank, sr)
            # conv frame-partition round-off can flip a block at the
            # relative gate; on this deliberately tiny fixture (2 s, ~17
            # momentary windows) one flip moves I by ~0.02 LU.  Allow
            # 0.05 (contract is +-0.1; larger fixtures pin tighter in
            # test_fused_chunked).
            assert float(got["loudness"]["integrated"][i]) == pytest.approx(
                float(loud["integrated"]), abs=0.05)
            assert float(got["loudness"]["true_peak"][i]) == pytest.approx(
                float(loud["true_peak"]), rel=1e-3)

            n_sf = 1 + (n - 2048) // 1024
            spec = _spectral_core(xi, n_sf, 2048, 1024, float(sr))
            for k in ("centroid", "flatness", "kurtosis", "flux", "rolloff"):
                assert float(got["spectral"][k][i]) == pytest.approx(
                    float(jnp.mean(spec[k])), rel=5e-3, abs=1e-3), k

            # region metrics vs direct masked computation
            s, e = int(nb[i, 0]), int(nb[i, 1])
            seg = x[i, s:e]
            assert float(got["regions"]["noise"]["rms"][i]) == pytest.approx(
                float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))), rel=1e-4)
            assert float(got["regions"]["noise"]["peak"][i]) == pytest.approx(
                float(np.max(np.abs(seg))), rel=1e-5)


class TestShardedTruePeakSeam:
    """Adversarial seam pin for the sharded true peak: an alternating-sign
    oscillation straddling each interior shard boundary.  The old
    both-sides-padded local `_tp_oversampled_max` manufactured interpolated
    values at the seams (the +0.175 dB class); the window-END form must
    equal the single-device whole-file value exactly."""

    def test_seam_oscillation_matches_whole_file(self):
        from jivetalking_tpu.parallel.master import sharded_loudness
        from jivetalking_tpu.pipeline.fused import (
            _constants_for_rate,
            _tp_oversampled_max,
        )

        mesh = _mesh(2, 4)
        sr = 8000
        n_local = 4800          # multiple of sr // 10
        n = 4 * n_local
        _, kw_ir, tp_bank, _ = _constants_for_rate(sr, 80.0, 3500.0)

        rng = np.random.default_rng(9)
        x = (1e-3 * rng.standard_normal((2, n))).astype(np.float32)
        for row in range(2):
            for seam in (n_local, 2 * n_local, 3 * n_local):
                for j, v in enumerate([0.5, -0.5, 0.5, -0.5, 0.5, -0.5]):
                    x[row, seam - 3 + j] = v

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=P("dp", "sp"), out_specs=P("dp"),
            check_vma=False,
        )
        def run(xs):
            return sharded_loudness(xs, kw_ir, tp_bank, sr, "sp")

        got = run(jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P("dp", "sp"))))

        for i in range(2):
            xi = jnp.asarray(x[i])
            want = max(float(_tp_oversampled_max(xi, tp_bank)),
                       float(jnp.max(jnp.abs(xi))))
            assert want > 0.5
            assert float(got["true_peak"][i]) == pytest.approx(want, rel=1e-6)

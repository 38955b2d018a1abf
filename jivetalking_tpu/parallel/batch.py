"""Batch / device-mesh parallelism.

The reference's only concurrency is a bounded worker pool over files plus
band-measure goroutines (ref: SURVEY.md §2.3; cmd/jivetalking/pool.go).
The TPU-native equivalents here:

  * `process_files_data_parallel` — file-level data parallelism over real
    devices: each worker thread pins its file's computation to one device
    via `jax.default_device`, so N chips master N files concurrently (the
    back-catalogue configuration).  On one chip it degrades gracefully to
    the host worker pool.
  * `batched_integrated_loudness` — the batched measurement kernel: a
    (batch, time) PCM block sharded over a device mesh, masked-block
    BS.1770 gating per file (variable lengths via block masks), all files
    metered in one device program.  This is the "64-episode back-catalogue"
    sweep primitive: measurement is the dominant cost of analyse-only runs.
  * `make_mesh` — the dp(xsp) mesh constructor shared with the dry-run
    harness (__graft_entry__.dryrun_multichip exercises the sp axis with
    halo exchange + psum).
"""

from __future__ import annotations

import functools
import threading
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..metering.kweight import k_weighting_sos
from ..ops.iir import sos_impulse_response

ABSOLUTE_GATE_LUFS = -70.0
_LOG_FLOOR = 1e-15


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# ---------------------------------------------------------------------------
# batched masked R128 (the back-catalogue measurement kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("block_len", "n_blocks", "dual_mono"))
def _batched_gated_loudness(
    kx: jnp.ndarray,          # (batch, n) K-weighted PCM (zero padded)
    n_valid_blocks: jnp.ndarray,  # (batch,) valid 100ms blocks per file
    block_len: int,
    n_blocks: int,
    dual_mono: bool,
) -> jnp.ndarray:
    b = kx.shape[0]
    total = n_blocks * block_len
    blocks = kx[:, :total].reshape(b, n_blocks, block_len)
    bp = jnp.mean(blocks.astype(jnp.float32) ** 2, axis=2)
    if dual_mono:
        bp = bp * 2.0

    # momentary (400 ms) sliding means over 4 blocks
    c = jnp.concatenate([jnp.zeros((b, 1), bp.dtype), jnp.cumsum(bp, axis=1)], axis=1)
    mp = (c[:, 4:] - c[:, :-4]) / 4.0
    n_m = mp.shape[1]
    m_idx = jnp.arange(n_m)[None, :]
    valid = m_idx < jnp.maximum(n_valid_blocks[:, None] - 3, 1)

    ml = -0.691 + 10.0 * jnp.log10(jnp.maximum(mp, _LOG_FLOOR))
    abs_mask = valid & (ml > ABSOLUTE_GATE_LUFS)
    cnt = jnp.maximum(jnp.sum(abs_mask, axis=1), 1)
    mean_p = jnp.sum(jnp.where(abs_mask, mp, 0.0), axis=1) / cnt
    rel_thresh = -0.691 + 10.0 * jnp.log10(jnp.maximum(mean_p, _LOG_FLOOR)) - 10.0
    rel_mask = abs_mask & (ml > rel_thresh[:, None])
    cnt2 = jnp.maximum(jnp.sum(rel_mask, axis=1), 1)
    gated = jnp.sum(jnp.where(rel_mask, mp, 0.0), axis=1) / cnt2
    gated = jnp.where(jnp.sum(rel_mask, axis=1) > 0, gated, _LOG_FLOOR)
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(gated, _LOG_FLOOR))


def batched_integrated_loudness(
    pcm_batch: np.ndarray,
    lengths: np.ndarray,
    sample_rate: int,
    dual_mono: bool = True,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Integrated LUFS for a (batch, n) zero-padded PCM block; `lengths`
    gives each file's true sample count.  With a mesh, the batch axis is
    sharded across devices (each chip meters its shard; no collectives
    needed — file-level DP)."""
    x = jnp.asarray(pcm_batch, dtype=jnp.float32)
    b, n = x.shape
    block_len = max(1, int(round(sample_rate * 0.1)))
    n_blocks = max(4, n // block_len)

    sos = k_weighting_sos(sample_rate)
    ir = jnp.asarray(sos_impulse_response(sos, 4096), dtype=jnp.float32)

    if mesh is not None:
        sharding = NamedSharding(mesh, P("dp", None))
        x = jax.device_put(x, sharding)

    @jax.jit
    def kweight_batch(xb):
        # overlap-free batched FFT convolution: pad to n + ir - 1
        fft_len = 1 << int(np.ceil(np.log2(n + ir.shape[0] - 1)))
        spec = jnp.fft.rfft(xb, n=fft_len, axis=1) * jnp.fft.rfft(ir, n=fft_len)[None, :]
        return jnp.fft.irfft(spec, n=fft_len, axis=1)[:, :n]

    kx = kweight_batch(x)
    valid_blocks = jnp.asarray(np.minimum(lengths // block_len, n_blocks), dtype=jnp.int32)
    out = _batched_gated_loudness(kx, valid_blocks, block_len, n_blocks, dual_mono)
    return np.asarray(out, dtype=np.float64)


def pad_to_batch(pcm_list: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad a list of mono PCM arrays to one (batch, max_n) block
    (pad-to-bucket; SURVEY.md §7 'dynamic shapes')."""
    lengths = np.array([len(p) for p in pcm_list], dtype=np.int64)
    max_n = int(lengths.max()) if len(pcm_list) else 0
    batch = np.zeros((len(pcm_list), max_n), dtype=np.float32)
    for i, p in enumerate(pcm_list):
        batch[i, : len(p)] = p
    return batch, lengths


# ---------------------------------------------------------------------------
# file-level data parallelism over real devices
# ---------------------------------------------------------------------------

def process_files_data_parallel(
    pcm_list: list[np.ndarray],
    sample_rate: int,
    base_config=None,
    max_workers: int | None = None,
):
    """Master each file's PCM with its computation pinned to a device in
    round-robin — N devices run N files concurrently (the TPU analogue of
    the reference's `jobs = min(files, NumCPU)` pool)."""
    from ..pipeline.process import process_audio

    devices = jax.devices()
    n_dev = len(devices)
    workers = max_workers or min(len(pcm_list), max(1, n_dev))
    lock = threading.Lock()
    counter = [0]

    def run(pcm):
        with lock:
            dev = devices[counter[0] % n_dev]
            counter[0] += 1
        with jax.default_device(dev):
            return process_audio(pcm, sample_rate, base_config=base_config)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(run, pcm_list))


# ---------------------------------------------------------------------------
# batched fused master (the 64-episode back-catalogue configuration)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "sr", "out_rate", "nlm_enabled", "afftdn_enabled", "declick_enabled"))
def _batched_master_impl(
    x, gate_thr, gate_ratio, gate_range, comp_thr_lin, deess_i, nf_db,
    nr_db, band_shape, noise_bounds, speech_bounds, target_i, ttp_lin,
    chain_ir, kw_ir, tp_bank, deess_k, sr, out_rate,
    nlm_enabled, afftdn_enabled, declick_enabled,
):
    from ..pipeline.fused import _master_stage_a_tree, _master_stage_b_tree

    def one_file(xi, gt, gr, grange, ct, di, nf, nr, shape, nb, sb, ti, ttp):
        prefixed, offset_db, ma = _master_stage_a_tree(
            xi, gt, gr, grange, ct, di, nf, nr, shape,
            ti, ttp,
            nb, sb, chain_ir, kw_ir, tp_bank, deess_k,
            sr=sr, nlm_enabled=nlm_enabled, afftdn_enabled=afftdn_enabled,
        )
        z_chunks, mb = _master_stage_b_tree(
            prefixed, offset_db, ttp, nb, sb, kw_ir, tp_bank,
            sr=sr, out_rate=out_rate, declick_enabled=declick_enabled,
        )
        z = jnp.concatenate(z_chunks)
        return z, {
            "final_i": mb["final"]["integrated"],
            "final_tp": mb["final"]["true_peak"],
            "effective_i": ma["plan"]["effective_i"],
            "offset_db": ma["plan"]["offset_db"],
        }

    return jax.vmap(one_file)(
        x, gate_thr, gate_ratio, gate_range, comp_thr_lin, deess_i, nf_db,
        nr_db, band_shape, noise_bounds, speech_bounds, target_i, ttp_lin,
    )


def batched_master(
    x_batch,
    sample_rate: int,
    configs: list,
    measurements: list,
    out_rate: int = 44100,
    mesh: Mesh | None = None,
):
    """Master a (batch, n) block of equal-length files in ONE device
    program, dp-sharded over the mesh: the fused pass-2/3/4 stages vmapped
    over the batch axis with per-file adapted parameters as (batch,)
    operand arrays.  This is the back-catalogue sweep shape (BASELINE
    config 5): one compile serves every episode, chips split the batch.

    Variable lengths are the caller's concern (pad_to_batch + per-file
    trim); per-file delivery/publish stays on the host."""
    from ..pipeline.fused import _constants_for_rate

    chain_ir, kw_ir, tp_bank, deess_k = _constants_for_rate(
        sample_rate,
        configs[0].rumble_highpass.frequency,
        configs[0].bandlimit_lowpass.frequency,
    )

    def region_bounds(m, which):
        region = None
        if m is not None:
            if which == "noise":
                region = m.vad.noise_region
            elif m.vad.speech_profile is not None:
                region = m.vad.speech_profile.region
        if region is None:
            return np.zeros(2, np.int32)
        return np.asarray(
            [int(round(region.start * sample_rate)),
             int(round(region.end * sample_rate))], np.int32)

    def arr(fn, dtype=np.float32):
        return jnp.asarray(np.asarray([fn(c, m) for c, m in zip(configs, measurements)], dtype))

    ops = dict(
        gate_thr=arr(lambda c, m: c.speech_gate.threshold),
        gate_ratio=arr(lambda c, m: c.speech_gate.ratio),
        gate_range=arr(lambda c, m: c.speech_gate.range),
        comp_thr_lin=arr(lambda c, m: 10.0 ** (c.levelling_compressor.threshold / 20.0)),
        deess_i=arr(lambda c, m: c.deesser.intensity if c.deesser.enabled else 0.0),
        nf_db=arr(lambda c, m: c.noise_reduction.afftdn_noise_floor
                  if c.noise_reduction.afftdn_noise_floor != 0.0 else -50.0),
        nr_db=arr(lambda c, m: c.noise_reduction.afftdn_noise_reduction),
        band_shape=jnp.asarray(np.asarray(
            [np.asarray(c.noise_reduction.afftdn_band_noise, np.float32)
             if (c.noise_reduction.afftdn_noise_type == "custom"
                 and c.noise_reduction.afftdn_band_noise)
             else np.zeros(15, np.float32)
             for c in configs])),
        noise_bounds=jnp.asarray(np.stack(
            [region_bounds(m, "noise") for m in measurements])),
        speech_bounds=jnp.asarray(np.stack(
            [region_bounds(m, "speech") for m in measurements])),
        target_i=arr(lambda c, m: c.loudnorm.target_i),
        ttp_lin=arr(lambda c, m: 10.0 ** (c.loudnorm.target_tp / 20.0)),
    )

    # per-file DSP enable flags are jit statics: require a homogeneous
    # batch (the chunked path's bucket_files splits on _dsp_flags; callers
    # of this whole-file path must do the same)
    from .batch_chunked import _dsp_flags

    flag_set = {_dsp_flags(c) for c in configs}
    if len(flag_set) != 1:
        raise ValueError(
            f"batched_master mixes dsp-enable flags {sorted(flag_set)}; "
            "split the batch by _dsp_flags")
    nlm_enabled, afftdn_enabled, declick_enabled = next(iter(flag_set))

    x = jnp.asarray(x_batch, dtype=jnp.float32)
    if mesh is not None:
        sharding = NamedSharding(mesh, P("dp", None))
        x = jax.device_put(x, sharding)
        ops = {k: jax.device_put(v, NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1)))))
               for k, v in ops.items()}

    return _batched_master_impl(
        x, ops["gate_thr"], ops["gate_ratio"], ops["gate_range"],
        ops["comp_thr_lin"], ops["deess_i"], ops["nf_db"], ops["nr_db"],
        ops["band_shape"], ops["noise_bounds"], ops["speech_bounds"],
        ops["target_i"], ops["ttp_lin"],
        chain_ir, kw_ir, tp_bank, deess_k, sample_rate, out_rate,
        nlm_enabled, afftdn_enabled, declick_enabled,
    )


# ---------------------------------------------------------------------------
# the back-catalogue sweep end to end (BASELINE config 5)
# ---------------------------------------------------------------------------

def _shrink_mesh_for(mesh: Mesh | None, batch_size: int) -> Mesh | None:
    """dp sharding needs the batch divisible by the mesh; shrink to the
    largest divisor (1 -> single-device)."""
    if mesh is None or batch_size % mesh.devices.size == 0:
        return mesh
    d = max(k for k in range(1, mesh.devices.size + 1) if batch_size % k == 0)
    return make_mesh(d) if d > 1 else None


def process_back_catalogue(
    paths: list[str],
    out_dir: str | None = None,
    mesh: Mesh | None = None,
    base_config=None,
    progress=None,
) -> list[dict]:
    """Master a catalogue of episode files through batched device programs
    — the TPU-idiomatic form of BASELINE config 5 (64 x ~45-min episodes
    across a v5e-8 slice):

      1. files group by sample rate; each group's Pass-1 analysis runs as
         ONE vmapped device program per chunk slab (`batched_analysis`) —
         not N serial `analyse_audio` calls;
      2. adaptation runs per file on host (pure function);
      3. files bucket by (rate, ceil(n / C)) so padding never exceeds one
         ~2-min chunk (`bucket_files` — no pad-to-longest);
      4. each bucket masters through the CHUNKED fused passes vmapped over
         the file axis (`batched_master_chunked`): hour-scale episodes
         never materialise whole-file intermediates, mixed-length and
         mixed-rate catalogues just land in different buckets.

    Per-file isolation: a failing file reports its error and the rest
    continue (ref: pool.go:210-216) — at open/analysis granularity per
    file, at bucket granularity for the device passes.

    Returns one dict per file: {"path", "output_path", "output_lufs",
    "output_tp_db", "effective_target_i", "offset_db", "result":
    ProcessResult, "wall_secs"} or {"path", "error"}.  The CLI routes
    `result` through the same artefact spine as the per-file pool."""
    import os
    import time as _time

    from ..adaptive.adapt import adapt_config
    from ..adaptive.config import default_filter_config
    from ..io.audio import open_audio_file, save_flac
    from ..pipeline.process import ProcessResult, assemble_fused_stage_results
    from ..report.paths import output_audio_path
    from .batch_chunked import (
        BATCH_CHUNK_SECS,
        batched_analysis,
        batched_master_chunked,
        bucket_files,
    )
    from ..pipeline.fused_chunked import chunk_length

    if out_dir is not None:
        # the encoder opens a sibling dot-temp under out_dir; create it up
        # front so a missing directory fails here (clearly) rather than as
        # a per-file "failed to encode FLAC" after the device passes ran
        os.makedirs(out_dir, exist_ok=True)

    base = base_config or default_filter_config()
    t_all = _time.perf_counter()

    # ---- open (per-file isolation) + per-file upload-as-ready ----
    # Each mono file goes to the device the moment it decodes, with a tiny
    # dependent reduce DISPATCHED (not blocked on) to force the lazy wire
    # transfer to start — file i's upload then overlaps file i+1's decode,
    # the batch-path analogue of the pool's cross-process upload/compute
    # overlap (VERDICT r4 #6: the slab used to upload whole after ALL
    # decodes).  batched_analysis consumes device rows directly and slices
    # its chunk slabs on device — no second host transfer.
    opened, failures, _uploaders = [], [], []
    for p in paths:
        try:
            samples, meta = open_audio_file(p, raw_int16=True)
            if np.ndim(samples) == 1:
                dev = jax.device_put(jnp.asarray(samples))
                # force the lazy wire transfer NOW from a waiter thread
                # (block_until_ready releases the GIL) while this thread
                # decodes the next file; joined before the device passes
                t = threading.Thread(target=dev.block_until_ready,
                                     daemon=True)
                t.start()
                _uploaders.append(t)
                samples = dev
            opened.append({"path": p, "samples": samples, "meta": meta,
                           "sample_rate": meta.sample_rate,
                           "n_samples": int(np.shape(samples)[-1])})
        except Exception as e:  # ref: pool.go:210-216
            failures.append({"path": p, "error": str(e)})
    if not opened:
        return failures
    for t in _uploaders:
        t.join()

    # ---- batched Pass-1 per rate group + per-file adaptation ----
    t_an = _time.perf_counter()
    by_rate: dict[int, list[int]] = {}
    for i, e in enumerate(opened):
        by_rate.setdefault(e["sample_rate"], []).append(i)
    entries = []
    for sr, idxs in sorted(by_rate.items()):
        try:
            ms = batched_analysis([opened[i]["samples"] for i in idxs], sr,
                                  target_i=base.loudnorm.target_i, mesh=None)
        except Exception as e:
            for i in idxs:
                failures.append({"path": opened[i]["path"], "error": str(e)})
            continue
        for i, m in zip(idxs, ms):
            try:
                eff, diag = adapt_config(base, m)
                eff.resample.enabled = True
            except Exception as e:
                failures.append({"path": opened[i]["path"], "error": str(e)})
                continue
            opened[i]["samples"] = None          # mono lives on device now
            entries.append({**opened[i], "m": m, "eff": eff, "diag": diag,
                            "samples": None})
    analysis_wall = _time.perf_counter() - t_an
    if not entries:
        return failures

    # ---- bucket by (rate, n_chunks) and master each bucket ----
    chunk_len_for = {
        e["sample_rate"]: chunk_length(
            e["sample_rate"],
            e["eff"].resample.sample_rate or 44100,
            BATCH_CHUNK_SECS,
        )
        for e in entries
    }
    results = []
    buckets = bucket_files(entries, chunk_len_for)
    # Cap the file axis per device dispatch: a catalogue bucket can hold
    # dozens of episodes, and the vmapped chunk programs' intermediates
    # scale with the batch width (the per-chunk NLM/weight fields and the
    # follower state all carry a leading b axis) — HBM on real slices and
    # the CPU executor in the test mesh both want a bound.  Measured
    # 2026-08-19: a b=30 vmapped master aborted XLA:CPU's ThunkExecutor
    # outright; b<=16 (2 rows/chip on a v5e-8) runs everywhere.  Slabs of
    # one bucket share the same compiled programs (same (rate, n_chunks,
    # flags) key), so splitting costs no extra compiles.
    max_b = int(os.environ.get("JT_MAX_BUCKET_FILES", "16"))
    slabs = [(bi, idxs[s : s + max_b])
             for bi, idxs in enumerate(buckets)
             for s in range(0, len(idxs), max_b)]

    def _finalise_one(g, pcm_i, fm, sr, rate, share, an_share, timings, n_group):
        """Per-file host finalize: assemble stage results, encode FLAC,
        shape the outcome dict.  Runs on the finisher thread so slab N's
        encodes overlap slab N+1's device passes (the ctypes FLAC encoder
        and the device waits both release the GIL); all writes go through
        the thread-safe atomic publish, each to a distinct destination."""
        p = g["path"]
        try:
            filtered, final, norm = assemble_fused_stage_results(
                fm, g["m"], g["eff"], sr, int(g["m"].device_pcm.shape[-1]))
            res = ProcessResult(
                measurements=g["m"], effective_config=g["eff"],
                diagnostics=g["diag"], filtered=filtered, final=final,
                normalisation=norm, output_audio=pcm_i, output_rate=rate,
                pass_timings={
                    "analysis": an_share,
                    "processing": timings["stage_a"] / n_group,
                    "normalising": timings["stage_b"] / n_group,
                },
            )
            name_lufs = norm.output_lufs
            if not (name_lufs < 0.0):
                name_lufs = norm.effective_target_i or norm.requested_target_i
            out_path = output_audio_path(p, name_lufs)
            if out_dir is not None:
                out_path = os.path.join(out_dir, os.path.basename(out_path))
            save_flac(out_path, pcm_i, rate)
            return {
                "path": p,
                "output_path": out_path,
                "output_lufs": norm.output_lufs,
                "output_tp_db": norm.output_tp,
                "effective_target_i": norm.effective_target_i,
                "offset_db": norm.gain_applied_db,
                "result": res,
                "wall_secs": an_share + share,
            }
        except Exception as e:
            return {"path": p, "error": str(e)}

    finalise_futs = []
    finisher = ThreadPoolExecutor(max_workers=1)
    for si, (bi, idxs) in enumerate(slabs):
        group = [entries[i] for i in idxs]
        sr = group[0]["sample_rate"]
        out_rate = group[0]["eff"].resample.sample_rate or 44100
        t_b = _time.perf_counter()
        try:
            outs, rate, metrics_list, timings = batched_master_chunked(
                [g["m"] for g in group], [g["eff"] for g in group], sr,
                out_rate=out_rate, mesh=_shrink_mesh_for(mesh, len(group)),
                progress=(lambda f, _si=si: progress((_si + f) / len(slabs)))
                if progress else None,
            )
        except Exception as e:   # slab-level isolation
            for g in group:
                failures.append({"path": g["path"], "error": str(e)})
            continue
        bucket_wall = _time.perf_counter() - t_b
        share = bucket_wall / max(1, len(group))
        an_share = analysis_wall / max(1, len(entries))
        for g, pcm_i, fm in zip(group, outs, metrics_list):
            finalise_futs.append(finisher.submit(
                _finalise_one, g, pcm_i, fm, sr, rate, share, an_share,
                timings, max(1, len(group))))
    for fut in finalise_futs:
        r = fut.result()
        (failures if "error" in r else results).append(r)
    finisher.shutdown()
    total_wall = _time.perf_counter() - t_all
    for r in results:
        r["batch_wall_secs"] = total_wall
    # input order, like the pool's outcome list (cli/pool.run_pool):
    # bucketing/slabbing is an internal dispatch detail
    order = {p: i for i, p in enumerate(paths)}
    return sorted(results + failures,
                  key=lambda r: order.get(r["path"], 1 << 30))

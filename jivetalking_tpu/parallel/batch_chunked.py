"""Config-5-scale batch mastering: the chunked fused master vmapped over a
file batch.

Round 2's `batched_master` vmapped the WHOLE-FILE fused stages, so a real
back-catalogue batch (BASELINE config 5: 64 x ~45-min episodes) padded to
the longest file and materialised whole-file STFT/NLM intermediates per
lane — exactly what `fused_chunked.should_chunk` exists to prevent.  This
module composes the two parallel forms instead:

  * every per-chunk program of `pipeline.fused_chunked` (chain, de-esser,
    stage partials, limiter, stage B, resample, flat-factor) is wrapped in
    `jax.vmap` over a leading file axis — one compiled program per chunk
    shape serves every chunk of every file in the bucket, and the big
    intermediates exist one (batch, chunk) slab at a time;
  * follower/limiter carries become (batch,) vectors; the limiter plan and
    linear-mode offset evaluate the SHARED scalar laws
    (pipeline.normalise.limiter_plan_scalars / linear_mode_scalars) on
    per-file numpy vectors between chunk passes;
  * files bucket by (sample_rate, ceil(n / C)) — padding is at most ONE
    chunk (~2 min), never pad-to-longest (see `bucket_files`);
  * Pass-1 analysis is ONE vmapped device program per chunk slab
    (`batched_analysis`), not N serial `analyse_audio` calls: the per-chunk
    partial trees unpack per file through the same `_combine_analysis_parts`
    + `assemble_measurements` path the single-file streamed analysis uses.

The dp mesh shards the batch axis: `jax.vmap` + `NamedSharding(P("dp"))`
on the slab inputs lets XLA partition every chunk program across chips
with no collectives (file-level data parallelism over ICI).
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..adaptive.config import FilterConfig
from ..analysis.analyser import AudioMeasurements, assemble_measurements
from ..pipeline import fused_chunked as FC
from ..pipeline.fused import _constants_for_rate, _unpack_all
from ..pipeline.normalise import (
    BRICKWALL_TRUE_PEAK_HEADROOM_DB,
    limiter_plan_scalars,
    linear_mode_scalars,
)
from ..ops.resample import _banded_bank

# smaller than the single-file defaults: the (batch, ...) chunk
# intermediates multiply by the bucket size, so chunks shrink to keep the
# NLM/afftdn slabs inside HBM (8 lanes x 120 s @ 48 kHz ~ the same live
# bytes as 1 lane x 240 s with the reduced NLM block)
BATCH_CHUNK_SECS = 120.0
BATCH_NLM_BLOCK = 262144


# ---------------------------------------------------------------------------
# bucketing
# ---------------------------------------------------------------------------

def _dsp_flags(cfg) -> tuple[bool, bool, bool]:
    """The per-file adaptive enable flags that are STATIC in the vmapped
    chunk programs (nlm, afftdn, declick).  Files with different flags must
    land in different buckets — collapsing them across a bucket would let
    one file's adaptation (e.g. afftdn OFF on a voice_activated file,
    adapt.py:133-136) silently change every other file's audio."""
    nlm = bool(cfg.noise_reduction.enabled)
    return (nlm, nlm and bool(cfg.noise_reduction.afftdn_enabled),
            bool(cfg.adeclick.enabled))


def bucket_files(entries: list[dict], chunk_len_for: dict[int, int]) -> list[list[int]]:
    """Group file indices by (sample_rate, n_chunks, dsp-enable flags) so
    one padded batch never pads a file by more than one chunk (VERDICT r2:
    bucket by length instead of pad-to-longest) and never mixes files whose
    adapted configs need different static chunk programs.  `entries[i]`
    needs keys "sample_rate" and "n_samples" (plus "eff", the adapted
    config, when available); `chunk_len_for` maps rate -> C."""
    buckets: dict[tuple, list[int]] = {}
    for i, e in enumerate(entries):
        sr = e["sample_rate"]
        C = chunk_len_for[sr]
        n_chunks = max(1, -(-e["n_samples"] // C))
        flags = _dsp_flags(e["eff"]) if e.get("eff") is not None else None
        buckets.setdefault((sr, n_chunks, flags), []).append(i)
    # None (no "eff") and tuple flags can share a (rate, n_chunks) pair —
    # order the flagless bucket first rather than let sorted() compare
    # None against a tuple
    return [buckets[k] for k in
            sorted(buckets, key=lambda k: (k[0], k[1], k[2] is not None,
                                           k[2] or ()))]


# ---------------------------------------------------------------------------
# vmapped chunk programs (module-level caches: one jit per statics combo)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _slice_v(hl: int, C: int, hr: int):
    return jax.jit(jax.vmap(
        lambda padded, start: FC._slice_ext(padded, start, hl, C, hr),
        in_axes=(0, None)))


@functools.lru_cache(maxsize=16)
def _chain_v(sr, C, hl, hr, nlm_enabled, afftdn_enabled):
    def one(ext, envg, envc, gt, gr, grg, ct, nf, nr, shape, chain_ir):
        return FC._chain_chunk(
            ext, envg, envc, gt, gr, grg, ct, nf, nr, shape, chain_ir,
            sr=sr, C=C, hl=hl, hr=hr, nlm_enabled=nlm_enabled,
            afftdn_enabled=afftdn_enabled, nlm_block=BATCH_NLM_BLOCK)
    return jax.jit(jax.vmap(one, in_axes=(0,) * 10 + (None,)))


@functools.lru_cache(maxsize=16)
def _deess_v(sr, C):
    def one(left, c_k, right, envhf, envall, d_i, deess_k):
        return FC._deess_chunk(left, c_k, right, envhf, envall, d_i, deess_k,
                               sr=sr, C=C)
    return jax.jit(jax.vmap(one, in_axes=(0,) * 6 + (None,)))


@functools.lru_cache(maxsize=16)
def _partials_v(sr, C, hm, w):
    def one(ext, k0, n_total, nb, sb, kw_ir, tp_bank):
        return FC._stage_partials_packed(ext, k0, n_total, nb, sb, kw_ir,
                                         tp_bank, sr=sr, C=C, hm=hm, w=w)
    return jax.jit(jax.vmap(one, in_axes=(0, None, 0, 0, 0, None, None)))


@functools.lru_cache(maxsize=16)
def _loudpart_v(sr, C, hm):
    def one(ext, k0, n_total, kw_ir, tp_bank):
        return FC._loudness_partials(ext, k0, n_total, kw_ir, tp_bank,
                                     sr=sr, C=C, hm=hm)
    return jax.jit(jax.vmap(one, in_axes=(0, None, 0, None, None)))


@functools.lru_cache(maxsize=16)
def _limit_v(sr, C, lookahead):
    def one(y_k, head, pre, lim, w_in):
        return FC._limit_chunk(y_k, head, pre, lim, w_in,
                               sr=sr, C=C, lookahead=lookahead)
    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=16)
def _b_v(sr, C, declick_enabled, brick_lookahead):
    def one(left, p_k, right, off, brick, w_in):
        return FC._b_chunk(left, p_k, right, off, brick, w_in, sr=sr, C=C,
                           declick_enabled=declick_enabled,
                           brick_lookahead=brick_lookahead)
    return jax.jit(jax.vmap(one))


@functools.lru_cache(maxsize=16)
def _resample_v(L, M, taps, C):
    def one(left, z_k, right, B):
        return FC._resample_chunk(left, z_k, right, B, L=L, M=M, taps=taps, C=C)
    return jax.jit(jax.vmap(one, in_axes=(0, 0, 0, None)))


@functools.lru_cache(maxsize=16)
def _flat_v(C):
    def one(x_k, state, k0, n_total, gmin, gmax):
        return FC._flat_chunk(x_k, state, k0, n_total, gmin, gmax, C=C)
    return jax.jit(jax.vmap(one, in_axes=(0, 0, None, 0, 0, 0)))


@functools.lru_cache(maxsize=16)
def _analysis_v(sr, C, hm, w, il):
    def one(ext_raw, k0, n_total, kw_ir, tp_bank):
        return FC._analysis_chunk_packed(ext_raw, k0, n_total, kw_ir, tp_bank,
                                         sr=sr, C=C, hm=hm, w=w, il=il)
    return jax.jit(jax.vmap(one, in_axes=(0, None, 0, None, None)))


# ---------------------------------------------------------------------------
# batched Pass-1 analysis (VERDICT r2 #8)
# ---------------------------------------------------------------------------

def batched_analysis(
    pcm_list: list[np.ndarray],
    sample_rate: int,
    target_i: float = -16.0,
    measure_bands: bool = True,
    chunk_secs: float = 40.0,
    mesh: Mesh | None = None,
) -> list[AudioMeasurements]:
    """Pass-1 analysis for a same-rate batch as ONE vmapped device program
    per chunk slab: each file's metering partials compute in the same
    dispatch, so the analysis wall for a b-file bucket approaches the
    single-file wall (upload-bound on the dev tunnel).  Per-file VAD /
    elections / band measures then run host-side exactly as the
    single-file path does (`assemble_measurements`)."""
    b = len(pcm_list)
    sr = sample_rate
    if not FC.analysis_streaming_ok(sr):
        # degenerate chunk-grid alignment at this rate (see
        # analysis_streaming_ok): fall back to the whole-file program per
        # file — correctness over batching for the exotic-rate case
        from ..pipeline.fused import fused_analysis

        out = []
        for p in pcm_list:
            mono, tree = fused_analysis(p, sr)
            out.append(assemble_measurements(mono, tree, sr, target_i,
                                             measure_bands))
        return out
    C, hm, il, w = FC._analysis_geometry(sr, chunk_secs)
    lengths = [int(np.shape(p)[-1]) for p in pcm_list]

    # sub-bucket by chunk count (the master's bucket_files discipline): a
    # 5-min file grouped with 45-min episodes must not upload ~40 min of
    # dense zero slabs through the tunnel nor dispatch chunk programs whose
    # rows are entirely masked out
    groups: dict[int, list[int]] = {}
    for i, n_i in enumerate(lengths):
        groups.setdefault(max(1, -(-n_i // C)), []).append(i)
    if len(groups) > 1:
        from .batch import _shrink_mesh_for

        out_by_idx: dict[int, AudioMeasurements] = {}
        for nc in sorted(groups):
            idxs = groups[nc]
            sub = batched_analysis(
                [pcm_list[i] for i in idxs], sr, target_i, measure_bands,
                chunk_secs, _shrink_mesh_for(mesh, len(idxs)))
            for i, m in zip(idxs, sub):
                out_by_idx[i] = m
        return [out_by_idx[i] for i in range(len(pcm_list))]

    n_chunks = max(1, max(-(-n // C) for n in lengths))

    _, kw_ir, tp_bank, _ = _constants_for_rate(sr, 80.0, 20500.0)
    n_tot = jnp.asarray(np.asarray(lengths, np.int32))
    shard = (NamedSharding(mesh, P("dp", None)) if mesh is not None else None)

    # mono rows already ON DEVICE (process_back_catalogue's per-file
    # upload-as-ready path): pad each row to the chunk grid and stack once,
    # then every chunk slab is a device-side dynamic_slice — the analysis
    # performs no further host->device transfer at all.  The rows must
    # share ONE dtype: jnp.stack would silently VALUE-promote a mixed
    # int16/float32 batch (int16 100 -> 100.0f, not 100/32768), and the
    # chunk program's in-graph /32768 scaling keys on the slab dtype — a
    # mixed lossless+lossy catalogue falls back to the host path instead.
    all_dev = mesh is None and all(
        isinstance(p, jax.Array) and p.ndim == 1 for p in pcm_list
    ) and len({p.dtype for p in pcm_list}) == 1
    if all_dev:
        L = hm + n_chunks * C
        padded = jnp.stack([
            _pad_analysis_row(p, L, hm) for p in pcm_list])   # (b, L)
        slab_for = _slab_slice(b, hm + C)
    else:
        # one dtype for the batch: all-mono-int16 keeps the half-width upload
        all_i16 = all(np.asarray(p).dtype == np.int16 and np.ndim(p) == 1
                      for p in pcm_list)
        if all_i16:
            host = [np.asarray(p) for p in pcm_list]
        else:
            from ..io.audio import downmix_mono

            host = [np.asarray(downmix_mono(np.asarray(p)), dtype=np.float32)
                    for p in pcm_list]

    run = _analysis_v(sr, C, hm, w, il)
    mono_rows, packed_rows = [], []
    for k in range(n_chunks):
        s = k * C - hm
        if all_dev:
            dev = slab_for(padded, jnp.int32(k * C))
        else:
            slab = np.zeros((b, hm + C), dtype=host[0].dtype)
            for i, p in enumerate(host):
                lo = max(0, s)
                seg = p[lo : min(lengths[i], s + hm + C)]
                slab[i, lo - s : lo - s + seg.shape[0]] = seg
            dev = jax.device_put(jnp.asarray(slab), shard)
        mc, pk = run(dev, jnp.int32(k * C), n_tot, kw_ir, tp_bank)
        mono_rows.append(mc)
        packed_rows.append(pk)

    treedef, shapes, dtypes = FC._analysis_chunk_meta(sr, C, hm, w, il)
    for pk in packed_rows:
        pk.copy_to_host_async()
    packed_np = [np.asarray(pk) for pk in packed_rows]

    out: list[AudioMeasurements] = []
    for i in range(b):
        parts = [_unpack_all(packed_np[k][i], shapes, dtypes, treedef)
                 for k in range(n_chunks)]
        monos = [mono_rows[k][i] for k in range(n_chunks)]
        mono_i, tree_i = FC._combine_analysis_parts(
            parts, monos, lengths[i], sr, C, il, w)
        out.append(assemble_measurements(mono_i, tree_i, sr, target_i,
                                         measure_bands))
    return out


@functools.partial(jax.jit, static_argnames=("L", "hm"))
def _pad_analysis_row(row, L: int, hm: int):
    """Device-side [zeros(hm), row, zero tail] to length L, dtype kept
    (int16 rows stay int16 — the chunk program converts in-graph)."""
    out = jnp.zeros(L, row.dtype)
    return jax.lax.dynamic_update_slice(out, row, (hm,))


@functools.lru_cache(maxsize=16)
def _slab_slice(b: int, width: int):
    """Jitted (b, L) -> (b, width) chunk-slab slice at traced offset k*C
    (the left halo rides at hm, so slab k starts at padded column k*C)."""
    return jax.jit(lambda padded, start: jax.lax.dynamic_slice(
        padded, (jnp.int32(0), start), (b, width)))


@functools.partial(jax.jit, static_argnames=("npad", "hl", "hr"))
def _pad_row(row, npad: int, hl: int, hr: int):
    out = jnp.zeros(hl + npad + hr, jnp.float32)
    return jax.lax.dynamic_update_slice(out, row.astype(jnp.float32), (hl,))


@jax.jit
def _quant_s16(z):
    return jnp.clip(jnp.round(z * 32767.0), -32768.0, 32767.0).astype(jnp.int16)


# ---------------------------------------------------------------------------
# the batched chunked master
# ---------------------------------------------------------------------------

def batched_master_chunked(
    measurements: list[AudioMeasurements],
    cfgs: list[FilterConfig],
    sample_rate: int,
    out_rate: int = 44100,
    chunk_secs: float = BATCH_CHUNK_SECS,
    mesh: Mesh | None = None,
    progress=None,
) -> tuple[list[np.ndarray], int, list[dict], dict]:
    """Master a bucket of same-rate files (device-resident mono PCM on each
    `AudioMeasurements.device_pcm`) through the chunked fused passes with
    every per-chunk program vmapped over the file axis.  All files in the
    bucket share ceil(n/C) (see `bucket_files`); shorter files mask their
    pad tail via per-file n_total, exactly as the single-file chunked
    master masks its final chunk.

    Returns (per-file delivery int16 arrays, out_rate, per-file metrics
    trees in the `fused_master` shape, timings)."""
    t0 = time.perf_counter()
    b = len(measurements)
    sr = sample_rate
    C = FC.chunk_length(sr, out_rate, chunk_secs)
    lengths = [int(m.device_pcm.shape[-1]) for m in measurements]
    n_chunks = max(1, max(-(-n // C) for n in lengths))
    block_len = max(1, int(round(sr * 0.1)))
    w = max(2, int(round(0.05 * sr)))

    shard = (NamedSharding(mesh, P("dp", None)) if mesh is not None else None)
    shard1 = (NamedSharding(mesh, P("dp")) if mesh is not None else None)

    def dput(x, s=None):
        return jax.device_put(x, s) if s is not None else x

    # ---- per-file parameter vectors ----
    def vec(fn, dtype=np.float32):
        return dput(jnp.asarray(np.asarray(
            [fn(c, m) for c, m in zip(cfgs, measurements)], dtype)), shard1)

    def region_bounds(m, which):
        region = None
        if m is not None:
            if which == "noise":
                region = m.vad.noise_region
            elif m.vad.speech_profile is not None:
                region = m.vad.speech_profile.region
        if region is None:
            return np.zeros(2, np.int32)
        return np.asarray([int(round(region.start * sr)),
                           int(round(region.end * sr))], np.int32)

    gate_thr = vec(lambda c, m: c.speech_gate.threshold)
    gate_ratio = vec(lambda c, m: c.speech_gate.ratio)
    gate_range = vec(lambda c, m: c.speech_gate.range)
    comp_thr = vec(lambda c, m: 10.0 ** (c.levelling_compressor.threshold / 20.0))
    deess_i = vec(lambda c, m: c.deesser.intensity if c.deesser.enabled else 0.0)
    nf_db = vec(lambda c, m: c.noise_reduction.afftdn_noise_floor
                if c.noise_reduction.afftdn_noise_floor != 0.0 else -50.0)
    nr_db = vec(lambda c, m: c.noise_reduction.afftdn_noise_reduction)
    shape = dput(jnp.asarray(np.asarray(
        [np.asarray(c.noise_reduction.afftdn_band_noise, np.float32)
         if (c.noise_reduction.afftdn_noise_type == "custom"
             and c.noise_reduction.afftdn_band_noise)
         else np.zeros(15, np.float32) for c in cfgs])), shard)
    noise_b = dput(jnp.asarray(np.stack(
        [region_bounds(m, "noise") for m in measurements])), shard)
    speech_b = dput(jnp.asarray(np.stack(
        [region_bounds(m, "speech") for m in measurements])), shard)
    n_tot = dput(jnp.asarray(np.asarray(lengths, np.int32)), shard1)

    # per-bucket statics: bucket_files keys on _dsp_flags, so every file in
    # the bucket shares them — reject a mis-bucketed call rather than
    # silently master one file with another's flags
    flag_set = {_dsp_flags(c) for c in cfgs}
    if len(flag_set) != 1:
        raise ValueError(
            f"bucket mixes dsp-enable flags {sorted(flag_set)}; "
            "bucket_files must key on _dsp_flags")
    nlm_enabled, afftdn_enabled, declick_enabled = next(iter(flag_set))
    target_i = np.asarray([c.loudnorm.target_i for c in cfgs], np.float64)
    target_tp_db = np.asarray([c.loudnorm.target_tp for c in cfgs], np.float64)

    chain_ir, kw_ir, tp_bank, deess_k = _constants_for_rate(
        sr, cfgs[0].rumble_highpass.frequency,
        cfgs[0].bandlimit_lowpass.frequency)

    def report(frac):
        if progress is not None:
            progress(frac)

    # ---- padded (b, hl + n_chunks*C + hr) batch ----
    hl, hr = 16384, 4096
    padded = jnp.stack([_pad_row(m.device_pcm, n_chunks * C, hl, hr)
                        for m in measurements])
    padded = dput(padded, shard)

    # ---- CHAIN ----
    zerob = dput(jnp.zeros(b, jnp.float32), shard1)
    envg = envc = zerob
    slice_r = _slice_v(hl, C, hr)
    chain_r = _chain_v(sr, C, hl, hr, nlm_enabled, afftdn_enabled)
    cchunks = []
    for k in range(n_chunks):
        ext = slice_r(padded, jnp.int32(k * C))
        c_k, envg, envc = chain_r(ext, envg, envc, gate_thr, gate_ratio,
                                  gate_range, comp_thr, nf_db, nr_db, shape,
                                  chain_ir)
        cchunks.append(c_k)
        report(0.30 * (k + 1) / n_chunks)
    padded = None

    # ---- DEESS + filtered partials ----
    delay = (int(deess_k.shape[0]) - 1) // 2
    hm = max(4096, w - 1, FC.SPEC_WIN)
    hm = -(-hm // FC.SPEC_HOP) * FC.SPEC_HOP
    deess_r = _deess_v(sr, C)
    partials_r = _partials_v(sr, C, hm, w)
    zeros_delay = dput(jnp.zeros((b, delay), jnp.float32), shard)
    zeros_hm = dput(jnp.zeros((b, hm), jnp.float32), shard)
    envhf = envall = zerob
    ychunks, packed_f = [], []
    for k in range(n_chunks):
        left = cchunks[k - 1][:, -delay:] if k > 0 else zeros_delay
        right = cchunks[k + 1][:, :delay] if k + 1 < n_chunks else zeros_delay
        y_k, envhf, envall = deess_r(left, cchunks[k], right, envhf, envall,
                                     deess_i, deess_k)
        ychunks.append(y_k)
        yl = ychunks[k - 1][:, -hm:] if k > 0 else zeros_hm
        packed_f.append(partials_r(jnp.concatenate([yl, y_k], axis=1),
                                   jnp.int32(k * C), n_tot, noise_b, speech_b,
                                   kw_ir, tp_bank))
        report(0.30 + 0.25 * (k + 1) / n_chunks)
    cchunks = None

    for p in packed_f:
        p.copy_to_host_async()
    treedef, shapes, dtypes = FC._stage_partials_meta(sr, C, hm, w)
    packed_f_np = [np.asarray(p) for p in packed_f]
    n_blocks = [max(1, n // block_len) for n in lengths]

    def per_file_parts(packed_np):
        return [[_unpack_all(packed_np[k][i], shapes, dtypes, treedef)
                 for k in range(n_chunks)] for i in range(b)]

    parts_f = per_file_parts(packed_f_np)
    loud_f = [FC._combine_loudness([p["bp"] for p in parts_f[i]], n_blocks[i],
                                   [float(p["tp_max"]) for p in parts_f[i]],
                                   [float(p["speak_max"]) for p in parts_f[i]])
              for i in range(b)]
    t_stage_a = time.perf_counter() - t0

    # ---- plan per file (the shared scalar law, numpy vectors) ----
    measured_i = np.asarray([float(l["integrated"]) for l in loud_f])
    measured_tp_db = np.asarray(
        [20.0 * math.log10(max(float(l["true_peak"]), 1e-12)) for l in loud_f])
    hp = limiter_plan_scalars(measured_i, measured_tp_db, target_i,
                              target_tp_db, xp=np)
    needed = np.asarray(hp["needed"], bool)
    pre_gain_db = np.asarray(hp["pre_gain_db"], np.float64)
    ceiling_db = np.asarray(hp["ceiling_db"], np.float64)

    # ---- filtered astats (+ flat pass over y) ----
    ast_f = [FC._combine_astats(parts_f[i], lengths[i], w) for i in range(b)]
    flat_r = _flat_v(C)

    def run_flat_batch(chunks, asts):
        gmin = dput(jnp.asarray(np.asarray(
            [float(a["min_level"]) for a in asts], np.float32)), shard1)
        gmax = dput(jnp.asarray(np.asarray(
            [float(a["max_level"]) for a in asts], np.float32)), shard1)
        falseb = dput(jnp.zeros(b, bool), shard1)
        state = (zerob, zerob, zerob, zerob, falseb, falseb)
        for k in range(len(chunks)):
            state = flat_r(chunks[k], state, jnp.int32(k * C), n_tot, gmin, gmax)
        s_np = [np.asarray(s) for s in state]
        for i, a in enumerate(asts):
            a["min_count"] = np.float32(s_np[0][i])
            a["max_count"] = np.float32(s_np[1][i])
            a["min_runs"] = np.float32(max(1.0, float(s_np[2][i])))
            a["max_runs"] = np.float32(max(1.0, float(s_np[3][i])))
        return asts

    ast_f = run_flat_batch(ychunks, ast_f)

    # ---- LIMIT + pass-3 partials ----
    t1 = time.perf_counter()
    lookahead = max(1, int(round(5.0 * sr / 1000.0)))
    pre_lin = dput(jnp.asarray(np.where(needed, 10.0 ** (pre_gain_db / 20.0),
                                        1.0).astype(np.float32)), shard1)
    limit_lin = dput(jnp.asarray(np.where(needed, 10.0 ** (ceiling_db / 20.0),
                                          1e9).astype(np.float32)), shard1)
    w_carry = dput(jnp.full(b, -3.0e38, jnp.float32), shard1)
    limit_r = _limit_v(sr, C, lookahead)
    loudp_r = _loudpart_v(sr, C, 4096)
    zeros_la = dput(jnp.zeros((b, lookahead), jnp.float32), shard)
    zeros_4096 = dput(jnp.zeros((b, 4096), jnp.float32), shard)
    pchunks, p3 = [], []
    for k in range(n_chunks):
        head = ychunks[k + 1][:, :lookahead] if k + 1 < n_chunks else zeros_la
        p_k, w_carry = limit_r(ychunks[k], head, pre_lin, limit_lin, w_carry)
        pchunks.append(p_k)
        pl = pchunks[k - 1][:, -4096:] if k > 0 else zeros_4096
        p3.append(loudp_r(jnp.concatenate([pl, p_k], axis=1),
                          jnp.int32(k * C), n_tot, kw_ir, tp_bank))
        report(0.55 + 0.15 * (k + 1) / n_chunks)
    ychunks = None

    # each p3 element is (b, nb+2) packed [bp..., tp, speak] rows
    p3_np = [np.asarray(pk) for pk in p3]
    loud_m = [FC._combine_loudness([pk[i, :-2] for pk in p3_np], n_blocks[i],
                                   [float(pk[i, -2]) for pk in p3_np],
                                   [float(pk[i, -1]) for pk in p3_np])
              for i in range(b)]
    m_i = np.asarray([float(l["integrated"]) for l in loud_m])
    m_tp_db = np.asarray(
        [20.0 * math.log10(max(float(l["true_peak"]), 1e-12)) for l in loud_m])
    _, effective_i, offset_db = linear_mode_scalars(m_i, m_tp_db, target_i,
                                                    xp=np)

    # ---- B + final partials + delivery ----
    g = math.gcd(sr, out_rate)
    L, M = out_rate // g, sr // g
    B = None
    taps = 0
    if out_rate != sr:
        B_np, taps = _banded_bank(L, M)
        B = jnp.asarray(B_np)
    off_lin = dput(jnp.asarray(
        (10.0 ** (np.asarray(offset_db) / 20.0)).astype(np.float32)), shard1)
    brick_lin = dput(jnp.asarray((10.0 ** (
        (target_tp_db - BRICKWALL_TRUE_PEAK_HEADROOM_DB) / 20.0
    )).astype(np.float32)), shard1)
    b_look = max(1, int(round(sr / 1000.0)))
    hb = max(8, int(round(55.0 * sr / 1000.0)))
    b_r = _b_v(sr, C, declick_enabled, b_look)
    w_carry = dput(jnp.full(b, -3.0e38, jnp.float32), shard1)
    zeros_hb = dput(jnp.zeros((b, hb), jnp.float32), shard)
    zchunks, packed_z, out_chunks = [], [], []
    if out_rate != sr:
        half = taps // 2
        slack = taps + 2 * M
        res_r = _resample_v(L, M, taps, C)
        zeros_half = dput(jnp.zeros((b, half), jnp.float32), shard)
        zeros_slack = dput(jnp.zeros((b, slack), jnp.float32), shard)

    def emit_delivery(j):
        # delivery slab for chunk j (one behind the B stream when
        # resampling — it needs the right neighbour); the host pull starts
        # IMMEDIATELY so the multi-MB downlink overlaps the remaining
        # B/partials compute instead of queueing after it — the same
        # pattern as the single-file chunked master's emit_delivery
        # (pipeline/fused_chunked.py), which measured the batch path's
        # biggest wire stall (BENCH_NOTES 2026-08-18: 4x300 s at 35.1x
        # with the whole delivery serialised after compute)
        if out_rate != sr:
            left = zchunks[j - 1][:, -half:] if j > 0 else zeros_half
            right = (zchunks[j + 1][:, :slack] if j + 1 < n_chunks
                     else zeros_slack)
            c = res_r(left, zchunks[j], right, B)
        else:
            c = _quant_s16(zchunks[j])
        c.copy_to_host_async()
        out_chunks.append(c)

    for k in range(n_chunks):
        left = pchunks[k - 1][:, -hb:] if k > 0 else zeros_hb
        right = pchunks[k + 1][:, :hb] if k + 1 < n_chunks else zeros_hb
        z_k, w_carry = b_r(left, pchunks[k], right, off_lin, brick_lin, w_carry)
        zchunks.append(z_k)
        zl = zchunks[k - 1][:, -hm:] if k > 0 else zeros_hm
        packed_z.append(partials_r(jnp.concatenate([zl, z_k], axis=1),
                                   jnp.int32(k * C), n_tot, noise_b, speech_b,
                                   kw_ir, tp_bank))
        if k >= 1:
            emit_delivery(k - 1)
        report(0.70 + 0.20 * (k + 1) / n_chunks)
    emit_delivery(n_chunks - 1)

    for p in packed_z:
        p.copy_to_host_async()
    packed_z_np = [np.asarray(p) for p in packed_z]
    parts_z = per_file_parts(packed_z_np)
    loud_z = [FC._combine_loudness([p["bp"] for p in parts_z[i]], n_blocks[i],
                                   [float(p["tp_max"]) for p in parts_z[i]],
                                   [float(p["speak_max"]) for p in parts_z[i]])
              for i in range(b)]
    ast_z = run_flat_batch(zchunks, [FC._combine_astats(parts_z[i], lengths[i], w)
                                     for i in range(b)])

    def spec_means(parts):
        cnt = max(1, int(sum(int(p["spec_count"]) for p in parts)))
        keys = parts[0]["spec_sums"].keys()
        return {k: np.float32(sum(float(p["spec_sums"][k]) for p in parts) / cnt)
                for k in keys}

    nb_np = np.asarray(noise_b)
    sb_np = np.asarray(speech_b)
    metrics_list = []
    for i in range(b):
        metrics_list.append({
            "filtered": loud_f[i],
            "filtered_astats": ast_f[i],
            "filtered_spectral": spec_means(parts_f[i]),
            "pass3": loud_m[i],
            "final": loud_z[i],
            "final_astats": ast_z[i],
            "final_spectral": spec_means(parts_z[i]),
            "regions": {
                "filtered_noise": FC._combine_region(parts_f[i], "noise", loud_f[i], nb_np[i], sr),
                "filtered_speech": FC._combine_region(parts_f[i], "speech", loud_f[i], sb_np[i], sr),
                "final_noise": FC._combine_region(parts_z[i], "noise", loud_z[i], nb_np[i], sr),
                "final_speech": FC._combine_region(parts_z[i], "speech", loud_z[i], sb_np[i], sr),
            },
            "plan": {
                "needed": np.bool_(needed[i]),
                "clamped": np.bool_(bool(hp["clamped"][i])),
                "ceiling_db": np.float32(ceiling_db[i]),
                "pre_gain_db": np.float32(pre_gain_db[i]),
                "gain_db": np.float32(hp["gain_db"][i]),
                "measured_i": np.float32(m_i[i]),
                "measured_tp_db": np.float32(m_tp_db[i]),
                "effective_i": np.float32(effective_i[i]),
                "offset_db": np.float32(offset_db[i]),
            },
        })

    # delivery pulls: per-chunk slabs, then per-file trim
    for c in out_chunks:
        c.copy_to_host_async()
    out_np = [np.asarray(c) for c in out_chunks]
    outs = []
    for i in range(b):
        n_out = lengths[i] * L // M if out_rate != sr else lengths[i]
        outs.append(np.concatenate([c[i] for c in out_np])[:n_out])

    report(1.0)
    return outs, out_rate, metrics_list, {
        "stage_a": t_stage_a,
        "stage_b": time.perf_counter() - t1,
    }

"""Sequence-parallel (sp-axis) exactness: the sharded recurrence/FIR/limiter
formulations must reproduce the single-device results bit-for-bit-ish
(f32 tolerance) on the virtual mesh — the carried-filter-state contract of
SURVEY.md §2.3 re-expressed as cross-shard prefix combines."""

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

from jivetalking_tpu.ops.dynamics import linear_recurrence
from jivetalking_tpu.ops.limiter import _maxplus_prefix
from jivetalking_tpu.parallel.sequence import (
    sharded_fir,
    sharded_gated_loudness,
    sharded_linear_recurrence,
    sharded_maxplus_prefix,
)

SP = 4
BATCH = 2
N = SP * 2048


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:SP]).reshape(1, SP)
    return Mesh(devices, ("dp", "sp"))


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P(None, "sp")))


class TestShardedLinearRecurrence:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(0)
        # release-like coefficients (near 1) and rms detector inputs
        a = (1.0 - 10 ** rng.uniform(-4, -2, (BATCH, N))).astype(np.float32)
        b = (rng.uniform(0, 1e-3, (BATCH, N))).astype(np.float32)
        want = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b)))

        f = jax.jit(shard_map(
            functools.partial(sharded_linear_recurrence, axis_name="sp"),
            mesh=mesh, in_specs=(P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        ))
        got = np.asarray(f(_shard(mesh, a), _shard(mesh, b)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    def test_carry_actually_crosses_shards(self, mesh):
        # an impulse in shard 0 must decay INTO shards 1..3
        a = np.full((1, N), 0.999, np.float32)
        b = np.zeros((1, N), np.float32)
        b[0, 10] = 1.0
        f = jax.jit(shard_map(
            functools.partial(sharded_linear_recurrence, axis_name="sp"),
            mesh=mesh, in_specs=(P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        ))
        got = np.asarray(f(_shard(mesh, a), _shard(mesh, b)))
        local = N // SP
        assert got[0, local + 5] > 0  # second shard sees the decayed impulse
        want = 0.999 ** (local + 5 - 10)
        assert got[0, local + 5] == pytest.approx(want, rel=1e-4)


class TestShardedMaxplus:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(1)
        v = rng.uniform(-40, 0, N).astype(np.float32)
        c = -1.0 / 4800.0
        want = np.asarray(_maxplus_prefix(jnp.asarray(v), c))

        f = jax.jit(shard_map(
            functools.partial(sharded_maxplus_prefix, c=c, axis_name="sp"),
            mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
        ))
        got = np.asarray(f(jax.device_put(v, NamedSharding(mesh, P("sp")))))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


class TestShardedFIR:
    def test_matches_causal_convolution(self, mesh):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((BATCH, N)).astype(np.float32)
        ir = (rng.standard_normal(65) * np.exp(-np.arange(65) / 8)).astype(np.float32)
        want = np.stack([np.convolve(row, ir)[:N] for row in x]).astype(np.float32)

        f = jax.jit(shard_map(
            functools.partial(sharded_fir, ir=jnp.asarray(ir), axis_name="sp"),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"),
        ))
        got = np.asarray(f(_shard(mesh, x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestShardedGatedLoudness:
    def test_matches_unsharded_gating(self, mesh):
        rng = np.random.default_rng(3)
        # block powers with a loud region and a quiet tail (gating active)
        bp = np.concatenate([
            rng.uniform(1e-3, 1e-2, (BATCH, 16)),
            rng.uniform(1e-9, 1e-8, (BATCH, 16)),
        ], axis=1).astype(np.float32)

        # unsharded reference of the same gating maths
        ml = -0.691 + 10 * np.log10(np.maximum(bp, 1e-15))
        m1 = ml > -70.0
        mean_p = (bp * m1).sum(1) / np.maximum(m1.sum(1), 1)
        rel = -0.691 + 10 * np.log10(np.maximum(mean_p, 1e-15)) - 10.0
        m2 = m1 & (ml > rel[:, None])
        want = -0.691 + 10 * np.log10(
            np.maximum((bp * m2).sum(1) / np.maximum(m2.sum(1), 1), 1e-15))

        f = jax.jit(shard_map(
            functools.partial(sharded_gated_loudness, axis_name="sp"),
            mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None),
        ))
        got = np.asarray(f(_shard(mesh, bp)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

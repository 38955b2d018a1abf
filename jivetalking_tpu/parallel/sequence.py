"""Sequence-parallel (sp-axis) formulations of the sequential ops.

The reference streams each file through a frame loop with carried filter
state (biquad z^-1/z^-2, envelope-follower state, limiter release state;
SURVEY.md §2.3 / §5 "long-context").  Sharding the TIME axis over a mesh
re-expresses that carried state as a cross-shard prefix combine:

  * each shard solves its recurrence locally with a zero carry-in
    (ops/dynamics.linear_recurrence — itself a two-level scan-free
    parallel prefix), and exposes (decay_product, end_state);
  * the carries obey the SAME first-order recurrence over shards, so a
    log2(sp)-round `ppermute` Hillis-Steele over (A, B) pairs yields each
    shard's exclusive carry-in over ICI;
  * a positionwise correction `y += prefix_decay * carry_in` makes the
    sharded result EXACTLY equal to the single-device solve (pinned by
    tests/test_parallel_sequence.py).

The same machinery works in the max-plus semiring for the limiter's
release prefix (`sharded_maxplus_prefix`), and FIR convolutions exchange
a (K-1)-sample halo (`sharded_fir`).  Global R128 gating reductions are
`psum`s (see batched_integrated_loudness and __graft_entry__).

These run under `shard_map` with an `sp` mesh axis; on a real slice the
ppermutes ride ICI.  No tp/pp/ep exists here — a mastering pipeline has
no weight matrices to shard; dp x sp is the whole story.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.dynamics import linear_recurrence


def _axis_size(axis_name: str) -> int:
    return jax.lax.psum(1, axis_name)


def sharded_fir(x: jnp.ndarray, ir: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Causal FIR over a time axis sharded on `axis_name`.

    `x` is the local (batch, n_local) shard; each shard receives the
    previous shard's last (K-1) samples as a halo (zero history for the
    first shard) so the result equals the unsharded causal convolution."""
    sp = _axis_size(axis_name)
    k = int(ir.shape[0])
    halo = k - 1
    left = jax.lax.ppermute(
        x[:, -halo:], axis_name,
        [(i, (i + 1) % sp) for i in range(sp)],
    )
    idx = jax.lax.axis_index(axis_name)
    left = jnp.where(idx == 0, 0.0, left)
    ext = jnp.concatenate([left, x], axis=1)
    return jax.vmap(lambda r: jnp.convolve(r, ir, mode="valid"))(ext)


def _ppermute_prefix(A_end, B_end, axis_name: str):
    """Exclusive cross-shard prefix of the first-order-recurrence monoid:
    returns each shard's carry-in = the recurrence state at the end of the
    previous shard.  log2(sp) ppermute rounds (Hillis-Steele), all on ICI."""
    sp = _axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # inclusive prefix over shards
    A, B = A_end, B_end
    s = 1
    while s < sp:
        A_in = jax.lax.ppermute(A, axis_name, [(i, (i + s) % sp) for i in range(sp)])
        B_in = jax.lax.ppermute(B, axis_name, [(i, (i + s) % sp) for i in range(sp)])
        take = idx >= s
        A, B = (
            jnp.where(take, A_in * A, A),
            jnp.where(take, A * B_in + B, B),
        )
        s *= 2
    # exclusive: shift right by one shard
    carry = jax.lax.ppermute(B, axis_name, [(i, (i + 1) % sp) for i in range(sp)])
    return jnp.where(idx == 0, 0.0, carry)


def sharded_linear_recurrence(
    a: jnp.ndarray, b: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Solve y[t] = a[t]*y[t-1] + b[t] with the time axis sharded on
    `axis_name` (local shape (..., n_local)); exactly equals the
    single-device `linear_recurrence` over the concatenated axis."""
    y_local = linear_recurrence(a, b)
    # positionwise prefix decay: p[t] = prod a[0..t]  (b = 0, y0 = 1)
    prefix_decay = linear_recurrence(a, jnp.zeros_like(a), 1.0)
    A_end = prefix_decay[..., -1]
    y_end = y_local[..., -1]
    carry = _ppermute_prefix(A_end, y_end, axis_name)
    return y_local + prefix_decay * carry[..., None]


def _ppermute_maxplus_prefix(P_end, shift, axis_name: str):
    """Exclusive cross-shard max-plus prefix: carry_i = max over j < i of
    P_end[j] + (i - j - 1) * shift (the release decay accumulated over the
    shards in between)."""
    sp = _axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    neg = jnp.float32(-3.0e38)
    P = P_end
    s = 1
    while s < sp:
        P_in = jax.lax.ppermute(P, axis_name, [(i, (i + s) % sp) for i in range(sp)])
        take = idx >= s
        P = jnp.where(take, jnp.maximum(P, P_in + s * shift), P)
        s *= 2
    carry = jax.lax.ppermute(P, axis_name, [(i, (i + 1) % sp) for i in range(sp)])
    return jnp.where(idx == 0, neg, carry)


def sharded_maxplus_prefix(v: jnp.ndarray, c, axis_name: str) -> jnp.ndarray:
    """w[t] = max(v[t], w[t-1] + c) with the time axis sharded on
    `axis_name` (local shape (n_local,) per batch row handled by vmap
    outside); exact sequence-parallel form of the limiter's log-domain
    release prefix (ops/limiter._maxplus_prefix)."""
    from ..ops.limiter import _maxplus_prefix

    n_local = v.shape[-1]
    w_local = _maxplus_prefix(v, c)
    # carry shifted by each position's distance from the shard start:
    # w[t] = max(w_local[t], carry_in + (t+1)*c)
    P_end = w_local[..., -1]
    carry = _ppermute_maxplus_prefix(P_end, n_local * c, axis_name)
    steps = (jnp.arange(n_local, dtype=jnp.float32) + 1.0) * c
    return jnp.maximum(w_local, carry[..., None] + steps)


def sharded_gated_loudness(kx_blocks_power: jnp.ndarray, axis_name: str):
    """Gated integrated loudness over sp-sharded 100 ms block powers:
    the absolute and relative gating passes each need GLOBAL sums, which
    are `psum`s over the mesh (SURVEY.md §2.3 collectives).
    kx_blocks_power: (batch, n_blocks_local) K-weighted mean-square per
    block (dual-mono doubling already applied)."""
    bp = kx_blocks_power
    ml = -0.691 + 10.0 * jnp.log10(jnp.maximum(bp, 1e-15))
    abs_mask = ml > -70.0
    s1 = jax.lax.psum(jnp.sum(jnp.where(abs_mask, bp, 0.0), axis=1), axis_name)
    c1 = jax.lax.psum(jnp.sum(abs_mask, axis=1), axis_name)
    mean_p = s1 / jnp.maximum(c1, 1)
    rel = -0.691 + 10.0 * jnp.log10(jnp.maximum(mean_p, 1e-15)) - 10.0
    rel_mask = abs_mask & (ml > rel[..., None])
    s2 = jax.lax.psum(jnp.sum(jnp.where(rel_mask, bp, 0.0), axis=1), axis_name)
    c2 = jax.lax.psum(jnp.sum(rel_mask, axis=1), axis_name)
    gated = s2 / jnp.maximum(c2, 1)
    return -0.691 + 10.0 * jnp.log10(jnp.maximum(gated, 1e-15))

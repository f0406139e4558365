"""Distributed systematic resampling as explicit collectives.

Design (SURVEY §7.3 "Distributed systematic resampling"): each shard holds
P/D particles. The global inverse-CDF lookup needs the *global* weight
prefix-sum; particle payload exchange is an all-gather (particle state is
tiny — pose+weight is 16 bytes — so at practical particle counts the gather
rides ICI far below the EDT's cost; a ppermute-based exchange is the upgrade
path if payloads ever grow maps).

Written with ``shard_map`` so the collectives (psum / all_gather) are explicit
and unit-testable on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_resample_kernel(logw, poses, prev_poses, u0, axis_name: str):
    """Runs per-shard under shard_map. logw/poses are the local shards."""
    p_local = logw.shape[0]
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    p_global = p_local * d

    # Global normalization: max then sum-exp via psum.
    gmax = jax.lax.pmax(jnp.max(logw), axis_name)
    w = jnp.exp(logw - gmax)
    total = jax.lax.psum(jnp.sum(w), axis_name)
    w = w / total

    # Global cumulative weights: exclusive prefix of shard totals via psum
    # of masked contributions, plus local cumsum.
    shard_sum = jnp.sum(w)
    # all-gather shard totals (D,) then take prefix below my index
    totals = jax.lax.all_gather(shard_sum, axis_name)        # (D,)
    prefix = jnp.sum(jnp.where(jnp.arange(d) < my, totals, 0.0))
    local_cum = prefix + jnp.cumsum(w)                        # (P/D,) global cdf slice

    # Each shard draws its own slice of the global systematic comb:
    # u_i = (u0 + i) / P for i in [my*P/D, (my+1)*P/D)
    i0 = my * p_local
    u = (u0 + i0 + jnp.arange(p_local, dtype=jnp.float32)) / p_global

    # Gather the full cdf and payloads (small), then local searchsorted.
    cdf = jax.lax.all_gather(local_cum, axis_name).reshape(p_global)
    all_poses = jax.lax.all_gather(poses, axis_name).reshape(p_global, -1)
    all_prev = jax.lax.all_gather(prev_poses, axis_name).reshape(p_global, -1)
    idx = jnp.clip(jnp.searchsorted(cdf, u), 0, p_global - 1)
    return all_poses[idx], all_prev[idx], idx.astype(jnp.int32)


def distributed_systematic_resample(mesh: Mesh, logw, poses, prev_poses, u0,
                                    axis_name: str = "particles"):
    """Resample sharded particles. Inputs sharded on leading axis over
    ``axis_name``; returns (new_poses, new_prev, ancestor_idx) with the same
    sharding. ``u0`` is the shared uniform draw in [0, 1)."""
    spec = P(axis_name)
    fn = functools.partial(_local_resample_kernel, axis_name=axis_name)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(spec, spec, spec, P()),
        out_specs=(spec, spec, spec),
    )(logw, poses, prev_poses, u0)

"""Particle-axis sharded EKF-FastSLAM bank (pjit/GSPMD path).

BASELINE config 2's model family on a device mesh: every leaf of
``EkfSlamState`` is leading-(P,) (poses, weights, landmark means/covs/seen
masks), so the bank shards over the ``particles`` mesh axis exactly like the
grid PF (``parallel/sharded.py``). The per-(particle, landmark) 2x2 EKF
algebra and the Gauss-Newton proposal refinement are embarrassingly
parallel; the only cross-shard operations are the weight normalization
(max/softmax/sum — psum-lowered by GSPMD) and systematic resampling, whose
ancestor gather XLA turns into the all-gather exchange the hand-written
``parallel/resampling.py`` spells out explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_slam_tpu.models.ekf_slam import EkfSlamConfig, EkfSlamState, ekf_slam_step_ml

_SHARDED_LEAVES = ("poses", "prev_poses", "logw", "lm_mean", "lm_cov",
                   "lm_seen")


def state_shardings(state: EkfSlamState, mesh: Mesh):
    """PartitionSpec pytree: per-particle leaves sharded, rng replicated."""
    ps = NamedSharding(mesh, P("particles"))
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        name = path[0].name if path else ""
        return ps if name in _SHARDED_LEAVES else rep

    return jax.tree_util.tree_map_with_path(spec, state)


def place_state(state: EkfSlamState, mesh: Mesh) -> EkfSlamState:
    """Place an EkfSlamState onto the mesh (multi-process-safe callback API,
    same rationale as ``parallel/mesh.shard_particle_state``)."""
    ps = NamedSharding(mesh, P("particles"))
    rep = NamedSharding(mesh, P())

    def place(path, leaf):
        leaf = np.asarray(leaf)
        name = path[0].name if path else ""
        sh = ps if name in _SHARDED_LEAVES else rep
        return jax.make_array_from_callback(
            leaf.shape, sh, lambda idx, l=leaf: l[idx])

    return jax.tree_util.tree_map_with_path(place, state)


def make_sharded_ekf_step(ekf_cfg: EkfSlamConfig, mesh: Mesh):
    """Returns (step_fn, place_fn): the jitted mesh-sharded ML-association
    step. ``step_fn(state, obs, obs_valid, odo) -> (state, est_pose)``."""

    def step(state, obs, obs_valid, odo):
        new_state, est = ekf_slam_step_ml(state, obs, obs_valid, ekf_cfg,
                                          odo=odo)
        spec = state_shardings(new_state, mesh)
        new_state = jax.lax.with_sharding_constraint(new_state, spec)
        return new_state, est

    def place(state):
        return place_state(state, mesh)

    return jax.jit(step, donate_argnums=(0,)), place

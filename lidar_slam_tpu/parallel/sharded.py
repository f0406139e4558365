"""Mesh-sharded particle-filter pipeline (pjit/GSPMD path).

Two complementary paths exist:
- this module: the whole ``pf_step`` jitted with sharding constraints — XLA
  partitions the batched gathers and inserts the resampling collectives
  (the "annotate and let XLA do it" recipe);
- ``parallel/resampling.py``: the hand-written shard_map collective for the
  resampling exchange, used where explicit control matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_slam_tpu.config import SlamConfig
from lidar_slam_tpu.core import sensor
from lidar_slam_tpu.models import fastslam
from lidar_slam_tpu.parallel import mesh as mesh_lib


def state_shardings(state: fastslam.ParticleState, mesh: Mesh):
    """PartitionSpec pytree for a ParticleState: particles sharded, rest replicated."""
    ps = NamedSharding(mesh, P("particles"))
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        name = path[0].name if path else ""
        return ps if name in ("poses", "prev_poses", "logw") else rep

    return jax.tree_util.tree_map_with_path(spec, state)


def make_sharded_pf_step(cfg: SlamConfig, mesh: Mesh):
    """Returns (step_fn, place_fn): jitted sharded step + state placement.

    When the mesh has a 'map' axis with more than one shard, the keyframe EDT
    runs as the halo-exchange sharded transform over that axis (row blocks +
    ppermute), so both mesh dimensions carry real work: particles on one,
    map blocks on the other."""
    angles = jnp.asarray(sensor.beam_angles(cfg.lidar))

    edt_fn = None
    if "map" in mesh.axis_names and mesh.shape["map"] > 1:
        from lidar_slam_tpu.parallel import sharded_edt

        def edt_fn(occ, max_dist):
            return sharded_edt.edt_sharded(occ, mesh, "map", max_dist)

    def step(state, ranges):
        new_state, est = fastslam.pf_step(state, ranges, cfg, angles,
                                          edt_fn=edt_fn)
        # Keep particle leaves pinned to the mesh so GSPMD doesn't decide to
        # replicate them between steps.
        spec = state_shardings(new_state, mesh)
        new_state = jax.lax.with_sharding_constraint(new_state, spec)
        return new_state, est

    def place(state):
        return mesh_lib.shard_particle_state(state, mesh)

    return jax.jit(step, donate_argnums=(0,)), place


def run_sharded_pf(ranges_all, cfg: SlamConfig, mesh: Mesh, seed: int = 0):
    """Host-loop sharded run (collects the estimated trajectory)."""
    import numpy as np

    step, place = make_sharded_pf_step(cfg, mesh)
    state = place(fastslam.init_particles(jnp.asarray(ranges_all[0]), cfg, seed))
    poses = [np.zeros(3, np.float32)]
    for t in range(1, len(ranges_all)):
        state, est = step(state, jnp.asarray(ranges_all[t]))
        poses.append(np.asarray(est))
    return np.stack(poses), state

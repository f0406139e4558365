"""Sharding tests on the virtual 8-device CPU mesh.

The reference's analog: verifying the accelerator on scaled-down fixtures
before real hardware (dissertation p.46 §15.3.4). Here: all collective paths
must compile and agree with the single-device reference implementations.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
from lidar_slam_tpu.models import fastslam
from lidar_slam_tpu.parallel import mesh as mesh_lib
from lidar_slam_tpu.parallel import resampling, sharded


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_distributed_resample_matches_single_device():
    mesh = mesh_lib.make_mesh(n_particles_shards=8, n_map_shards=1)
    p = 64
    key = jax.random.PRNGKey(0)
    logw = jax.random.normal(key, (p,))
    poses = jax.random.normal(jax.random.fold_in(key, 1), (p, 3))
    prev = jax.random.normal(jax.random.fold_in(key, 2), (p, 3))
    u0 = jnp.float32(0.37)

    new_poses, new_prev, idx = resampling.distributed_systematic_resample(
        mesh, logw, poses, prev, u0)

    # single-device reference: same comb, same cdf
    w = jax.nn.softmax(logw)
    cdf = jnp.cumsum(w)
    u = (u0 + jnp.arange(p, dtype=jnp.float32)) / p
    want_idx = np.clip(np.searchsorted(np.asarray(cdf), np.asarray(u)), 0, p - 1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(new_poses),
                               np.asarray(poses)[want_idx], rtol=1e-6)


def test_sharded_pf_step_runs_and_tracks(small_dataset):
    ranges, gt = small_dataset
    mesh = mesh_lib.make_mesh(n_particles_shards=8, n_map_shards=1)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        particles=ParticleConfig(n_particles=32, vol_theta_bins=5, vol_half=4))
    path, state = sharded.run_sharded_pf(ranges[:40], cfg, mesh, seed=0)
    from lidar_slam_tpu.utils.metrics import ate
    err = ate(path, gt[:40])
    assert err < 0.25, f"sharded PF lost track: ATE {err:.3f}"


def test_sharded_ekf_step_matches_single_device():
    """The mesh-sharded EKF-bank step equals the plain step bit-for-bit:
    same rng stream, same (P, L) algebra — GSPMD only changes placement."""
    from lidar_slam_tpu.models import ekf_slam
    from lidar_slam_tpu.parallel import sharded_ekf

    ecfg = ekf_slam.EkfSlamConfig(n_particles=64, max_landmarks=8,
                                  use_scan_odometry=True)
    mesh = mesh_lib.make_mesh(n_particles_shards=8, n_map_shards=1)
    obs = jnp.asarray([[2.0, 0.3], [3.0, -0.7], [1.5, 1.1], [4.0, 0.0]],
                      jnp.float32)
    valid = jnp.asarray([True, True, True, False])
    odo = jnp.asarray([0.05, 0.0, 0.01], jnp.float32)

    state_ref = ekf_slam.init_ekf_slam(ecfg, seed=0)
    for _ in range(3):
        state_ref, est_ref = ekf_slam.ekf_slam_step_ml(
            state_ref, obs, valid, ecfg, odo=odo)

    step, place = sharded_ekf.make_sharded_ekf_step(ecfg, mesh)
    state_sh = place(ekf_slam.init_ekf_slam(ecfg, seed=0))
    for _ in range(3):
        state_sh, est_sh = step(state_sh, obs, valid, odo)

    np.testing.assert_allclose(np.asarray(est_sh), np.asarray(est_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_sh.poses),
                               np.asarray(state_ref.poses),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state_sh.lm_mean),
                               np.asarray(state_ref.lm_mean),
                               rtol=1e-4, atol=1e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_scaling_report_runs_at_all_shard_counts(small_dataset):
    from lidar_slam_tpu.parallel import multihost

    ranges, _ = small_dataset
    results = multihost.scaling_report(ranges, n_particles=64,
                                       shard_counts=(1, 2, 4), n_scans=8,
                                       vol_theta_bins=5, vol_half=4)
    assert set(results) == {1, 2, 4}
    assert all(v > 0 for v in results.values())

"""Tests for the batched scan-to-scan odometry pre-pass (ops/scan_odometry).

ADVICE r3: the module is enabled by default in ekf_slam.long_tour_config (the
CLI --mode ekf and bench EKF path) but had no direct coverage — a sign or
alignment regression would have passed CI. These tests pin:
- pairwise_odometry recovers known synthetic inter-scan motion (sign,
  frame convention, magnitude) on raycast scans of the museum world;
- the centered raster routes out-of-extent points to the drop slot instead
  of wrapping to the opposite edge (negative-index .at[] semantics);
- the max_range-vs-grid-extent guard raises;
- reach_clip_fraction flags envelope-clipped deltas;
- the scan-driven EKF with use_scan_odometry=True runs end-to-end and
  tracks (the default-config path the bench and CLI exercise);
- ekf_slam_step_ml without the required odo fails with a clear error.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_slam_tpu.config import LidarConfig
from lidar_slam_tpu.core.sensor import beam_angles
from lidar_slam_tpu.io import simulate
from lidar_slam_tpu.ops import scan_odometry


def _expected_deltas(gt: np.ndarray) -> np.ndarray:
    """Reference-convention relative poses from ground-truth world poses
    (same math as io/simulate.generate_ekf_dataset's odometry)."""
    out = np.zeros((len(gt) - 1, 3), np.float32)
    for t in range(1, len(gt)):
        d = gt[t, :2] - gt[t - 1, :2]
        cp, sp = np.cos(gt[t - 1, 2]), np.sin(gt[t - 1, 2])
        out[t - 1] = (cp * d[0] - sp * d[1], sp * d[0] + cp * d[1],
                      gt[t, 2] - gt[t - 1, 2])
    return out


def test_pairwise_odometry_recovers_known_shift_and_rotation():
    """Noise-free raycast pair with a known SE(2) delta at a feature-rich
    pose: the recovered delta must match in frame, sign, and magnitude."""
    cfg = LidarConfig()
    world = simulate.museum_world()
    angles = beam_angles(cfg)
    pose0 = np.asarray([5.0, 4.0, 0.8])    # sees corners + a pillar
    delta = np.asarray([0.02, -0.015, 0.012], np.float64)
    # world displacement for a ref-convention delta: d_world = R(-th0) dt
    c, s = np.cos(pose0[2]), np.sin(pose0[2])
    d_world = np.asarray([c * delta[0] + s * delta[1],
                          -s * delta[0] + c * delta[1], delta[2]])
    r0 = simulate.raycast(world, pose0, angles)
    r1 = simulate.raycast(world, pose0 + d_world, angles)
    ranges = np.stack([r0, r1]).astype(np.float32)
    got = np.asarray(scan_odometry.pairwise_odometry(
        jnp.asarray(ranges), jnp.asarray(angles), cfg, chunk=1))[0]
    assert np.abs(got - delta).max() < 0.01, (got, delta)


def test_pairwise_odometry_tracks_trajectory():
    """Statistical check over real tour pairs. Along-track translation in a
    corridor is weakly observable from one scan pair (parallel walls), so
    individual deltas scatter — the bound here pins frame/sign/scale, the
    precise per-axis claim is the raycast-pair test above."""
    cfg = LidarConfig()
    ranges, gt = simulate.generate_dataset(n_scans=8, seed=3)
    angles = jnp.asarray(beam_angles(cfg))
    deltas = np.asarray(scan_odometry.pairwise_odometry(
        jnp.asarray(ranges), angles, cfg, chunk=7))
    want = _expected_deltas(gt)
    assert deltas.shape == want.shape
    # motion is real (the tour moves ~3.5 cm/scan) — the test must not pass
    # by both sides being ~zero
    assert np.abs(want[:, :2]).max() > 0.01
    assert np.abs(deltas[:, :2] - want[:, :2]).max() < 0.04
    assert np.abs(deltas[:, :2] - want[:, :2]).mean() < 0.02
    assert np.abs(deltas[:, 2] - want[:, 2]).max() < 0.01


def test_pairwise_odometry_rotation_sign():
    """Pure-rotation pair: the recovered delta-theta must match in sign and
    magnitude (a transposed-convention regression flips the sign)."""
    cfg = LidarConfig()
    world = simulate.museum_world()
    angles = beam_angles(cfg)
    pose0 = np.asarray([6.0, 5.0, 0.3])
    dth = 0.025
    r0 = simulate.raycast(world, pose0, angles)
    r1 = simulate.raycast(world, pose0 + np.asarray([0.0, 0.0, dth]), angles)
    ranges = np.stack([r0, r1]).astype(np.float32)
    deltas = np.asarray(scan_odometry.pairwise_odometry(
        jnp.asarray(ranges), jnp.asarray(angles), cfg, chunk=1))
    assert abs(deltas[0, 2] - dth) < 0.006, deltas[0]
    assert np.abs(deltas[0, :2]).max() < 0.02


def test_raster_centered_drops_out_of_extent():
    """A valid point beyond the grid half-extent must not wrap to the
    opposite edge as phantom occupancy (ADVICE r3, negative-index wrap)."""
    size, pixel = 64, 0.05  # half-extent 1.6 m
    x = jnp.asarray([0.0, -5.0, 5.0, 1.0], jnp.float32)   # 2 far outside
    y = jnp.asarray([0.0, -5.0, 5.0, -1.0], jnp.float32)
    valid = jnp.asarray([True, True, True, True])
    grid = scan_odometry._raster_centered(x, y, valid, pixel, size)
    occ = np.asarray(grid.occ)
    assert occ.sum() == 2  # only the two in-extent points landed
    # the out-of-extent points must not have wrapped anywhere
    col0 = int(np.round((0.0 + 0.5 * size * pixel) / pixel))
    assert occ[col0, col0]


def test_max_range_guard():
    cfg = LidarConfig()
    angles = jnp.zeros(cfg.n_beams, jnp.float32)
    with pytest.raises(ValueError, match="half-extent"):
        scan_odometry.pairwise_odometry(
            jnp.zeros((3, cfg.n_beams), jnp.float32), angles, cfg,
            max_range=12.0, size=448, pixel=0.05)


def test_reach_clip_fraction():
    ok = np.asarray([[0.01, 0.0, 0.0], [0.0, 0.02, -0.01]], np.float32)
    clipped = np.asarray([[0.058, 0.0, 0.0], [0.0, 0.0, -0.059]], np.float32)
    assert scan_odometry.reach_clip_fraction(ok) == 0.0
    assert scan_odometry.reach_clip_fraction(clipped) == 1.0
    both = np.concatenate([ok, clipped])
    assert scan_odometry.reach_clip_fraction(both) == 0.5


def test_ekf_scan_odometry_end_to_end():
    """The default-config EKF path (use_scan_odometry=True) tracks a short
    museum segment — covers the full pre-pass + filter integration the
    bench and `--mode ekf` CLI run."""
    from lidar_slam_tpu.models import ekf_slam
    from lidar_slam_tpu.utils.metrics import ate

    ranges, gt = simulate.generate_dataset(n_scans=60, seed=0)
    cfg = ekf_slam.long_tour_config(64)
    assert cfg.use_scan_odometry
    path, _ = ekf_slam.run_ekf_slam_scan(
        ranges, cfg, lidar_cfg=LidarConfig(), seed=0,
        max_range=ekf_slam.LONG_TOUR_MAX_RANGE)
    err = float(ate(np.asarray(path), gt))
    assert err < 0.25, f"ATE {err:.3f} m over 60 scans"


def test_step_ml_requires_odo():
    from lidar_slam_tpu.models import ekf_slam

    cfg = ekf_slam.long_tour_config(8)
    state = ekf_slam.init_ekf_slam(cfg, 0)
    obs = jnp.zeros((4, 2), jnp.float32)
    vmask = jnp.zeros(4, bool)
    with pytest.raises(ValueError, match="requires an `odo`"):
        ekf_slam.ekf_slam_step_ml(state, obs, vmask, cfg)

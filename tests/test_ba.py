"""Schur-complement BA: noisy poses + landmarks must jointly converge."""

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.core import se2
from lidar_slam_tpu.models import ba


def _make_problem(n_poses=12, n_lms=6, seed=0, pose_noise=0.08, lm_noise=0.3):
    rng = np.random.default_rng(seed)
    # ground truth: straight-ish corridor of poses, landmarks to both sides
    gt_poses = np.stack([np.linspace(0, 10, n_poses),
                         0.3 * np.sin(np.linspace(0, 3, n_poses)),
                         0.1 * np.cos(np.linspace(0, 3, n_poses))], 1).astype(np.float32)
    gt_lms = np.stack([np.linspace(1, 9, n_lms),
                       np.tile([2.0, -2.0], n_lms // 2 + 1)[:n_lms]], 1).astype(np.float32)

    # observations: every pose sees every landmark within 6 m
    obs_i, obs_j, obs_z = [], [], []
    for i in range(n_poses):
        for j in range(n_lms):
            dx, dy = gt_lms[j] - gt_poses[i, :2]
            r = float(np.hypot(dx, dy))
            if r > 6.0:
                continue
            bearing = np.arctan2(dy, dx) + gt_poses[i, 2]
            obs_i.append(i)
            obs_j.append(j)
            obs_z.append([r + rng.normal(0, 0.01),
                          bearing + rng.normal(0, 0.005)])
    f = len(obs_z)
    fcap = 128
    assert f <= fcap

    # odometry: exact relative measurements (standard convention), noisy inits
    odo_z = [np.asarray(se2.between(jnp.asarray(gt_poses[t]),
                                    jnp.asarray(gt_poses[t + 1])))
             for t in range(n_poses - 1)]
    init_poses = gt_poses + rng.normal(0, pose_noise, gt_poses.shape).astype(np.float32)
    init_poses[0] = gt_poses[0]  # gauge
    init_lms = gt_lms + rng.normal(0, lm_noise, gt_lms.shape).astype(np.float32)

    ecap = 32
    prob = ba.BAProblem(
        poses=jnp.asarray(init_poses),
        landmarks=jnp.asarray(init_lms),
        pose_active=jnp.arange(n_poses) < n_poses,
        lm_active=jnp.arange(n_lms) < n_lms,
        odo_i=jnp.zeros(ecap, jnp.int32).at[:n_poses - 1].set(jnp.arange(n_poses - 1)),
        odo_j=jnp.zeros(ecap, jnp.int32).at[:n_poses - 1].set(jnp.arange(1, n_poses)),
        odo_z=jnp.zeros((ecap, 3)).at[:n_poses - 1].set(jnp.asarray(np.stack(odo_z))),
        odo_w=jnp.ones((ecap, 3)) * 10.0,
        odo_active=jnp.arange(ecap) < n_poses - 1,
        obs_i=jnp.zeros(fcap, jnp.int32).at[:f].set(jnp.asarray(obs_i)),
        obs_j=jnp.zeros(fcap, jnp.int32).at[:f].set(jnp.asarray(obs_j)),
        obs_z=jnp.zeros((fcap, 2)).at[:f].set(jnp.asarray(obs_z)),
        obs_w=jnp.tile(jnp.asarray([100.0, 400.0]), (fcap, 1)),
        obs_active=jnp.arange(fcap) < f,
    )
    return prob, gt_poses, gt_lms


def test_ba_converges_jointly():
    prob, gt_poses, gt_lms = _make_problem()
    e0 = float(ba.ba_error(prob))
    out = ba.optimize_ba(prob, iters=15)
    e1 = float(ba.ba_error(out))
    assert e1 < e0 * 0.05, (e0, e1)

    pose_err0 = np.abs(np.asarray(prob.poses)[:, :2] - gt_poses[:, :2]).max()
    pose_err1 = np.abs(np.asarray(out.poses)[:, :2] - gt_poses[:, :2]).max()
    lm_err1 = np.abs(np.asarray(out.landmarks) - gt_lms).max()
    assert pose_err1 < pose_err0 * 0.5
    assert pose_err1 < 0.05, pose_err1
    assert lm_err1 < 0.05, lm_err1


def test_ba_inactive_slots_untouched():
    prob, _, _ = _make_problem()
    # deactivate the last landmark and check it doesn't move
    lm_active = np.array(prob.lm_active)  # writable copy
    lm_active[-1] = False
    obs_active = np.asarray(prob.obs_active) & np.asarray(prob.obs_j != prob.landmarks.shape[0] - 1)
    prob2 = prob._replace(lm_active=jnp.asarray(lm_active),
                          obs_active=jnp.asarray(obs_active))
    out = ba.optimize_ba(prob2, iters=5)
    np.testing.assert_allclose(np.asarray(out.landmarks[-1]),
                               np.asarray(prob.landmarks[-1]), atol=1e-6)

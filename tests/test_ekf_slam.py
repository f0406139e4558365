"""EKF-FastSLAM model family: tracking + landmark recovery."""

import numpy as np

from lidar_slam_tpu.io import simulate
from lidar_slam_tpu.models import ekf_slam
from lidar_slam_tpu.utils.metrics import ate


def test_ekf_slam_tracks_and_maps():
    odom, obs, vis, gt, lms = simulate.generate_ekf_dataset(n_scans=300, seed=2)
    cfg = ekf_slam.EkfSlamConfig(n_particles=128, max_landmarks=lms.shape[0])
    path, final = ekf_slam.run_ekf_slam(odom, obs, vis, cfg)
    path = np.asarray(path)

    # dead-reckoning drift for comparison
    dead = [np.zeros(3, np.float32)]
    for d in odom:
        import jax.numpy as jnp
        from lidar_slam_tpu.models.ekf_slam import _compose_ref
        dead.append(np.asarray(_compose_ref(jnp.asarray(dead[-1]), jnp.asarray(d))))
    dead = np.stack(dead)

    err_slam = ate(path, gt)
    err_dead = ate(dead, gt)
    assert err_slam < 0.2, f"EKF-SLAM lost track: {err_slam:.3f}"
    assert err_slam < err_dead * 0.9, (err_slam, err_dead)

    # landmarks seen during the run must be localized
    est_lms = ekf_slam.landmark_estimates(final)
    seen = np.asarray(final.lm_seen)
    seen_any = vis.any(axis=0)
    np.testing.assert_array_equal(seen, seen_any)
    errs = np.linalg.norm(est_lms[seen] - lms[seen], axis=1)
    assert errs.max() < 0.5, errs
    assert np.median(errs) < 0.15, errs

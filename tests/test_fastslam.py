"""Particle-filter layer tests: resampling, ESS, end-to-end tracking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_slam_tpu.config import DEFAULT_CONFIG, ParticleConfig
from lidar_slam_tpu.models import fastslam
from lidar_slam_tpu.utils.metrics import ate


def test_systematic_resample_tracks_weights():
    key = jax.random.PRNGKey(0)
    logw = jnp.log(jnp.asarray([0.7, 0.1, 0.1, 0.1]))
    counts = np.zeros(4)
    for i in range(200):
        idx = fastslam.systematic_resample(jax.random.fold_in(key, i), logw)
        counts += np.bincount(np.asarray(idx), minlength=4)
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, [0.7, 0.1, 0.1, 0.1], atol=0.05)


def test_systematic_resample_uniform_is_near_identity():
    # equal weights + systematic comb => each particle survives ~once
    idx = fastslam.systematic_resample(jax.random.PRNGKey(1), jnp.zeros(64))
    counts = np.bincount(np.asarray(idx), minlength=64)
    assert counts.max() <= 2 and (counts == 1).sum() >= 62


def test_effective_sample_size():
    assert float(fastslam.effective_sample_size(jnp.zeros(32))) == pytest.approx(32.0)
    sharp = jnp.asarray([100.0] + [0.0] * 31)
    assert float(fastslam.effective_sample_size(sharp)) == pytest.approx(1.0, abs=1e-3)


def test_pf_tracks_ground_truth(small_dataset):
    ranges, gt = small_dataset
    # small volume keeps the CPU test fast; TPU uses the full default
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        particles=ParticleConfig(n_particles=32, vol_theta_bins=5, vol_half=4))
    path, state = fastslam.run_pf(ranges, cfg, seed=0)
    err = ate(np.asarray(path), gt)
    assert err < 0.15, f"particle filter lost track: ATE {err:.3f} m"
    assert int(state.pmap.size) > 500  # map actually grew


def test_pf_gradient_refinement_runs():
    """Gradient-guided proposal refinement (opt-in) tracks comparably."""
    import numpy as np

    from lidar_slam_tpu.io import dataset

    ranges, gt, _ = dataset.ensure_dataset(n_scans=60, seed=3)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        particles=ParticleConfig(n_particles=32, vol_theta_bins=5, vol_half=4,
                                 grad_refine_steps=2))
    path, _ = fastslam.run_pf(np.asarray(ranges), cfg, seed=0)
    assert ate(np.asarray(path), np.asarray(gt)) < 0.2

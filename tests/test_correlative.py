"""Correlation-volume scoring: math properties + pallas/jnp equivalence."""

import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from lidar_slam_tpu.core.gridmap import OccGrid
from lidar_slam_tpu.ops import correlative


def _toy_grid(seed=0, s=64):
    rng = np.random.default_rng(seed)
    metric = jnp.asarray(rng.random((s, s)), jnp.float32) * 10.0
    grid = OccGrid(occ=jnp.zeros((s, s), jnp.bool_),
                   n_rows=jnp.int32(s - 4), n_cols=jnp.int32(s - 6),
                   origin=jnp.asarray([-3.0, -3.0], jnp.float32), pixel=0.1)
    n = 64
    scan_x = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    scan_y = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    return metric, grid, scan_x, scan_y, valid


def test_volume_matches_direct_scoring():
    """Volume value at integer offsets == direct masked gather scoring."""
    metric, grid, sx, sy, valid = _toy_grid()
    base = jnp.asarray([0.2, -0.1, 0.3], jnp.float32)
    vol = correlative.build_score_volume(metric, grid, sx, sy, valid, base,
                                         n_theta=3, half=4, impl="jnp")
    # direct: project at the base pose, sum metric under shifted cells
    from lidar_slam_tpu.ops import matching

    cell_x, cell_y = matching.project_scan(sx, sy, base[None], grid)
    for dy, dx in [(0, 0), (2, -1), (-3, 3)]:
        cx = cell_x[0] + dx
        cy = cell_y[0] + dy
        inb = (cx > 1) & (cy > 1) & (cx < grid.n_cols) & (cy < grid.n_rows) & valid
        vals = metric[jnp.clip(cy - 1, 0, 63), jnp.clip(cx - 1, 0, 63)]
        want = float(jnp.sum(jnp.where(inb, vals, 0.0)))
        got = float(vol.scores[1, 4 + dy, 4 + dx])
        assert got == pytest.approx(want, rel=1e-5), (dy, dx)
        assert float(vol.counts[1, 4 + dy, 4 + dx]) == pytest.approx(
            float(jnp.sum(inb)), rel=1e-6)


def test_pallas_volume_matches_jnp():
    metric, grid, sx, sy, valid = _toy_grid(seed=3)
    base = jnp.asarray([-0.3, 0.4, -0.2], jnp.float32)
    vol_jnp = correlative.build_score_volume(metric, grid, sx, sy, valid, base,
                                             n_theta=5, half=4, impl="jnp")
    with pltpu.force_tpu_interpret_mode():
        vol_pl = correlative.build_score_volume(metric, grid, sx, sy, valid,
                                                base, n_theta=5, half=4,
                                                impl="pallas")
    np.testing.assert_allclose(np.asarray(vol_pl.scores),
                               np.asarray(vol_jnp.scores), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vol_pl.counts),
                               np.asarray(vol_jnp.counts), rtol=1e-6, atol=1e-3)


def test_trilinear_lookup_interpolates():
    metric, grid, sx, sy, valid = _toy_grid(seed=5)
    base = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    vol = correlative.build_score_volume(metric, grid, sx, sy, valid, base,
                                         n_theta=3, half=4, impl="jnp")
    # at exactly the base pose the lookup hits the volume center
    d0 = float(correlative.lookup_avg_distance(vol, base[None])[0])
    want = float(vol.scores[1, 4, 4] / jnp.maximum(vol.counts[1, 4, 4], 1.0))
    assert d0 == pytest.approx(want, rel=1e-5)
    # halfway to the next cell: average of the two cell scores (bilinear)
    half_px = grid.pixel / 2.0
    d_half = float(correlative.lookup_avg_distance(
        vol, jnp.asarray([[half_px, 0.0, 0.0]]))[0])
    s_mid = 0.5 * (vol.scores[1, 4, 4] + vol.scores[1, 4, 5])
    c_mid = 0.5 * (vol.counts[1, 4, 4] + vol.counts[1, 4, 5])
    assert d_half == pytest.approx(float(s_mid / c_mid), rel=1e-4)


def test_pallas_volume_wide_window_matches_jnp():
    """half=14 (wider than one sublane tile, the loop-closure window) over a
    multi-chunk grid — regression for the kernel's generalized padding.
    Shapes scaled down: interpret mode pays per-offset python cost."""
    rng = np.random.default_rng(11)
    s = 96
    metric = jnp.asarray(rng.random((s, s)), jnp.float32) * 10.0
    grid = OccGrid(occ=jnp.zeros((s, s), jnp.bool_),
                   n_rows=jnp.int32(s), n_cols=jnp.int32(s),
                   origin=jnp.asarray([-9.6, -9.6], jnp.float32), pixel=0.2)
    n = 64
    sx = jnp.asarray(rng.uniform(-8, 8, n), jnp.float32)
    sy = jnp.asarray(rng.uniform(-8, 8, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    base = jnp.asarray([0.3, -0.2, 0.15], jnp.float32)
    vol_jnp = correlative.build_score_volume(
        metric, grid, sx, sy, valid, base, n_theta=3,
        theta_step=0.008727, half=14, impl="jnp")
    with pltpu.force_tpu_interpret_mode():
        vol_pl = correlative.build_score_volume(
            metric, grid, sx, sy, valid, base, n_theta=3,
            theta_step=0.008727, half=14, impl="pallas")
    np.testing.assert_allclose(np.asarray(vol_pl.scores),
                               np.asarray(vol_jnp.scores), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vol_pl.counts),
                               np.asarray(vol_jnp.counts), atol=1e-3)


def test_pallas_volume_large_array_small_region_matches_jnp():
    """Full-size fixed array with a small active region (the common case)."""
    rng = np.random.default_rng(9)
    s = 400
    metric = jnp.asarray(rng.random((s, s)), jnp.float32) * 10.0
    grid = OccGrid(occ=jnp.zeros((s, s), jnp.bool_),
                   n_rows=jnp.int32(120), n_cols=jnp.int32(100),
                   origin=jnp.asarray([-3.0, -3.0], jnp.float32), pixel=0.1)
    n = 48
    sx = jnp.asarray(rng.uniform(0, 6, n), jnp.float32)
    sy = jnp.asarray(rng.uniform(0, 6, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.9)
    base = jnp.asarray([0.5, 0.5, 0.1], jnp.float32)
    vol_jnp = correlative.build_score_volume(metric, grid, sx, sy, valid, base,
                                             n_theta=3, half=2, impl="jnp")
    with pltpu.force_tpu_interpret_mode():
        vol_pl = correlative.build_score_volume(metric, grid, sx, sy, valid,
                                                base, n_theta=3, half=2,
                                                impl="pallas")
    np.testing.assert_allclose(np.asarray(vol_pl.scores),
                               np.asarray(vol_jnp.scores), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vol_pl.counts),
                               np.asarray(vol_jnp.counts), atol=1e-3)


def test_windowed_fast_match_default_is_reference_27():
    """window=1 must produce the reference's exact candidate grid (order and
    values), so fidelity-mode bit-parity is unchanged by the window feature."""
    from lidar_slam_tpu.ops import matching

    pose = jnp.asarray([1.0, -2.0, 0.3], jnp.float32)
    got = matching.candidate_grid_ref(pose, 0.05, 0.01, 1, 1)
    offs = jnp.array([-1.0, 0.0, 1.0], jnp.float32)
    th = jnp.repeat(pose[2] + offs * 0.01, 9)
    tx = jnp.tile(jnp.repeat(pose[0] + offs * 0.05, 3), 3)
    ty = jnp.tile(pose[1] + offs * 0.05, 9)
    want = jnp.stack([tx, ty, th], axis=-1)
    assert got.shape == (27, 3)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_windowed_fast_match_recovers_large_offset():
    """A +-4-step window finds an alignment 3 steps away that the reference's
    +-1 window cannot reach in one call."""
    from lidar_slam_tpu.ops import matching

    metric, grid, sx, sy, valid = _toy_grid(seed=2)
    # plant a zero-cost trench exactly at offset (+3 steps in x)
    true_pose = jnp.asarray([0.3, 0.0, 0.0], jnp.float32)
    cx, cy = matching.project_scan(sx, sy, true_pose[None], grid)
    metric = metric.at[jnp.clip(cy[0] - 1, 0, 63),
                       jnp.clip(cx[0] - 1, 0, 63)].set(0.0)
    guess = jnp.zeros(3, jnp.float32)
    narrow = matching.fast_match(metric, grid, sx, sy, valid, guess,
                                 0.1, 0.01, 1, 1)
    wide = matching.fast_match(metric, grid, sx, sy, valid, guess,
                               0.1, 0.01, 4, 1)
    assert wide.score < narrow.score
    assert abs(float(wide.pose[0]) - 0.3) < 1e-6

"""Unit tests for sensor gating, SE(2) geometry, and rasterization."""

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import LidarConfig
from lidar_slam_tpu.core import gridmap, se2, sensor


def test_read_scan_gating_and_compaction():
    cfg = LidarConfig(n_beams=8, angle_min=0.0, angle_increment=0.1,
                      range_min=0.023, usable_range=24.0)
    angles = jnp.asarray(sensor.beam_angles(cfg))
    ranges = jnp.asarray([1.0, 0.0, 30.0, 2.0, 0.01, 24.0, 0.023, 25.0])
    scan = sensor.read_scan(ranges, angles, cfg)
    assert int(scan.size) == 4  # 1.0, 2.0, 24.0, 0.023 pass the gate
    want_r = np.asarray([1.0, 2.0, 24.0, 0.023])
    want_a = np.asarray([0.0, 0.3, 0.5, 0.6])
    np.testing.assert_allclose(np.asarray(scan.x[:4]),
                               want_r * np.cos(want_a), rtol=1e-5)
    assert np.all(np.asarray(scan.x[4:]) == 0.0)
    np.testing.assert_array_equal(np.asarray(scan.valid),
                                  np.arange(8) < 4)


def test_transform_ref_convention():
    # reference convention rotates by -theta: w = [[c, s], [-s, c]] p + t
    x = jnp.asarray([1.0, 0.0])
    y = jnp.asarray([0.0, 1.0])
    pose = jnp.asarray([10.0, 20.0, np.pi / 2], jnp.float32)
    wx, wy = se2.transform_ref(x, y, pose)
    np.testing.assert_allclose(np.asarray(wx), [10.0, 11.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(wy), [19.0, 20.0], atol=1e-6)


def test_transform_roundtrip_standard():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=16), jnp.float32)
    y = jnp.asarray(rng.normal(size=16), jnp.float32)
    pose = jnp.asarray([0.5, -1.0, 0.7], jnp.float32)
    wx, wy = se2.transform(x, y, pose)
    inv = se2.between(pose, jnp.zeros(3))  # pose^-1
    bx, by = se2.transform(wx, wy, inv)
    np.testing.assert_allclose(np.asarray(bx), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(by), np.asarray(y), atol=1e-5)


def test_roundf_like_matches_c_roundf():
    vals = jnp.asarray([0.5, 1.5, 2.5, -0.5, -1.5, 0.49, -0.49, 0.0])
    got = np.asarray(gridmap.roundf_like(vals))
    want = np.asarray([1.0, 2.0, 3.0, -1.0, -2.0, 0.0, -0.0, 0.0])
    np.testing.assert_array_equal(got, want)


def test_rasterize_places_points():
    from lidar_slam_tpu.config import GridConfig
    xy = jnp.zeros((16, 2)).at[0].set(jnp.asarray([1.0, 2.0])) \
                           .at[1].set(jnp.asarray([1.4, 2.0]))
    local = gridmap.LocalMap(xy=xy, mask=jnp.arange(16) < 2)
    cfg = GridConfig()
    coarse, fine = gridmap.rasterize_dual(local, cfg)
    # extent 0.4 x 0 plus margins; coarse: 0.4/0.2 + 6 margin + 1
    assert int(coarse.n_cols) == 9
    assert int(coarse.n_rows) == 7
    occ = np.asarray(coarse.occ)
    assert occ[3, 3] and occ[3, 5]  # margin offset 3 px, dx = 2 cells
    assert occ.sum() == 2
    assert int(fine.n_cols) == 11
    assert np.asarray(fine.occ).sum() == 2

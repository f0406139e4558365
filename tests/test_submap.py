"""Submap atlas: geometry round trips, spawning, paging, and tracking."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import DEFAULT_CONFIG, SubmapConfig
from lidar_slam_tpu.core import se2, submap
from lidar_slam_tpu.models import scan_matcher, submap_slam
from lidar_slam_tpu.utils import paging
from lidar_slam_tpu.utils.metrics import ate


def _atlas_with_points(anchor=(1.0, -2.0, 0.7), n=32, seed=0):
    rng = np.random.default_rng(seed)
    wx = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    wy = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    a = submap.empty_atlas(8, 64)
    a = submap.start_submap(a, jnp.asarray(anchor, jnp.float32))
    a = submap.insert_world_points(a, wx, wy, jnp.ones(n, jnp.bool_))
    return a, np.asarray(wx), np.asarray(wy)


def test_insert_world_roundtrip():
    """World -> anchor frame -> world must be the identity (fp32)."""
    a, wx, wy = _atlas_with_points()
    gx, gy, mask = submap.submap_world_points(a)
    gx, gy, mask = np.asarray(gx), np.asarray(gy), np.asarray(mask)
    assert mask[0, :32].all() and not mask[0, 32:].any() and not mask[1:].any()
    np.testing.assert_allclose(gx[0, :32], wx, atol=1e-5)
    np.testing.assert_allclose(gy[0, :32], wy, atol=1e-5)


def test_anchor_correction_rigid():
    """Re-anchoring moves all submap points by the same rigid transform."""
    a, wx, wy = _atlas_with_points()
    delta = jnp.asarray([0.5, -0.3, 0.2], jnp.float32)
    new_anchor = a.anchors[0] + delta
    a2 = submap.apply_anchor_correction(
        a, a.anchors.at[0].set(new_anchor))
    gx, gy, _ = submap.submap_world_points(a2)
    # expected: point p (anchor frame) under the new anchor
    ex, ey = se2.transform_ref(a.pts[0, :32, 0], a.pts[0, :32, 1],
                               new_anchor[None])
    np.testing.assert_allclose(np.asarray(gx[0, :32]), np.asarray(ex)[0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy[0, :32]), np.asarray(ey)[0],
                               atol=1e-6)


def test_nearest_includes_active_and_sorts_by_distance():
    a = submap.empty_atlas(8, 16)
    for x in (0.0, 5.0, 10.0, 15.0):
        a = submap.start_submap(a, jnp.asarray([x, 0.0, 0.0], jnp.float32))
    # active is the last (x=15); query near x=0
    idx = np.asarray(submap.nearest_submaps(
        a, jnp.asarray([0.0, 0.0, 0.0], jnp.float32), 3))
    assert idx[0] == 3            # active always first (forced distance -1)
    assert set(idx[1:]) == {0, 1}  # then the two genuinely nearest


def test_extract_local_matches_flat_filter():
    a, wx, wy = _atlas_with_points()
    pose = jnp.zeros(3, jnp.float32)
    scan_wx = jnp.asarray([-1.0, 1.0], jnp.float32)
    scan_wy = jnp.asarray([-1.0, 1.0], jnp.float32)
    valid = jnp.ones(2, jnp.bool_)
    local = submap.extract_local_from_atlas(a, pose, scan_wx, scan_wy, valid,
                                            border=0.5, k_nearest=2)
    got = np.sort(np.asarray(local.xy)[np.asarray(local.mask)], axis=0)
    inside = (wx > -1.5) & (wx < 1.5) & (wy > -1.5) & (wy < 1.5)
    want = np.sort(np.stack([wx[inside], wy[inside]], 1), axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_submap_slam_tracks(small_dataset):
    ranges, gt = small_dataset
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, submaps=SubmapConfig(n_submaps=16, submap_capacity=4096,
                                             k_nearest=4, spawn_dist=2.0))
    path, final = submap_slam.run_scan(ranges, cfg)
    err = ate(np.asarray(path), gt)
    assert err < 0.1, err
    # flat-map pipeline on the same data as a sanity anchor
    flat_path, _ = scan_matcher.run_scan(ranges, DEFAULT_CONFIG)
    flat_err = ate(np.asarray(flat_path), gt)
    assert err < max(2.5 * flat_err, 0.08), (err, flat_err)


def test_submap_slam_spawns(small_dataset):
    ranges, _ = small_dataset
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, submaps=SubmapConfig(n_submaps=16, submap_capacity=512,
                                             k_nearest=4, spawn_dist=0.5))
    _, final = submap_slam.run_scan(ranges, cfg)
    assert int(final.atlas.n_submaps) > 1
    assert int(submap.total_points(final.atlas)) > 0


def test_paging_keeps_pool_bounded(small_dataset):
    ranges, gt = small_dataset
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, submaps=SubmapConfig(n_submaps=4, submap_capacity=512,
                                             k_nearest=2, spawn_dist=0.4,
                                             spawn_fill_frac=0.8))
    paged = paging.PagedAtlas(near_dist=1.0, keep_free=2)
    path, final = paging.run_host_loop_paged(ranges, cfg, paged,
                                             manage_every=4)
    assert int(final.atlas.n_submaps) <= 4
    assert paged.pages_out > 0          # the pool actually overflowed
    allpts = paged.world_points(final.atlas)
    assert len(allpts) > 0
    assert np.isfinite(path).all()


def test_paging_reloads_near_submaps():
    paged = paging.PagedAtlas(near_dist=2.0, keep_free=1)
    a = submap.empty_atlas(2, 8)
    a = submap.start_submap(a, jnp.asarray([0.0, 0.0, 0.0], jnp.float32))
    a = submap.insert_world_points(
        a, jnp.asarray([0.1]), jnp.asarray([0.2]), jnp.asarray([True]))
    a = submap.start_submap(a, jnp.asarray([10.0, 0.0, 0.0], jnp.float32))
    # robot at x=10: submap 0 (far) must page out
    a = paged.manage(a, np.asarray([10.0, 0.0, 0.0]))
    assert paged.pages_out == 1 and int(a.n_submaps) == 1
    # robot returns to the origin: submap 0 must page back in
    a = paged.manage(a, np.asarray([0.0, 0.0, 0.0]))
    assert paged.pages_in == 1
    gx, gy, mask = submap.submap_world_points(a)
    pts = np.stack([np.asarray(gx)[np.asarray(mask)],
                    np.asarray(gy)[np.asarray(mask)]], 1)
    assert any(np.allclose(p, [0.1, 0.2], atol=1e-5) for p in pts)

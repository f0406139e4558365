"""Distributed Schur BA must match the single-device dense solver."""

import jax
import numpy as np

from lidar_slam_tpu.models import ba
from lidar_slam_tpu.parallel import sharded_ba

from test_ba import _make_problem


def test_sharded_ba_matches_dense():
    prob, gt_poses, gt_lms = _make_problem()
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])

    dense = ba.optimize_ba(prob, iters=12)
    dist = sharded_ba.optimize_ba_sharded(prob, mesh, iters=12)

    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(dense.poses), atol=5e-3)
    np.testing.assert_allclose(np.asarray(dist.landmarks),
                               np.asarray(dense.landmarks), atol=5e-3)


def test_sharded_ba_converges_to_ground_truth():
    prob, gt_poses, gt_lms = _make_problem(seed=1)
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])
    out = sharded_ba.optimize_ba_sharded(prob, mesh, iters=15)

    e0 = float(ba.ba_error(prob))
    e1 = float(ba.ba_error(out))
    assert e1 < e0 * 0.05, (e0, e1)
    pose_err = np.abs(np.asarray(out.poses)[:, :2] - gt_poses[:, :2]).max()
    lm_err = np.abs(np.asarray(out.landmarks) - gt_lms).max()
    assert pose_err < 0.05, pose_err
    assert lm_err < 0.05, lm_err


def test_no_k2_intermediate():
    """K=256: the compiled program holds no (K, K)- or (L, K)-shaped array.

    The round-4 kernel assembled a dense (K, K, 3, 3) per-shard Hessian and
    a replicated (L, K, 3, 2) U before reducing — gigabytes at the
    "thousands of keyframes" the module docstring promises. The matrix-free
    Schur CG must keep every intermediate O(E/D + F/D + K + L); this pins
    the property on the lowered HLO text at a K big enough that a dense
    slab would be unmistakable."""
    import jax.numpy as jnp

    k, l, e, f = 256, 32, 255, 64
    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(0, 1, (k, 3)).astype(np.float32))
    lms = jnp.asarray(rng.normal(0, 1, (l, 2)).astype(np.float32))
    prob = ba.BAProblem(
        poses=poses, landmarks=lms,
        pose_active=jnp.ones(k, bool), lm_active=jnp.ones(l, bool),
        odo_i=jnp.arange(e, dtype=jnp.int32),
        odo_j=jnp.arange(1, e + 1, dtype=jnp.int32),
        odo_z=jnp.zeros((e, 3), jnp.float32),
        odo_w=jnp.ones((e, 3), jnp.float32),
        odo_active=jnp.ones(e, bool),
        obs_i=jnp.asarray(rng.integers(0, k, f), jnp.int32),
        obs_j=jnp.asarray(rng.integers(0, l, f), jnp.int32),
        obs_z=jnp.ones((f, 2), jnp.float32),
        obs_w=jnp.ones((f, 2), jnp.float32),
        obs_active=jnp.ones(f, bool))
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])
    pp = sharded_ba.pad_problem(prob, 8)
    lowered = sharded_ba._run_sharded.lower(pp, mesh, "graph", 1, 8, 1e-3)
    txt = lowered.as_text()
    # no tensor with two keyframe axes (256x256, sharded 32x256) and no
    # (landmark, keyframe) U tensor (32x256 would collide with the slab
    # pattern anyway); formats like f32[256,256,3,3] / f32[32,256,3,2]
    assert "256,256" not in txt, "dense (K, K) intermediate reappeared"
    assert "[32,256" not in txt, "(L, K) or slab intermediate reappeared"


def test_sharded_ba_uneven_sizes_padded():
    """K, L, E, F not divisible by the device count still work (padding)."""
    prob, _, _ = _make_problem(n_poses=13, n_lms=7, seed=2)
    mesh = sharded_ba.make_graph_mesh(jax.devices()[:8])
    dense = ba.optimize_ba(prob, iters=8)
    dist = sharded_ba.optimize_ba_sharded(prob, mesh, iters=8)
    assert dist.poses.shape == prob.poses.shape
    assert dist.landmarks.shape == prob.landmarks.shape
    np.testing.assert_allclose(np.asarray(dist.poses),
                               np.asarray(dense.poses), atol=5e-3)

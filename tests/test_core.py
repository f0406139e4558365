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


def test_trig32_matches_native():
    """The C++ sincos32 twin must stay bit-identical to the trig32 formula
    (first leg of full-scale trajectory parity; see trig32.py docstring).

    The bit-exact leg is checked against a numpy evaluation of the formula
    (numpy ops are correctly rounded and never FMA-contracted). The jitted
    JAX version is allowed 1 ulp of slack: XLA:CPU contracts mul+add chains
    into FMAs in some environments (plugin-load-order dependent), which
    perturbs the polynomial by <= 1 ulp — the end-to-end trajectory parity
    tests (test_pipeline_parity.py) enforce that this never flips a cell or
    an argmin over full workloads on either backend."""
    import ctypes

    import jax
    import jax.numpy as jnp

    from lidar_slam_tpu import native
    from lidar_slam_tpu.core import trig32

    def sincos32_np(x):
        f = np.float32
        t = x * f(0.63661975)
        k = np.trunc(t + np.sign(t) * f(0.5))
        r = ((x - k * f(1.5703125)) - k * f(4.837512969970703e-4)) \
            - k * f(7.549789415861596e-8)
        r2 = r * r
        sp = (f(-1.9515295891e-4) * r2 + f(8.3321608736e-3)) * r2 \
            + f(-1.6666654611e-1)
        sinr = (sp * r2) * r + r
        cp = (f(2.443315711809948e-5) * r2 + f(-1.388731625493765e-3)) * r2 \
            + f(4.166664568298827e-2)
        cosr = (cp * r2) * r2 + (f(1.0) - f(0.5) * r2)
        q = np.mod(k.astype(np.int32), 4)
        sin = np.select([q == 0, q == 1, q == 2], [sinr, cosr, -sinr], -cosr)
        cos = np.select([q == 0, q == 1, q == 2], [cosr, -sinr, -cosr], sinr)
        return sin.astype(np.float32), cos.astype(np.float32)

    lib = native.get_lib()
    x = np.random.default_rng(7).uniform(-50, 50, 65536).astype(np.float32)
    s_n, c_n = sincos32_np(x)
    s_c = np.zeros_like(x)
    c_c = np.zeros_like(x)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.tpuslam_sincos32(fp(x), len(x), fp(s_c), fp(c_c))
    assert np.array_equal(s_n, s_c)
    assert np.array_equal(c_n, c_c)
    # jitted JAX: identical up to possible FMA contraction (1 ulp)
    s_j, c_j = jax.jit(trig32.sincos32)(jnp.asarray(x))
    assert np.abs(np.asarray(s_j) - s_n).max() <= 1.2e-7
    assert np.abs(np.asarray(c_j) - c_n).max() <= 1.2e-7
    # and accurate, not merely identical
    assert np.abs(s_n - np.sin(x.astype(np.float64))).max() < 2e-7

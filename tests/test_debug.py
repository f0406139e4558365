"""Debug-assert mode (utils/debug): the sanitizer-analog layer.

Pins: invariant auditing catches injected NaNs / capacity violations /
weight collapse; checkify instrumentation catches NaN production inside a
jitted program; a healthy SLAM step passes both."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_slam_tpu.config import DEFAULT_CONFIG
from lidar_slam_tpu.io import simulate
from lidar_slam_tpu.models import scan_matcher
from lidar_slam_tpu.utils import debug


def _state():
    ranges, _ = simulate.generate_dataset(n_scans=2, seed=0)
    return scan_matcher.init_state(jnp.asarray(ranges[0]), DEFAULT_CONFIG), ranges


def test_healthy_state_validates():
    state, _ = _state()
    assert debug.validate_state(state) == []


def test_injected_nan_is_caught():
    state, _ = _state()
    bad = state._replace(pose=jnp.asarray([jnp.nan, 0.0, 0.0]))
    violations = debug.validate_state(bad)
    assert any("pose" in v and "non-finite" in v for v in violations)
    with pytest.raises(AssertionError, match="non-finite"):
        debug.assert_valid(bad)


def test_capacity_violation_is_caught():
    state, _ = _state()
    bad = state._replace(pmap=state.pmap._replace(
        size=jnp.int32(state.pmap.xy.shape[0] + 5)))
    assert any("pmap.size" in v for v in debug.validate_state(bad))


def test_weight_collapse_is_caught():
    from lidar_slam_tpu.models import fastslam
    import dataclasses
    from lidar_slam_tpu.config import ParticleConfig

    cfg = dataclasses.replace(DEFAULT_CONFIG,
                              particles=ParticleConfig(n_particles=8))
    ranges, _ = simulate.generate_dataset(n_scans=2, seed=0)
    ps = fastslam.init_particles(jnp.asarray(ranges[0]), cfg)
    assert debug.validate_state(ps) == []
    bad = ps._replace(logw=jnp.full_like(ps.logw, -jnp.inf))
    assert any("collapsed" in v for v in debug.validate_state(bad))


def test_checked_catches_nan_inside_jit():
    from jax.experimental import checkify

    def f(x):
        return jnp.log(x - 2.0)      # NaN for x < 2

    g = debug.checked(f)
    np.testing.assert_allclose(g(jnp.float32(3.0)), 0.0, atol=1e-6)
    with pytest.raises(checkify.JaxRuntimeError, match="nan"):
        g(jnp.float32(1.0))


def test_checked_slam_step_is_clean():
    """A real jitted SLAM step runs NaN/div-instrumented without tripping —
    the pipeline's intentional masked/clamped math is checkify-clean."""
    from lidar_slam_tpu.core import sensor

    state, ranges = _state()
    angles = jnp.asarray(sensor.beam_angles(DEFAULT_CONFIG.lidar))
    step = debug.checked(
        lambda st, r: scan_matcher.slam_step(st, r, DEFAULT_CONFIG, angles))
    new_state, pose = step(state, jnp.asarray(ranges[1]))
    assert debug.validate_state(new_state) == []
    assert np.isfinite(np.asarray(pose)).all()


def test_finite_or_revert():
    good = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    bad = {"a": jnp.asarray([1.0, jnp.nan, 2.0]), "b": jnp.zeros(2)}
    old = {"a": jnp.full(3, 7.0), "b": jnp.full(2, 7.0)}
    out = debug.finite_or_revert(good, old)
    np.testing.assert_allclose(out["a"], 1.0)
    out = debug.finite_or_revert(bad, old)
    np.testing.assert_allclose(out["a"], 7.0)   # whole-tree revert
    np.testing.assert_allclose(out["b"], 7.0)

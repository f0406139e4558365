"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU in bench).

Mirrors the reference's C-sim-then-RTL-cosim kernel verification ladder
(dissertation p.45-46): interpreter == C-simulation here, the TPU bench run
== on-hardware check.
"""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lidar_slam_tpu.ops import edt


@pytest.mark.parametrize("shape,density,seed", [
    ((200, 200), 0.01, 0),
    ((400, 400), 0.005, 1),
    ((64, 128), 0.1, 2),
])
def test_pallas_edt_matches_jnp(shape, density, seed):
    from lidar_slam_tpu.ops import pallas_edt

    rng = np.random.default_rng(seed)
    occ = rng.random(shape) < density
    want = np.asarray(edt.edt_clamped(occ, 10))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_edt.edt_clamped_pallas(occ, 10))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pallas_edt_empty_grid():
    from lidar_slam_tpu.ops import pallas_edt

    occ = np.zeros((64, 128), bool)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_edt.edt_clamped_pallas(occ, 10))
    np.testing.assert_allclose(got, np.full((64, 128), 10.0), atol=1e-6)

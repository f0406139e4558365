"""Sharded EDT with halo exchange vs the single-device kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from lidar_slam_tpu.ops import edt
from lidar_slam_tpu.parallel import sharded_edt


@pytest.fixture
def map_mesh():
    import numpy as _np

    return Mesh(_np.asarray(jax.devices()).reshape(8), axis_names=("map",))


@pytest.mark.parametrize("size,density,seed", [(128, 0.05, 1), (160, 0.02, 0),
                                               (240, 0.008, 2)])
def test_sharded_edt_matches_single_device(map_mesh, size, density, seed):
    rng = np.random.default_rng(seed)
    occ = rng.random((size, size)) < density
    want = np.asarray(edt.edt_clamped(occ, 10))
    got = np.asarray(sharded_edt.edt_sharded(jnp.asarray(occ), map_mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_edt_cross_shard_distances(map_mesh):
    # one obstacle near a shard boundary: distances must cross the halo
    occ = np.zeros((128, 128), bool)
    occ[15, 64] = True  # last row of shard 0 (128/8 = 16 rows per shard)
    got = np.asarray(sharded_edt.edt_sharded(jnp.asarray(occ), map_mesh))
    assert got[15, 64] == 0.0
    assert got[16, 64] == pytest.approx(1.0)   # shard 1, one row below
    assert got[21, 72] == pytest.approx(10.0)  # sqrt(36+64), into shard 1
    assert got[23, 64] == pytest.approx(8.0)
    assert got[8, 64] == pytest.approx(7.0)


def test_sharded_edt_rejects_thin_shards(map_mesh):
    with pytest.raises(ValueError, match="shard height"):
        sharded_edt.edt_sharded(jnp.zeros((64, 64), bool), map_mesh)

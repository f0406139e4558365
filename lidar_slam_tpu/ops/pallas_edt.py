"""Pallas TPU kernel: clamped Euclidean distance transform.

The TPU answer to the reference's FPGA EDT co-processor (HLS kernel,
``Submodule_2/Accelereated_Euclidean_Distance_Transform.c``; 0.4 ms per
400x400 on fabric, dissertation p.46): one fused kernel, the whole grid
VMEM-resident (400x400 f32 = 640 KB), separable two-pass windowed min:

  pass 1 (lanes):    d1[y,x] = min_{|dx|<=R} (occ[y,x+dx] ? dx^2 : INF)
  pass 2 (sublanes): d2[y,x] = min_{|dy|<=R} (d1[y+dy,x] + dy^2)
  out = occ ? 0 : min(sqrt(d2), R)

Shifts are static `pltpu.roll`s with iota edge masks (no HBM round trips, no
scatter/gather). Exact under the clamp — matches ``ops/edt.edt_clamped`` and
the brute-force oracle bit-for-bit on f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38  # python float: a module-level jnp scalar would be a captured const


def _edt_kernel(occ_ref, out_ref, *, max_dist: int):
    r = max_dist
    occ = occ_ref[:]                                  # (H, W) f32 (0/1)
    h, w = occ.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    # pass 1: along lanes (x)
    inf = jnp.float32(_INF)
    d1 = jnp.full((h, w), inf)
    for dx in range(-r, r + 1):
        # circular roll by (-dx mod w): shifted[y,x] = occ[y,x+dx]; the iota
        # mask below kills the wrapped entries (pltpu.roll wants shift >= 0)
        shifted = pltpu.roll(occ, (-dx) % w, axis=1)
        ok = (col + dx >= 0) & (col + dx < w)
        d1 = jnp.minimum(d1, jnp.where((shifted > 0) & ok,
                                       jnp.float32(dx * dx), inf))

    # pass 2: along sublanes (y)
    d2 = jnp.full((h, w), inf)
    for dy in range(-r, r + 1):
        shifted = pltpu.roll(d1, (-dy) % h, axis=0)   # shifted[y,x] = d1[y+dy,x]
        ok = (row + dy >= 0) & (row + dy < h)
        d2 = jnp.minimum(d2, jnp.where(ok, shifted, inf) + jnp.float32(dy * dy))

    dist = jnp.minimum(jnp.sqrt(jnp.minimum(d2, inf)), jnp.float32(max_dist))
    # 2^-10 lattice snap (ops/edt.quantize_metric): keeps matcher scores
    # order-independent in f32, hence bit-comparable with the C++ oracle
    dist = jnp.trunc(dist * jnp.float32(1024.0) + jnp.float32(0.5)) \
        * jnp.float32(1.0 / 1024.0)
    out_ref[:] = jnp.where(occ > 0, jnp.float32(0.0), dist)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def edt_clamped_pallas(occ: jnp.ndarray, max_dist: int = 10) -> jnp.ndarray:
    """Clamped EDT of a boolean grid as one fused Pallas kernel."""
    occ_f = occ.astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_edt_kernel, max_dist=int(max_dist)),
        out_shape=jax.ShapeDtypeStruct(occ.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=occ.size * (4 * max_dist + 6),
            bytes_accessed=occ.size * 8,
            transcendentals=occ.size,
        ),
    )(occ_f)

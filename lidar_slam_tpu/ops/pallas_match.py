"""Pallas TPU kernel: fused scan-match correlation volume.

The BASELINE "fused Pallas scan-match kernel". Computes, for each theta bin,
the full (W, W) translation-offset score surface

    scores[t, dy, dx] = sum_{y,x} hist[t, y, x] * metric[y+dy, x+dx]
    counts[t, dy, dx] = sum_{y,x} hist[t, y, x] * inbounds[y+dy, x+dx]

where ``hist`` is the per-bin histogram of projected scan points (a tiny
scatter built outside the kernel) and ``metric`` the EDT likelihood field
pre-masked to the grid's valid region. Everything lives in VMEM (a 400x400
f32 field is 640 KB); the offset loop is 2R+1 sublane rolls x 2R+1 lane
rolls with iota edge masks — no gathers anywhere, pure VPU arithmetic.

This replaces the jnp row-slab + one-hot-matmul path of
``ops/correlative.build_score_volume`` on TPU (identical results: the
histogram commutes the per-beam sum into cell space).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(hist_ref, metric_ref, scores_ref, *, half: int):
    """One program per theta bin: correlate hist[t] against the masked field.

    Inputs are zero-padded by >= half on every side, so circular rolls wrap
    only into zeros — no edge masks needed (see correlate_volume). The
    offset loop uses fori_loop + dynamic rolls (a statically unrolled
    (2R+1)^2 version takes ~8 minutes to compile; this compiles in seconds).
    The companion count volume is analytic (separable in dy/dx) and is
    computed outside as a tiny mask einsum — only the score correlation
    needs the field.

    NOTE on performance: the kernel is reduction-bound on the VPU (one
    full-grid multiply-reduce per offset). An MXU formulation (stack the
    bins, contract the flattened grid per offset) would be several times
    faster but needs a cross-lane reshape Mosaic does not support
    ("unsupported shape cast"); revisit when it does.
    """
    h = hist_ref[0]                                  # (SP_r, SP_c)
    metric = metric_ref[:]
    sp_rows, sp_cols = metric.shape

    w = 2 * half + 1
    # aligned accumulators (unaligned loop carries are unsupported in Mosaic)
    acc_r = ((w + 7) // 8) * 8
    acc_c = 128
    row_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, acc_c), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, acc_c), 1)

    def body_dy(iy, scores):
        dy = iy - half
        m_y = pltpu.roll(metric, (-dy) % sp_rows, axis=0)

        def body_dx(ix, s2):
            dx = ix - half
            m_s = pltpu.roll(m_y, (-dx) % sp_cols, axis=1)
            sel = (row_id == iy) & (col_id == ix)
            return jnp.where(sel, jnp.sum(h * m_s), s2)

        return jax.lax.fori_loop(0, w, body_dx, scores)

    zeros = jnp.zeros((acc_r, acc_c), jnp.float32)
    scores = jax.lax.fori_loop(0, w, body_dy, zeros)
    scores_ref[0] = scores[:w, :w]


@functools.partial(jax.jit, static_argnames=("half",))
def correlate_volume(hist: jnp.ndarray, metric_masked: jnp.ndarray,
                     half: int = 8):
    """hist (T, SP_r, SP_c) f32, metric_masked (SP_r, SP_c) f32 ->
    scores (T, W, W) with W = 2*half+1."""
    t, sp_r, sp_c = hist.shape
    w = 2 * half + 1
    kernel = functools.partial(_corr_kernel, half=half)
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, sp_r, sp_c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sp_r, sp_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, w, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=t * w * w * sp_r * sp_c * 2,
            bytes_accessed=(t + 1) * sp_r * sp_c * 4,
            transcendentals=0,
        ),
    )(hist, metric_masked)

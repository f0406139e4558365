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


def _corr_kernel(hist_ref, metric_ref, inb_ref, scores_ref, counts_ref,
                 *, half: int):
    """One program per theta bin: correlate hist[t] against both fields.

    Inputs are zero-padded by >= half on every side, so circular rolls wrap
    only into zeros — no edge masks needed (see correlate_volume). The
    offset loop uses fori_loop + dynamic rolls (a statically unrolled
    (2R+1)^2 version takes ~8 minutes to compile; this compiles in seconds).

    NOTE on performance: this kernel is reduction-bound on the VPU (two
    full-grid multiply-reduces per offset). An MXU formulation (stack the
    bins, contract the flattened grid per offset) would be ~5x faster but
    needs a cross-lane reshape Mosaic does not support ("unsupported shape
    cast"); until then the XLA row-slab path in ``ops/correlative`` is the
    default on all backends and this kernel is kept as the independent
    second implementation (and the seed of the future fused version).
    """
    h = hist_ref[0]                                  # (SP_r, SP_c)
    metric = metric_ref[:]
    inb = inb_ref[:]
    sp_rows, sp_cols = metric.shape

    w = 2 * half + 1
    # aligned accumulators (unaligned loop carries are unsupported in Mosaic)
    acc_r = ((w + 7) // 8) * 8
    acc_c = 128
    row_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, acc_c), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, acc_c), 1)

    def body_dy(iy, carry):
        scores, counts = carry
        dy = iy - half
        m_y = pltpu.roll(metric, (-dy) % sp_rows, axis=0)
        i_y = pltpu.roll(inb, (-dy) % sp_rows, axis=0)

        def body_dx(ix, c2):
            s2, c2_ = c2
            dx = ix - half
            m_s = pltpu.roll(m_y, (-dx) % sp_cols, axis=1)
            i_s = pltpu.roll(i_y, (-dx) % sp_cols, axis=1)
            sel = (row_id == iy) & (col_id == ix)
            s2 = jnp.where(sel, jnp.sum(h * m_s), s2)
            c2_ = jnp.where(sel, jnp.sum(h * i_s), c2_)
            return s2, c2_

        return jax.lax.fori_loop(0, w, body_dx, (scores, counts))

    zeros = jnp.zeros((acc_r, acc_c), jnp.float32)
    scores, counts = jax.lax.fori_loop(0, w, body_dy, (zeros, zeros))
    scores_ref[0] = scores[:w, :w]
    counts_ref[0] = counts[:w, :w]


@functools.partial(jax.jit, static_argnames=("half",))
def correlate_volume(hist: jnp.ndarray, metric_masked: jnp.ndarray,
                     inbounds: jnp.ndarray, half: int = 8):
    """hist (T, S, S) f32, metric_masked/inbounds (S, S) f32 ->
    (scores (T, W, W), counts (T, W, W)) with W = 2*half+1."""
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
            pl.BlockSpec((sp_r, sp_c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, w, w), jnp.float32),
            jax.ShapeDtypeStruct((t, w, w), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t * w * w * sp_r * sp_c * 4,
            bytes_accessed=(t + 2) * sp_r * sp_c * 4,
            transcendentals=0,
        ),
    )(hist, metric_masked, inbounds)

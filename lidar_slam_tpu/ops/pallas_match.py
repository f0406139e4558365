"""Pallas TPU kernel: fused scan-match correlation volume.

The BASELINE "fused Pallas scan-match kernel". Computes, for each theta bin,
the full (W, W) translation-offset score surface

    scores[t, dy, dx] = sum_{y,x} hist[t, y, x] * metric[y+dy, x+dx]
    counts[t, dy, dx] = sum_{y,x} hist[t, y, x] * inbounds[y+dy, x+dx]

where ``hist`` is the per-bin histogram of projected scan points (a tiny
scatter built outside the kernel) and ``metric`` the EDT likelihood field
pre-masked to the grid's valid region. Everything lives in VMEM; there are
no gathers anywhere.

Kernel structure (v2 — 4x the v1 per-bin-rolls version):
- the grid axis iterates row *chunks* of the field (32 rows each), not theta
  bins, so the (dy, dx) offset loops touch only a (32, C) block that stays
  in vector registers;
- the dy offset is a cheap in-register roll of an 8-aligned superset load
  (Mosaic requires sublane-aligned ref slices; the superset trick turns the
  unaligned hist window into one aligned load + one static roll);
- the 2R+1 lane-rolled copies of the metric chunk are hoisted out of the
  theta/dy loops (v1 re-rolled the full 400^2 field per offset: 1274
  full-grid rolls per call vs 13 block rolls per chunk here);
- chunks beyond the grid's *dynamic* valid row count are skipped entirely
  via a scalar-prefetch bound (the fixed 400^2 array usually holds a much
  smaller live region, reference grid sizing ``main.c:275-302``).

Padding contract (see ``correlative._volume_pallas``): content rows start at
``ROW_PAD`` (16) and columns at ``COL_PAD`` (8); both margins are >= half so
every roll wraps zeros.

The companion count volume is analytic (separable in dy/dx) and is computed
outside as a tiny mask einsum — only the score correlation needs the field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_CHUNK = 32


def row_halo(half: int) -> int:
    """Superset row halo: ``half`` rounded up to the sublane multiple."""
    return ((half + 7) // 8) * 8


def row_pad(half: int) -> int:
    """Content row offset in the padded layout (== the 8-aligned halo)."""
    return row_halo(half)


def col_pad(half: int) -> int:
    """Content column offset: any value >= half keeps lane rolls in zeros."""
    return half


def _corr_kernel(row_hi_ref, hist_ref, metric_ref, scores_ref, *, half: int,
                 rows_per: int):
    i = pl.program_id(0)
    w = 2 * half + 1
    t_bins = hist_ref.shape[0]
    halo = row_halo(half)
    r0 = halo + i * rows_per

    acc_r = ((w + 7) // 8) * 8
    row_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, 128), 0)
    col_id = jax.lax.broadcasted_iota(jnp.int32, (acc_r, 128), 1)
    nsup = rows_per + 2 * halo

    @pl.when(i == 0)
    def _():
        scores_ref[...] = jnp.zeros_like(scores_ref)

    # skip chunks past the grid's dynamic valid region (metric is zero there)
    @pl.when(i * rows_per < row_hi_ref[0])
    def _():
        m_blk = metric_ref[pl.ds(r0, rows_per), :]
        sp_c = m_blk.shape[-1]
        m_rolls = [pltpu.roll(m_blk, (-(dx - half)) % sp_c, axis=1)
                   for dx in range(w)]
        for t in range(t_bins):
            # aligned superset covering hist rows [r0-half, r0+rows_per+half)
            h_sup = hist_ref[t, pl.ds(r0 - halo, nsup), :]
            acc = jnp.zeros((acc_r, 128), jnp.float32)
            for dyi in range(w):
                # hist row (metric row) - dy, in superset coords: halo - dy
                sh = halo + half - dyi
                h_slice = pltpu.roll(h_sup, (-sh) % nsup, axis=0)[:rows_per, :]
                for dxi in range(w):
                    s = jnp.sum(h_slice * m_rolls[dxi])
                    acc = acc + jnp.where((row_id == dyi) & (col_id == dxi),
                                          s, 0.0)
            scores_ref[t] += acc[: scores_ref.shape[1], : scores_ref.shape[2]]


@functools.partial(jax.jit, static_argnames=("half",))
def correlate_volume(hist: jnp.ndarray, metric_masked: jnp.ndarray,
                     row_hi: jnp.ndarray, half: int = 8):
    """hist (T, SP_r, SP_c) f32, metric_masked (SP_r, SP_c) f32 ->
    scores (T, W, W) with W = 2*half+1.

    Inputs follow the row_pad(half)/col_pad(half) layout (content at
    ``[row_pad:, col_pad:]``); ``SP_r - 2*row_halo(half)`` must be a multiple
    of ROWS_PER_CHUNK. ``row_hi`` (i32 scalar) bounds the live content rows —
    chunks at or beyond it are skipped.
    """
    t, sp_r, sp_c = hist.shape
    halo = row_halo(half)
    assert (sp_r - 2 * halo) % ROWS_PER_CHUNK == 0, (sp_r, halo)
    n_chunks = (sp_r - 2 * halo) // ROWS_PER_CHUNK
    w = 2 * half + 1
    kernel = functools.partial(_corr_kernel, half=half,
                               rows_per=ROWS_PER_CHUNK)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((t, w, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=t * w * w * sp_r * sp_c * 2,
            bytes_accessed=(t + 1) * sp_r * sp_c * 4,
            transcendentals=0,
        ),
    )(jnp.reshape(row_hi.astype(jnp.int32), (1,)), hist, metric_masked)

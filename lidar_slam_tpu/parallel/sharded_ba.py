"""Distributed Schur-complement bundle adjustment (multi-device).

``models/ba.py`` solves the reduced pose system densely on one device; at
scale (thousands of keyframes) both the Schur-correction einsum and the
(3K)^2 reduced matrix outgrow a single chip. This module block-shards the
solve over keyframes, the design SURVEY §7 calls "Schur-complement reduced
BA with block-sharded linear algebra" (the reference has no distribution at
all — its only "multi-node" mechanism is an HTTP relay chain, SURVEY §2.4).

Sharding layout (1-D mesh axis, default name "graph"):

- factor arrays (odometry E axis, observation F axis) are sharded — each
  device linearizes only its factor shard (embarrassingly parallel jacfwd);
- the pose Hessian ``Hpp`` is assembled locally per shard and
  ``psum_scatter``-ed along keyframe *rows*, so each device materializes
  only its (K/D, K) row-slab of the reduced matrix;
- the landmark system (Hll block-diagonal, U = Hpl) is psum-replicated —
  landmarks couple poses across shards, and the 2x2 blocks are tiny;
- the Schur correction S = Hpp - U^T Hll^-1 U is computed on row-slices:
  each device contracts its (L, K/D, 3, 2) slice of U against the full U —
  the O(L K^2) einsum, the FLOP hot spot, scales 1/D per device;
- the reduced solve is preconditioned conjugate gradients with a
  block-Jacobi (3x3 pose-block) preconditioner: the matvec is row-local +
  one ``all_gather`` per iteration; dot products run on replicated vectors.

Gauge: pose 0 (and inactive poses) are handled as *exact* constraints
(rows/columns zeroed, identity diagonal) instead of the dense path's 1e6
prior — a 1e6 diagonal entry would wreck CG conditioning.

Collectives used: ``psum``, ``psum_scatter``, ``all_gather`` — all ICI-
friendly; nothing is gathered that grows as K^2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lidar_slam_tpu.core import se2
from lidar_slam_tpu.models.ba import BAProblem, _inv2, _obs_residual, _odo_residual


def make_graph_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'graph'."""
    devices = np.asarray(list(devices if devices is not None else jax.devices()))
    return Mesh(devices, axis_names=("graph",))


def _pad_to(x: jnp.ndarray, n: int, fill=0):
    if x.shape[0] == n:
        return x
    pad_width = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def pad_problem(p: BAProblem, n_dev: int) -> BAProblem:
    """Pad every axis (K, L, E, F) to a multiple of ``n_dev``.

    Padded slots are inactive: they contribute zero to every normal-equation
    block and their states are pinned by the exact-constraint rows.
    """

    def up(n):
        return ((n + n_dev - 1) // n_dev) * n_dev

    k = up(p.poses.shape[0])
    l = up(p.landmarks.shape[0])
    e = up(p.odo_i.shape[0])
    f = up(p.obs_i.shape[0])
    return BAProblem(
        poses=_pad_to(p.poses, k),
        landmarks=_pad_to(p.landmarks, l),
        pose_active=_pad_to(p.pose_active, k, fill=False),
        lm_active=_pad_to(p.lm_active, l, fill=False),
        odo_i=_pad_to(p.odo_i, e),
        odo_j=_pad_to(p.odo_j, e),
        odo_z=_pad_to(p.odo_z, e),
        odo_w=_pad_to(p.odo_w, e),
        odo_active=_pad_to(p.odo_active, e, fill=False),
        obs_i=_pad_to(p.obs_i, f),
        obs_j=_pad_to(p.obs_j, f),
        obs_z=_pad_to(p.obs_z, f),
        obs_w=_pad_to(p.obs_w, f),
        obs_active=_pad_to(p.obs_active, f, fill=False),
    )


def _ba_kernel(poses0, lms0, pose_active, lm_active,
               odo_i, odo_j, odo_z, odo_w, odo_active,
               obs_i, obs_j, obs_z, obs_w, obs_active,
               *, axis_name: str, iters: int, cg_iters: int, damping: float):
    """Per-shard body. Factor arrays are local shards; state is replicated."""
    kmax = poses0.shape[0]
    lmax = lms0.shape[0]
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    kl = kmax // d
    ll = lmax // d
    g_rows = my * kl + jnp.arange(kl)              # global keyframe rows here
    eye3 = jnp.eye(3, dtype=jnp.float32)

    # exact-constraint poses: gauge (node 0) + inactive slots
    fixed = (~pose_active) | (jnp.arange(kmax) == 0)

    obs_jac = jax.vmap(jax.jacfwd(_obs_residual, argnums=(0, 1)), in_axes=(0, 0, 0))
    obs_res = jax.vmap(_obs_residual, in_axes=(0, 0, 0))
    odo_jac = jax.vmap(jax.jacfwd(_odo_residual, argnums=(0, 1)), in_axes=(0, 0, 0))
    odo_res = jax.vmap(_odo_residual, in_axes=(0, 0, 0))

    def gn_iter(_, carry):
        poses, lms = carry

        # --- local factor linearization (this shard's factors only) -------
        xi = poses[odo_i]
        xj = poses[odo_j]
        (ji, jj) = odo_jac(xi, xj, odo_z)
        ro = odo_res(xi, xj, odo_z)
        wo = odo_w * odo_active[:, None]
        h_ii = jnp.einsum("eab,ea,eac->ebc", ji, wo, ji)
        h_jj = jnp.einsum("eab,ea,eac->ebc", jj, wo, jj)
        h_ij = jnp.einsum("eab,ea,eac->ebc", ji, wo, jj)
        b_i = jnp.einsum("eab,ea,ea->eb", ji, wo, ro)
        b_j = jnp.einsum("eab,ea,ea->eb", jj, wo, ro)

        hpp = jnp.zeros((kmax, kmax, 3, 3), jnp.float32)
        hpp = hpp.at[odo_i, odo_i].add(h_ii, mode="drop")
        hpp = hpp.at[odo_j, odo_j].add(h_jj, mode="drop")
        hpp = hpp.at[odo_i, odo_j].add(h_ij, mode="drop")
        hpp = hpp.at[odo_j, odo_i].add(jnp.swapaxes(h_ij, 1, 2), mode="drop")
        bp = jnp.zeros((kmax, 3), jnp.float32)
        bp = bp.at[odo_i].add(b_i, mode="drop")
        bp = bp.at[odo_j].add(b_j, mode="drop")

        xo = poses[obs_i]
        lo = lms[obs_j]
        (jp_, jl) = obs_jac(xo, lo, obs_z)
        rv = obs_res(xo, lo, obs_z)
        wv = obs_w * obs_active[:, None]
        hpp_o = jnp.einsum("fab,fa,fac->fbc", jp_, wv, jp_)
        hll_o = jnp.einsum("fab,fa,fac->fbc", jl, wv, jl)
        hpl_o = jnp.einsum("fab,fa,fac->fbc", jp_, wv, jl)
        bp_o = jnp.einsum("fab,fa,fa->fb", jp_, wv, rv)
        bl_o = jnp.einsum("fab,fa,fa->fb", jl, wv, rv)

        hpp = hpp.at[obs_i, obs_i].add(hpp_o, mode="drop")
        bp = bp.at[obs_i].add(bp_o, mode="drop")
        hll = jnp.zeros((lmax, 2, 2), jnp.float32).at[obs_j].add(hll_o, mode="drop")
        bl = jnp.zeros((lmax, 2), jnp.float32).at[obs_j].add(bl_o, mode="drop")
        u = jnp.zeros((lmax, kmax, 3, 2), jnp.float32)
        u = u.at[obs_j, obs_i].add(hpl_o, mode="drop")

        # --- cross-shard reduction -----------------------------------------
        # row-slabs of Hpp / bp stay sharded; the landmark system replicates
        hpp_rows = jax.lax.psum_scatter(hpp, axis_name, scatter_dimension=0,
                                        tiled=True)              # (Kl, K, 3, 3)
        bp_rows = jax.lax.psum_scatter(bp, axis_name, scatter_dimension=0,
                                       tiled=True)               # (Kl, 3)
        hll = jax.lax.psum(hll, axis_name)
        bl = jax.lax.psum(bl, axis_name)
        u = jax.lax.psum(u, axis_name)                           # (L, K, 3, 2)

        eye2 = jnp.eye(2, dtype=jnp.float32)
        hll = hll + eye2[None] * (damping
                                  + (~lm_active).astype(jnp.float32))[:, None, None]
        hll_inv = _inv2(hll)

        # --- row-sliced Schur complement ------------------------------------
        u_rows = jax.lax.dynamic_slice_in_dim(u, my * kl, kl, axis=1)  # (L, Kl, 3, 2)
        s_rows = hpp_rows - jnp.einsum("lkab,lbc,lmdc->kmad", u_rows, hll_inv, u)
        b_red_rows = bp_rows - jnp.einsum("lkab,lbc,lc->ka", u_rows, hll_inv, bl)

        # exact constraints: zero fixed rows/cols, identity diagonal, damping
        rowfix = fixed[g_rows]
        s_rows = s_rows * (~rowfix)[:, None, None, None].astype(jnp.float32)
        s_rows = s_rows * (~fixed)[None, :, None, None].astype(jnp.float32)
        diag_add = jnp.where(rowfix, 1.0, damping)
        s_rows = s_rows.at[jnp.arange(kl), g_rows].add(
            eye3[None] * diag_add[:, None, None])

        rhs_rows = jnp.where(rowfix[:, None], 0.0, -b_red_rows)
        rhs = jax.lax.all_gather(rhs_rows, axis_name, tiled=True)  # (K, 3)

        # block-Jacobi preconditioner from the local diagonal blocks
        dblocks = s_rows[jnp.arange(kl), g_rows]                   # (Kl, 3, 3)
        minv = jax.lax.all_gather(jnp.linalg.inv(dblocks), axis_name,
                                  tiled=True)                      # (K, 3, 3)

        def matvec(v):
            y_rows = jnp.einsum("kmab,mb->ka", s_rows, v)
            return jax.lax.all_gather(y_rows, axis_name, tiled=True)

        def precond(r):
            return jnp.einsum("kab,kb->ka", minv, r)

        # --- distributed PCG on S dp = rhs ----------------------------------
        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = precond(r0)
        rz0 = jnp.sum(r0 * z0)

        def cg_step(_, st):
            x, r, z, pvec, rz = st
            ap = matvec(pvec)
            den = jnp.sum(pvec * ap)
            alpha = jnp.where(jnp.abs(den) > 1e-20, rz / den, 0.0)
            x = x + alpha * pvec
            r = r - alpha * ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
            return x, r, z, z + beta * pvec, rz_new

        dp, *_ = jax.lax.fori_loop(0, cg_iters, cg_step,
                                   (x0, r0, z0, z0, rz0))
        dp = jnp.where(fixed[:, None], 0.0, dp)

        # --- landmark back-substitution (replicated; L x tiny blocks) -------
        hlp_dp = jnp.einsum("lkba,kb->la", u, dp)
        dl = jnp.einsum("lab,lb->la", hll_inv, -bl - hlp_dp)
        dl = dl * lm_active[:, None]

        new_poses = poses + dp
        new_poses = new_poses.at[:, 2].set(se2.wrap_angle(new_poses[:, 2]))
        return new_poses, lms + dl

    poses, lms = jax.lax.fori_loop(0, iters, gn_iter, (poses0, lms0))
    # return this shard's row-slices; shard_map reassembles the full arrays
    return (jax.lax.dynamic_slice_in_dim(poses, my * kl, kl, axis=0),
            jax.lax.dynamic_slice_in_dim(lms, my * ll, ll, axis=0))


@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis_name", "iters", "cg_iters",
                                    "damping"))
def _run_sharded(p: BAProblem, mesh: Mesh, axis_name: str, iters: int,
                 cg_iters: int, damping: float):
    spec = P(axis_name)
    rep = P()
    kernel = functools.partial(_ba_kernel, axis_name=axis_name, iters=iters,
                               cg_iters=cg_iters, damping=damping)
    return jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(rep, rep, rep, rep,
                  spec, spec, spec, spec, spec,
                  spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )(p.poses, p.landmarks, p.pose_active, p.lm_active,
      p.odo_i, p.odo_j, p.odo_z, p.odo_w, p.odo_active,
      p.obs_i, p.obs_j, p.obs_z, p.obs_w, p.obs_active)


def optimize_ba_sharded(p: BAProblem, mesh: Mesh | None = None,
                        axis_name: str = "graph", iters: int = 10,
                        damping: float = 1e-3,
                        cg_iters: int | None = None) -> BAProblem:
    """Distributed damped Gauss-Newton with Schur landmark elimination.

    Drop-in for ``models.ba.optimize_ba`` on a device mesh. ``cg_iters``
    defaults to the full reduced dimension (exact solve in exact arithmetic);
    at scale a few dozen iterations suffice thanks to the block-Jacobi
    preconditioner.
    """
    if mesh is None:
        mesh = make_graph_mesh()
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                         if a == axis_name]))
    orig_k = p.poses.shape[0]
    orig_l = p.landmarks.shape[0]
    pp = pad_problem(p, n_dev)
    if cg_iters is None:
        cg_iters = 3 * pp.poses.shape[0]
    poses, lms = _run_sharded(pp, mesh, axis_name, iters, int(cg_iters),
                              float(damping))
    return p._replace(poses=poses[:orig_k], landmarks=lms[:orig_l])

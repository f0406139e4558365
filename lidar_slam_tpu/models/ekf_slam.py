"""FastSLAM with per-particle landmark EKFs — fully vmapped/batched.

BASELINE.json config 2 ("1k particles, vmapped per-particle landmark EKF +
batched importance weighting"). The grid-based filter (``fastslam.py``) shares
one occupancy map; this model family is the Rao-Blackwellized *landmark*
formulation: each particle carries an independent bank of 2-D landmark EKFs
(mean + covariance), updated in closed form.

TPU-native design: there is no per-landmark loop anywhere. Every step does
the EKF update for ALL (particle, landmark) pairs as (P, L)-batched 2x2
linear algebra (closed-form inverses, no solves), then selects between
{update, initialize, keep} with masks. For P=10k, L=64 that is ~10 MFLOP of
pure VPU arithmetic per step.

Conventions: poses use the reference convention (w = A(theta) p + t,
A = [[c, s], [-s, c]]); a landmark at world offset (dx, dy) is observed at
range |d| and sensor-frame bearing atan2(dy, dx) + theta.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.core import se2


class EkfSlamConfig(NamedTuple):
    n_particles: int = 1024
    max_landmarks: int = 16
    r_noise: float = 0.05       # measurement std (range, m)
    b_noise: float = 0.015      # measurement std (bearing, rad)
    odo_xy_noise: float = 0.006  # proposal noise around odometry
    odo_th_noise: float = 0.002
    resample_threshold: float = 0.5


class EkfSlamState(NamedTuple):
    poses: jnp.ndarray     # (P, 3)
    logw: jnp.ndarray      # (P,)
    lm_mean: jnp.ndarray   # (P, L, 2)
    lm_cov: jnp.ndarray    # (P, L, 2, 2)
    lm_seen: jnp.ndarray   # (L,) bool (known association -> shared)
    rng: jnp.ndarray


def init_ekf_slam(cfg: EkfSlamConfig, seed: int = 0) -> EkfSlamState:
    p, l = cfg.n_particles, cfg.max_landmarks
    return EkfSlamState(
        poses=jnp.zeros((p, 3), jnp.float32),
        logw=jnp.zeros(p, jnp.float32),
        lm_mean=jnp.zeros((p, l, 2), jnp.float32),
        lm_cov=jnp.tile(jnp.eye(2, dtype=jnp.float32) * 1e4, (p, l, 1, 1)),
        lm_seen=jnp.zeros(l, jnp.bool_),
        rng=jax.random.PRNGKey(seed),
    )


def _compose_ref(pose: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """compose in the reference convention: result applies delta in pose's frame."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x = pose[..., 0] + c * delta[..., 0] + s * delta[..., 1]
    y = pose[..., 1] - s * delta[..., 0] + c * delta[..., 1]
    return jnp.stack([x, y, pose[..., 2] + delta[..., 2]], axis=-1)


def _inv2(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form 2x2 inverse + determinant (batched)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv = jnp.stack([jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2)
    return inv / det[..., None, None], det


def ekf_slam_step(state: EkfSlamState, odo: jnp.ndarray, obs: jnp.ndarray,
                  vis: jnp.ndarray, cfg: EkfSlamConfig
                  ) -> tuple[EkfSlamState, jnp.ndarray]:
    """One step: propagate + per-(particle, landmark) EKF update + resample.

    odo: (3,) relative motion; obs: (L, 2) (range, bearing); vis: (L,) bool.
    Returns (state, estimated pose)."""
    p, l = cfg.n_particles, cfg.max_landmarks
    key, k_noise, k_resample = jax.random.split(state.rng, 3)

    # --- propagate through odometry with per-particle noise
    noise = jax.random.normal(k_noise, (p, 3)) * jnp.asarray(
        [cfg.odo_xy_noise, cfg.odo_xy_noise, cfg.odo_th_noise], jnp.float32)
    poses = _compose_ref(state.poses, odo[None, :] + noise)     # (P, 3)

    # --- batched EKF: all (P, L) pairs at once
    px, py, pth = poses[:, 0:1], poses[:, 1:2], poses[:, 2:3]   # (P, 1)
    dx = state.lm_mean[..., 0] - px                              # (P, L)
    dy = state.lm_mean[..., 1] - py
    r2 = jnp.maximum(dx * dx + dy * dy, 1e-6)
    r = jnp.sqrt(r2)
    zr = obs[None, :, 0]                                         # (1, L)
    zb = obs[None, :, 1]
    r_noise2 = jnp.float32(cfg.r_noise ** 2)
    b_noise2 = jnp.float32(cfg.b_noise ** 2)

    # innovation (range, bearing); bearing = atan2(dy,dx) + theta (ref conv)
    nu_r = zr - r
    nu_b = se2.wrap_angle(zb - (jnp.arctan2(dy, dx) + pth))
    nu = jnp.stack([nu_r, nu_b], axis=-1)                        # (P, L, 2)

    # H = d(h)/d(landmark): rows (range, bearing)
    h = jnp.stack([
        jnp.stack([dx / r, dy / r], -1),
        jnp.stack([-dy / r2, dx / r2], -1),
    ], axis=-2)                                                  # (P, L, 2, 2)

    pcov = state.lm_cov
    hp = h @ pcov                                                # (P, L, 2, 2)
    s_mat = hp @ jnp.swapaxes(h, -1, -2)
    s_mat = s_mat + jnp.asarray([[r_noise2, 0.0], [0.0, b_noise2]])
    s_inv, s_det = _inv2(s_mat)
    k_gain = jnp.swapaxes(hp, -1, -2) @ s_inv                    # P H^T S^-1
    upd_mean = state.lm_mean + (k_gain @ nu[..., None])[..., 0]
    upd_cov = pcov - k_gain @ hp
    loglik = -0.5 * ((nu[..., None, :] @ s_inv @ nu[..., None])[..., 0, 0]
                     + jnp.log(jnp.maximum(s_det, 1e-12))
                     + 2.0 * jnp.log(2.0 * jnp.pi))              # (P, L)

    # --- initialization branch for first sightings
    ang = zb - pth                                               # world angle
    init_mean = jnp.stack([px + zr * jnp.cos(ang),
                           py + zr * jnp.sin(ang)], axis=-1)     # (P, L, 2)
    j_cos, j_sin = jnp.cos(ang), jnp.sin(ang)
    jac = jnp.stack([
        jnp.stack([j_cos, -zr * j_sin], -1),
        jnp.stack([j_sin, zr * j_cos], -1),
    ], axis=-2)                                                  # (P, L, 2, 2)
    meas_cov = jnp.asarray([[cfg.r_noise ** 2, 0.0],
                            [0.0, cfg.b_noise ** 2]], jnp.float32)
    init_cov = jac @ meas_cov @ jnp.swapaxes(jac, -1, -2)

    # --- select per (landmark) branch: update / init / keep
    seen = state.lm_seen[None, :]                                # (1, L)
    visb = vis[None, :]
    do_upd = (visb & seen)[..., None]
    do_init = (visb & ~seen)[..., None]
    new_mean = jnp.where(do_upd, upd_mean,
                         jnp.where(do_init, init_mean, state.lm_mean))
    new_cov = jnp.where(do_upd[..., None], upd_cov,
                        jnp.where(do_init[..., None], init_cov, state.lm_cov))
    logw = state.logw + jnp.sum(jnp.where(visb & seen, loglik, 0.0), axis=1)
    logw = logw - jnp.max(logw)

    # --- resample (branchless ESS gate; ancestors carry their landmark banks)
    w = jax.nn.softmax(logw)
    ess = 1.0 / jnp.sum(w * w)
    c = jnp.cumsum(w)
    u0 = jax.random.uniform(k_resample, (), minval=0.0, maxval=1.0 / p)
    u = u0 + jnp.arange(p, dtype=jnp.float32) / p
    idx_rs = jnp.clip(jnp.searchsorted(c, u), 0, p - 1)
    do_rs = ess < cfg.resample_threshold * p
    idx = jnp.where(do_rs, idx_rs, jnp.arange(p))
    poses = poses[idx]
    new_mean = new_mean[idx]
    new_cov = new_cov[idx]
    logw = jnp.where(do_rs, jnp.zeros_like(logw), logw)

    est = jnp.sum(jax.nn.softmax(logw)[:, None] * poses, axis=0)
    new_state = EkfSlamState(poses=poses, logw=logw, lm_mean=new_mean,
                             lm_cov=new_cov, lm_seen=state.lm_seen | vis,
                             rng=key)
    return new_state, est


@functools.partial(jax.jit, static_argnames=("cfg",))
def _run_jit(odom, obs, vis, cfg: EkfSlamConfig, seed):
    state = init_ekf_slam(cfg, 0)

    def body(st, inp):
        o, z, v = inp
        return ekf_slam_step(st, o, z, v, cfg)

    final, path = jax.lax.scan(body, state, (odom, obs, vis))
    return jnp.concatenate([jnp.zeros((1, 3), jnp.float32), path]), final


def run_ekf_slam(odom: np.ndarray, obs: np.ndarray, vis: np.ndarray,
                 cfg: EkfSlamConfig, seed: int = 0):
    """Whole-sequence on-device run. obs/vis include t=0 (skipped for odom
    alignment: obs[t] pairs with the pose after odom[t-1])."""
    return _run_jit(jnp.asarray(odom, jnp.float32),
                    jnp.asarray(obs[1:], jnp.float32),
                    jnp.asarray(vis[1:]), cfg, seed)


def landmark_estimates(state: EkfSlamState) -> np.ndarray:
    """Weight-averaged landmark means (L, 2)."""
    w = jax.nn.softmax(state.logw)
    return np.asarray(jnp.einsum("p,plk->lk", w, state.lm_mean))

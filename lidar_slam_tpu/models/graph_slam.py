"""Graph-SLAM driver: scan-matcher frontend + loop closure + pose graph.

The full-capability model (BASELINE.json config 5): the fidelity frontend
tracks pose scan-to-map; every keyframe becomes a graph node with an odometry
edge; revisited places are detected by keyframe-to-keyframe correlative
matching over a wide search window; accepted closures trigger a damped
Gauss-Newton solve and a map rebuild from the optimized keyframe poses.

Structure: a host loop around three jitted pieces (frontend step, loop-closure
match, graph optimize). Loop closures are rare events with data-dependent
graph sizes — host-side control flow is the right tool here, while every
numeric inner loop stays on device. (The frontend alone remains available as
one fused lax.scan for pure odometry benchmarking.)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.config import SlamConfig
from lidar_slam_tpu.core import gridmap, se2, sensor
from lidar_slam_tpu.core.gridmap import OccGrid, roundf_like
from lidar_slam_tpu.models import posegraph, scan_matcher
from lidar_slam_tpu.ops import correlative
from lidar_slam_tpu.ops import edt as edt_ops


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    raster_size: int = 256        # keyframe raster: 256 cells @ 0.2 m = +-25.6 m
    raster_pixel: float = 0.2
    n_theta: int = 21             # +-10 bins
    theta_step: float = 0.008727  # 0.5 deg
    window_half: int = 14         # +-2.8 m search window
    accept_avg_dist: float = 1.1  # px — acceptance threshold
    min_inlier_frac: float = 0.75  # fraction of beams in bounds
    min_gap: int = 10             # keyframe index gap before closing
    max_dist: float = 4.0         # m — candidate search radius
    max_candidates: int = 2       # old keyframes tried per new keyframe
    refine_iters: int = 8


class KeyframeStore(NamedTuple):
    x: jnp.ndarray      # (K, N) gated sensor-frame points
    y: jnp.ndarray
    valid: jnp.ndarray  # (K, N)
    count: jnp.ndarray  # () i32


@functools.partial(jax.jit, static_argnames=("size",))
def _raster_edt(x, y, valid, size: int, pixel: float):
    """Rasterize one keyframe scan in its own frame + clamped EDT."""
    half = size // 2
    col = roundf_like(x / pixel).astype(jnp.int32) + half
    row = roundf_like(y / pixel).astype(jnp.int32) + half
    col = jnp.where(valid, col, size)
    row = jnp.where(valid, row, size)
    occ = jnp.zeros((size, size), jnp.bool_).at[row, col].set(True, mode="drop")
    return edt_ops.edt(occ, 10)


@functools.partial(jax.jit, static_argnames=("lc_size", "lc_pixel", "n_theta",
                                             "theta_step", "half", "iters"))
def _match_keyframes(old_x, old_y, old_valid, cur_x, cur_y, cur_valid,
                     guess_rel, lc_size: int, lc_pixel: float, n_theta: int,
                     theta_step: float, half: int, iters: int):
    """Match current scan against an old keyframe's raster.

    Returns (rel_pose (3,), avg_dist (), inlier_frac ()). ``guess_rel`` and
    the result use the reference convention in the old keyframe's frame."""
    metric = _raster_edt(old_x, old_y, old_valid, lc_size, lc_pixel)
    halfm = lc_size // 2 * lc_pixel
    grid = OccGrid(occ=jnp.zeros((lc_size, lc_size), jnp.bool_),
                   n_rows=jnp.int32(lc_size), n_cols=jnp.int32(lc_size),
                   origin=jnp.asarray([-halfm, -halfm], jnp.float32),
                   pixel=lc_pixel)
    vol = correlative.build_score_volume(
        metric, grid, cur_x, cur_y, cur_valid, guess_rel,
        n_theta=n_theta, theta_step=theta_step, half=half)

    steps0 = jnp.asarray([lc_pixel, lc_pixel, theta_step], jnp.float32)
    offs = jnp.stack(jnp.meshgrid(*([jnp.asarray([-1.0, 0.0, 1.0])] * 3),
                                  indexing="ij"), axis=-1).reshape(27, 3)

    def refine(carry, i):
        est, _ = carry
        # coarse-to-fine: halve the step every other iteration
        scale = 2.0 ** (-(i // 2).astype(jnp.float32))
        cands = est[None, :] + offs * (steps0 * scale)[None, :]
        d = correlative.lookup_avg_distance(vol, cands)
        k = jnp.argmin(d)
        return (cands[k], d[k]), None

    (rel, avg_d), _ = jax.lax.scan(refine, (guess_rel, jnp.float32(1e9)),
                                   jnp.arange(iters))
    # inlier fraction: beams of the current scan landing inside the window
    n_valid = jnp.maximum(jnp.sum(cur_valid), 1)
    counts = correlative.lookup_avg_distance(
        vol._replace(scores=vol.counts, counts=jnp.ones_like(vol.counts)),
        rel[None])[0]
    return rel, avg_d, counts / n_valid.astype(jnp.float32)


class GraphSlam:
    """Host-side orchestrator. See module docstring."""

    frontend = scan_matcher  # module providing init_state / slam_step

    def __init__(self, cfg: SlamConfig, lc: LoopClosureConfig = LoopClosureConfig(),
                 max_keyframes: int = 512):
        self.cfg = cfg
        self.lc = lc
        self.max_keyframes = max_keyframes
        self.angles = jnp.asarray(sensor.beam_angles(cfg.lidar))
        n = cfg.lidar.n_beams
        self.graph = posegraph.empty_graph(max_keyframes, max_keyframes * 4)
        self.kf = KeyframeStore(
            x=jnp.zeros((max_keyframes, n), jnp.float32),
            y=jnp.zeros((max_keyframes, n), jnp.float32),
            valid=jnp.zeros((max_keyframes, n), jnp.bool_),
            count=jnp.int32(0))
        self.kf_poses: list[np.ndarray] = []   # ref-convention, host mirror
        self.closures: list[tuple[int, int]] = []
        self.kf_times: list[int] = []   # scan index of each keyframe

    # -- keyframe bookkeeping -------------------------------------------------
    def _add_keyframe(self, scan_x, scan_y, scan_valid, pose_ref: np.ndarray,
                      scan_t: int = 0):
        k = int(self.kf.count)
        self.kf = self.kf._replace(
            x=self.kf.x.at[k].set(scan_x),
            y=self.kf.y.at[k].set(scan_y),
            valid=self.kf.valid.at[k].set(scan_valid),
            count=jnp.int32(k + 1))
        pose_std = np.asarray(se2.ref_to_std(jnp.asarray(pose_ref)))
        self.graph, _ = posegraph.add_node(self.graph, jnp.asarray(pose_std))
        if k > 0:
            prev_std = jnp.asarray(
                np.asarray(se2.ref_to_std(jnp.asarray(self.kf_poses[-1]))))
            z = se2.between(prev_std, jnp.asarray(pose_std))
            self.graph = posegraph.add_edge(
                self.graph, jnp.int32(k - 1), jnp.int32(k), z,
                jnp.asarray([100.0, 100.0, 400.0]))
        self.kf_poses.append(np.asarray(pose_ref))
        self.kf_times.append(scan_t)
        return k

    def _try_loop_closure(self, k: int, scan_x, scan_y, scan_valid):
        """Search old keyframes near the current pose; add an edge if matched."""
        lc = self.lc
        if k < lc.min_gap:
            return None
        cur = self.kf_poses[k]
        old_candidates = [
            (i, np.hypot(*(np.asarray(p[:2]) - cur[:2])))
            for i, p in enumerate(self.kf_poses[: k - lc.min_gap + 1])
        ]
        old_candidates = [c for c in old_candidates if c[1] < lc.max_dist]
        if not old_candidates:
            return None
        old_candidates.sort(key=lambda c: c[1])
        accepted = None
        cur_ref = jnp.asarray(cur)
        for i, _ in old_candidates[: lc.max_candidates]:
            old_ref = jnp.asarray(self.kf_poses[i])
            # relative guess in the old keyframe's frame (ref convention):
            # compose_ref(old, z) == cur => z = (A(-th_o)(t_c - t_o), th_c - th_o)
            co, so = jnp.cos(old_ref[2]), jnp.sin(old_ref[2])
            d = cur_ref[:2] - old_ref[:2]
            guess = jnp.asarray([co * d[0] - so * d[1],
                                 so * d[0] + co * d[1],
                                 cur_ref[2] - old_ref[2]])
            rel, avg_d, inlier = _match_keyframes(
                self.kf.x[i], self.kf.y[i], self.kf.valid[i],
                scan_x, scan_y, scan_valid, guess,
                lc.raster_size, lc.raster_pixel, lc.n_theta, lc.theta_step,
                lc.window_half, lc.refine_iters)
            if (float(avg_d) > lc.accept_avg_dist
                    or float(inlier) < lc.min_inlier_frac):
                continue
            # rail rejection: a "match" at the edge of the search window means
            # the true alignment is outside it (drift exceeded the window) —
            # such railed solutions pass the score test with garbage poses.
            off = np.asarray(rel) - np.asarray(guess)
            max_xy = 0.85 * lc.window_half * lc.raster_pixel
            max_th = 0.85 * (lc.n_theta // 2) * lc.theta_step
            if (abs(off[0]) > max_xy or abs(off[1]) > max_xy
                    or abs(off[2]) > max_th):
                continue
            # convert measurement to the standard convention (theta negated)
            z_std = jnp.asarray([float(rel[0]), float(rel[1]), -float(rel[2])])
            self.graph = posegraph.add_edge(
                self.graph, jnp.int32(i), jnp.int32(k), z_std,
                jnp.asarray([50.0, 50.0, 200.0]))
            self.closures.append((i, k))
            accepted = i
        return accepted

    # -- frontend feedback ----------------------------------------------------
    def _post_chunk(self, state) -> None:
        """Hook for frontend-specific per-chunk bookkeeping (no-op here)."""

    def _rebuild_frontend(self, state):
        """Fold optimized keyframe poses back into the live frontend state.

        The frontend pose is re-expressed relative to the last keyframe
        (pose' = opt_k ⊕ (old_k ⊖ pose), anchored on the frontend's own
        record of its last keyframe pose), and the point map is rebuilt from
        the stored keyframe scans at their optimized poses (subsampled to
        capacity). mini_updated is forced so the next step re-rasters the
        corrected map before matching."""
        old_last = jnp.asarray(state.pmap.keyframe_pose)
        new_last = jnp.asarray(self.kf_poses[-1])

        def correct(pose):
            # z = old_last ⊖ pose (ref convention), then new_last ⊕ z
            co, so = jnp.cos(old_last[2]), jnp.sin(old_last[2])
            d = pose[:2] - old_last[:2]
            z = jnp.asarray([co * d[0] - so * d[1], so * d[0] + co * d[1],
                             pose[2] - old_last[2]])
            cn, sn = jnp.cos(new_last[2]), jnp.sin(new_last[2])
            return jnp.asarray([
                new_last[0] + cn * z[0] + sn * z[1],
                new_last[1] - sn * z[0] + cn * z[1],
                new_last[2] + z[2],
            ])

        # rebuild the map from keyframe scans at optimized poses (host-side;
        # runs only on accepted loop closures)
        pts = []
        for k in range(len(self.kf_poses)):
            wx, wy = se2.transform_ref(self.kf.x[k], self.kf.y[k],
                                       jnp.asarray(self.kf_poses[k]))
            v = np.asarray(self.kf.valid[k])
            pts.append(np.stack([np.asarray(wx)[v], np.asarray(wy)[v]], 1))
        allpts = np.concatenate(pts) if pts else np.zeros((0, 2), np.float32)
        cap = state.pmap.xy.shape[0]
        if len(allpts) > cap:
            allpts = allpts[:: int(np.ceil(len(allpts) / cap))][:cap]
        xy = np.zeros((cap, 2), np.float32)
        xy[: len(allpts)] = allpts

        new_pose = correct(state.pose)
        return state._replace(
            pose=new_pose,
            prev_pose=correct(state.prev_pose),
            mini_updated=jnp.bool_(True),
            pmap=state.pmap._replace(
                xy=jnp.asarray(xy),
                size=jnp.int32(len(allpts)),
                keyframe_pose=new_pose + 0.0),
        )

    # -- main loop ------------------------------------------------------------
    def run(self, ranges_all: np.ndarray, optimize_every_closure: bool = True,
            chunk_size: int = 64, feedback: bool = True):
        """Returns (path (T,3) ref convention, optimized keyframe poses).

        The frontend runs in on-device ``lax.scan`` chunks (per-scan host
        syncs cost a ~30 ms dispatch round trip on remote-attached TPUs);
        keyframe bookkeeping and loop closures are handled per chunk — the
        frontend state never depends on the graph, so chunking only delays
        closure *detection* by at most one chunk."""
        cfg = self.cfg
        state = self.frontend.init_state(jnp.asarray(ranges_all[0]), cfg)
        scan0 = sensor.read_scan(jnp.asarray(ranges_all[0]), self.angles, cfg.lidar)
        self._add_keyframe(scan0.x, scan0.y, scan0.valid,
                           np.zeros(3, np.float32))
        path = [np.zeros(3, np.float32)]
        slam_step = self.frontend.slam_step

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_chunk(st, chunk_ranges):
            def body(s, r):
                s2, pose = slam_step(s, r, cfg, self.angles)
                return s2, (pose, s2.mini_updated)

            return jax.lax.scan(body, st, chunk_ranges)

        t = 1
        while t < len(ranges_all):
            chunk = jnp.asarray(ranges_all[t: t + chunk_size])
            state, (poses_c, flags_c) = run_chunk(state, chunk)
            poses_c = np.asarray(poses_c)
            flags_c = np.asarray(flags_c)
            # pass 1: register this chunk's keyframes (closure candidates
            # only ever look backward, so batching the adds is neutral)
            new_kf = []
            for i in range(len(chunk)):
                path.append(poses_c[i])
                if not flags_c[i]:
                    continue
                scan = sensor.read_scan(jnp.asarray(ranges_all[t + i]),
                                        self.angles, cfg.lidar)
                k = self._add_keyframe(scan.x, scan.y, scan.valid, poses_c[i],
                                       scan_t=t + i)
                new_kf.append((k, scan))
            # frontend-specific bookkeeping (e.g. submap-anchor association)
            # before any optimization rewrites kf_poses
            self._post_chunk(state)
            # pass 2: loop closures + optimization
            optimized = False
            for k, scan in new_kf:
                closed = self._try_loop_closure(k, scan.x, scan.y, scan.valid)
                if closed is not None and optimize_every_closure:
                    candidate = posegraph.optimize(self.graph, iters=10)
                    opt = np.asarray(candidate.poses[: int(self.kf.count)])
                    if np.isfinite(opt).all():
                        self.graph = candidate
                        self.kf_poses = [
                            np.asarray(se2.std_to_ref(jnp.asarray(p)))
                            for p in opt]
                        optimized = True
                    # else: keep the unoptimized graph; the offending edge
                    # stays but robust reweighting bounds its influence
            if optimized and feedback:
                state = self._rebuild_frontend(state)
            t += len(chunk)

        opt_poses = [
            np.asarray(se2.std_to_ref(self.graph.poses[i]))
            for i in range(int(self.kf.count))
        ]
        self.final_state = state  # for map export by callers/subclasses
        return np.stack(path), np.stack(opt_poses)

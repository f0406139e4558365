"""Graph-SLAM over the submap atlas: loop closures re-anchor submaps rigidly.

Combines ``models/submap_slam.py`` (tiled frontend) with the pose-graph
backend of ``models/graph_slam.py``. The key structural win over the
flat-map GraphSlam: the map correction after a loop closure is O(M) anchor
rewrites instead of an O(points) map rebuild — each submap is tied to a
keyframe node via a fixed rigid relation recorded at spawn time, so
optimized keyframe poses propagate to the whole map by
``anchor_s = compose_ref(kf_pose_i, rel_s)``.

The reference has no loop closure at all (SURVEY §0); this is the north-star
"pose-graph backend" capability (BASELINE config 5) at unbounded map scale.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lidar_slam_tpu.core import submap
from lidar_slam_tpu.models import graph_slam, submap_slam
from lidar_slam_tpu.models.graph_slam import GraphSlam


class SubmapGraphSlam(GraphSlam):
    """GraphSlam with the submap-atlas frontend and anchor-based feedback."""

    frontend = submap_slam

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # submap slot -> (keyframe index, rigid relation kf -> anchor)
        self.anchor_assoc: dict[int, tuple[int, np.ndarray]] = {}

    # -- per-chunk bookkeeping --------------------------------------------------
    def _post_chunk(self, state) -> None:
        """Associate newly spawned submaps with their nearest keyframe.

        Runs before any optimization in the chunk, so the anchor (frontend
        frame) and the keyframe pose estimate are expressed in the same
        frame; the recorded relation is the *rigid* link that survives every
        subsequent optimization. One packed fetch; all math in host numpy.
        """
        if not self.kf_poses:
            return
        atlas = state.atlas
        packed = np.asarray(jnp.concatenate(
            [atlas.anchors,
             jnp.full((1, 3), atlas.n_submaps, jnp.float32)]))  # one fetch
        anchors = packed[:-1]
        n = int(packed[-1, 0])
        kf = np.stack(self.kf_poses)                       # (K, 3) ref conv
        for s in range(n):
            if s in self.anchor_assoc:
                continue
            d = np.hypot(kf[:, 0] - anchors[s, 0], kf[:, 1] - anchors[s, 1])
            i = int(np.argmin(d))
            self.anchor_assoc[s] = (i, graph_slam._np_between_ref(kf[i],
                                                                  anchors[s]))

    # -- feedback ---------------------------------------------------------------
    def _corrected_anchors(self, anchors: np.ndarray) -> jnp.ndarray:
        """Recompute every associated anchor from current keyframe estimates
        (host numpy; anchors already fetched by the caller)."""
        anchors = anchors.copy()
        for s, (i, rel) in self.anchor_assoc.items():
            if s >= anchors.shape[0] or i >= len(self.kf_poses):
                continue
            anchors[s] = graph_slam._np_compose_ref(self.kf_poses[i], rel)
        return jnp.asarray(anchors)

    def _rebuild_frontend(self, state):
        """Fold optimized keyframes into the live state: re-anchor submaps
        rigidly and re-express the tracked pose relative to the last
        keyframe (same pose math as the flat-map version, but zero point
        rewrites). One packed fetch; host numpy math; uploads only."""
        fb = np.asarray(jnp.concatenate(
            [jnp.stack([state.keyframe_pose, state.pose, state.prev_pose]),
             state.atlas.anchors]))                         # one fetch
        old_last, cur_pose, prev_pose = fb[0], fb[1], fb[2]
        anchors = fb[3:]
        new_last = self.kf_poses[-1]

        def correct(pose):
            z = graph_slam._np_between_ref(old_last, np.asarray(pose))
            return graph_slam._np_compose_ref(new_last, z)

        atlas = submap.apply_anchor_correction(
            state.atlas, self._corrected_anchors(anchors))
        new_pose = jnp.asarray(correct(cur_pose))
        return state._replace(
            pose=new_pose,
            prev_pose=jnp.asarray(correct(prev_pose)),
            keyframe_pose=new_pose + 0.0,
            mini_updated=jnp.bool_(True),
            atlas=atlas,
        )

    # -- output -----------------------------------------------------------------
    def world_map(self, state) -> np.ndarray:
        """All submap points in world frame under the current anchors."""
        wx, wy, mask = submap.submap_world_points(state.atlas)
        wx, wy, mask = np.asarray(wx), np.asarray(wy), np.asarray(mask)
        return np.stack([wx[mask], wy[mask]], axis=1)


"""Grasp collision checking without OpenRave.

Re-design of the reference checker (reference:
dex-net/src/dexnet/grasping/collision_checker.py:46-376 —
OpenRaveCollisionChecker / GraspCollisionChecker wrap openravepy, an optional
dependency that is absent in most installs, including this one): collisions
are tested against object SURFACE GEOMETRY (SDF surface points or sensor
clouds) with the gripper's panel boxes in the grasp frame — the same model
the samplers use (gripper.py panel boxes) — so the whole check is one
batched device call for G grasps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import sdf as sdf_lib
from .gripper import Gripper, collision_and_open_counts, panel_box_array


class GraspCollisionChecker:
    """(collision_checker.py:237-376 API surface)."""

    def __init__(self, gripper: Gripper = Gripper()):
        self.gripper = gripper
        self._boxes = jnp.asarray(panel_box_array(gripper), jnp.float32)
        self._points: list = []
        self._table_z = None

    # ------------------------------------------------------------------
    def set_graspable_object(self, obj, pose_4x4=None):
        """obj: SdfGrid or (N, 3) points. Replaces the scene."""
        self._points = []
        self.add_graspable_object(obj, pose_4x4)

    def add_graspable_object(self, obj, pose_4x4=None):
        if isinstance(obj, sdf_lib.SdfGrid):
            pts = np.asarray(sdf_lib.grid_to_world(obj, obj.surface_points))
        else:
            pts = np.asarray(obj, np.float32)
        if pose_4x4 is not None:
            pose_4x4 = np.asarray(pose_4x4)
            pts = pts @ pose_4x4[:3, :3].T + pose_4x4[:3, 3]
        self._points.append(pts.astype(np.float32))

    def set_table(self, z: float = 0.0):
        """(collision_checker.py set_table analogue): clearance plane."""
        self._table_z = z

    @property
    def scene_points(self):
        if not self._points:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(self._points)

    # ------------------------------------------------------------------
    def grasps_in_collision(self, frames):
        """Batched: frames (G, >=4, 3) rows [bottom_center, approach,
        binormal, minor, ...]. Returns (G,) bool — any hand panel (bottom /
        left / right) contains scene points, or the hand dips below the
        table (grasp_in_collision, collision_checker.py:310-336 semantics).
        """
        pts = jnp.asarray(self.scene_points)
        frames = jnp.asarray(frames, jnp.float32)
        boxes = self._boxes

        def one(frame):
            bc, approach, binormal, minor = (frame[0], frame[1], frame[2],
                                             frame[3])
            rot = jnp.stack([approach, binormal, minor])
            pf = (pts - bc) @ rot.T
            counts = collision_and_open_counts(pf, boxes)
            collide = (counts[1] > 0) | (counts[2] > 0) | (counts[3] > 0)
            if self._table_z is not None:
                from .gripper import hand_points

                hp = bc + jnp.asarray(
                    hand_points(self.gripper)[1:], jnp.float32) @ rot
                collide = collide | (jnp.min(hp[:, 2]) < self._table_z)
            return collide

        if pts.shape[0] == 0 and self._table_z is None:
            return np.zeros(len(frames), bool)
        return np.asarray(jax.vmap(one)(frames))

    def grasp_in_collision(self, frame, key=None):
        """Single-grasp convenience (collision_checker.py:310)."""
        return bool(self.grasps_in_collision(np.asarray(frame)[None])[0])

    def collides_along_approach(self, frame, approach_dist: float,
                                delta_approach: float = 0.005):
        """Check collisions while retracting along the approach axis
        (collision_checker.py:337-376): sample poses from ``approach_dist``
        back to the grasp pose; True if ANY pose collides."""
        frame = np.asarray(frame, np.float32)
        steps = max(int(approach_dist / delta_approach), 1)
        frames = np.tile(frame[None], (steps, 1, 1))
        for i in range(steps):
            frames[i, 0] = frame[0] - frame[1] * (approach_dist - i * delta_approach)
        return bool(self.grasps_in_collision(frames).any())

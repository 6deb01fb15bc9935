"""The four VoxAct-B benchmark tasks against the kinematic backend.

Counterparts of rlbench/tasks/{open_jar,open_drawer,put_item_in_drawer,
hand_over_item}.py with their scripted bimanual demo logic (dominant-conditioned
waypoint mirroring, open_jar.py:40-99; success via proximity/grasp conditions,
open_jar.py:86-90). Geometry is simplified to what the kinematic backend models;
the contracts (placement randomization, dominant-arm ground truth, per-arm labeled
waypoints, success conditions) match.
"""

from __future__ import annotations

from typing import List

import numpy as np

from voxactb_tpu.sim.backend import SceneObject
from voxactb_tpu.sim.conditions import (
    GraspedCondition,
    ObjectAboveCondition,
    ObjectDisplacedCondition,
    DetectedCondition,
)
from voxactb_tpu.sim.task import BimanualTask, Waypoint

TABLE_Z = 0.76
DOWN = np.array([0.0, 1.0, 0.0, 0.0])  # gripper pointing down (xyzw)


def _assistive(dominant: str) -> str:
    return "left" if dominant == "right" else "right"


class OpenJar(BimanualTask):
    """Assistive arm steadies the jar; dominant unscrews and lifts the lid
    (open_jar.py:15-114, incl. the 0.9-1.01 random rescale)."""

    name = "open_jar"
    num_variations = 2  # jar biased to the right / left half

    def init_task(self) -> None:
        pass

    def init_episode(self, variation: int, rng) -> List[str]:
        self.backend.remove_all_objects()
        side = -1.0 if variation % 2 == 0 else 1.0
        scale = rng.uniform(0.9, 1.01)  # resize_object_of_interest
        jar_pos = np.array([
            rng.uniform(0.15, 0.45),
            side * rng.uniform(0.1, 0.35),
            TABLE_Z + 0.05,
        ])
        self.backend.add_object(SceneObject(
            "jar", jar_pos, size=np.array([0.08, 0.08, 0.10]) * scale,
            color=(0.9, 0.1, 0.1)))
        self.backend.add_object(SceneObject(
            "lid", jar_pos + [0, 0, 0.07 * scale],
            size=np.array([0.09, 0.09, 0.02]) * scale, color=(0.2, 0.2, 0.9)))
        self._dominant = "right" if side < 0 else "left"
        self.register_success_conditions([
            ObjectAboveCondition("lid", TABLE_Z + 0.25),
            GraspedCondition("jar", _assistive(self._dominant)),
        ])
        d = self._dominant
        return [
            f"grasp the jar with {_assistive(d)} hand and grasp the lid of the "
            f"jar with {d} hand to unscrew it in an anti_clockwise direction "
            "until it is removed from the jar",
        ]

    def target_object_name(self):
        return "jar"

    def dominant_arm(self) -> str:
        return self._dominant

    def get_waypoints(self, dominant_arm: str) -> List[Waypoint]:
        jar = self.backend.get_object("jar")
        lid = self.backend.get_object("lid")
        a, d = _assistive(dominant_arm), dominant_arm
        return [
            Waypoint(a, jar.position + [0, 0, 0.12], DOWN, 1.0, label="approach_jar"),
            Waypoint(a, jar.position + [0, 0, 0.0], DOWN, 0.0, label="grasp_jar"),
            Waypoint(d, lid.position + [0, 0, 0.10], DOWN, 1.0, label="approach_lid"),
            Waypoint(d, lid.position + [0, 0, 0.0], DOWN, 0.0, label="grasp_lid"),
            Waypoint(d, lid.position + [0, 0, 0.30], DOWN, None, label="lift_lid"),
        ]


class OpenDrawer(BimanualTask):
    """Assistive steadies the cabinet; dominant pulls the bottom handle
    (open_drawer.py behavior)."""

    name = "open_drawer"
    num_variations = 2

    def init_task(self) -> None:
        pass

    def init_episode(self, variation: int, rng) -> List[str]:
        self.backend.remove_all_objects()
        facing = -1.0 if variation % 2 == 0 else 1.0  # handle faces right / left arm
        base = np.array([rng.uniform(0.2, 0.4), rng.uniform(-0.1, 0.1),
                         TABLE_Z + 0.12])
        self.backend.add_object(SceneObject(
            "cabinet", base, size=np.array([0.25, 0.3, 0.25]),
            color=(0.5, 0.35, 0.2), static=True))
        handle_pos = base + [0.0, facing * 0.18, -0.06]
        self.backend.add_object(SceneObject(
            "bottom_handle", handle_pos, size=np.full(3, 0.03),
            color=(0.8, 0.8, 0.2)))
        self._dominant = "right" if facing < 0 else "left"
        self._handle_start = handle_pos.copy()
        self.register_success_conditions([
            ObjectDisplacedCondition("bottom_handle", self._handle_start,
                                     0.12, axis=1),
        ])
        d = self._dominant
        return [f"hold the drawer with {_assistive(d)} hand and open the bottom "
                f"drawer with {d} hand"]

    def target_object_name(self):
        return "bottom_handle"

    def dominant_arm(self) -> str:
        return self._dominant

    def get_waypoints(self, dominant_arm: str) -> List[Waypoint]:
        cab = self.backend.get_object("cabinet")
        handle = self.backend.get_object("bottom_handle")
        a, d = _assistive(dominant_arm), dominant_arm
        pull = np.array([0.0, np.sign(handle.position[1] - cab.position[1]), 0.0])
        return [
            Waypoint(a, cab.position + [0, 0, 0.20], DOWN, 1.0, label="hold_top"),
            Waypoint(a, cab.position + [0, 0, 0.14], DOWN, 0.0, label="press_top"),
            Waypoint(d, handle.position + pull * 0.08, DOWN, 1.0,
                     label="approach_handle"),
            Waypoint(d, handle.position, DOWN, 0.0, label="grasp_handle"),
            Waypoint(d, handle.position + pull * 0.2, DOWN, None, label="pull"),
        ]


class PutItemInDrawer(BimanualTask):
    """One arm opens the top drawer, the other drops the item in."""

    name = "put_item_in_drawer"
    num_variations = 2

    def init_task(self) -> None:
        pass

    def init_episode(self, variation: int, rng) -> List[str]:
        self.backend.remove_all_objects()
        facing = -1.0 if variation % 2 == 0 else 1.0
        base = np.array([rng.uniform(0.2, 0.4), rng.uniform(-0.1, 0.1),
                         TABLE_Z + 0.12])
        self.backend.add_object(SceneObject(
            "cabinet", base, size=np.array([0.25, 0.3, 0.25]),
            color=(0.5, 0.35, 0.2), static=True))
        handle_pos = base + [0.0, facing * 0.18, 0.08]
        self.backend.add_object(SceneObject(
            "top_handle", handle_pos, size=np.full(3, 0.03), color=(0.8, 0.8, 0.2)))
        item_pos = np.array([rng.uniform(0.15, 0.45),
                             -facing * rng.uniform(0.2, 0.4), TABLE_Z + 0.02])
        self.backend.add_object(SceneObject(
            "item", item_pos, size=np.full(3, 0.04), color=(0.2, 0.8, 0.2)))
        self._dominant = "right" if facing < 0 else "left"
        self._drawer_region = base + [0.0, 0.0, 0.12]
        self.register_success_conditions([
            DetectedCondition("item", self._drawer_region,
                              np.array([0.15, 0.18, 0.12])),
        ])
        d = self._dominant
        return [f"open the top drawer with {d} hand and put the item in the top "
                f"drawer with {_assistive(d)} hand"]

    def target_object_name(self):
        return "top_handle"

    def dominant_arm(self) -> str:
        return self._dominant

    def get_waypoints(self, dominant_arm: str) -> List[Waypoint]:
        handle = self.backend.get_object("top_handle")
        item = self.backend.get_object("item")
        a, d = _assistive(dominant_arm), dominant_arm
        pull = np.array([0.0, np.sign(handle.position[1]
                                      - self._drawer_region[1]), 0.0])
        drop = self._drawer_region + [0, 0, 0.08]
        return [
            Waypoint(d, handle.position + pull * 0.08, DOWN, 1.0,
                     label="approach_handle"),
            Waypoint(d, handle.position, DOWN, 0.0, label="grasp_handle"),
            Waypoint(d, handle.position + pull * 0.18, DOWN, 1.0, label="pull_open"),
            Waypoint(a, item.position + [0, 0, 0.10], DOWN, 1.0,
                     label="approach_item"),
            Waypoint(a, item.position, DOWN, 0.0, label="grasp_item"),
            Waypoint(a, drop, DOWN, None, label="carry"),
            Waypoint(a, drop, DOWN, 1.0, dwell=5, label="drop"),
        ]


class HandOverItem(BimanualTask):
    """The near arm passes the item to the far (dominant) arm."""

    name = "hand_over_item"
    num_variations = 2

    def init_task(self) -> None:
        pass

    def init_episode(self, variation: int, rng) -> List[str]:
        self.backend.remove_all_objects()
        side = -1.0 if variation % 2 == 0 else 1.0
        item_pos = np.array([rng.uniform(0.2, 0.45),
                             side * rng.uniform(0.2, 0.4), TABLE_Z + 0.02])
        self.backend.add_object(SceneObject(
            "cube", item_pos, size=np.full(3, 0.04), color=(0.9, 0.2, 0.9)))
        # cube near the right arm -> LEFT dominant (receiver), and vice versa
        self._dominant = "left" if side < 0 else "right"
        self.register_success_conditions([
            GraspedCondition("cube", self._dominant),
        ])
        d = self._dominant
        return [f"pass the item from the {_assistive(d)} hand to the {d} hand"]

    def target_object_name(self):
        return "cube"

    def dominant_arm(self) -> str:
        return self._dominant

    def get_waypoints(self, dominant_arm: str) -> List[Waypoint]:
        cube = self.backend.get_object("cube")
        d = dominant_arm
        a = _assistive(d)
        meet = np.array([0.3, 0.0, TABLE_Z + 0.25])
        return [
            Waypoint(a, cube.position + [0, 0, 0.10], DOWN, 1.0, label="approach"),
            Waypoint(a, cube.position, DOWN, 0.0, label="grasp"),
            Waypoint(a, meet, DOWN, None, label="present"),
            Waypoint(d, meet + [0, 0, 0.08], DOWN, 1.0, label="reach"),
            Waypoint(a, meet, DOWN, 1.0, label="release"),
            Waypoint(d, meet, DOWN, 0.0, label="receive"),
            Waypoint(d, meet + [0, 0, 0.1], DOWN, None, label="retreat"),
        ]


TASK_REGISTRY = {
    t.name: t for t in (OpenJar, OpenDrawer, PutItemInDrawer, HandOverItem)
}

"""VoxPoser subsystem: value maps, greedy planner, LMP sandbox, heuristics, rollout."""

import numpy as np
import pytest

from voxactb_tpu.envs.fake_env import FakeBimanualEnv
from voxactb_tpu.voxposer.heuristics import determine_dominant_hand
from voxactb_tpu.voxposer.interface import (
    DetectedObject,
    LMPInterface,
    VoxPoserPlanner,
)
from voxactb_tpu.voxposer.lmp import (
    LMP,
    DiskCache,
    LMPConfig,
    ScriptedBackend,
    exec_safe,
)
from voxactb_tpu.voxposer.planner import GreedyPathPlanner, PlannerConfig
from voxactb_tpu.voxposer.value_maps import VoxelMapSpec, set_voxel_by_radius

BOUNDS = np.array([-0.4, -0.5, 0.6, 0.6, 0.5, 1.4], np.float32)


def test_voxel_map_spec_roundtrip():
    spec = VoxelMapSpec(BOUNDS, 50)
    p = np.array([0.1, 0.0, 1.0])
    idx = spec.world_to_voxel(p)
    back = spec.voxel_to_world(idx)
    assert np.linalg.norm(back - p) < np.linalg.norm(spec.resolution)
    assert spec.cm2index(10) >= 4  # 10cm at 2cm resolution = 5 cells


def test_set_voxel_by_radius():
    spec = VoxelMapSpec(BOUNDS, 40)
    m = spec.affordance_map()
    set_voxel_by_radius(m, [20, 20, 20], radius_cm=6, spec=spec, value=1.0)
    assert m[20, 20, 20] == 1.0
    assert m.sum() > 1
    assert m[0, 0, 0] == 0.0


def test_planner_reaches_target():
    planner = GreedyPathPlanner(map_size=40)
    target = np.zeros((40, 40, 40))
    target[30, 30, 30] = 1
    obstacle = np.zeros_like(target)
    path, info = planner.optimize(np.array([5.0, 5.0, 5.0]), target, obstacle)
    assert len(path) >= 2
    np.testing.assert_allclose(path[-1], [30, 30, 30], atol=2.0)


def test_planner_avoids_obstacles():
    planner = GreedyPathPlanner(
        PlannerConfig(obstacle_map_weight=10.0, obstacle_map_gaussian_sigma=2.0),
        map_size=40)
    target = np.zeros((40, 40, 40))
    target[35, 20, 20] = 1
    obstacle = np.zeros_like(target)
    obstacle[15:25, 15:25, :] = 1  # wall between start and target
    path, _ = planner.optimize(np.array([5.0, 20.0, 20.0]), target, obstacle)
    # path should route around the wall core rather than through its center
    inside = [p for p in path if 17 <= p[0] <= 22 and 17 <= p[1] <= 22]
    assert len(inside) < len(path) * 0.3


def test_exec_safe_sandbox():
    with pytest.raises(ValueError, match="banned"):
        exec_safe("import os")
    with pytest.raises(ValueError, match="banned"):
        exec_safe("x = ().__class__")
    lvars = exec_safe("ret_val = sum([1, 2, 3])")
    assert lvars["ret_val"] == 6
    # exec/eval are neutered
    lvars = exec_safe("ret_val = eval('1+1')")
    assert lvars["ret_val"] is None


def test_lmp_runs_scripted_program(tmp_path):
    backend = ScriptedBackend({"wave": "ret_val = helper() * 2"})
    lmp = LMP("planner", LMPConfig(), backend,
              variable_vars={"helper": lambda: 21},
              cache_dir=str(tmp_path))
    assert lmp("wave at the camera") == 42
    # cache hit on repeat (backend would return same anyway; check cache file exists)
    assert len(list(tmp_path.iterdir())) == 1


def test_disk_cache_roundtrip(tmp_path):
    cache = DiskCache(str(tmp_path))
    key = {"prompt": "p", "stop": ["#"]}
    assert cache.get(key) is None
    cache.put(key, "code")
    assert cache.get(key) == "code"


def test_dominant_hand_rules():
    # OpenDrawer: normal pointing back at the camera -> angle 180 >= 135 -> right
    assert determine_dominant_hand(
        "open_drawer", front_lookat=[1, 0, 0],
        object_normals=np.array([[-1, 0, 0]])) == "right"
    assert determine_dominant_hand(
        "open_drawer", front_lookat=[1, 0, 0],
        object_normals=np.array([[1, 0, 0]])) == "left"
    # PutItemInDrawer flips the arms
    assert determine_dominant_hand(
        "put_item_in_drawer", front_lookat=[1, 0, 0],
        object_normals=np.array([[-1, 0, 0]])) == "left"
    # OpenJar: closer arm is dominant
    assert determine_dominant_hand(
        "open_jar", object_centroid=[0.1, -0.3, 0.8],
        right_arm_base=[0.0, -0.5, 0.75], left_arm_base=[0.0, 0.5, 0.75]) == "right"
    # HandOverItem: the FAR arm receives -> dominant
    assert determine_dominant_hand(
        "hand_over_item", object_centroid=[0.1, -0.3, 0.8],
        right_arm_base=[0.0, -0.5, 0.75], left_arm_base=[0.0, 0.5, 0.75]) == "left"
    with pytest.raises(NotImplementedError):
        determine_dominant_hand("stack_blocks")


def test_lmp_interface_executes_path_in_env():
    env = FakeBimanualEnv(image_size=8, episode_length=50, seed=0)
    env.launch()
    env.reset()
    spec = VoxelMapSpec(BOUNDS, 40)
    target_pos = env.target_object_world_coords()
    obj = DetectedObject("cube", np.asarray(target_pos))

    iface = LMPInterface(env, spec, lambda name: obj, arm="right")
    aff = iface.get_empty_affordance_map()
    iface.set_voxel_by_radius(aff, iface.pointat2index(obj.position),
                              radius_cm=4, value=1.0)
    actions = iface.execute("ee", aff)
    assert len(actions) >= 1
    # the commanded gripper ends near the object
    final = env.step_log[-1][2][:3]
    assert np.linalg.norm(final - np.asarray(target_pos)) < 0.15


def test_voxposer_only_rollout(tmp_path):
    from voxactb_tpu.runners.rollout import RolloutGenerator

    env = FakeBimanualEnv(image_size=8, episode_length=30, seed=1)
    env.launch()
    spec = VoxelMapSpec(BOUNDS, 40)

    def lookup(name):
        return DetectedObject(name, np.asarray(env.target_object_world_coords()))

    program = (
        "obj = detect('cube')\n"
        "aff = get_empty_affordance_map()\n"
        "set_voxel_by_radius(aff, pointat2index(obj.position), 4, 1.0)\n"
        "grip = get_default_gripper_map()\n"
        "grip[:, :, :] = 0.0\n"
        "ret_val = execute('ee', aff, gripper_map=grip)\n"
    )
    planner = VoxPoserPlanner(
        ScriptedBackend({"hand": program}), spec, lookup,
        cache_dir=str(tmp_path))
    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, agent=None, episode_length=30, voxposer_only_eval=True,
        planner=planner))
    assert transitions
    # both arms got driven
    arms = {arm for _, arm, _ in env.step_log}
    assert arms == {"left", "right"} or transitions[-1].terminal


def test_sim_object_lookup_points_and_normals():
    """Env bridge (rlbench_env.py:867-991): detect() resolves sim objects with
    surface points and outward unit normals."""
    import numpy as np

    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import OpenJar
    from voxactb_tpu.voxposer.interface import make_sim_object_lookup

    env = BimanualTaskEnvironment(OpenJar, image_size=8, seed=0)
    env.launch()
    env.reset()
    lookup = make_sim_object_lookup(env)
    obj = lookup("the jar")  # fuzzy name resolution
    assert obj.name == "jar"
    assert obj.points is not None and obj.normals is not None
    assert obj.points.shape == obj.normals.shape
    # normals are unit outward: point + eps*normal leaves the AABB
    lengths = np.linalg.norm(obj.normals, axis=-1)
    np.testing.assert_allclose(lengths, 1.0)
    outside = obj.points + obj.normals * 1e-3
    lo, hi = obj.aabb[:3], obj.aabb[3:]
    strictly_inside = ((outside > lo) & (outside < hi)).all(-1)
    assert not strictly_inside.any()
    import pytest

    with pytest.raises(KeyError):
        lookup("nonexistent thing")

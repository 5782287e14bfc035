"""Example: register database grasps to the robot frame and pick the best.

Equivalent of the reference example (reference:
dex-net/examples/execute_grasp_registration.py — look up an object's stored
grasps, transform them through the object's registered pose into the robot
frame, filter by collisions, and emit the best gripper pose).

Self-contained demo: builds a synthetic object + database in a temp dir.
Run: PYTHONPATH=. python examples/execute_grasp_registration.py
"""

import tempfile

import numpy as np

from pointnetgpd_tpu.api import DexNet
from pointnetgpd_tpu.geometry.io import write_obj
from pointnetgpd_tpu.geometry.mesh import Mesh3D
from pointnetgpd_tpu.grasping.collision_checker import GraspCollisionChecker
from pointnetgpd_tpu.grasping.grasp import rotated_full_axis
from pointnetgpd_tpu.grasping.gripper import Gripper


def make_sphere_obj(tmp, radius=0.05):
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], float)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    m = Mesh3D(v, f).subdivide().subdivide()
    m = Mesh3D(radius * m.vertices / np.linalg.norm(m.vertices, axis=1,
                                                    keepdims=True),
               m.triangles)
    path = f"{tmp}/sphere.obj"
    write_obj(path, m.vertices, m.triangles)
    return path


def main():
    tmp = tempfile.mkdtemp()
    api = DexNet({"sdf_dim": 32, "sdf_padding": 3, "grasps_per_class": 3,
                  "cache_dir": f"{tmp}/cache"})
    api.open_database(f"{tmp}/demo.hdf5")
    api.open_dataset("demo")
    key = api.add_object(make_sphere_obj(tmp))
    api.compute_simulation_data(key, seed=0)
    configs, metrics = api.get_grasps(key)
    print(f"{len(configs)} stored grasps")

    # registered object pose in the robot frame (e.g. from perception)
    t_obj_robot = np.eye(4)
    t_obj_robot[:3, 3] = [0.45, 0.1, 0.08]

    # transform grasps into the robot frame
    robot_configs = configs.copy()
    robot_configs[:, 0:3] = configs[:, 0:3] @ t_obj_robot[:3, :3].T \
        + t_obj_robot[:3, 3]
    robot_configs[:, 3:6] = configs[:, 3:6] @ t_obj_robot[:3, :3].T

    # filter by table collisions
    checker = GraspCollisionChecker(Gripper())
    checker.set_table(0.0)
    frames = []
    for cfg in robot_configs:
        rot = np.asarray(rotated_full_axis(cfg[3:6], cfg[7]))
        frames.append(np.stack([cfg[0:3], rot[:, 0], cfg[3:6], rot[:, 2]]))
    collides = checker.grasps_in_collision(np.stack(frames))
    ok = ~collides

    scores = metrics["robust_ferrari_canny"]
    ranked = np.argsort(-scores * ok)
    best = ranked[0]
    print(f"best collision-free grasp #{best}: "
          f"center={robot_configs[best, :3].round(3).tolist()} "
          f"quality={scores[best]:.4f} collision_free={bool(ok[best])}")
    api.close_database()


if __name__ == "__main__":
    main()

"""Package integrity: every module imports cleanly (no missing deps on the
non-gated paths, no syntax errors) and the public API surfaces exist."""

import importlib
import pkgutil

import pointnetgpd_tpu

# modules with gated heavy/optional deps that must still IMPORT fine
# (their ROS/MoveIt entry functions import lazily)
ALL_MODULES = [
    name for _, name, _ in pkgutil.walk_packages(
        pointnetgpd_tpu.__path__, prefix="pointnetgpd_tpu.")
]


def test_all_modules_import():
    failed = {}
    for name in ALL_MODULES:
        try:
            importlib.import_module(name)
        except Exception as e:  # pragma: no cover
            failed[name] = repr(e)
    assert not failed, f"modules failed to import: {failed}"


def test_public_api_symbols():
    from pointnetgpd_tpu.api import DexNet  # noqa: F401
    from pointnetgpd_tpu.grasping.gripper import Gripper  # noqa: F401
    from pointnetgpd_tpu.inference.scorer import GraspScorer  # noqa: F401
    from pointnetgpd_tpu.models import (  # noqa: F401
        apply_pointnet_cls,
        convert_state_dict,
        init_pointnet_cls,
        load_torch_checkpoint,
    )
    from pointnetgpd_tpu.robot.node import GraspDetector  # noqa: F401
    from pointnetgpd_tpu.training.loop import TrainConfig, Trainer  # noqa: F401


def test_cli_parsers_build():
    from pointnetgpd_tpu.cli.infer import build_parser as infer_parser
    from pointnetgpd_tpu.cli.train import build_parser as train_parser

    assert train_parser().parse_args(["--mode", "train"]).mode == "train"
    assert infer_parser().parse_args([]).num_point == 500


def test_end_to_end_demo_runs():
    """The examples/end_to_end_demo.py pipeline (mesh -> SDF -> labels ->
    train -> deploy) completes and prints every stage."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "end_to_end_demo.py"),
         "--steps", "3"],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    for stage in ("[1/4]", "[2/4]", "[3/4]", "[4/4]", "demo complete"):
        assert stage in out.stdout, out.stdout

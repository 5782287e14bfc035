"""End-to-end YCB frame driver on synthetic assets: calibration/pose/depth
h5 + jpg + pbm mask -> registered cloud files (pipelines/ycb_clouds.py
generate_frame, mirroring the reference's file layout)."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
iio = pytest.importorskip("imageio.v2")
PIL_Image = pytest.importorskip("PIL.Image")


@pytest.fixture()
def ycb_frame(tmp_path):
    """One synthetic frame: a flat plane at 1.2 m in front of camera NP1."""
    obj = "001_test_object"
    rgbd = tmp_path / obj / "rgbd"
    (rgbd / "masks").mkdir(parents=True)
    (rgbd / "poses").mkdir()

    h, w = 48, 64
    k = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]])

    with h5py.File(rgbd / "calibration.h5", "w") as f:
        f["NP1_depth_K"] = k
        f["NP1_rgb_K"] = k
        f["NP1_ir_depth_scale"] = np.array(1.0)  # *1e-4 -> meters
        f["H_NP1_from_NP5"] = np.eye(4)
        f["H_NP1_ir_from_NP5"] = np.eye(4)
    with h5py.File(rgbd / "poses" / "NP5_30_pose.h5", "w") as f:
        t = np.eye(4)
        t[:3, 3] = [0.1, 0.0, 0.0]
        f["H_table_from_reference_camera"] = t
    depth_mm_tenths = np.full((h, w), 12000, np.uint16)  # 1.2 m at 1e-4 scale
    with h5py.File(rgbd / "NP1_30.h5", "w") as f:
        f["depth"] = depth_mm_tenths
    rgb = np.random.RandomState(0).randint(0, 255, (h, w, 3)).astype(np.uint8)
    iio.imwrite(rgbd / "NP1_30.jpg", rgb)
    # mask: 255 = REMOVE (the reference zeroes masked pixels, :368);
    # mask out the left quarter of the image
    mask = np.zeros((h, w), np.uint8)
    mask[:, : w // 4] = 255
    PIL_Image.fromarray(mask).convert("RGB").save(rgbd / "masks"
                                                  / "NP1_30_mask.pbm")
    return str(tmp_path), obj


def test_generate_frame_end_to_end(ycb_frame):
    from pointnetgpd_tpu.pipelines.ycb_clouds import generate_frame

    root, obj = ycb_frame
    out = generate_frame(root, obj, "NP1", "30")
    assert out and os.path.exists(out)
    cloud = np.load(out)
    # unmasked pixels minus the 7x7 filter border -> hundreds of points
    assert len(cloud) > 500
    # plane at z=1.2 in camera, identity refFromRGB, obj shift +0.1 in x
    np.testing.assert_allclose(cloud[:, 2].mean(), 1.2, atol=0.01)
    assert cloud[:, 0].min() >= 0.1 - 1.2  # x shifted by +0.1
    # companion formats written
    stem = out[:-4]
    assert os.path.exists(stem + ".ply") and os.path.exists(stem + ".pcd")
    # idempotent: second call returns the cached path
    assert generate_frame(root, obj, "NP1", "30") == out


def test_generate_frame_blacklist(tmp_path):
    from pointnetgpd_tpu.pipelines.ycb_clouds import generate_frame

    assert generate_frame(str(tmp_path), "046_plastic_bolt", "NP1", "0") is None

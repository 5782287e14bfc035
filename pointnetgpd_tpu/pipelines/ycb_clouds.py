"""YCB RGB-D -> registered point clouds, with the per-pixel math on device.

Re-design of the reference cloud generator (reference:
PointNetGPD/ycb_cloud_generate.py): the O(H*W) pure-Python loops —
``filterDiscontinuities`` (:35-57), ``registerDepthMap`` (:60-118),
``registeredDepthMapToPointCloud`` (:121-184) — become three jitted kernels
(window reduction, scatter-max reprojection, elementwise backprojection).
The reference reports ~36 hours for the full YCB set on a 56-thread dual
Xeon (README.md:166); the kernels here process a frame in milliseconds.

Host driver ``generate_frame`` mirrors the reference file layout and outputs
(.ply/.pcd/.npy under rgbd/clouds/, :313-374), including the NP5 reference
camera and the mask/blacklist handling.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

BLACK_LIST_OBJ = ["046_plastic_bolt", "063-b_marbles", "063-c_marbles",
                  "063-f_marbles"]


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("filt_size",))
def filter_discontinuities(depth, *, filt_size: int = 7, thresh: float = 1000.0):
    """Zero out depth pixels at depth discontinuities (ref :35-57): a pixel is
    marked when the 7x7 window max/min deviates from the center by > thresh.
    Only the interior (valid-window region) is marked, like the reference's
    offset bookkeeping (:53-55)."""
    off = (filt_size - 1) // 2
    d = depth.astype(jnp.float32)
    mins = jax.lax.reduce_window(d, jnp.inf, jax.lax.min,
                                 (filt_size, filt_size), (1, 1), "VALID")
    maxes = jax.lax.reduce_window(d, -jnp.inf, jax.lax.max,
                                  (filt_size, filt_size), (1, 1), "VALID")
    mids = d[off:-off, off:-off]
    discont = jnp.maximum(jnp.abs(mins - mids), jnp.abs(maxes - mids))
    mark = (discont > thresh)
    full = jnp.zeros_like(d, dtype=bool)
    full = full.at[off:off + mark.shape[0], off:off + mark.shape[1]].set(mark)
    return depth * (1 - full.astype(depth.dtype))


@functools.partial(jax.jit, static_argnames=("out_height", "out_width"))
def register_depth_map(depth, depth_k, rgb_k, h_rgb_from_depth,
                       *, out_height: int, out_width: int):
    """Reproject the depth image into the RGB camera (ref :60-118): per-pixel
    backproject -> transform -> project -> nearest-pixel scatter keeping the
    MAX depth per target pixel (:115-116). One scatter-max instead of a
    double Python loop."""
    h, w = depth.shape
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = depth.astype(jnp.float32)
    x = (u - depth_k[0, 2]) * z / depth_k[0, 0]
    y = (v - depth_k[1, 2]) * z / depth_k[1, 1]

    rot, t = h_rgb_from_depth[:3, :3], h_rgb_from_depth[:3, 3]
    xr = rot[0, 0] * x + rot[0, 1] * y + rot[0, 2] * z + t[0]
    yr = rot[1, 0] * x + rot[1, 1] * y + rot[1, 2] * z + t[1]
    zr = rot[2, 0] * x + rot[2, 1] * y + rot[2, 2] * z + t[2]

    zr_safe = jnp.where(zr == 0, 1.0, zr)
    u_rgb = jnp.floor(rgb_k[0, 0] * xr / zr_safe + rgb_k[0, 2] + 0.5).astype(jnp.int32)
    v_rgb = jnp.floor(rgb_k[1, 1] * yr / zr_safe + rgb_k[1, 2] + 0.5).astype(jnp.int32)

    ok = ((z > 0) & (u_rgb >= 0) & (u_rgb < out_width)
          & (v_rgb >= 0) & (v_rgb < out_height))
    flat_idx = jnp.where(ok, v_rgb * out_width + u_rgb, out_height * out_width)
    vals = jnp.where(ok, zr, -jnp.inf)

    registered = jnp.zeros((out_height * out_width + 1,), jnp.float32)
    registered = registered.at[flat_idx.reshape(-1)].max(vals.reshape(-1))
    return registered[:-1].reshape(out_height, out_width)


@jax.jit
def depth_map_to_cloud(depth_map, rgb_image, rgb_k, ref_from_rgb, obj_from_ref):
    """Backproject a registered depth map into the object/table frame
    (ref :121-184). Returns ((H*W, 6) xyzrgb rows, (H*W,) valid mask) —
    the reference's non-organized packing is a host-side mask compaction."""
    h, w = depth_map.shape
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = depth_map.astype(jnp.float32)
    x = (u - rgb_k[0, 2]) * z / rgb_k[0, 0]
    y = (v - rgb_k[1, 2]) * z / rgb_k[1, 1]

    p = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    p = p @ ref_from_rgb[:3, :3].T + ref_from_rgb[:3, 3]
    p = p @ obj_from_ref[:3, :3].T + obj_from_ref[:3, 3]

    rgb = rgb_image.reshape(-1, rgb_image.shape[-1])[:, :3].astype(jnp.float32)
    cloud = jnp.concatenate([p, rgb], axis=1)
    return cloud, (z > 0).reshape(-1)


# ---------------------------------------------------------------------------
# Host IO + frame driver (reference layout, :313-374)
# ---------------------------------------------------------------------------

def write_ply(filename, cloud_xyzrgb):
    """ASCII PLY in the reference's layout (:187-230)."""
    n = len(cloud_xyzrgb)
    color = cloud_xyzrgb.shape[1] == 6
    header = ["ply", "format ascii 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if color:
        header += ["property uchar diffuse_red", "property uchar diffuse_green",
                   "property uchar diffuse_blue"]
    header += ["end_header"]
    with open(filename, "w") as f:
        f.write("\n".join(header) + "\n")
        for row in cloud_xyzrgb:
            xyz = " ".join(f"{v:f}" for v in row[:3])
            if color:
                f.write(xyz + " " + " ".join(str(int(c)) for c in row[3:6]) + "\n")
            else:
                f.write(xyz + "\n")


def write_pcd(filename, cloud_xyz):
    """Binary PCD (xyz float32), reference writePCD analogue (:233-300)."""
    n = len(cloud_xyz)
    header = "\n".join([
        "# .PCD v.7 - Point Cloud Data file format",
        "VERSION .7", "FIELDS x y z", "SIZE 4 4 4", "TYPE F F F",
        "COUNT 1 1 1", f"WIDTH {n}", "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0", f"POINTS {n}", "DATA binary", ""])
    with open(filename, "wb") as f:
        f.write(header.encode())
        cloud_xyz.astype(np.float32).tofile(f)


def generate_frame(ycb_data_folder: str, target_object: str,
                   viewpoint_camera: str, viewpoint_angle: str,
                   reference_camera: str = "NP5", overwrite: bool = False):
    """Process one RGB-D frame into clouds/*.ply/.pcd/.npy (ref generate(),
    :313-374). Requires the YCB rgbd assets (h5/jpg/pbm) on disk."""
    import h5py

    try:
        from imageio.v2 import imread
    except ImportError:  # pragma: no cover
        from imageio import imread

    if target_object in BLACK_LIST_OBJ:
        return None
    rgbd = os.path.join(ycb_data_folder, target_object, "rgbd")
    clouds_dir = os.path.join(rgbd, "clouds")
    os.makedirs(clouds_dir, exist_ok=True)
    stem = f"pc_{viewpoint_camera}_{reference_camera}_{viewpoint_angle}"
    npy_fname = os.path.join(clouds_dir, stem + ".npy")
    if os.path.exists(npy_fname) and not overwrite:
        return npy_fname

    basename = f"{viewpoint_camera}_{viewpoint_angle}"
    calibration = h5py.File(os.path.join(rgbd, "calibration.h5"), "r")
    if f"{viewpoint_camera}_depth_K" not in calibration:
        return None
    depth_k = calibration[f"{viewpoint_camera}_depth_K"][:]
    rgb_k = calibration[f"{viewpoint_camera}_rgb_K"][:]
    depth_scale = np.array(
        calibration[f"{viewpoint_camera}_ir_depth_scale"]) * 1e-4
    rgb_from_ref = calibration[f"H_{viewpoint_camera}_from_{reference_camera}"][:]
    ir_from_ref = calibration[f"H_{viewpoint_camera}_ir_from_{reference_camera}"][:]
    h_rgb_from_depth = rgb_from_ref @ np.linalg.inv(ir_from_ref)
    ref_from_rgb = np.linalg.inv(rgb_from_ref)

    obj_from_ref = h5py.File(
        os.path.join(rgbd, "poses",
                     f"{reference_camera}_{viewpoint_angle}_pose.h5"), "r"
    )["H_table_from_reference_camera"][:]
    rgb_image = imread(os.path.join(rgbd, basename + ".jpg"))
    mask = imread(os.path.join(rgbd, "masks", basename + "_mask.pbm"))[:, :, 0]
    depth = h5py.File(os.path.join(rgbd, basename + ".h5"), "r")["depth"][:]

    depth = np.asarray(
        filter_discontinuities(jnp.asarray(depth.astype(np.float32)))
    ) * depth_scale
    registered = register_depth_map(
        jnp.asarray(depth), jnp.asarray(depth_k.astype(np.float32)),
        jnp.asarray(rgb_k.astype(np.float32)),
        jnp.asarray(h_rgb_from_depth.astype(np.float32)),
        out_height=rgb_image.shape[0], out_width=rgb_image.shape[1])
    registered = jnp.where(jnp.asarray(mask == 255), 0.0, registered)
    cloud, valid = depth_map_to_cloud(
        registered, jnp.asarray(rgb_image), jnp.asarray(rgb_k.astype(np.float32)),
        jnp.asarray(ref_from_rgb.astype(np.float32)),
        jnp.asarray(obj_from_ref.astype(np.float32)))
    cloud = np.asarray(cloud)[np.asarray(valid)]

    write_ply(os.path.join(clouds_dir, stem + ".ply"), cloud)
    write_pcd(os.path.join(clouds_dir, stem + ".pcd"), cloud[:, :3])
    np.save(npy_fname, cloud[:, :3])
    return npy_fname


def main(argv=None):
    import argparse
    import glob

    p = argparse.ArgumentParser(description="YCB RGB-D -> point clouds")
    p.add_argument("--data-root",
                   default=os.environ.get("PointNetGPD_FOLDER", ""))
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)
    folder = os.path.join(args.data_root, "data/ycb-tools/models/ycb")
    # failed frames are appended to exception.txt, like the reference's
    # bad-frame log (PointNetGPD/exception.txt)
    exc_path = os.path.join(args.data_root or ".", "exception.txt")
    jpgs = sorted(glob.glob(f"{folder}/*/rgbd/*.jpg"))
    if not jpgs:
        p.error(
            f"no RGB-D frames under {folder!r} — point --data-root (or "
            "$PointNetGPD_FOLDER) at the reference's YCB layout")
    for jpg in jpgs:
        parts = jpg.split("/")
        obj = parts[-3]
        cam, angle = os.path.basename(jpg).split(".")[0].split("_")
        try:
            out = generate_frame(folder, obj, cam, angle,
                                 overwrite=args.overwrite)
            if out is None:
                raise ValueError("missing calibration or blacklisted")
        except Exception as e:
            with open(exc_path, "a") as f:
                f.write(f"{jpg}: {e}\n")
    print(f"All {len(jpgs)} frames done.")


if __name__ == "__main__":
    main()

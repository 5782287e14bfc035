"""YCB cloud kernel tests: parity vs a direct numpy transcription of the
reference loops on synthetic frames (reference:
PointNetGPD/ycb_cloud_generate.py:35-184)."""

import numpy as np
import jax.numpy as jnp

from pointnetgpd_tpu.pipelines.ycb_clouds import (
    depth_map_to_cloud,
    filter_discontinuities,
    register_depth_map,
)


def _np_filter(depth, filt=7, thresh=1000.0):
    """Literal-semantics oracle for filterDiscontinuities (interior only)."""
    off = (filt - 1) // 2
    h, w = depth.shape
    mark = np.zeros_like(depth, dtype=bool)
    for v in range(off, h - off):
        for u in range(off, w - off):
            win = depth[v - off:v + off + 1, u - off:u + off + 1]
            mid = depth[v, u]
            if max(abs(win.min() - mid), abs(win.max() - mid)) > thresh:
                mark[v, u] = True
    return depth * (1 - mark.astype(depth.dtype))


def _np_register(depth, depth_k, rgb_k, h, out_shape):
    """Oracle for registerDepthMap (:86-116)."""
    out = np.zeros(out_shape)
    hgt, wid = depth.shape
    for v in range(hgt):
        for u in range(wid):
            z = depth[v, u]
            if z == 0:
                continue
            x = (u - depth_k[0, 2]) * z / depth_k[0, 0]
            y = (v - depth_k[1, 2]) * z / depth_k[1, 1]
            p = h[:3, :3] @ [x, y, z] + h[:3, 3]
            u2 = int(rgb_k[0, 0] * p[0] / p[2] + rgb_k[0, 2] + 0.5)
            v2 = int(rgb_k[1, 1] * p[1] / p[2] + rgb_k[1, 2] + 0.5)
            if 0 <= u2 < out_shape[1] and 0 <= v2 < out_shape[0]:
                if p[2] > out[v2, u2]:
                    out[v2, u2] = p[2]
    return out


def test_filter_discontinuities_matches_oracle():
    rng = np.random.RandomState(0)
    depth = rng.randint(2000, 3000, (32, 40)).astype(np.float32)
    depth[10, 12] = 9000  # a spike: marks its whole neighborhood
    depth[20:23, 25:28] = 0  # dropouts create discontinuities around them
    ours = np.asarray(filter_discontinuities(jnp.asarray(depth)))
    oracle = _np_filter(depth)
    np.testing.assert_array_equal(ours, oracle)


def test_register_depth_map_matches_oracle():
    rng = np.random.RandomState(1)
    depth = rng.uniform(0.5, 1.5, (24, 32)).astype(np.float32)
    depth[rng.rand(24, 32) < 0.2] = 0.0
    depth_k = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]], np.float32)
    rgb_k = np.array([[45.0, 0, 20], [0, 45.0, 15], [0, 0, 1]], np.float32)
    h = np.eye(4, dtype=np.float32)
    h[:3, 3] = [0.01, -0.02, 0.005]
    out_shape = (30, 40)
    ours = np.asarray(register_depth_map(
        jnp.asarray(depth), jnp.asarray(depth_k), jnp.asarray(rgb_k),
        jnp.asarray(h), out_height=out_shape[0], out_width=out_shape[1]))
    oracle = _np_register(depth, depth_k, rgb_k, h, out_shape)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_depth_map_to_cloud_roundtrip():
    """Backproject a synthetic plane at depth z0 and check the cloud."""
    h, w = 20, 24
    z0 = 1.25
    depth = np.full((h, w), z0, np.float32)
    depth[0, 0] = 0.0  # one invalid pixel
    rgb_k = np.array([[50.0, 0, 12], [0, 50.0, 10], [0, 0, 1]], np.float32)
    rgb = np.random.RandomState(2).randint(0, 255, (h, w, 3)).astype(np.uint8)
    identity = np.eye(4, dtype=np.float32)
    cloud, valid = depth_map_to_cloud(
        jnp.asarray(depth), jnp.asarray(rgb), jnp.asarray(rgb_k),
        jnp.asarray(identity), jnp.asarray(identity))
    cloud, valid = np.asarray(cloud), np.asarray(valid)
    assert valid.sum() == h * w - 1
    pts = cloud[valid]
    np.testing.assert_allclose(pts[:, 2], z0, atol=1e-6)
    # x at pixel u: (u - cx) z / fx
    u_vals = np.tile(np.arange(w), h)[valid.reshape(-1)]
    np.testing.assert_allclose(pts[:, 0], (u_vals - 12) * z0 / 50.0, atol=1e-5)
    # colors carried through
    np.testing.assert_array_equal(pts[:, 3:].astype(np.uint8),
                                  rgb.reshape(-1, 3)[valid])


def test_ply_pcd_writers(tmp_path):
    from pointnetgpd_tpu.pipelines.ycb_clouds import write_pcd, write_ply

    cloud = np.random.RandomState(3).rand(10, 6).astype(np.float32)
    cloud[:, 3:] = (cloud[:, 3:] * 255).astype(np.uint8)
    ply = tmp_path / "c.ply"
    pcd = tmp_path / "c.pcd"
    write_ply(str(ply), cloud)
    write_pcd(str(pcd), cloud[:, :3])
    txt = ply.read_text().splitlines()
    assert txt[0] == "ply" and "element vertex 10" in txt[2]
    assert len(txt) == 10 + 10  # header(10) + rows
    raw = pcd.read_bytes()
    assert b"POINTS 10" in raw and b"DATA binary" in raw
    data = np.frombuffer(raw.split(b"DATA binary\n")[1], np.float32).reshape(10, 3)
    np.testing.assert_allclose(data, cloud[:, :3], atol=1e-6)

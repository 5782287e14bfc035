"""Surface-window patch features on an analytic sphere."""

import numpy as np
import jax.numpy as jnp

from pointnetgpd_tpu.geometry.sdf import make_sdf
from pointnetgpd_tpu.grasping.surface_window import (
    surface_information,
    surface_window_projection,
    surface_window_sdf,
)

DIM, RES, R = 48, 0.005, 0.06


def _sphere():
    origin = -RES * (DIM - 1) / 2 * np.ones(3)
    ii, jj, kk = np.meshgrid(*(np.arange(DIM),) * 3, indexing="ij")
    pts = origin + RES * np.stack([ii, jj, kk], axis=-1)
    return make_sdf(np.linalg.norm(pts, axis=-1) - R, origin, RES)


def test_sdf_window_center_zero_edges_positive():
    sdf = _sphere()
    contact = jnp.asarray([[R, 0.0, 0.0]])
    in_dir = jnp.asarray([[-1.0, 0.0, 0.0]])  # closing toward the center
    win = np.asarray(surface_window_sdf(sdf, contact, in_dir, width=0.02,
                                        num_steps=11))[0]
    c = win[5, 5]
    assert abs(c) < RES  # the contact sits on the surface
    # tangent-plane corners lie OUTSIDE the sphere (positive sdf)
    assert win[0, 0] > 0 and win[-1, -1] > 0
    # symmetric about the contact
    np.testing.assert_allclose(win, win.T, atol=1e-4)


def test_projection_window_matches_sphere_sagitta():
    sdf = _sphere()
    contact = jnp.asarray([[R, 0.0, 0.0]])
    in_dir = jnp.asarray([[-1.0, 0.0, 0.0]])
    num_steps, width = 11, 0.02
    win = np.asarray(surface_window_projection(
        sdf, contact, in_dir, width=width, num_steps=num_steps,
        max_depth=0.01, num_samples=64))[0]
    # analytic: a cell at tangent radius r has the surface at depth
    # R - sqrt(R^2 - r^2) along the inward direction
    scales = np.linspace(-width / 2, width / 2, num_steps)
    uu, vv = np.meshgrid(scales, scales, indexing="ij")
    r2 = uu ** 2 + vv ** 2
    expected = R - np.sqrt(np.maximum(R * R - r2, 0))
    np.testing.assert_allclose(win, expected, atol=2.5 * RES)
    # center depth ~ 0, increasing outward
    assert abs(win[5, 5]) < RES
    assert win[0, 0] > win[5, 5]


def test_surface_information_container():
    sdf = _sphere()
    info = surface_information(sdf, np.array([R, 0, 0.0]),
                               np.array([-1.0, 0, 0]), width=0.02,
                               num_steps=11)
    assert info.proj_win.shape == (11, 11)
    assert info.proj_win_flat.shape == (121,)
    assert len(info.grad) == 2 and info.grad[0].shape == (11, 11)

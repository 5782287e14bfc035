"""Surface-window patch features on an analytic sphere."""

import numpy as np
import jax.numpy as jnp

from pointnetgpd_tpu.geometry.sdf import make_sdf
from pointnetgpd_tpu.grasping.surface_window import (
    bilateral_denoise,
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
        max_depth=0.01, num_samples=64, sigma_range=0.0))[0]
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


def _bilateral_oracle(img, sigma_range, sigma_spatial, win_size):
    """Direct numpy transcription of the bilateral definition skimage's
    denoise_bilateral implements (mode='nearest'); skimage itself is absent
    from this environment."""
    r = win_size // 2
    padded = np.pad(img, r, mode="edge")
    out = np.zeros_like(img)
    H, W = img.shape
    for i in range(H):
        for j in range(W):
            patch = padded[i:i + win_size, j:j + win_size]
            di, dj = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                 indexing="ij")
            w = (np.exp(-(di ** 2 + dj ** 2) / (2 * sigma_spatial ** 2))
                 * np.exp(-(patch - img[i, j]) ** 2 / (2 * sigma_range ** 2)))
            out[i, j] = (w * patch).sum() / w.sum()
    return out


def test_bilateral_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(13, 13)).astype(np.float32) * 0.01
    got = np.asarray(bilateral_denoise(jnp.asarray(img), 0.1, 1.0,
                                       win_size=7))
    want = _bilateral_oracle(img, 0.1, 1.0, 7)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilateral_shift_invariant_and_batched():
    # shift invariance justifies dropping the reference's min-subtraction
    # (contacts.py:437-445); batching covers the (C, H, W) path
    rng = np.random.default_rng(1)
    wins = rng.normal(size=(3, 11, 11)).astype(np.float32) * 0.02
    base = np.asarray(bilateral_denoise(jnp.asarray(wins)))
    shifted = np.asarray(bilateral_denoise(jnp.asarray(wins + 0.5)))
    np.testing.assert_allclose(shifted, base + 0.5, atol=1e-5)
    const = np.asarray(bilateral_denoise(jnp.full((2, 9, 9), 0.3,
                                                  np.float32)))
    np.testing.assert_allclose(const, 0.3, atol=1e-6)


def test_projection_window_denoised_by_default():
    sdf = _sphere()
    contact = jnp.asarray([[R, 0.0, 0.0]])
    in_dir = jnp.asarray([[-1.0, 0.0, 0.0]])
    raw = np.asarray(surface_window_projection(
        sdf, contact, in_dir, width=0.02, num_steps=11, max_depth=0.01,
        num_samples=64, sigma_range=0.0))[0]
    smooth = np.asarray(surface_window_projection(
        sdf, contact, in_dir, width=0.02, num_steps=11, max_depth=0.01,
        num_samples=64))[0]
    # default path = bilateral filter of the raw window (reference defaults
    # sigma_range=0.1, sigma_spatial=1, contacts.py:461-463)
    want = _bilateral_oracle(raw, 0.1, 1.0, 7)
    np.testing.assert_allclose(smooth, want, atol=1e-5)
    # smoothing must not distort the sphere window by more than grid noise
    np.testing.assert_allclose(smooth, raw, atol=2 * RES)


def test_surface_information_container():
    sdf = _sphere()
    info = surface_information(sdf, np.array([R, 0, 0.0]),
                               np.array([-1.0, 0, 0]), width=0.02,
                               num_steps=11)
    assert info.proj_win.shape == (11, 11)
    assert info.proj_win_flat.shape == (121,)
    assert len(info.grad) == 2 and info.grad[0].shape == (11, 11)

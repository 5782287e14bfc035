"""Contact surface windows: local SDF / depth patches at contact points.

Re-design of the reference's patch features (reference:
dex-net/src/dexnet/grasping/contacts.py:312-644 — ``surface_window_sdf``,
``_compute_surface_window_projection`` / ``surface_window_projection``,
``surface_information`` and the ``SurfaceWindow`` container): a tangent-plane
grid at the contact is sampled against the SDF (sdf window) or marched along
the contact direction to a zero crossing (projection window). Both are
batched device programs over contacts x grid cells, replacing the per-cell
host loops. The reference's bilateral window denoising (contacts.py:437-445,
skimage ``denoise_bilateral``) is reproduced as a device kernel
(``bilateral_denoise``): unrolled shifted-window weighted average, one fused
XLA program over all contacts. The reference shifts the window nonnegative
before filtering only because skimage rejects negative input; a bilateral
filter is shift-invariant (weights depend on intensity *differences*, the
output is an affine average), so the kernel filters the signed window
directly — identical result, one less pass.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import sdf as sdf_lib
from .quality import tangents_from_direction


@dataclass
class SurfaceWindow:
    """(contacts.py:645-703): projection window + gradients + curvature."""

    proj_win: np.ndarray   # (num_steps, num_steps) depths
    grad: tuple            # (gx, gy)
    hess_x: tuple
    hess_y: tuple

    @property
    def proj_win_flat(self):
        return self.proj_win.reshape(-1)


def _tangent_grid(contact, direction, width: float, num_steps: int):
    """Grid of world points on the tangent plane at the contact
    (contacts.py:344-380 setup): num_steps x num_steps spanning +-width/2."""
    d, t1, t2 = tangents_from_direction(direction)
    scales = jnp.linspace(-width / 2.0, width / 2.0, num_steps)
    uu, vv = jnp.meshgrid(scales, scales, indexing="ij")
    pts = (contact[None, None, :] + uu[..., None] * t1[None, None, :]
           + vv[..., None] * t2[None, None, :])
    return pts.reshape(-1, 3), d


@functools.partial(jax.jit, static_argnames=("num_steps",))
def surface_window_sdf(sdf: sdf_lib.SdfGrid, contacts, in_directions,
                       width: float = 1e-2, num_steps: int = 21):
    """SDF values on the tangent grid at each contact
    (contacts.py:312-342). contacts/in_directions: (C, 3).
    Returns (C, num_steps, num_steps)."""

    def one(contact, direction):
        pts, _ = _tangent_grid(contact, direction, width, num_steps)
        grid = sdf_lib.world_to_grid(sdf, pts)
        vals = sdf_lib.signed_distance_oob_big(sdf, grid)
        return vals.reshape(num_steps, num_steps)

    return jax.vmap(one)(contacts, in_directions)


def _bilateral_window_size(sigma_spatial: float) -> int:
    """skimage's default support: max(5, 2*ceil(3*sigma_spatial)+1)."""
    import math

    return max(5, 2 * math.ceil(3.0 * float(sigma_spatial)) + 1)


@functools.partial(jax.jit, static_argnames=("win_size",))
def bilateral_denoise(windows, sigma_range: float = 0.1,
                      sigma_spatial: float = 1.0, win_size: int = 7):
    """Edge-preserving bilateral filter over (..., H, W) windows
    (contacts.py:437-445: ``denoise_bilateral(window_pos, sigma_range,
    sigma_spatial, mode='nearest')``).

    Each output pixel is the weighted average of its (win_size x win_size)
    neighborhood with weight exp(-d2_px / (2 sigma_spatial^2)) *
    exp(-(I_q - I_p)^2 / (2 sigma_range^2)); edges are 'nearest'-padded.
    The neighborhood loop unrolls at trace time (win_size^2 shifted adds,
    ~49 for the default), which XLA fuses into one elementwise program —
    no gather, batched over every leading dim at once.
    """
    r = win_size // 2
    lead = windows.shape[:-2]
    H, W = windows.shape[-2:]
    img = windows.reshape((-1, H, W))
    padded = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="edge")
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    inv2ss = 1.0 / (2.0 * sigma_spatial * sigma_spatial)
    inv2sr = 1.0 / (2.0 * sigma_range * sigma_range)
    for di in range(-r, r + 1):
        for dj in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(
                padded, (0, r + di, r + dj), img.shape)
            w_sp = jnp.exp(-(di * di + dj * dj) * inv2ss)
            w = w_sp * jnp.exp(-jnp.square(shifted - img) * inv2sr)
            num = num + w * shifted
            den = den + w
    return (num / den).reshape(lead + (H, W))


@functools.partial(jax.jit, static_argnames=("num_steps", "num_samples"))
def _projection_windows_raw(sdf: sdf_lib.SdfGrid, contacts, in_directions,
                            width: float, num_steps: int,
                            max_depth: float, num_samples: int):
    def one(contact, direction):
        pts, d = _tangent_grid(contact, direction, width, num_steps)
        # march from -max_depth to +max_depth along d per grid cell
        ts = jnp.linspace(-max_depth, max_depth, num_samples)
        line = pts[:, None, :] + ts[None, :, None] * d[None, None, :]
        grid = sdf_lib.world_to_grid(sdf, line.reshape(-1, 3))
        vals = sdf_lib.signed_distance_oob_big(sdf, grid).reshape(
            pts.shape[0], num_samples)
        # first sign change along the line: linear zero crossing
        sign_change = (vals[:, :-1] * vals[:, 1:]) <= 0
        has = jnp.any(sign_change, axis=1)
        first = jnp.argmax(sign_change, axis=1)
        v0 = jnp.take_along_axis(vals, first[:, None], axis=1)[:, 0]
        v1 = jnp.take_along_axis(vals, (first + 1)[:, None], axis=1)[:, 0]
        t0 = ts[first]
        dt = ts[1] - ts[0]
        frac = v0 / jnp.where(jnp.abs(v0 - v1) < 1e-12, 1e-12, v0 - v1)
        depth = t0 + jnp.clip(frac, 0.0, 1.0) * dt
        depth = jnp.where(has, depth, max_depth)
        return depth.reshape(num_steps, num_steps)

    return jax.vmap(one)(contacts, in_directions)


def surface_window_projection(sdf: sdf_lib.SdfGrid, contacts, in_directions,
                              width: float = 1e-2, num_steps: int = 21,
                              max_depth: float = 1e-2,
                              num_samples: int = 32,
                              sigma_range: float = 0.1,
                              sigma_spatial: float = 1.0):
    """Projected depth window: for each tangent-grid cell, march along the
    contact direction to the surface zero crossing and record the signed
    depth (contacts.py:344-461). Cells with no crossing get max_depth.

    As in the reference (contacts.py:437-445 and the public wrapper defaults
    at contacts.py:461-463), the window is bilateral-denoised when both
    sigmas are positive; pass ``sigma_range=0`` for the raw window.
    Returns (C, num_steps, num_steps) depths in [-max_depth, max_depth]."""
    win = _projection_windows_raw(sdf, contacts, in_directions, width,
                                  num_steps, max_depth, num_samples)
    if sigma_range > 0.0 and sigma_spatial > 0.0:
        win = bilateral_denoise(win, sigma_range, sigma_spatial,
                                win_size=_bilateral_window_size(sigma_spatial))
    return win


def surface_information(sdf: sdf_lib.SdfGrid, contact, in_direction,
                        width: float = 2e-2, num_steps: int = 21):
    """Full SurfaceWindow for one contact (contacts.py:564-644): projection
    window + finite-difference gradients and Hessian rows."""
    proj = np.asarray(surface_window_projection(
        sdf, jnp.asarray(contact)[None], jnp.asarray(in_direction)[None],
        width=width, num_steps=num_steps))[0]
    gx, gy = np.gradient(proj)
    hxx, hxy = np.gradient(gx)
    hyx, hyy = np.gradient(gy)
    return SurfaceWindow(proj, (gx, gy), (hxx, hxy), (hyx, hyy))


def grasp_surface_information(sdf, contacts, width: float = 2e-2,
                              num_steps: int = 21):
    """SurfaceWindows at both contact points of closed grasps
    (reference: grasp.py:949-968 surface_information — patch features at the
    jaw contacts). contacts: a Contacts batch (grasping/grasp.py); returns a
    list of (window_c1, window_c2) per grasp."""
    import numpy as np

    out = []
    points = np.asarray(contacts.points)
    dirs = np.asarray(contacts.in_directions)
    for g in range(points.shape[0]):
        out.append((
            surface_information(sdf, points[g, 0], dirs[g, 0], width,
                                num_steps),
            surface_information(sdf, points[g, 1], dirs[g, 1], width,
                                num_steps),
        ))
    return out

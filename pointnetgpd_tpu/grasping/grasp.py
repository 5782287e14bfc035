"""Parallel-jaw grasp representation + batched SDF contact finding.

Re-design of the reference ParallelJawPtGrasp3D (reference:
dex-net/src/dexnet/grasping/grasp.py) for TPU: the grasp is its 10-dim
configuration vector (center 0:3, axis 3:6, max width 6, approach angle 7,
jaw width 8, min width 9 — grasp.py:234-276), and the per-grasp host loops
(finger closing, line-of-action stepping, quadratic zero crossing,
grasp.py:435-713) become fixed-shape batched device functions: one call
evaluates contacts for G grasps x S line samples.

Deviations (documented):
- zero-crossing root choice: the reference takes whichever real root in
  [0, 10] np.roots happens to order last (grasp.py via sdf.py:748-753, an
  unspecified eigenvalue order); we take the SMALLEST real root in [0, 10]
  — the first crossing along the closing direction, which is the physical
  contact. Fallback to the parabola vertex and the |t| <= 1 rejection match
  the reference (sdf.py:756-763).
- while-loop early exit becomes an argmax over a precomputed per-sample
  acceptance mask (same first-accepted index, fixed shape).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sdf as sdf_lib


SAMPLES_PER_GRID = 2.0  # Grasp.samples_per_grid (grasp.py:86)


def adaptive_num_samples(sdf, width_world, minimum: int = 40,
                         multiple: int = 32, cap: int = 512) -> int:
    """Resolution-adaptive line-of-action sample count, the reference's
    ``num_samples = int(samples_per_grid * grasp_width_grid / 2)``
    (close_fingers, grasp.py:464-466).

    A FIXED sample count silently under-samples fine grids: at the
    prepare_objects 100-cube resolution a 40-sample line of action steps
    ~3.6 grid cells per sample while ``find_contact`` only accepts samples
    within the surface band (res * sqrt(2) / 2), so contacts are simply
    never seen and the labeling yield collapses to zero on small objects
    (the round-4 20-object run's silent 357/1200-row shortfall). Host-side
    helper — call BEFORE the jitted sampler/labeler; rounded up to
    ``multiple`` (coarse on purpose: each distinct count is a fresh jit
    of the whole sampler+labeler program set) so nearby resolutions share
    one compiled program."""
    width_grid = float(width_world) / float(sdf.resolution)
    n = int(np.ceil(SAMPLES_PER_GRID * width_grid / 2.0))
    if n <= minimum:  # coarse grids keep the legacy fixed count exactly
        return minimum
    return min(-(-n // multiple) * multiple, cap)


# ---------------------------------------------------------------------------
# Configuration vector <-> parameters (grasp.py:234-276)
# ---------------------------------------------------------------------------

def configuration_from_params(center, axis, width, angle=0.0, jaw_width=0.0,
                              min_width=0.0):
    axis = axis / jnp.linalg.norm(axis)
    return jnp.concatenate([
        center, axis,
        jnp.stack([jnp.asarray(width, center.dtype),
                   jnp.asarray(angle, center.dtype),
                   jnp.asarray(jaw_width, center.dtype),
                   jnp.asarray(min_width, center.dtype)]),
    ])


def params_from_configuration(config):
    """-> (center, axis, max_width, angle, jaw_width, min_width)."""
    return (config[0:3], config[3:6], config[6], config[7], config[8],
            config[9] if config.shape[0] >= 10 else jnp.zeros((), config.dtype))


def endpoints(config):
    """Jaw locations at max opening (grasp.py:202-210)."""
    center, axis = config[0:3], config[3:6]
    half = config[6] / 2.0
    return center - half * axis, center + half * axis


def grasp_distance(config1, config2, alpha: float = 0.05):
    """Spatial + rotational grasp distance (grasp.py:212-232)."""
    center_dist = jnp.linalg.norm(config1[0:3] - config2[0:3])
    dot = jnp.clip(jnp.abs(jnp.dot(config1[3:6], config2[3:6])), -1.0, 1.0)
    return center_dist + alpha * (2.0 / jnp.pi) * jnp.arccos(dot)


def unrotated_full_axis(axis):
    """Canonical grasp frame: X out of palm, Y between jaws (grasp.py:322-340)."""
    y = axis
    x = jnp.stack([y[1], -y[0], jnp.zeros((), axis.dtype)])
    degenerate = jnp.linalg.norm(x) == 0
    x = jnp.where(degenerate, jnp.array([1.0, 0.0, 0.0], axis.dtype), x)
    x = x / jnp.linalg.norm(x)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=1)  # columns


def rotation_y(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, z, -s]),
        jnp.stack([z, o, z]),
        jnp.stack([s, z, c]),
    ])  # == np.c_[[c,0,s],[0,1,0],[-s,0,c]] (grasp.py:370-375)


def rotated_full_axis(axis, angle):
    """(grasp.py:342-354)."""
    return unrotated_full_axis(axis) @ rotation_y(angle)


def t_grasp_obj(config):
    """4x4 grasp->object transform (grasp.py:356-368)."""
    rot = rotated_full_axis(config[3:6], config[7])
    t = jnp.eye(4, dtype=config.dtype)
    t = t.at[:3, :3].set(rot)
    t = t.at[:3, 3].set(config[0:3])
    return t


def center_from_endpoints(g1, g2):
    """(grasp.py:278-282)."""
    return 0.5 * (g1 + g2)


def axis_from_endpoints(g1, g2):
    """(grasp.py:284-290)."""
    axis = g2 - g1
    n = jnp.linalg.norm(axis)
    return jnp.where(n > 0, axis / jnp.maximum(n, 1e-30), axis)


def grasp_from_endpoints(g1, g2, width=None, approach_angle=0.0,
                         close_width=0.0):
    """Configuration from jaw endpoints (grasp.py:298-320)."""
    if width is None:
        width = jnp.linalg.norm(g2 - g1)
    return configuration_from_params(
        center_from_endpoints(g1, g2), axis_from_endpoints(g1, g2), width,
        angle=approach_angle, min_width=close_width)


def grasp_angles_from_stp_z(config, r_stp_obj):
    """Angles of the grasp frame vs a stable pose's table normal
    (grasp.py:401-433): (axis angle psi, |approach| angle phi, nu)."""
    rot = rotated_full_axis(config[3:6], config[7])  # grasp axes in obj coords
    rot_stp = r_stp_obj @ rot
    stp_z = jnp.array([0.0, 0.0, 1.0], config.dtype)
    psi = jnp.arccos(jnp.clip(stp_z @ rot_stp[:, 1], -1.0, 1.0))
    phi = jnp.arccos(jnp.clip(jnp.abs(stp_z @ rot_stp[:, 0]), -1.0, 1.0))
    nu = stp_z @ rot_stp[:, 2]
    return psi, phi, nu


def _angle_aligned_with_table(axis, angle_ref_frame_col, r_table_rows):
    """Solve the approach angle that aligns the grasp x-axis with the table
    plane — the core of parallel_table/perpendicular_table
    (grasp.py:715-836). Returns the optimal rotation angle about the grasp
    y-axis minimizing the z-component (parallel) of the approach axis."""
    # approach(theta) = U @ R_y(theta) @ e_x where U = unrotated_full_axis
    u = unrotated_full_axis(axis)
    table_z = r_table_rows[2]
    # z-comp(theta) = a cos(theta) + b sin(theta), a = z.(u e_x), b = z.(u e_z)
    a = table_z @ u[:, 0]
    b = table_z @ u[:, 2]
    return a, b


def parallel_table(config, r_table_rows):
    """Approach angle making the approach axis parallel to the table
    (grasp.py:765-782): minimize |z-component|."""
    a, b = _angle_aligned_with_table(config[3:6], None, r_table_rows)
    # a cos t + b sin t = 0 -> t = atan2(-a, b)
    theta = jnp.arctan2(-a, b)
    return config.at[7].set(theta)


def perpendicular_table(config, r_table_rows):
    """Approach angle pointing the approach axis INTO the table (maximally
    downward, grasp.py:815-836): minimize the z-component (signed)."""
    a, b = _angle_aligned_with_table(config[3:6], None, r_table_rows)
    # minimize a cos t + b sin t -> t = atan2(-b, -a)
    theta = jnp.arctan2(-b, -a)
    return config.at[7].set(theta)


# ---------------------------------------------------------------------------
# Contact finding
# ---------------------------------------------------------------------------

class Contacts(NamedTuple):
    """Batched contact pairs from closing fingers on an SDF."""

    found: jnp.ndarray        # (...,) bool — both contacts found + valid normals
    points: jnp.ndarray       # (..., 2, 3) world contact points
    normals: jnp.ndarray      # (..., 2, 3) OUTWARD surface normals
    in_directions: jnp.ndarray  # (..., 2, 3) finger closing directions (world)


def line_of_action(start_grid, axis_grid, length_grid, num_samples: int,
                   min_width_grid=0.0):
    """(S, 3) grid points: start + t*axis, t in linspace(0, length/2 - min/2)
    (grasp.py:583-613; the reference guarantees >= 3 samples)."""
    t = jnp.linspace(0.0, length_grid / 2.0 - min_width_grid / 2.0, num_samples)
    return start_grid[None, :] + t[:, None] * axis_grid[None, :]


def _quadratic_zero_crossing(p0, y0, p1, y1, p2, y2, eps: float = 1.0):
    """Zero crossing of the quadratic through three collinear samples
    (sdf.py:721-766). Returns (point, valid)."""
    v = p1 - p0
    seg = jnp.linalg.norm(v)
    v = v / jnp.maximum(seg, 1e-12)
    t1 = jnp.zeros_like(seg)
    t2 = seg
    t3 = jnp.linalg.norm(p2 - p0)

    # fit a t^2 + b t + c through (t1,y0) (t2,y1) (t3,y2) via Cramer's rule
    def det3(m):
        return (m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
                - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
                + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0]))

    x = jnp.stack([
        jnp.stack([t1 * t1, t1, jnp.ones_like(t1)]),
        jnp.stack([t2 * t2, t2, jnp.ones_like(t2)]),
        jnp.stack([t3 * t3, t3, jnp.ones_like(t3)]),
    ])
    y = jnp.stack([y0, y1, y2])
    d = det3(x)
    singular = jnp.abs(d) < 1e-12
    d_safe = jnp.where(singular, 1.0, d)
    a = det3(x.at[:, 0].set(y)) / d_safe
    b = det3(x.at[:, 1].set(y)) / d_safe
    c = det3(x.at[:, 2].set(y)) / d_safe

    disc = b * b - 4.0 * a * c
    has_roots = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(jnp.abs(a) < 1e-30, 1e-30, a)
    r1 = (-b - sq) / (2.0 * a_safe)
    r2 = (-b + sq) / (2.0 * a_safe)
    lo, hi = jnp.minimum(r1, r2), jnp.maximum(r1, r2)
    lo_ok = has_roots & (lo >= 0) & (lo <= 10.0)
    hi_ok = has_roots & (hi >= 0) & (hi <= 10.0)
    # smallest admissible root = first crossing along the closing direction
    t_root = jnp.where(lo_ok, lo, hi)
    root_found = lo_ok | hi_ok

    t_vertex = -b / (2.0 * a_safe)
    t_quad = jnp.where(root_found, t_root, t_vertex)

    # Deviation (improvement): the reference REJECTS when the quadratic
    # degenerates to a line (|a| < 1e-10, sdf.py:756-757) — losing real
    # contacts on locally-planar SDF regions. We fall back to the linear
    # zero crossing (the reference's own find_zero_crossing_linear,
    # sdf.py:706-719) instead.
    degenerate_quad = jnp.abs(a) < 1e-10
    b_safe = jnp.where(jnp.abs(b) < 1e-30, 1e-30, b)
    t_linear = -c / b_safe
    linear_ok = jnp.abs(b) >= 1e-30

    t_zc = jnp.where(degenerate_quad, t_linear, t_quad)
    ok = jnp.where(degenerate_quad, linear_ok, True)
    valid = (~singular) & ok & (jnp.abs(t_zc) <= eps)
    return p0 + t_zc[..., None] * v, valid


def find_contact(sdf: sdf_lib.SdfGrid, loa):
    """First surface contact along a line of action (grasp.py:615-713).

    loa: (S, 3) grid points. Returns (found, point_grid, strict_hit) where
    strict_hit is the reference's ``strict=True`` semantics (any on-surface
    sample — used for approach collision checks, grasp.py:479-481).
    """
    s = loa.shape[0]
    vals = sdf_lib.signed_distance_oob_big(sdf, loa)  # (S,)
    on_surf = jnp.abs(vals) < sdf.surface_thresh
    strict_hit = jnp.any(on_surf)

    # neighbor triples per index (edge-clamped like the reference's cases)
    idx = jnp.arange(s)
    i_next = jnp.where(idx == s - 1, s - 1, idx + 1)
    # i == 0 uses (0, 1, 2); i == S-1 uses (S-3, S-2, S-1) (grasp.py:669-693)
    a_idx = jnp.where(idx == 0, 0, jnp.where(idx == s - 1, s - 3, idx - 1))
    b_idx = jnp.where(idx == 0, 1, jnp.where(idx == s - 1, s - 2, idx))
    c_idx = jnp.where(idx == 0, 2, jnp.where(idx == s - 1, s - 1, idx + 1))

    pts_a, pts_b, pts_c = loa[a_idx], loa[b_idx], loa[c_idx]
    y_a, y_b, y_c = vals[a_idx], vals[b_idx], vals[c_idx]
    zc_pts, zc_valid = jax.vmap(_quadratic_zero_crossing)(
        pts_a, y_a, pts_b, y_b, pts_c, y_c)

    # "contact not yet found if the next sdf value is smaller" (grasp.py:679,696)
    next_smaller = jnp.abs(vals[i_next]) < jnp.abs(vals)
    next_smaller = jnp.where(idx == s - 1, False, next_smaller)

    accept = on_surf & zc_valid & (~next_smaller)
    found = jnp.any(accept)
    first = jnp.argmax(accept)
    return found, zc_pts[first], strict_hit


def _contact_with_normal(sdf: sdf_lib.SdfGrid, pt_grid, in_direction_grid):
    """Contact normal from the SDF, oriented outward against the closing
    direction (contacts.py:95-115). Returns (point_world, normal, valid)."""
    normal, n_valid = sdf_lib.surface_normal(sdf, pt_grid[None, :])
    normal, n_valid = normal[0], n_valid[0]
    flip = jnp.dot(in_direction_grid, normal) > 0
    normal = jnp.where(flip, -normal, normal)
    point_world = sdf_lib.grid_to_world(sdf, pt_grid)
    return point_world, normal, n_valid


@functools.partial(
    jax.jit, static_argnames=("num_samples", "check_approach", "num_approach_samples"))
def close_fingers(sdf: sdf_lib.SdfGrid, configs, *, num_samples: int = 40,
                  check_approach: bool = True, approach_dist: float = 1.0,
                  num_approach_samples: int = 40) -> Contacts:
    """Batched finger closing on an SDF (grasp.py:435-511).

    configs: (G, 10) grasp configurations (object/world frame). The number of
    line samples is static; the reference uses
    ``samples_per_grid * width_grid / 2`` (grasp.py:464-465) — pass the
    equivalent for parity (e.g. ``int(width / resolution)``).
    """

    def one(config):
        center, axis, width, angle = (config[0:3], config[3:6], config[6],
                                      config[7])
        axis = axis / jnp.linalg.norm(axis)
        min_width = config[9]
        g1_w = center - (width / 2.0) * axis
        g2_w = center + (width / 2.0) * axis
        g1 = sdf_lib.world_to_grid(sdf, g1_w)
        g2 = sdf_lib.world_to_grid(sdf, g2_w)
        axis_grid = axis  # axis-aligned similarity transform: directions fixed
        width_grid = width / sdf.resolution
        min_width_grid = min_width / sdf.resolution

        ok = jnp.asarray(True)
        if check_approach:
            approach_axis = rotated_full_axis(axis, angle)[:, 0]
            adist_grid = approach_dist / sdf.resolution
            # reference travels approach_dist/2 back (width/2 in
            # create_line_of_action, grasp.py:475-478,607-608)
            loa_a1 = line_of_action(g1, -approach_axis, adist_grid,
                                    num_approach_samples)
            loa_a2 = line_of_action(g2, -approach_axis, adist_grid,
                                    num_approach_samples)
            # strict mode: ANY on-surface sample is a collision (grasp.py:479-484)
            _, _, hit1 = find_contact(sdf, loa_a1)
            _, _, hit2 = find_contact(sdf, loa_a2)
            ok = ~(hit1 | hit2)

        loa1 = line_of_action(g1, axis_grid, width_grid, num_samples,
                              min_width_grid)
        loa2 = line_of_action(g2, -axis_grid, width_grid, num_samples,
                              min_width_grid)
        f1, p1, _ = find_contact(sdf, loa1)
        f2, p2, _ = find_contact(sdf, loa2)

        in_dir1 = axis
        in_dir2 = -axis
        pw1, n1, nv1 = _contact_with_normal(sdf, p1, in_dir1)
        pw2, n2, nv2 = _contact_with_normal(sdf, p2, in_dir2)
        found = ok & f1 & f2 & nv1 & nv2
        return Contacts(
            found=found,
            points=jnp.stack([pw1, pw2]),
            normals=jnp.stack([n1, n2]),
            in_directions=jnp.stack([in_dir1, in_dir2]),
        )

    return jax.vmap(one)(configs)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def approach_collision_free(sdf: sdf_lib.SdfGrid, config, angles, *,
                            num_samples: int = 40,
                            approach_dist: float = 1.0):
    """The check_approach half of ``close_fingers``, alone, per angle.

    Of close_fingers' work, ONLY the approach-collision test depends on
    the grasp's approach angle (grasp.py:475-484) — the closing lines and
    contacts are functions of center/axis/width alone. Callers that scan
    angle candidates (the antipodal sampler, grasp_sampler.py:757-768)
    use this per-angle test plus ONE angle-independent close_fingers
    instead of re-closing the fingers once per angle. Returns an
    (A,) bool mask: True = collision-free (strict mode: any on-surface
    approach sample is a collision).
    """
    center, axis, width = config[0:3], config[3:6], config[6]
    axis = axis / jnp.linalg.norm(axis)
    g1 = sdf_lib.world_to_grid(sdf, center - (width / 2.0) * axis)
    g2 = sdf_lib.world_to_grid(sdf, center + (width / 2.0) * axis)
    adist_grid = approach_dist / sdf.resolution

    def one(angle):
        approach_axis = rotated_full_axis(axis, angle)[:, 0]
        loa_a1 = line_of_action(g1, -approach_axis, adist_grid, num_samples)
        loa_a2 = line_of_action(g2, -approach_axis, adist_grid, num_samples)
        _, _, hit1 = find_contact(sdf, loa_a1)
        _, _, hit2 = find_contact(sdf, loa_a2)
        return ~(hit1 | hit2)

    return jax.vmap(one)(angles)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def grasp_from_contact_and_axis(sdf: sdf_lib.SdfGrid, c1_world, axis_world,
                                width_world, *, num_samples: int = 40,
                                min_width_world=0.0, backup: float = 0.5):
    """Create a grasp from one contact + axis by closing from both sides
    (grasp.py:872-947). Batched over leading dims via vmap by the caller.

    Returns (config (10,), contacts: Contacts for the pair, valid).
    """
    axis_world = axis_world / jnp.linalg.norm(axis_world)
    width_grid = width_world / sdf.resolution
    min_width_grid = min_width_world / sdf.resolution
    c1_grid = sdf_lib.world_to_grid(sdf, c1_world) - backup * axis_world
    g2 = c1_grid + (width_grid - backup) * axis_world

    loa1 = line_of_action(c1_grid, axis_world, width_grid, num_samples,
                          min_width_grid)
    loa2 = line_of_action(g2, -axis_world, 2.0 * width_grid, num_samples)
    f1, p1, _ = find_contact(sdf, loa1)
    f2, p2, _ = find_contact(sdf, loa2)

    pw1, n1, nv1 = _contact_with_normal(sdf, p1, axis_world)
    pw2, n2, nv2 = _contact_with_normal(sdf, p2, -axis_world)

    dist = jnp.linalg.norm(pw1 - pw2)
    valid = f1 & f2 & nv1 & nv2 & (dist > min_width_world)

    center = 0.5 * (pw1 + pw2)
    new_axis = (pw2 - pw1) / jnp.maximum(dist, 1e-12)
    config = jnp.concatenate([
        center, new_axis,
        jnp.stack([jnp.asarray(width_world, center.dtype),
                   jnp.zeros((), center.dtype),
                   jnp.zeros((), center.dtype),
                   jnp.zeros((), center.dtype)]),
    ])
    contacts = Contacts(
        found=valid,
        points=jnp.stack([pw1, pw2]),
        normals=jnp.stack([n1, n2]),
        in_directions=jnp.stack([axis_world, -axis_world]),
    )
    return config, contacts, valid


# ---------------------------------------------------------------------------
# Vacuum grasps (reference: grasp.py:969-1020 VacuumPoint)
# ---------------------------------------------------------------------------

def vacuum_configuration_from_params(center, axis):
    """5-DOF vacuum target -> 6-vector [center, unit axis]
    (VacuumPoint.configuration_from_params, grasp.py:995-1003).
    Host-side numpy: these are config-assembly utilities, not device code."""
    import numpy as _np

    center = _np.asarray(center, dtype=float)
    axis = _np.asarray(axis, dtype=float)
    if abs(_np.linalg.norm(axis) - 1.0) > 1e-5:
        raise ValueError("vacuum axis must be unit-norm")
    return _np.concatenate([center, axis])


def vacuum_params_from_configuration(configuration):
    """6-vector -> (center, axis) with the reference's unit-axis check
    (VacuumPoint.params_from_configuration, grasp.py:1005-1020)."""
    import numpy as _np

    configuration = _np.asarray(configuration, dtype=float)
    if configuration.shape[-1] != 6:
        raise ValueError("vacuum configuration must have 6 entries")
    axis = configuration[..., 3:6]
    if _np.max(_np.abs(_np.linalg.norm(axis, axis=-1) - 1.0)) > 1e-5:
        raise ValueError("vacuum axis must be unit-norm")
    return configuration[..., 0:3], axis

"""Grasp quality metrics as batched, jittable device code.

Re-design of the reference's quality layer (reference:
dex-net/src/dexnet/grasping/quality.py) for TPU. The reference leans on two
host C libraries — cvxopt QP (quality.py:62,786-822) and pyhull/qhull convex
hulls (quality.py:32,564) — called once per grasp inside the dataset-
generation hot loop. Here:

- ``force_closure``            — Nguyen antipodality test (quality.py:245-283),
                                 closed form, vmappable.
- ``grasp_matrix``             — 6xM wrench basis with torque scaling and
                                 soft-finger torsion columns (quality.py:191-243).
- ``ferrari_canny_l1_force_only`` — the dataset-label metric
                                 (quality.py:626-723). The reference builds a
                                 qhull hull of the 3-D force set and solves a
                                 cvxopt QP per facet. In 3-D the per-facet QP
                                 (min-norm point in a triangle) has a CLOSED
                                 FORM, and hull facets are exactly the
                                 *supporting* point triples — so the whole
                                 metric becomes a fixed-shape enumeration over
                                 C(M,3) triples with a support mask: exact,
                                 batched, no host round-trip.
- ``min_norm_in_simplex``      — projected-gradient min-norm-in-convex-hull
                                 (replaces min_norm_vector_in_facet,
                                 quality.py:786-822) for the 6-D metrics;
                                 fixed iteration count, vmappable.
- ``ferrari_canny_l1``         — full 6-D epsilon metric; hull enumeration via
                                 scipy/qhull on host (offline path only),
                                 facet QPs batched on device.
- ``ferrari_canny_l1_device``  — the same 6-D metric with NO host C library:
                                 exact facet-plane enumeration over C(M, 6)
                                 row subsets, batched 6x6 solves on device
                                 (oracle-tested against the qhull path).
"""

from __future__ import annotations

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_WRENCH_NORM_THRESH = 1e-3
DEFAULT_WRENCH_REGULARIZER = 1e-10


# ---------------------------------------------------------------------------
# Friction cones / contact wrenches
# ---------------------------------------------------------------------------

def tangents_from_direction(direction):
    """Right-handed tangent frame for an (inward) direction vector.

    Mirrors Contact3D.tangents (reference: contacts.py:117-185) with
    ``align_axes=True`` solved in closed form: the reference discretizes the
    in-plane rotation over 1000 samples to maximize alignment of t1 with the
    object x-axis; the continuous optimum is the normalized projection of
    x-hat onto the tangent plane (identical up to the 2pi/1000 grid).
    """
    d = direction / jnp.linalg.norm(direction)
    # any vector not parallel to d
    ref = jnp.where(jnp.abs(d[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], d.dtype),
                    jnp.array([0.0, 1.0, 0.0], d.dtype))
    x = ref - jnp.dot(ref, d) * d
    xn = jnp.linalg.norm(x)
    x = x / jnp.maximum(xn, 1e-12)
    y = jnp.cross(d, x)
    # align t1 with object x-axis: projection of x-hat onto span{x, y}
    target = jnp.array([1.0, 0.0, 0.0], d.dtype)
    cx, cy = jnp.dot(target, x), jnp.dot(target, y)
    norm = jnp.sqrt(cx * cx + cy * cy)
    v = jnp.where(norm > 1e-8, (cx * x + cy * y) / jnp.maximum(norm, 1e-12), x)
    w = jnp.cross(d, v)
    return d, v, w


def friction_cone(inward_normal, friction_coef, num_cone_faces: int = 8):
    """Discretized friction cone edges at one contact.

    (reference: contacts.py:268-280). Returns (num_cone_faces, 3) rows
    ``normal + mu * tangent_j`` — NOT normalized, matching the reference.
    """
    d, t1, t2 = tangents_from_direction(inward_normal)
    j = jnp.arange(num_cone_faces, dtype=inward_normal.dtype)
    ang = 2.0 * jnp.pi * j / num_cone_faces
    tan = jnp.cos(ang)[:, None] * t1 + jnp.sin(ang)[:, None] * t2
    return d + friction_coef * tan


def torques_from_forces(moment_arm, forces):
    """torque_i = moment_arm x force_i (reference: contacts.py:282-310)."""
    return jnp.cross(jnp.broadcast_to(moment_arm, forces.shape), forces)


def normal_force_magnitude(inward_normal, in_direction):
    """Component of the applied force along the surface normal
    (reference: contacts.py:210-223): max(dot(in_dir_hat, inward_normal), 0)."""
    d = in_direction / jnp.linalg.norm(in_direction)
    return jnp.maximum(jnp.dot(d, inward_normal), 0.0)


def grasp_matrix(forces, torques, normals, *, torque_scaling=1.0,
                 soft_fingers: bool = False, friction_coef=0.5,
                 finger_radius=0.005):
    """6 x M wrench basis (reference: quality.py:191-243).

    Args (note: row-major (M, 3) layout, transposed from the reference's 3xM):
      forces / torques: (M, 3); normals: (K, 3) inward-scaled normals.
    """
    g = jnp.concatenate([forces, torque_scaling * torques], axis=1).T  # (6, M)
    if soft_fingers:
        torsion = (jnp.pi * finger_radius ** 2 * friction_coef
                   * normals * torque_scaling)  # (K, 3)
        zeros = jnp.zeros_like(torsion)
        pos = jnp.concatenate([zeros, torsion], axis=1).T   # (6, K)
        neg = jnp.concatenate([zeros, -torsion], axis=1).T
        g = jnp.concatenate([g, pos, neg], axis=1)
    return g


# ---------------------------------------------------------------------------
# Force closure (Nguyen antipodality test)
# ---------------------------------------------------------------------------

def force_closure(p1, n1, p2, n2, friction_coef, use_abs_value: bool = True):
    """1 if the two contacts are in force closure (reference: quality.py:245-283).

    p1, p2: contact points; n1, n2: OUTWARD normals (the reference negates
    internally); vmappable over leading batch dims.
    """
    in1, in2 = -n1, -n2  # inward normals
    diff21 = p2 - p1
    diff12 = p1 - p2
    dist = jnp.linalg.norm(diff21)

    def check(normal, diff):
        proj = jnp.dot(normal, diff) / jnp.linalg.norm(normal)
        proj = jnp.where(use_abs_value, jnp.abs(proj), proj)
        in_cone = jnp.arccos(jnp.clip(proj / jnp.maximum(dist, 1e-16), -1.0, 1.0)) \
            <= jnp.arctan(friction_coef)
        return (proj >= 0) & in_cone

    same_point = dist == 0
    return jnp.where(same_point, 0,
                     (check(in1, diff21) & check(in2, diff12)).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Min-norm point in a simplex / convex hull
# ---------------------------------------------------------------------------

def _project_simplex(v):
    """Euclidean projection onto the probability simplex (sorted algorithm)."""
    n = v.shape[-1]
    u = jnp.sort(v, axis=-1)[..., ::-1]
    css = jnp.cumsum(u, axis=-1) - 1.0
    idx = jnp.arange(1, n + 1, dtype=v.dtype)
    cond = u - css / idx > 0
    rho = jnp.sum(cond, axis=-1)
    theta = jnp.take_along_axis(css, (rho - 1)[..., None].astype(jnp.int32),
                                axis=-1)[..., 0] / rho.astype(v.dtype)
    return jnp.maximum(v - theta[..., None], 0.0)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def min_norm_in_simplex(vertices, num_iters: int = 200,
                        wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER):
    """min_{x in simplex} ||V^T x|| for V = (n, d) vertex rows.

    Replaces min_norm_vector_in_facet (reference: quality.py:786-822): the
    same QP — min x'(VV' + eps I)x s.t. x >= 0, sum x = 1 — solved by
    accelerated projected gradient with a fixed iteration count (jit/vmap
    friendly) instead of cvxopt. Returns (min_norm, coefficients).
    """
    n = vertices.shape[0]
    gram = vertices @ vertices.T + wrench_regularizer * jnp.eye(n, dtype=vertices.dtype)
    # Lipschitz constant upper bound for the gradient 2*Gram x
    lip = 2.0 * jnp.maximum(jnp.trace(gram), 1e-12)
    step = 1.0 / lip

    x0 = jnp.full((n,), 1.0 / n, dtype=vertices.dtype)

    def body(_, carry):
        x, y, t = carry
        grad = 2.0 * (gram @ y)
        x_new = _project_simplex(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(0, num_iters, body,
                                (x0, x0, jnp.asarray(1.0, vertices.dtype)))
    min_norm = jnp.sqrt(jnp.maximum(x @ gram @ x, 0.0))
    return min_norm, x


def _project_simplex_cols(v):
    """Simplex projection of every COLUMN of ``v`` ((n, G) — lane-packed).

    Same sorted algorithm as _project_simplex, but with the batch index on
    the minor (lane) axis: every op in the projection is a fully packed
    G-wide vector op instead of an n-in-128-lanes one (the 6-D facet
    solver's lane-layout lesson — see _solve_ones_batched / SCALING.md).
    """
    n = v.shape[0]
    u = jnp.sort(v, axis=0)[::-1]
    css = jnp.cumsum(u, axis=0) - 1.0
    idx = jnp.arange(1, n + 1, dtype=v.dtype)[:, None]
    cond = u - css / idx > 0
    rho = jnp.sum(cond, axis=0)
    theta = jnp.take_along_axis(
        css, (rho - 1)[None, :].astype(jnp.int32), axis=0)[0] \
        / rho.astype(v.dtype)
    return jnp.maximum(v - theta[None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def min_norm_in_simplex_batch(vertices, num_iters: int = 300,
                              wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER):
    """Batched min_norm_in_simplex over (G, n, d) vertex sets, SoA layout.

    Functionally identical to ``vmap(min_norm_in_simplex)`` (same FISTA
    iteration, same step rule) but keeps the BATCH index on the minor
    (lane) axis through the whole loop: iterates are (n, G) and the Gram
    matrices (n, n, G), so the matvec is n^2 fully packed G-wide
    multiply-adds and the simplex projection sorts n-element columns with
    G on the lanes. The vmapped form leaves (G, n) rows with n = 16 in
    128-wide lanes — an 8x underfill tax on every op of the loop (the same
    pathology the facet solver's SoA rewrite fixed; SCALING.md "6-D facet
    enumeration"). Returns (min_norms (G,), coefficients (G, n)).
    """
    v = vertices
    g, n, _ = v.shape
    gram = jnp.einsum("gnd,gmd->nmg", v, v) \
        + wrench_regularizer * jnp.eye(n, dtype=v.dtype)[:, :, None]
    lip = 2.0 * jnp.maximum(jnp.trace(gram, axis1=0, axis2=1), 1e-12)
    step = (1.0 / lip)[None, :]

    def matvec(y):
        # (n, n, G) x (n, G) -> (n, G): broadcast-multiply + reduce keeps
        # the contraction on the VPU with G packing the lanes (a
        # dot_general would batch over G and underfill the MXU instead)
        return jnp.sum(gram * y[None, :, :], axis=1)

    x0 = jnp.full((n, g), 1.0 / n, dtype=v.dtype)

    def body(_, carry):
        x, y, t = carry
        grad = 2.0 * matvec(y)
        x_new = _project_simplex_cols(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(0, num_iters, body,
                                (x0, x0, jnp.asarray(1.0, v.dtype)))
    min_norms = jnp.sqrt(jnp.maximum(jnp.sum(x * matvec(x), axis=0), 0.0))
    return min_norms, x.T


def closest_point_on_triangle_to_origin(a, b, c):
    """Exact distance from the origin to triangle (a, b, c) in 3-D.

    Closed-form closest-point-on-triangle (Ericson, Real-Time Collision
    Detection §5.1.5) specialized to query point 0 — this IS the reference's
    per-facet QP (quality.py:786-822) for 3-vertex facets, exactly.
    """
    ab = b - a
    ac = c - a
    ap = -a
    d1 = jnp.dot(ab, ap)
    d2 = jnp.dot(ac, ap)
    bp = -b
    d3 = jnp.dot(ab, bp)
    d4 = jnp.dot(ac, bp)
    cp = -c
    d5 = jnp.dot(ab, cp)
    d6 = jnp.dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_sum = va + vb + vc

    # Disjoint Voronoi-region predicates (Ericson 5.1.5); all branches are
    # computed and combined with where (vmap/TPU friendly).
    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    def safe_div(num, den):
        return num / jnp.where(den == 0, 1.0, den)

    p_ab = a + jnp.clip(safe_div(d1, d1 - d3), 0, 1) * ab
    p_ac = a + jnp.clip(safe_div(d2, d2 - d6), 0, 1) * ac
    p_bc = b + jnp.clip(safe_div(d4 - d3, (d4 - d3) + (d5 - d6)), 0, 1) * (c - b)

    denom = jnp.where(denom_sum == 0, 1.0, denom_sum)
    p_inside = a + (vb / denom) * ab + (vc / denom) * ac

    p = p_inside
    p = jnp.where(in_edge_ab, p_ab, p)
    p = jnp.where(in_edge_ac, p_ac, p)
    p = jnp.where(in_edge_bc, p_bc, p)
    p = jnp.where(in_vert_a, a, p)
    p = jnp.where(in_vert_b, b, p)
    p = jnp.where(in_vert_c, c, p)
    return jnp.linalg.norm(p)


def _triples(m: int) -> np.ndarray:
    return np.asarray(list(itertools.combinations(range(m), 3)), dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("wrench_norm_thresh",))
def ferrari_canny_l1_force_only(g3,
                                wrench_norm_thresh: float = DEFAULT_WRENCH_NORM_THRESH):
    """Epsilon metric on the 3-D force set (reference: quality.py:626-723).

    g3: (M, 3) force rows (the reference's G[:3,:].T). Exact algorithm:
    every supporting triple of points (all other points on one side of its
    plane) is a hull facet; epsilon = min over supporting facets of the
    closed-form origin-to-triangle distance. Origin-outside / on-boundary
    cases return 0 like the reference (quality.py:696-705).

    Fixed shapes: C(M,3) triples, all evaluated, masked — no host hull.
    vmap over a leading batch axis for whole-dataset labeling in one call.
    """
    m = g3.shape[0]
    tri = jnp.asarray(_triples(m))  # (T, 3)
    a = g3[tri[:, 0]]
    b = g3[tri[:, 1]]
    c = g3[tri[:, 2]]

    n = jnp.cross(b - a, c - a)                       # (T, 3) plane normals
    n_norm = jnp.linalg.norm(n, axis=1)
    nondegenerate = n_norm > 1e-12 * jnp.maximum(jnp.max(jnp.abs(g3)), 1e-30)

    # signed distances of all points to each plane. Full precision is NOT
    # optional: default-precision bf16 MXU passes carry ~1e-3 relative
    # error, far above the supporting tolerance — on TPU they silently
    # misclassify facets and corrupt epsilon (the same bug class fixed for
    # the 6-D path in round 4; caught here by a TPU-vs-CPU ground-truth
    # A/B in round 5: eps 1.0 vs the correct 0.554).
    offs = (jnp.einsum("td,md->tm", n, g3,
                       precision=jax.lax.Precision.HIGHEST)
            - jnp.einsum("td,td->t", n, a,
                         precision=jax.lax.Precision.HIGHEST)[:, None])
    tol = 1e-10 * jnp.maximum(n_norm, 1e-30)[:, None]
    supporting = (jnp.all(offs <= tol, axis=1) | jnp.all(offs >= -tol, axis=1))
    supporting = supporting & nondegenerate

    # origin strictly inside: for every supporting plane, origin on the inner
    # side with positive margin. Inner side sign = side where the other
    # points lie; origin offset relative to the plane:
    origin_off = -jnp.einsum("td,td->t", n, a,
                             precision=jax.lax.Precision.HIGHEST) \
        / jnp.maximum(n_norm, 1e-30)
    side = jnp.where(jnp.sum(offs, axis=1) >= 0, 1.0, -1.0)  # sign of the point mass
    margin = side * origin_off  # > 0 when origin on the same side as the hull
    interior_margin = jnp.min(jnp.where(supporting, margin, jnp.inf))
    any_facet = jnp.any(supporting)
    origin_inside = any_facet & (interior_margin > 1e-10)

    dists = jax.vmap(closest_point_on_triangle_to_origin)(a, b, c)
    eps = jnp.min(jnp.where(supporting, dists, jnp.inf))
    eps = jnp.where(jnp.isfinite(eps), eps, 0.0)
    return jnp.where(origin_inside, eps, 0.0)


def ferrari_canny_l1(g6, wrench_norm_thresh: float = DEFAULT_WRENCH_NORM_THRESH,
                     wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
                     num_iters: int = 300):
    """Full 6-D epsilon metric (reference: quality.py:527-623).

    g6: (M, 6) wrench rows. The 6-D hull enumeration stays host-side
    (scipy/qhull — offline dataset generation only, like the reference); the
    per-facet min-norm QPs are batched on device via min_norm_in_simplex.
    """
    from scipy.spatial import ConvexHull  # host-only dependency, offline path

    g6 = np.asarray(g6, dtype=np.float64)
    try:
        hull = ConvexHull(g6, qhull_options="QJ")  # joggle matches qhull default use
    except Exception:
        return 0.0
    if len(hull.simplices) == 0:
        return 0.0

    min_norm_in_hull, coeffs = min_norm_in_simplex(jnp.asarray(g6),
                                                   num_iters=num_iters,
                                                   wrench_regularizer=wrench_regularizer)
    if float(min_norm_in_hull) > wrench_norm_thresh:
        return 0.0
    if int(np.sum(np.asarray(coeffs) > 1e-4)) <= g6.shape[1] - 1:
        return 0.0

    facets = jnp.asarray(g6[hull.simplices])  # (F, 6, 6) vertex rows per facet
    dists, _ = min_norm_in_simplex_batch(facets, num_iters=num_iters,
                                         wrench_regularizer=wrench_regularizer)
    return float(jnp.min(dists))


@functools.lru_cache(maxsize=16)
def _six_subsets(m: int) -> np.ndarray:
    # C(m, 6) grows combinatorially (C(24,6)=135k, C(32,6)=906k,
    # C(64,6)=75M): the table itself and the batched solves it drives
    # would hang/OOM far beyond any cone discretization this metric is
    # used with (<= 2 contacts x <= 16 cone edges). Fail loudly instead.
    if m > 40:  # C(40,6) = 3.8M subsets, ~60 MB host table — the ceiling
        raise ValueError(
            f"ferrari_canny_l1_device enumerates C({m},6) facet planes "
            f"({math.comb(m, 6):,}); wrench sets beyond 40 rows should "
            "use the host-qhull ferrari_canny_l1 instead")
    return np.asarray(list(itertools.combinations(range(m), 6)),
                      dtype=np.int32)


def _solve_ones_batched(p):
    """Solve P n = 1 for batched (T, 6, 6) systems via unrolled
    Gauss-Jordan with partial pivoting, in pure elementwise/where ops —
    structure-of-arrays layout: every operand is a (T,) vector, so the
    SOLVE index fills the TPU lane dimension.

    jnp.linalg.solve's batched LU lowering is the whole cost of the facet
    enumeration on TPU (measured ~245 ms per 24-row grasp = 134k systems);
    the first unrolled rewrite kept the (T, 6, 7) augmented tensor, whose
    7-wide minor axis pads to 128 lanes — an 18x physical blowup the VPU
    then streams (measured 2.3 us per 500-FLOP solve, round 5). Forty-two
    (T,) registers instead make each of the ~500 unrolled ops a fully
    packed vector op. Singular systems produce non-finite rows, which the
    caller's isfinite mask rejects (planes through the origin cannot be
    facets of an origin-interior hull). Returns (T, 6) solutions.
    """
    t, d, _ = p.shape
    soa = jnp.transpose(p, (1, 2, 0))                     # (row, col, T)
    ones = jnp.ones((t,), p.dtype)
    rows = [[soa[i, j] for j in range(d)] + [ones] for i in range(d)]
    for k in range(d):
        # partial pivot: compare-swap the max |column k| entry into row k
        for i in range(k + 1, d):
            c = jnp.abs(rows[i][k]) > jnp.abs(rows[k][k])
            for j in range(k, d + 1):
                rk, ri = rows[k][j], rows[i][j]
                rows[k][j] = jnp.where(c, ri, rk)
                rows[i][j] = jnp.where(c, rk, ri)
        piv_safe = jnp.where(jnp.abs(rows[k][k]) < 1e-30, jnp.inf,
                             rows[k][k])
        for i in range(d):
            if i == k:
                continue
            f = rows[i][k] / piv_safe
            for j in range(k, d + 1):
                rows[i][j] = rows[i][j] - f * rows[k][j]
    return jnp.stack([rows[i][d] / rows[i][i] for i in range(d)], axis=1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _boundary_distance_6d(g6, chunk: int = 16384):
    """Distance from the origin to the BOUNDARY of conv(g6) for an
    ORIGIN-INTERIOR hull, exactly, fully on device.

    For a convex polytope with the origin strictly inside, every facet
    hyperplane can be written <n, x> = 1 (the origin is never ON a facet
    plane), its distance to the origin is 1/||n||, and the boundary
    distance is the min of |d|/||n|| over facet PLANES (the inscribed ball
    argument — each half-space keeps the ball of that radius). So, like
    the 3-D force-only metric's triple enumeration, enumerate every
    C(M, 6) row subset, solve the 6x6 system P_S n = 1 for its candidate
    plane, keep SUPPORTING subsets (all M points on the origin side:
    <n, p_j> <= 1 + tol), and take the min distance. Exact — these are
    precisely the qhull facets the reference enumerates (quality.py:
    564-623) — with fixed shapes, batched solves, no host library.
    ``chunk`` bounds memory via lax.map over subset chunks
    (C(24,6) = 134,596; C(32,6) = 906,192).
    """
    m, d = g6.shape
    if m < d:  # degenerate wrench set: the hull has no 6-D interior, so no
        # facet planes to enumerate — epsilon is 0 (the host path's qhull
        # raises and is caught to the same value)
        return jnp.asarray(0.0, g6.dtype)
    subsets = _six_subsets(m)                  # (T, 6) static
    t_total = len(subsets)
    chunk = min(chunk, t_total)
    pad = (-t_total) % chunk
    if pad:  # cyclic tile: duplicates only re-test the same planes
        subsets = np.resize(subsets, (t_total + pad, 6))
    subs = jnp.asarray(subsets).reshape(-1, chunk, 6)

    def one_chunk(idx):
        pts = g6[idx]                          # (chunk, 6, 6)
        n = _solve_ones_batched(pts)
        # full-precision side test: default-precision bf16 MXU passes carry
        # ~1e-3 error in <n, w>, which rejects genuine facets (offsets are
        # scaled to 1) and overestimates epsilon (measured 0.078 vs the
        # qhull oracle's 0.0445 on a TPU chip before this fix)
        side = jnp.einsum("td,md->tm", n, g6,
                          precision=jax.lax.Precision.HIGHEST)
        supporting = jnp.all(side <= 1.0 + 1e-4, axis=1)
        nn = jnp.linalg.norm(n, axis=1)
        ok = supporting & jnp.isfinite(nn) & (nn > 1e-30)
        dist = jnp.where(ok, 1.0 / jnp.maximum(nn, 1e-30), jnp.inf)
        return jnp.min(dist)

    best = jnp.min(jax.lax.map(one_chunk, subs))
    return jnp.where(jnp.isfinite(best), best, 0.0)


def ferrari_canny_l1_device(g6,
                            wrench_norm_thresh: float = DEFAULT_WRENCH_NORM_THRESH,
                            wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
                            num_iters: int = 300):
    """Full 6-D epsilon metric with NO host C-library dependency
    (device-native replacement for ferrari_canny_l1's qhull facet
    enumeration; reference: quality.py:527-623).

    Same guards as the reference/host path: origin must be in the hull
    (min-norm over all rows <= wrench_norm_thresh) with a full-dimensional
    support (> d-1 active coefficients), else 0. The boundary distance is
    then the exact facet-plane enumeration (_boundary_distance_6d).
    Oracle-tested against the host qhull path (tests/test_quality_extras.py).
    jit/vmap-friendly given a fixed (M, 6) shape; returns a device scalar.
    """
    g6 = jnp.asarray(g6, jnp.float32)
    min_norm_in_hull, coeffs = min_norm_in_simplex(
        g6, num_iters=num_iters, wrench_regularizer=wrench_regularizer)
    in_hull = min_norm_in_hull <= wrench_norm_thresh
    full_rank = jnp.sum(coeffs > 1e-4) > g6.shape[1] - 1
    ok = in_hull & full_rank
    if not isinstance(ok, jax.core.Tracer):
        # eager call (the per-grasp labeling loop's shape): when the hull
        # guards already force 0 — the common case for non-force-closure
        # grasps — skip even DISPATCHING the C(M,6) facet enumeration
        if not bool(ok):
            return jnp.asarray(0.0, jnp.float32)
        return _boundary_distance_6d(g6)
    # traced (jit / scan): lax.cond keeps the skip — a rejected grasp pays
    # only the min-norm QP, not the C(M,6) enumeration. (Under vmap, cond
    # lowers to select and both branches run: batch callers should use
    # ferrari_canny_l1_device_batch, whose lax.map keeps cond a real branch.)
    return jax.lax.cond(
        ok, _boundary_distance_6d,
        lambda g: jnp.asarray(0.0, jnp.float32), g6)


@functools.partial(jax.jit, static_argnames=("num_iters", "group"))
def ferrari_canny_l1_device_batch(
        g6_batch, valid=None,
        wrench_norm_thresh: float = DEFAULT_WRENCH_NORM_THRESH,
        wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
        num_iters: int = 300, group: int = 32):
    """Batched 6-D epsilon metric over (G, M, 6) wrench sets, jit-safe with
    the REAL non-closure skip.

    The grasp axis is processed in GROUPS of ``group`` under ``lax.map``:
    within a group the C(M, 6) facet enumeration runs vmapped — group x
    chunk 6x6 Gauss-Jordan solves share each VPU dispatch — and a
    ``lax.cond`` per group keeps the non-closure skip real (a group with no
    accepted grasp pays only the min-norm hull guard). Grasps are first
    COMPACTED by acceptance (stable argsort on the rejection mask, inverse-
    permuted at the end), so accepted grasps fill whole groups: the groups
    that run are ~n_accepted/group, the rest skip.

    Measured at the bench's shape (137 accepted of 256, M=16, one chip):
    with the round-4 (T, 6, 7)-tensor solver, grouping LOST (group=1
    492 ms vs group=8 591 ms — the enumeration was compute-bound on a
    lane-padded layout, not dispatch-bound as VERDICT r4 conjectured);
    after `_solve_ones_batched`'s structure-of-arrays rewrite the same
    sweep reads 51.4 / 23.7 / 20.0 / 18.8 ms for group 1/4/16/32 — the
    layout fix is worth 9.6-26x and grouping another 2.7x on top. At
    group=32 the min-norm hull guard (14.9 ms for all 256 grasps) is the
    dominant term, not the facet enumeration (~4 ms).

    valid: optional (G,) bool — e.g. close_fingers' found & cone validity.
    Returns (G,) qualities (0 where rejected). Reference hot loop:
    generate-dataset-canny.py:109-133; facet enumeration quality.py:527-623.
    """
    g6_batch = jnp.asarray(g6_batch, jnp.float32)
    g = g6_batch.shape[0]
    if valid is None:
        valid = jnp.ones((g,), bool)
    # hull guards for the WHOLE batch in parallel, SoA layout (grasps on
    # the lane axis): the vmapped per-grasp QP left 16-wide rows in
    # 128-wide lanes and was this function's dominant term (14.9 ms for
    # 256 grasps at the bench shape); the lane-packed batch QP beat it in
    # a same-run A/B and cut the whole batched call roughly in half
    mn, coeffs = min_norm_in_simplex_batch(
        g6_batch, num_iters=num_iters,
        wrench_regularizer=wrench_regularizer)
    ok = (valid & (mn <= wrench_norm_thresh)
          & (jnp.sum(coeffs > 1e-4, axis=1) > g6_batch.shape[2] - 1))

    # compact accepted grasps to the front so they fill whole groups
    order = jnp.argsort(~ok, stable=True)
    unsort = jnp.argsort(order)
    g6_sorted = g6_batch[order]
    ok_sorted = ok[order]

    group = max(1, min(group, g))
    g_pad = -(-g // group) * group
    if g_pad > g:
        g6_sorted = jnp.concatenate(
            [g6_sorted, jnp.zeros((g_pad - g,) + g6_batch.shape[1:],
                                  jnp.float32)])
        ok_sorted = jnp.concatenate(
            [ok_sorted, jnp.zeros((g_pad - g,), bool)])
    g6_groups = g6_sorted.reshape(-1, group, *g6_batch.shape[1:])
    ok_groups = ok_sorted.reshape(-1, group)

    enum_group = jax.vmap(_boundary_distance_6d)

    def one_group(args):
        g6s, oks = args
        return jax.lax.cond(
            jnp.any(oks),
            lambda a: jnp.where(a[1], enum_group(a[0]), 0.0),
            lambda a: jnp.zeros((group,), jnp.float32),
            (g6s, oks))

    eps_sorted = jax.lax.map(one_group, (g6_groups, ok_groups))
    return eps_sorted.reshape(-1)[:g][unsort]


def force_closure_qp(g, wrench_norm_thresh: float = DEFAULT_WRENCH_NORM_THRESH,
                     wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
                     num_iters: int = 300):
    """QP force closure: is 0 in the convex hull of the wrench basis?
    (reference: quality.py:285-320). g: (M, d) wrench rows."""
    min_norm, _ = min_norm_in_simplex(jnp.asarray(g), num_iters=num_iters,
                                      wrench_regularizer=wrench_regularizer)
    return (min_norm < wrench_norm_thresh).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Spectral wrench-space metrics (reference: quality.py:441-525)
# ---------------------------------------------------------------------------

@jax.jit
def min_singular(g):
    """Minimum singular value of the grasp map (quality.py:441-465).
    g: (6, M) or (M, d) wrench basis — uses the 6xM orientation like the
    reference (rows = wrench dims)."""
    g = jnp.asarray(g)
    s = jnp.linalg.svd(g, compute_uv=False)
    return s[-1]


@jax.jit
def wrench_volume(g, k: float = 1.0):
    """Volume of the grasp-map ellipsoid: k * sqrt(prod sigma_i)
    (quality.py:467-495)."""
    s = jnp.linalg.svd(jnp.asarray(g), compute_uv=False)
    return k * jnp.sqrt(jnp.prod(s))


@jax.jit
def grasp_isotropy(g):
    """sigma_min / sigma_max of the grasp map (quality.py:497-525);
    0 when degenerate."""
    s = jnp.linalg.svd(jnp.asarray(g), compute_uv=False)
    ratio = s[-1] / jnp.maximum(s[0], 1e-30)
    return jnp.where(s[0] > 0, ratio, 0.0)


def partial_closure(g_per_finger, target_wrench, force_limit,
                    num_fingers: int, wrench_norm_thresh: float = 1e-3,
                    wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER):
    """Can the contacts resist a specific wrench under per-finger force
    limits? 1/0 (quality.py:322-375). g_per_finger: (M, d) rows grouped by
    finger (M divisible by num_fingers)."""
    ok, _ = wrench_in_positive_span(
        jnp.asarray(g_per_finger), jnp.asarray(target_wrench), force_limit,
        num_fingers=num_fingers, wrench_norm_thresh=wrench_norm_thresh,
        wrench_regularizer=wrench_regularizer)
    return jnp.asarray(ok, jnp.int32)


def wrench_resistance(g_per_finger, target_wrench, force_limit,
                      num_fingers: int, wrench_norm_thresh: float = 1e-3,
                      wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
                      finger_force_eps: float = 1e-9):
    """Inverse-norm of the finger forces needed to resist the target wrench;
    0 when it cannot be resisted (quality.py:377-439)."""
    ok, lam_norm = wrench_in_positive_span(
        jnp.asarray(g_per_finger), jnp.asarray(target_wrench), force_limit,
        num_fingers=num_fingers, wrench_norm_thresh=wrench_norm_thresh,
        wrench_regularizer=wrench_regularizer)
    return jnp.where(ok, 1.0 / jnp.maximum(lam_norm, finger_force_eps), 0.0)


@functools.partial(jax.jit, static_argnames=("num_iters", "num_fingers"))
def wrench_in_positive_span(wrench_basis, target_wrench, force_limit,
                            num_fingers: int = 1,
                            wrench_norm_thresh: float = 1e-4,
                            wrench_regularizer: float = DEFAULT_WRENCH_REGULARIZER,
                            num_iters: int = 400):
    """Can positive combinations of basis wrenches (with per-finger L1 force
    limits) produce the target wrench? (reference: quality.py:725-784).

    wrench_basis: (M, d) rows; solved by projected gradient on the box/L1
    feasible set instead of cvxopt. Returns (resisted: bool, ||lambda||).
    """
    m = wrench_basis.shape[0]
    per = m // num_fingers
    gram = wrench_basis @ wrench_basis.T + wrench_regularizer * jnp.eye(
        m, dtype=wrench_basis.dtype)
    q = -(wrench_basis @ target_wrench)
    lip = 2.0 * jnp.maximum(jnp.trace(gram), 1e-12)
    step = 1.0 / lip

    def project(x):
        # EXACT Euclidean projection onto {x >= 0, per-finger sum <= F}:
        # clip negatives; any finger block still over budget projects onto
        # the scaled simplex {y >= 0, sum y = F} (sorted-threshold algorithm)
        xf = jnp.maximum(x.reshape(num_fingers, per), 0.0)
        s = jnp.sum(xf, axis=1, keepdims=True)

        u = jnp.sort(xf, axis=1)[:, ::-1]
        css = jnp.cumsum(u, axis=1) - force_limit
        idxs = jnp.arange(1, per + 1, dtype=x.dtype)
        cond = u - css / idxs > 0
        rho = jnp.maximum(jnp.sum(cond, axis=1), 1)
        theta = jnp.take_along_axis(
            css, (rho - 1)[:, None].astype(jnp.int32), axis=1) / \
            rho[:, None].astype(x.dtype)
        projected = jnp.maximum(xf - theta, 0.0)
        return jnp.where(s > force_limit, projected, xf).reshape(m)

    x0 = jnp.zeros((m,), wrench_basis.dtype)

    def body(_, carry):
        x, y, t = carry
        grad = 2.0 * (gram @ y) + 2.0 * q
        x_new = project(y - step * grad)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, y_new, t_new

    x, _, _ = jax.lax.fori_loop(0, num_iters, body,
                                (x0, x0, jnp.asarray(1.0, wrench_basis.dtype)))
    residual = wrench_basis.T @ x - target_wrench
    min_dist = jnp.sum(residual * residual)
    return min_dist < wrench_norm_thresh, jnp.linalg.norm(x)

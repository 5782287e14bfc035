"""Batched grasp-quality evaluation: close fingers -> contact wrenches -> metric.

Re-design of the reference's per-grasp quality dispatch (reference:
dex-net/src/dexnet/grasping/quality.py:69-189 ``grasp_quality``) as batched
device programs over G grasps at once: one ``close_fingers`` call, one cone
construction, one metric evaluation — replacing the reference's 50-process
farm around per-grasp host loops (generate-dataset-canny.py:36-40).

Also the friction-ladder boundary labeling from dataset generation
(generate-dataset-canny.py:109-133): each grasp gets the smallest friction in
the (descending) ladder at which it remains force-closure, provided closure
holds contiguously from the top — then Ferrari-Canny at that friction.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sdf as sdf_lib
from . import quality
from .grasp import Contacts, close_fingers


class ContactWrenches(NamedTuple):
    forces: jnp.ndarray    # (G, 2*F, 3) cone edges scaled by normal force
    torques: jnp.ndarray   # (G, 2*F, 3)
    normals: jnp.ndarray   # (G, 2, 3) inward normals scaled by normal force
    valid: jnp.ndarray     # (G,) both contacts' cones computable (no slip)


def contact_wrenches(contacts: Contacts, center_of_mass, friction_coef,
                     num_cone_faces: int = 8) -> ContactWrenches:
    """Per-contact friction cones, torques, normal-force scaling
    (quality.py:117-158 + contacts.py:210-310). Batched over grasps."""

    def one(found, points, normals, in_dirs):
        def per_contact(point, n_out, in_dir):
            in_normal = -n_out
            # slip check (contacts.py:254-266)
            in_dir_hat = in_dir / jnp.linalg.norm(in_dir)
            n_mag = jnp.maximum(jnp.dot(in_dir_hat, in_normal), 0.0)
            _, t1, t2 = quality.tangents_from_direction(in_normal)
            tan_mag = jnp.sqrt(jnp.dot(in_dir_hat, t1) ** 2
                               + jnp.dot(in_dir_hat, t2) ** 2)
            no_slip = friction_coef * n_mag >= tan_mag

            cone = quality.friction_cone(in_normal, friction_coef,
                                         num_cone_faces)       # (F, 3)
            moment_arm = point - center_of_mass                 # (3,)
            torq = quality.torques_from_forces(moment_arm, cone)
            return n_mag * cone, n_mag * torq, n_mag * in_normal, no_slip

        f, t, n, ok = jax.vmap(per_contact)(points, normals, in_dirs)
        return (f.reshape(-1, 3), t.reshape(-1, 3), n,
                found & jnp.all(ok))

    forces, torques, normals, valid = jax.vmap(one)(
        contacts.found, contacts.points, contacts.normals,
        contacts.in_directions)
    return ContactWrenches(forces, torques, normals, valid)


@functools.partial(jax.jit, static_argnames=("num_samples", "check_approach",
                                             "num_cone_faces"))
def evaluate_force_closure(sdf: sdf_lib.SdfGrid, configs, friction_coef,
                           *, num_samples: int = 40,
                           check_approach: bool = False,
                           num_cone_faces: int = 8):
    """Batched force-closure labels: close fingers + the fast 2-contact
    antipodality test (quality.py:108-112,245-283). friction_coef may be a
    scalar or (G,) per-grasp values. Returns (labels (G,) int, contacts)."""
    contacts = close_fingers(sdf, configs, num_samples=num_samples,
                             check_approach=check_approach)
    mu = jnp.broadcast_to(jnp.asarray(friction_coef), configs.shape[:1])
    fc = jax.vmap(
        lambda p, n, m: quality.force_closure(p[0], n[0], p[1], n[1], m)
    )(contacts.points, contacts.normals, mu)
    return jnp.where(contacts.found, fc, 0), contacts


@functools.partial(jax.jit, static_argnames=("num_samples", "check_approach",
                                             "num_cone_faces"))
def evaluate_ferrari_canny(sdf: sdf_lib.SdfGrid, configs, center_of_mass,
                           friction_coef, *, num_samples: int = 40,
                           check_approach: bool = False,
                           num_cone_faces: int = 8,
                           torque_scaling: float = 1.0):
    """Batched Ferrari-Canny force-only labels (the dataset metric,
    quality.py:626-723 with config.yaml's ferrari_canny_L1_force_only).
    friction_coef scalar or (G,). Returns (qualities (G,), contacts)."""
    contacts = close_fingers(sdf, configs, num_samples=num_samples,
                             check_approach=check_approach)
    mu = jnp.broadcast_to(jnp.asarray(friction_coef), configs.shape[:1])

    def one(found, points, normals, in_dirs, m):
        cw = contact_wrenches(
            Contacts(found[None], points[None], normals[None], in_dirs[None]),
            center_of_mass, m, num_cone_faces)
        eps = quality.ferrari_canny_l1_force_only(cw.forces[0])
        return jnp.where(found & cw.valid[0], eps, 0.0)

    quals = jax.vmap(one)(contacts.found, contacts.points, contacts.normals,
                          contacts.in_directions, mu)
    return quals, contacts


@functools.partial(jax.jit, static_argnames=("num_samples", "check_approach",
                                             "num_cone_faces"))
def evaluate_ferrari_canny_6d(sdf: sdf_lib.SdfGrid, configs, center_of_mass,
                              friction_coef, *, num_samples: int = 40,
                              check_approach: bool = False,
                              num_cone_faces: int = 8,
                              torque_scaling: float = 1.0):
    """Batched FULL 6-D Ferrari-Canny labels (force + scaled torque rows,
    the reference's ferrari_canny_L1 with the quasi-static wrench basis —
    quality.py:527-623 via grasp_matrix :191-243), entirely on device.

    The per-grasp epsilon runs through ``ferrari_canny_l1_device_batch``:
    grasps rejected by the hull guards (non-force-closure) skip the C(M,6)
    facet enumeration even under jit — cost shape identical to the eager
    loop. friction_coef scalar or (G,). Returns (qualities (G,), contacts).
    """
    contacts = close_fingers(sdf, configs, num_samples=num_samples,
                             check_approach=check_approach)
    mu = jnp.broadcast_to(jnp.asarray(friction_coef), configs.shape[:1])

    def one(found, points, normals, in_dirs, m):
        cw = contact_wrenches(
            Contacts(found[None], points[None], normals[None], in_dirs[None]),
            center_of_mass, m, num_cone_faces)
        g6 = jnp.concatenate(
            [cw.forces[0], torque_scaling * cw.torques[0]], axis=1)  # (M, 6)
        return g6, found & cw.valid[0]

    g6_all, valid = jax.vmap(one)(contacts.found, contacts.points,
                                  contacts.normals, contacts.in_directions,
                                  mu)
    quals = quality.ferrari_canny_l1_device_batch(g6_all, valid)
    return quals, contacts


@functools.partial(jax.jit, static_argnames=("num_samples", "n_fc"))
def friction_boundary_labels(sdf: sdf_lib.SdfGrid, configs, fc_list,
                             *, num_samples: int = 40, n_fc: int = 3):
    """The dataset-generation friction ladder (generate-dataset-canny.py:109-133).

    fc_list: (n_fc,) DESCENDING friction values (e.g. [2.0, 1.6, 0.6]).
    A grasp is labeled with fc_list[k] where k is the last index of the
    contiguous run of force-closure successes starting at index 0; grasps
    not force-closure at fc_list[0] are invalid (skipped by the reference).

    Returns (label_fc (G,), label_idx (G,) int, valid (G,)).
    """
    contacts = close_fingers(sdf, configs, num_samples=num_samples,
                             check_approach=False)

    def fc_at(mu):
        return jax.vmap(
            lambda p, n: quality.force_closure(p[0], n[0], p[1], n[1], mu)
        )(contacts.points, contacts.normals)

    flags = jax.vmap(fc_at)(fc_list).T                    # (G, n_fc)
    flags = flags * contacts.found[:, None].astype(flags.dtype)
    prefix = jnp.cumprod(flags, axis=1)                   # contiguous run
    label_idx = jnp.sum(prefix, axis=1).astype(jnp.int32) - 1
    valid = label_idx >= 0
    label_fc = fc_list[jnp.clip(label_idx, 0, n_fc - 1)]
    return jnp.where(valid, label_fc, 0.0), label_idx, valid


# reference ladders (generate-dataset-canny.py:88-95)
FC_LIST_LESS_CLASS = np.round(np.array([2.0, 1.6, 0.6]), 2)
FC_LIST_FULL = np.round(
    np.concatenate([np.arange(2.0, 0.75, -0.4), np.arange(0.5, 0.36, -0.05)]), 2)

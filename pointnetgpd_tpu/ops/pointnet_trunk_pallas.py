"""Pallas TPU kernel: fused PointNet trunk (shared MLP + max-pool).

The inference hot loop is the per-point shared MLP
(3 -> 64 -> 128 -> 1024, each 1x1 conv + BN + ReLU) followed by the
symmetric max over the point axis (reference: PointNetGPD/model/pointnet.py:144-149).
XLA already fuses this well; the Pallas version goes further for the
inference path:

- eval-mode BatchNorm is FOLDED into the matmul weights on the host
  (W' = W * gamma / sqrt(var + eps), b' = (b - mean) * gamma / ... + beta),
  so the kernel is three matmuls + two ReLUs + one max;
- per-sample intermediates ((N, 64), (N, 128), (N, 1024)) live entirely in
  VMEM — the (B, N, 1024) activation never materializes in HBM, which is the
  SURVEY's stated goal for the point axis (SURVEY.md §5 long-context note);
- the grid walks the batch, one sample per program, weights resident.

Training keeps the autodiffable jnp path; this kernel serves batched
inference. Numerics match the unfused eval forward to fp32 tolerance
(tests/test_pallas_trunk.py, interpret mode on CPU + real TPU when available).

STATUS: documented negative result — NOT wired into any product path.
Measured on one v5e chip at the scorer's shapes (B=512, N=750),
fetch-bounded (round-3 re-measurement; the numbers previously here were
round-1 dispatch-only artifacts): XLA 1.92 ms, this kernel 2.92 ms,
outputs bit-identical. The trunk is NOT HBM-bound at these sizes — a bf16
variant of the XLA path measures the same 1.9 ms, i.e. the wall is the
~54 TFLOP/s pace of K<=128-contraction matmuls, which a VMEM-resident
schedule cannot raise (it only removes bandwidth that wasn't the
bottleneck, and its per-sample grid serializes what XLA overlaps). The
jnp path is the product default; this file stays as the measured
refutation + the fold_bn/fold_trunk_params helpers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on CPU; interpret mode still works)
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def fold_bn(w, b, scale, bias, mean, var, eps: float = 1e-5):
    """Fold eval-mode BN into a linear layer: y = (x@W.T + b) -> BN."""
    gamma = scale / jnp.sqrt(var + eps)
    return w * gamma[:, None], (b - mean) * gamma + bias


def fold_trunk_params(params, state):
    """PointNetfeat trunk params/state -> folded (w1,b1,w2,b2,w3,b3),
    transposed to (in, out) for row-major matmuls in the kernel."""
    f, s = params, state
    w1, b1 = fold_bn(f["conv1"]["w"], f["conv1"]["b"], f["bn1"]["scale"],
                     f["bn1"]["bias"], s["bn1"]["mean"], s["bn1"]["var"])
    w2, b2 = fold_bn(f["conv2"]["w"], f["conv2"]["b"], f["bn2"]["scale"],
                     f["bn2"]["bias"], s["bn2"]["mean"], s["bn2"]["var"])
    w3, b3 = fold_bn(f["conv3"]["w"], f["conv3"]["b"], f["bn3"]["scale"],
                     f["bn3"]["bias"], s["bn3"]["mean"], s["bn3"]["var"])
    return (w1.T, b1, w2.T, b2, w3.T, b3)


def _trunk_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  out_ref):
    """One sample per program: (N, C) points -> (1, 1024) max-pooled feature.

    The output block is (1, 1, 1024) — a full (1, 1024) trailing tile — so
    the kernel lowers on real TPU hardware (the Mosaic tiling rule wants the
    last two block dims divisible by (8, 128) or equal to the array dims)."""
    x = x_ref[0]  # (N, C_in_padded)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    h = jnp.maximum(h, 0.0)
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    # no relu before the pool (ref :147)
    out_ref[0, 0] = jnp.max(h, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_trunk(x, folded, *, interpret: bool = False):
    """x: (B, N, C) post-STN points; folded: fold_trunk_params output.
    Returns (B, 1024) global features. Pads C to the lane-friendly 8."""
    w1, b1, w2, b2, w3, b3 = folded
    b, n, c = x.shape
    c_pad = 8
    if c < c_pad:
        x = jnp.concatenate(
            [x, jnp.zeros((b, n, c_pad - c), x.dtype)], axis=-1)
        w1 = jnp.concatenate(
            [w1, jnp.zeros((c_pad - c, w1.shape[1]), w1.dtype)], axis=0)

    if _VMEM is not None and not interpret:
        spec = lambda shape, imap=None: pl.BlockSpec(
            shape, imap, memory_space=_VMEM)
    else:
        spec = lambda shape, imap=None: pl.BlockSpec(shape, imap)

    out = pl.pallas_call(
        _trunk_kernel,
        grid=(b,),
        in_specs=[
            spec((1, n, c_pad), lambda i: (i, 0, 0)),
            spec(w1.shape, lambda i: (0, 0)),
            spec(b1.shape, lambda i: (0,)),
            spec(w2.shape, lambda i: (0, 0)),
            spec(b2.shape, lambda i: (0,)),
            spec(w3.shape, lambda i: (0, 0)),
            spec(b3.shape, lambda i: (0,)),
        ],
        out_specs=spec((1, 1, 1024), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, 1024), jnp.float32),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
    return out[:, 0]


def trunk_reference(x, folded):
    """Unfused jnp reference for the same folded computation."""
    w1, b1, w2, b2, w3, b3 = folded
    h = jnp.maximum(x @ w1 + b1, 0.0)
    h = jnp.maximum(h @ w2 + b2, 0.0)
    h = h @ w3 + b3
    return jnp.max(h, axis=1)

"""PointNet grasp-quality classifier family, pure-functional JAX.

Re-design of the reference model family (reference: PointNetGPD/model/pointnet.py:8-221)
for TPU: channels-last activations so every 1x1 Conv1d becomes one MXU matmul,
``max`` over the point axis for the symmetric aggregation (== MaxPool1d(N)),
and explicit param/state pytrees whose nesting mirrors the torch module tree so
the reference's pickled checkpoints convert by key-mapping
(see pointnetgpd_tpu/models/convert.py).

Models:
- ``PointNetCls``      — STN3d input transform + shared MLP (3->64->128->1024)
                         + max-pool + FC head (1024->512->256->k), log_softmax.
                         (ref: pointnet.py:177-194)
- ``DualPointNetCls``  — two SimpleSTN3d on channels 0:3 / 3:6, concat, same trunk.
                         (ref: pointnet.py:157-174)
- ``PointNetDenseCls`` — per-point segmentation head on [global|point] features.
                         (ref: pointnet.py:197-221)

All ``apply`` functions take ``x`` with shape ``(B, N, C)`` (channels-last;
use ``jnp.swapaxes(x, 1, 2)`` to adapt the reference's ``(B, C, N)``) and
return ``((log_probs, trans), new_state)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fused_maxpool import linear_bn_max
from .layers import batchnorm, init_batchnorm, init_linear, linear, linear_bn_relu

# ---------------------------------------------------------------------------
# Spatial transformer networks (STN)
# ---------------------------------------------------------------------------

# (conv widths, fc widths) — STN3d vs SimpleSTN3d (ref: pointnet.py:8-45, 48-85)
_STN_DIMS = {
    "stn3d": ((64, 128, 1024), (512, 256)),
    "simple": ((64, 128, 256), (128, 64)),
}


def init_stn(key, input_chann: int = 3, kind: str = "stn3d", dtype=jnp.float32):
    conv_dims, fc_dims = _STN_DIMS[kind]
    keys = jax.random.split(key, 6)
    p, s = {}, {}
    c_in = input_chann
    for i, c_out in enumerate(conv_dims, start=1):
        p[f"conv{i}"] = init_linear(keys[i - 1], c_in, c_out, dtype)
        p[f"bn{i}"], s[f"bn{i}"] = init_batchnorm(c_out, dtype)
        c_in = c_out
    f_in = conv_dims[-1]
    for i, f_out in enumerate(fc_dims, start=1):
        p[f"fc{i}"] = init_linear(keys[2 + i], f_in, f_out, dtype)
        p[f"bn{i + 3}"], s[f"bn{i + 3}"] = init_batchnorm(f_out, dtype)
        f_in = f_out
    p["fc3"] = init_linear(keys[5], f_in, 9, dtype)
    return p, s


def apply_stn(p, s, x, *, train: bool, fused_maxpool: bool = False):
    """x: (B, N, C) -> (B, 3, 3) transform = fc(x) + I. (ref: pointnet.py:27-45)

    ``fused_maxpool`` (train only): conv3 -> bn3 -> relu -> max runs as the
    streamed no-(B,N,C) op (models/fused_maxpool.py). relu and max commute
    (both monotone), so relu applies to the pooled (B, C) instead."""
    ns = {}
    h = x
    for i in (1, 2):
        h = linear_bn_relu(p, s, f"conv{i}", f"bn{i}", h, train=train, new_state=ns)
    h = jax.nn.relu(linear_bn_max(p, s, "conv3", "bn3", h, train=train,
                                  new_state=ns, fused=fused_maxpool))
    # symmetric aggregation == MaxPool1d(N), fused into the line above
    h = linear_bn_relu(p, s, "fc1", "bn4", h, train=train, new_state=ns)
    h = linear_bn_relu(p, s, "fc2", "bn5", h, train=train, new_state=ns)
    h = linear(p["fc3"], h)
    trans = h.reshape(-1, 3, 3) + jnp.eye(3, dtype=h.dtype)
    return trans, ns


# ---------------------------------------------------------------------------
# Feature trunks
# ---------------------------------------------------------------------------

def init_pointnet_feat(key, input_chann: int = 3, dtype=jnp.float32):
    k_stn, k1, k2, k3 = jax.random.split(key, 4)
    p, s = {}, {}
    p["stn"], s["stn"] = init_stn(k_stn, input_chann, "stn3d", dtype)
    for i, (c_in, c_out, k) in enumerate(
        [(input_chann, 64, k1), (64, 128, k2), (128, 1024, k3)], start=1
    ):
        p[f"conv{i}"] = init_linear(k, c_in, c_out, dtype)
        p[f"bn{i}"], s[f"bn{i}"] = init_batchnorm(c_out, dtype)
    return p, s


def apply_pointnet_feat(p, s, x, *, train: bool, global_feat: bool = True,
                        fused_maxpool: bool = False):
    """(ref: pointnet.py:137-154). x: (B, N, C) -> (global_1024[, pointfeat]), trans."""
    ns = {}
    trans, ns["stn"] = apply_stn(p["stn"], s["stn"], x, train=train,
                                 fused_maxpool=fused_maxpool and global_feat)
    x = jnp.matmul(x, trans, preferred_element_type=x.dtype)  # == bmm(x, trans)
    x = linear_bn_relu(p, s, "conv1", "bn1", x, train=train, new_state=ns)
    pointfeat = x
    x = linear_bn_relu(p, s, "conv2", "bn2", x, train=train, new_state=ns)
    if global_feat:
        # conv3 -> bn3 -> max (NO relu, ref :147) as one streamed op when
        # fused_maxpool (models/fused_maxpool.py); unfused otherwise
        x = linear_bn_max(p, s, "conv3", "bn3", x, train=train,
                          new_state=ns, fused=fused_maxpool)
        return (x, trans), ns
    x = linear(p["conv3"], x)
    x, ns["bn3"] = batchnorm(p["bn3"], s["bn3"], x, train=train)  # NOTE: no relu (ref :147)
    x = jnp.max(x, axis=1)  # (B, 1024)
    g = jnp.broadcast_to(x[:, None, :], (x.shape[0], pointfeat.shape[1], x.shape[1]))
    return (jnp.concatenate([g, pointfeat], axis=-1), trans), ns


def init_dual_pointnet_feat(key, input_chann: int = 6, dtype=jnp.float32):
    k_stn1, k_stn2, k1, k2, k3 = jax.random.split(key, 5)
    p, s = {}, {}
    p["stn1"], s["stn1"] = init_stn(k_stn1, input_chann // 2, "simple", dtype)
    p["stn2"], s["stn2"] = init_stn(k_stn2, input_chann // 2, "simple", dtype)
    for i, (c_in, c_out, k) in enumerate(
        [(input_chann, 64, k1), (64, 128, k2), (128, 1024, k3)], start=1
    ):
        p[f"conv{i}"] = init_linear(k, c_in, c_out, dtype)
        p[f"bn{i}"], s[f"bn{i}"] = init_batchnorm(c_out, dtype)
    return p, s


def apply_dual_pointnet_feat(p, s, x, *, train: bool,
                             fused_maxpool: bool = False):
    """(ref: pointnet.py:103-120). x: (B, N, 6); STNs act on xyz halves separately."""
    ns = {}
    trans1, ns["stn1"] = apply_stn(p["stn1"], s["stn1"], x[..., 0:3],
                                   train=train, fused_maxpool=fused_maxpool)
    trans2, ns["stn2"] = apply_stn(p["stn2"], s["stn2"], x[..., 3:6],
                                   train=train, fused_maxpool=fused_maxpool)
    x = jnp.concatenate(
        [
            jnp.matmul(x[..., 0:3], trans1, preferred_element_type=x.dtype),
            jnp.matmul(x[..., 3:6], trans2, preferred_element_type=x.dtype),
        ],
        axis=-1,
    )
    x = linear_bn_relu(p, s, "conv1", "bn1", x, train=train, new_state=ns)
    x = linear_bn_relu(p, s, "conv2", "bn2", x, train=train, new_state=ns)
    x = linear_bn_max(p, s, "conv3", "bn3", x, train=train, new_state=ns,
                      fused=fused_maxpool)
    return (x, trans1 + trans2), ns


# ---------------------------------------------------------------------------
# Classifier heads
# ---------------------------------------------------------------------------

def init_pointnet_cls(key, input_chann: int = 3, k: int = 2, *, dual: bool = False,
                      dtype=jnp.float32):
    k_feat, k1, k2, k3 = jax.random.split(key, 4)
    p, s = {}, {}
    if dual:
        p["feat"], s["feat"] = init_dual_pointnet_feat(k_feat, input_chann, dtype)
    else:
        p["feat"], s["feat"] = init_pointnet_feat(k_feat, input_chann, dtype)
    p["fc1"] = init_linear(k1, 1024, 512, dtype)
    p["fc2"] = init_linear(k2, 512, 256, dtype)
    p["fc3"] = init_linear(k3, 256, k, dtype)
    p["bn1"], s["bn1"] = init_batchnorm(512, dtype)
    p["bn2"], s["bn2"] = init_batchnorm(256, dtype)
    return p, s


def apply_pointnet_cls(p, s, x, *, train: bool = False, dual: bool = False,
                       fused_maxpool: bool = False):
    """(ref: pointnet.py:189-194 / 169-174). Returns ((log_probs, trans), new_state).

    ``fused_maxpool``: run the train-mode conv3->BN->max stages through the
    streamed custom-VJP op (models/fused_maxpool.py) — no (B, N, 1024)
    activation in forward OR backward. Inference (train=False) ignores it."""
    ns = {}
    if dual:
        (feat, trans), ns["feat"] = apply_dual_pointnet_feat(
            p["feat"], s["feat"], x, train=train, fused_maxpool=fused_maxpool)
    else:
        (feat, trans), ns["feat"] = apply_pointnet_feat(
            p["feat"], s["feat"], x, train=train, fused_maxpool=fused_maxpool)
    h = linear_bn_relu(p, s, "fc1", "bn1", feat, train=train, new_state=ns)
    h = linear_bn_relu(p, s, "fc2", "bn2", h, train=train, new_state=ns)
    h = linear(p["fc3"], h)
    return (jax.nn.log_softmax(h, axis=-1), trans), ns


def init_pointnet_dense_cls(key, input_chann: int = 3, k: int = 2, dtype=jnp.float32):
    k_feat, k1, k2, k3, k4 = jax.random.split(key, 5)
    p, s = {}, {}
    p["feat"], s["feat"] = init_pointnet_feat(k_feat, input_chann, dtype)
    for i, (c_in, c_out, kk) in enumerate(
        [(1088, 512, k1), (512, 256, k2), (256, 128, k3)], start=1
    ):
        p[f"conv{i}"] = init_linear(kk, c_in, c_out, dtype)
        p[f"bn{i}"], s[f"bn{i}"] = init_batchnorm(c_out, dtype)
    p["conv4"] = init_linear(k4, 128, k, dtype)
    return p, s


def apply_pointnet_dense_cls(p, s, x, *, train: bool = False):
    """(ref: pointnet.py:211-221). Per-point log-probs (B, N, k)."""
    ns = {}
    (h, trans), ns["feat"] = apply_pointnet_feat(
        p["feat"], s["feat"], x, train=train, global_feat=False
    )
    for i in (1, 2, 3):
        h = linear_bn_relu(p, s, f"conv{i}", f"bn{i}", h, train=train, new_state=ns)
    h = linear(p["conv4"], h)
    return (jax.nn.log_softmax(h, axis=-1), trans), ns


# ---------------------------------------------------------------------------
# Convenience: jitted eval-mode forward
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("dual",))
def pointnet_cls_infer(params, state, x, *, dual: bool = False):
    """Eval-mode forward: x (B, N, C) -> (log_probs (B, k), trans (B, 3, 3))."""
    (logp, trans), _ = apply_pointnet_cls(params, state, x, train=False, dual=dual)
    return logp, trans

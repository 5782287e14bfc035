"""Functional NN building blocks with PyTorch-compatible semantics.

The reference model family (reference: PointNetGPD/model/pointnet.py) is built
from three primitives: 1x1 Conv1d (== a per-point linear layer), Linear, and
BatchNorm1d. We implement them as pure functions over explicit param/state
pytrees so that (a) converting the reference's pickled torch checkpoints is a
mechanical key-mapping, and (b) everything composes with jit/vmap/pjit and
custom shardings without a module framework in the way.

Layout convention: activations are channels-LAST — ``(B, N, C)`` for point
clouds and ``(B, C)`` for vectors. The reference uses torch's channels-first
``(B, C, N)``; channels-last maps 1x1 convs straight onto MXU matmuls with no
transposes inside the network.

Parity notes (verified against torch in tests/test_model_parity.py):
- BatchNorm eps=1e-5, momentum=0.1; normalization uses the *biased* batch
  variance while the running-var update uses the *unbiased* one (n/(n-1)),
  matching torch.nn.BatchNorm1d.
- Initializers follow torch's kaiming-uniform(a=sqrt(5)) default for
  Conv1d/Linear: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def init_linear(key, in_features: int, out_features: int, dtype=jnp.float32):
    """Torch-default init for Linear / 1x1-Conv1d: U(+-1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_features ** 0.5)
    return {
        # weight stored (out, in), same as torch, so converters are copies.
        "w": jax.random.uniform(kw, (out_features, in_features), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
    }


def init_batchnorm(num_features: int, dtype=jnp.float32):
    params = {
        "scale": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return params, state


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(p, x):
    """x: (..., Cin) -> (..., Cout). Runs on the MXU for large leading dims."""
    return jnp.matmul(x, p["w"].T, preferred_element_type=x.dtype) + p["b"]


def batchnorm(p, s, x, *, train: bool):
    """BatchNorm over all axes but the last (channel) axis.

    For ``(B, N, C)`` this reduces over (B, N) — identical to torch
    BatchNorm1d on ``(B, C, N)``. For ``(B, C)`` it reduces over B.

    Returns ``(y, new_state)``; ``new_state is s`` when ``train=False``.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        # stats accumulate in AT LEAST f32 (bit-identical for f32/f64
        # inputs; for the bf16 mixed-precision train path a bf16 reduction
        # over ~1e5 elements would lose the mean entirely). The casts fuse
        # into the reduces — no extra materialization.
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased, normalizes
        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + BN_EPS).astype(x.dtype)
        n = 1
        for a in axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_s = {
            "mean": (1.0 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM
            * mean.astype(s["mean"].dtype),
            "var": (1.0 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM
            * unbiased.astype(s["var"].dtype),
        }
        return y * p["scale"] + p["bias"], new_s
    y = (x - s["mean"].astype(x.dtype)) * jax.lax.rsqrt(
        s["var"] + BN_EPS).astype(x.dtype)
    return y * p["scale"] + p["bias"], s


def linear_bn_relu(p, s, name: str, bn_name: str, x, *, train: bool, new_state: dict):
    """Fused-by-XLA linear -> batchnorm -> relu step, threading BN state."""
    y = linear(p[name], x)
    y, ns = batchnorm(p[bn_name], s[bn_name], y, train=train)
    new_state[bn_name] = ns
    return jax.nn.relu(y)

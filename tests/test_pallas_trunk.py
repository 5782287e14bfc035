"""Pallas fused-trunk kernel: numerics vs the unfused eval forward
(interpret mode on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.models.layers import batchnorm, linear
from pointnetgpd_tpu.models.pointnet import init_pointnet_feat
from pointnetgpd_tpu.ops.pointnet_trunk_pallas import (
    fold_bn,
    fold_trunk_params,
    fused_trunk,
    trunk_reference,
)


def _unfused_trunk(params, state, x):
    """The model's own eval-mode trunk (post-STN part of
    apply_pointnet_feat): conv1-bn-relu, conv2-bn-relu, conv3-bn, max."""
    h, _ = batchnorm(params["bn1"], state["bn1"], linear(params["conv1"], x),
                     train=False)
    h = jax.nn.relu(h)
    h, _ = batchnorm(params["bn2"], state["bn2"], linear(params["conv2"], h),
                     train=False)
    h = jax.nn.relu(h)
    h, _ = batchnorm(params["bn3"], state["bn3"], linear(params["conv3"], h),
                     train=False)
    return jnp.max(h, axis=1)


def test_bn_folding_matches_unfused():
    rng = np.random.RandomState(0)
    params, state = init_pointnet_feat(jax.random.PRNGKey(0), input_chann=3)
    # randomize BN stats so folding is non-trivial
    for bn in ("bn1", "bn2", "bn3"):
        n = state[bn]["mean"].shape[0]
        state[bn] = {"mean": jnp.asarray(rng.randn(n), jnp.float32) * 0.1,
                     "var": jnp.asarray(rng.rand(n) + 0.5, jnp.float32)}
        params[bn] = {"scale": jnp.asarray(rng.rand(n) + 0.5, jnp.float32),
                      "bias": jnp.asarray(rng.randn(n), jnp.float32) * 0.1}

    x = jnp.asarray(rng.randn(4, 128, 3).astype(np.float32))
    folded = fold_trunk_params(params, state)
    ref = _unfused_trunk(params, state, x)
    out = trunk_reference(x, folded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_kernel_matches_reference_interpret():
    rng = np.random.RandomState(1)
    params, state = init_pointnet_feat(jax.random.PRNGKey(1), input_chann=3)
    folded = fold_trunk_params(params, state)
    x = jnp.asarray(rng.randn(8, 256, 3).astype(np.float32))
    out = fused_trunk(x, folded, interpret=True)
    ref = trunk_reference(x, folded)
    assert out.shape == (8, 1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fold_bn_identity():
    """Folding identity BN leaves the layer unchanged."""
    w = jnp.asarray(np.random.RandomState(2).randn(8, 4), jnp.float32)
    b = jnp.zeros((8,))
    w2, b2 = fold_bn(w, b, jnp.ones(8), jnp.zeros(8), jnp.zeros(8),
                     jnp.ones(8) - 1e-5)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), 0.0, atol=1e-6)

"""Fused linear->BatchNorm(train)->max (models/fused_maxpool.py) must be a
drop-in for the unfused composition: same outputs, same BN statistics, same
gradients — while never materializing the (B, N, C) activation (the train
step's HBM wall, docs/SCALING.md roofline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnetgpd_tpu.models.fused_maxpool import matmul_bn_max
from pointnetgpd_tpu.models.layers import batchnorm, linear


def _unfused(x, w, b, gamma, beta):
    h = linear({"w": w, "b": b}, x)
    y, ns = batchnorm({"scale": gamma, "bias": beta},
                      {"mean": jnp.zeros(w.shape[0]),
                       "var": jnp.ones(w.shape[0])}, h, train=True)
    return jnp.max(y, axis=1), ns


def _rand(key, bsz=4, n=333, f=16, c=24, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x = jax.random.normal(k1, (bsz, n, f), dtype) * 2.0 + 0.7
    w = jax.random.normal(k2, (c, f), dtype) * 0.3
    b = jax.random.normal(k3, (c,), dtype)
    # mixed-sign gamma: negative channels exercise the min/argmin path
    gamma = jax.random.normal(k4, (c,), dtype) + 0.2
    beta = jax.random.normal(k5, (c,), dtype)
    return x, w, b, gamma, beta


class TestForward:
    @pytest.mark.parametrize("n", [333, 128, 256, 64])
    def test_matches_unfused(self, n):
        x, w, b, gamma, beta = _rand(jax.random.PRNGKey(0), n=n)
        m, mean, var = matmul_bn_max(x, w, b, gamma, beta)
        m_ref, _ = _unfused(x, w, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-5)
        # stats match the unfused batchnorm's batch statistics
        h = linear({"w": w, "b": b}, x)
        np.testing.assert_allclose(np.asarray(mean),
                                   np.asarray(jnp.mean(h, axis=(0, 1))),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(var),
            np.asarray(jnp.mean(
                jnp.square(h - jnp.mean(h, axis=(0, 1))), axis=(0, 1))),
            rtol=1e-4, atol=1e-6)

    def test_negative_gamma_uses_min(self):
        """A strongly negative gamma flips the affine map: the pooled value
        must come from the MINIMUM of h, not the maximum."""
        x, w, b, _, beta = _rand(jax.random.PRNGKey(1))
        gamma = -jnp.ones((w.shape[0],))
        m, _, _ = matmul_bn_max(x, w, b, gamma, beta)
        m_ref, _ = _unfused(x, w, b, gamma, beta)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   rtol=1e-5, atol=1e-5)


class TestGradients:
    def test_matches_unfused_grads(self):
        x, w, b, gamma, beta = _rand(jax.random.PRNGKey(2))
        cot = jax.random.normal(jax.random.PRNGKey(3),
                                (x.shape[0], w.shape[0]))

        def loss_fused(x, w, b, gamma, beta):
            m, _, _ = matmul_bn_max(x, w, b, gamma, beta)
            return jnp.sum(m * cot)

        def loss_ref(x, w, b, gamma, beta):
            m, _ = _unfused(x, w, b, gamma, beta)
            return jnp.sum(m * cot)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma,
                                                           beta)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, gamma,
                                                         beta)
        names = ["x", "w", "b", "gamma", "beta"]
        for name, a_, b_ in zip(names, gf, gr):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch: {name}")

    def test_conv_bias_grad_is_exactly_zero(self):
        """BatchNorm absorbs the conv bias: dL/db == 0 analytically (the
        fused backward returns literal zeros; the unfused autodiff returns
        numerical ~0)."""
        x, w, b, gamma, beta = _rand(jax.random.PRNGKey(4))

        def loss(b):
            m, _, _ = matmul_bn_max(x, w, b, gamma, beta)
            return jnp.sum(m ** 2)

        assert float(jnp.max(jnp.abs(jax.grad(loss)(b)))) == 0.0


class TestModelIntegration:
    def _setup(self, key, dtype=jnp.float32):
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls

        params, state = init_pointnet_cls(key, input_chann=3, k=3)
        x = jax.random.normal(jax.random.PRNGKey(9), (6, 200, 3)) * 0.05
        labels = jnp.asarray([0, 1, 2, 1, 0, 2])
        return params, state, x.astype(dtype), labels

    def test_full_model_forward_and_grads_match(self):
        from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls

        params, state, x, labels = self._setup(jax.random.PRNGKey(5))

        def loss(params, fused):
            (logp, _), ns = apply_pointnet_cls(params, state, x, train=True,
                                               fused_maxpool=fused)
            return -jnp.mean(logp[jnp.arange(len(labels)), labels]), ns

        (l1, ns1), g1 = jax.value_and_grad(
            lambda p: loss(p, True), has_aux=True)(params)
        (l0, ns0), g0 = jax.value_and_grad(
            lambda p: loss(p, False), has_aux=True)(params)
        assert abs(float(l1) - float(l0)) < 1e-5
        for (k1, a_), (k0, b_) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g0)):
            np.testing.assert_allclose(
                np.asarray(a_), np.asarray(b_), rtol=5e-3, atol=5e-5,
                err_msg=f"param grad mismatch at {jax.tree_util.keystr(k1)}")
        # BN running-state updates identical
        for a_, b_ in zip(jax.tree_util.tree_leaves(ns1),
                          jax.tree_util.tree_leaves(ns0)):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=1e-5, atol=1e-6)

    def test_fused_train_step_learns(self):
        import optax

        from pointnetgpd_tpu.training.data import SyntheticGraspData
        from pointnetgpd_tpu.training.train import (
            init_train_state, make_fused_train_step,
        )
        from pointnetgpd_tpu.models.pointnet import init_pointnet_cls

        params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3,
                                       k=2)
        tx = optax.adam(3e-3)
        state = init_train_state(params, bn, tx)
        step = make_fused_train_step(tx, num_points=64, min_point_limit=5,
                                     fused_maxpool=True)
        data = SyntheticGraspData(batch_size=16, cloud_points=512)
        g, c, t, l, w = data.next_batch()
        losses = []
        for i in range(8):
            state, m = step(state, g, c, t, l, w, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_bf16_compute_path_runs(self):
        from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls

        params, state, x, labels = self._setup(jax.random.PRNGKey(6),
                                               dtype=jnp.bfloat16)
        p16 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)
        (logp, _), _ = apply_pointnet_cls(p16, state, x, train=True,
                                          fused_maxpool=True)
        assert np.isfinite(np.asarray(logp, np.float32)).all()

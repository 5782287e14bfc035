"""Tensor-parallel (dp x mp) layout: sharded forward == replicated forward."""

import numpy as np
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls, init_pointnet_cls
from pointnetgpd_tpu.parallel.tp import (
    batch_sharding_2d,
    make_2d_mesh,
    shard_params_tp,
    tp_param_shardings,
)


def test_tp_shardings_target_the_wide_layers():
    params, _ = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)
    mesh = make_2d_mesh(8, mp=2)
    shardings = tp_param_shardings(params, mesh)
    assert "mp" in str(shardings["feat"]["conv3"]["w"].spec)
    assert "mp" in str(shardings["fc1"]["w"].spec)
    assert str(shardings["fc3"]["w"].spec) == "PartitionSpec()"


def test_tp_forward_matches_replicated():
    assert jax.device_count() == 8
    mesh = make_2d_mesh(8, mp=2)
    params, state = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3,
                                      k=3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 3).astype(np.float32))

    (ref_logp, ref_trans), _ = apply_pointnet_cls(params, state, x,
                                                  train=False)

    p_tp, s_tp = shard_params_tp(params, state, mesh)
    x_sh = jax.device_put(x, batch_sharding_2d(mesh))

    @jax.jit
    def fwd(p, s, x):
        (logp, trans), _ = apply_pointnet_cls(p, s, x, train=False)
        return logp, trans

    logp, trans = fwd(p_tp, s_tp, x_sh)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(ref_logp),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(trans), np.asarray(ref_trans),
                               atol=2e-5)


def test_tp_train_step_runs():
    """Fused train step under the 2-D mesh: batch dp-sharded, the Megatron
    pair mp-sharded; one step executes and stays finite."""
    from pointnetgpd_tpu.training.data import SyntheticGraspData
    from pointnetgpd_tpu.training.train import (
        init_train_state,
        make_fused_train_step,
        make_optimizer,
    )

    mesh = make_2d_mesh(8, mp=2)
    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=2)
    p_tp, s_tp = shard_params_tp(params, bn, mesh)
    tx = make_optimizer(0.005)
    state = init_train_state(p_tp, s_tp, tx)
    step = make_fused_train_step(tx, num_points=32, min_point_limit=5)

    data = SyntheticGraspData(batch_size=16, cloud_points=256)
    grasps, clouds, transforms, labels, weights = data.next_batch()
    sharding = batch_sharding_2d(mesh)
    args = [jax.device_put(a, sharding)
            for a in (grasps, clouds, transforms, labels, weights)]
    new_state, metrics = step(state, *args, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

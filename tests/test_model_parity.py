"""Bit-accuracy (fp32 tolerance) parity of the JAX model family vs the
reference PyTorch definitions (reference: PointNetGPD/model/pointnet.py, gpd.py).

The pretrained checkpoint blobs are absent from the reference snapshot
(.MISSING_LARGE_BLOBS), so the oracle is the reference *code*: random-init a
torch model, convert its state_dict with models/convert.py, and compare
forward outputs. This validates both the architecture re-implementation and
the checkpoint converter — exactly what loading a real pretrained file
exercises.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.models import (
    apply_gpd_classifier,
    apply_pointnet_cls,
    apply_pointnet_dense_cls,
    convert_state_dict,
    init_pointnet_cls,
)

from conftest import requires_reference

ATOL = 1e-4


def _torch_eval(model, x_np):
    import torch

    model.eval()
    with torch.no_grad():
        out, trans = model(torch.from_numpy(x_np))
    return out.numpy(), trans.numpy()


@requires_reference
@pytest.mark.parametrize("k,num_points", [(2, 750), (3, 500)])
def test_pointnet_cls_eval_parity(ref_pointnet, rng, k, num_points):
    model = ref_pointnet.PointNetCls(num_points=num_points, input_chann=3, k=k)
    params, state = convert_state_dict(model.state_dict())

    x = rng.randn(4, 3, num_points).astype(np.float32)  # torch layout (B, C, N)
    ref_logp, ref_trans = _torch_eval(model, x)

    x_jax = jnp.asarray(x).swapaxes(1, 2)  # our layout (B, N, C)
    (logp, trans), _ = apply_pointnet_cls(params, state, x_jax, train=False)

    np.testing.assert_allclose(np.asarray(trans), ref_trans, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logp), ref_logp, atol=ATOL)


@requires_reference
def test_dual_pointnet_cls_eval_parity(ref_pointnet, rng):
    model = ref_pointnet.DualPointNetCls(num_points=256, input_chann=6, k=2)
    params, state = convert_state_dict(model.state_dict())

    x = rng.randn(2, 6, 256).astype(np.float32)
    ref_logp, ref_trans = _torch_eval(model, x)

    (logp, trans), _ = apply_pointnet_cls(
        params, state, jnp.asarray(x).swapaxes(1, 2), train=False, dual=True
    )
    np.testing.assert_allclose(np.asarray(trans), ref_trans, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logp), ref_logp, atol=ATOL)


@requires_reference
def test_pointnet_dense_cls_eval_parity(ref_pointnet, rng):
    from pointnetgpd_tpu.models import init_pointnet_dense_cls  # noqa: F401

    model = ref_pointnet.PointNetDenseCls(num_points=128, input_chann=3, k=4)
    params, state = convert_state_dict(model.state_dict())

    x = rng.randn(2, 3, 128).astype(np.float32)
    ref_logp, ref_trans = _torch_eval(model, x)

    (logp, trans), _ = apply_pointnet_dense_cls(
        params, state, jnp.asarray(x).swapaxes(1, 2), train=False
    )
    np.testing.assert_allclose(np.asarray(trans), ref_trans, atol=ATOL)
    np.testing.assert_allclose(np.asarray(logp), ref_logp, atol=ATOL)


@requires_reference
@pytest.mark.parametrize("chann", [3, 12])
def test_gpd_classifier_eval_parity(ref_gpd, rng, chann):
    import torch

    model = ref_gpd.GPDClassifier(input_chann=chann, dropout=False)
    model.eval()
    params, _ = convert_state_dict(model.state_dict())

    x = rng.randn(3, chann, 60, 60).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(x)).numpy()

    x_jax = jnp.asarray(x).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    out = apply_gpd_classifier(params, x_jax, train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=ATOL)


@requires_reference
def test_batchnorm_train_mode_parity(ref_pointnet, rng):
    """Train-mode forward + running-stat updates must match torch exactly."""
    import torch

    model = ref_pointnet.PointNetCls(num_points=64, input_chann=3, k=2)
    params, state = convert_state_dict(model.state_dict())

    x = rng.randn(8, 3, 64).astype(np.float32)
    model.train()
    with torch.no_grad():
        ref_logp, _ = model(torch.from_numpy(x))
    ref_sd = model.state_dict()  # running stats updated by the forward pass

    (logp, _), new_state = apply_pointnet_cls(
        params, state, jnp.asarray(x).swapaxes(1, 2), train=True
    )
    np.testing.assert_allclose(np.asarray(logp), ref_logp.numpy(), atol=1e-4)

    # compare every updated running stat against torch's
    _, ref_new_state = convert_state_dict(ref_sd)
    flat_ours = jax.tree_util.tree_leaves_with_path(new_state)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_new_state))
    assert len(flat_ours) == len(flat_ref) > 0
    for path, leaf in flat_ours:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]), atol=1e-4,
            err_msg=f"running stat mismatch at {jax.tree_util.keystr(path)}",
        )


def test_init_shapes_and_determinism():
    """Init produces the same tree structure as a converted torch state_dict
    and is deterministic in the PRNG key."""
    p1, s1 = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)
    p2, s2 = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert p1["fc3"]["w"].shape == (3, 256)
    assert s1["feat"]["bn3"]["var"].shape == (1024,)


@requires_reference
def test_init_tree_matches_torch_tree(ref_pointnet):
    """Our init tree and a converted torch tree must have identical structure."""
    model = ref_pointnet.PointNetCls(num_points=100, input_chann=3, k=2)
    ref_p, ref_s = convert_state_dict(model.state_dict())
    p, s = init_pointnet_cls(jax.random.PRNGKey(1), input_chann=3, k=2)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(ref_p)
    assert jax.tree_util.tree_structure(s) == jax.tree_util.tree_structure(ref_s)


@requires_reference
def test_torch_export_roundtrip(ref_pointnet, rng):
    """params -> torch state_dict -> reference model: outputs must match the
    JAX forward (checkpoint interop both directions)."""
    import torch

    from pointnetgpd_tpu.models.convert import export_torch_state_dict
    from pointnetgpd_tpu.models import init_pointnet_cls

    params, state = init_pointnet_cls(jax.random.PRNGKey(5), input_chann=3,
                                      k=3)
    sd = export_torch_state_dict(params, state)
    model = ref_pointnet.PointNetCls(num_points=128, input_chann=3, k=3)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected
    # only num_batches_tracked counters may be missing
    assert all("num_batches_tracked" in m for m in missing)

    x = rng.randn(2, 3, 128).astype(np.float32)
    model.eval()
    with torch.no_grad():
        ref_logp, _ = model(torch.from_numpy(x))
    from pointnetgpd_tpu.models import apply_pointnet_cls

    (logp, _), _ = apply_pointnet_cls(params, state,
                                      jnp.asarray(x).swapaxes(1, 2),
                                      train=False)
    np.testing.assert_allclose(np.asarray(logp), ref_logp.numpy(), atol=1e-4)

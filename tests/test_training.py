"""Training-stack tests: fused DP train step, optimizer schedule, masking,
checkpoint round-trip — on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
from pointnetgpd_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_tree
from pointnetgpd_tpu.training.data import SyntheticGraspData, labels_from_scores
from pointnetgpd_tpu.training.train import (
    init_train_state,
    make_fused_train_step,
    make_optimizer,
    make_train_step,
    masked_nll_loss,
)


def _tiny_state(k=2, lr=0.01, steps_per_epoch=10):
    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=k)
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)
    tx = make_optimizer(lr, steps_per_epoch=steps_per_epoch)
    return init_train_state(params, bn, tx), tx


def test_masked_nll_loss_ignores_invalid():
    logp = jnp.log(jnp.asarray([[0.9, 0.1], [0.1, 0.9], [0.5, 0.5]]))
    labels = jnp.asarray([0, 1, 0])
    full = masked_nll_loss(logp, labels, jnp.asarray([1.0, 1.0, 1.0]))
    masked = masked_nll_loss(logp, labels, jnp.asarray([1.0, 1.0, 0.0]))
    assert float(masked) < float(full)
    np.testing.assert_allclose(float(masked), -np.log(0.9), rtol=1e-6)


def test_labels_from_scores_bands():
    level = np.asarray([2.0, 0.4, 0.61])
    refine = np.zeros(3)
    # 2-class: >= .6 bad(0); <= .6 good(1); else dropped
    lab, w = labels_from_scores(level, refine, 0.6, 0.6, 2)
    assert lab.tolist() == [0, 1, 0] and w.tolist() == [1.0, 1.0, 1.0]
    lab, w = labels_from_scores(np.asarray([0.55]), np.zeros(1), 0.5, 0.6, 2)
    assert w.tolist() == [0.0]  # skip band
    # 3-class: >=1.2 -> 0, <=0.5 -> 2, else 1
    lab, w = labels_from_scores(np.asarray([2.0, 0.3, 0.8]), np.zeros(3), 0.5, 1.2, 3)
    assert lab.tolist() == [0, 2, 1] and w.tolist() == [1.0, 1.0, 1.0]


def test_less_class_ladder_cannot_reach_good_band():
    """The reference's less_class friction ladder {2.0, 1.6, 0.6}
    (generate-dataset-canny.py:88-90) is incompatible with its own training
    thresholds: score = fc + 0.01*canny never reaches main_1v_mc's good band
    (<= 0.5), so 3-class training on less_class labels degenerates to
    majority-class — caught by the 20-object workflow rehearsal
    (docs/QUIRKS.md). The full ladder's 0.4 rung reaches class 2.
    pipelines/generate_dataset.py --ladder full exists for exactly this."""
    from pointnetgpd_tpu.grasping.evaluation import (
        FC_LIST_FULL,
        FC_LIST_LESS_CLASS,
    )

    canny = np.linspace(0.0, 1.5, 7)  # observed canny range is ~[0, 1.5]
    for fc in FC_LIST_LESS_CLASS:
        lab, _ = labels_from_scores(np.full_like(canny, fc), canny,
                                    0.5, 1.2, 3)
        assert not np.any(lab == 2)
    lab, _ = labels_from_scores(
        np.full_like(canny, FC_LIST_FULL.min()), canny, 0.5, 1.2, 3)
    assert np.all(lab == 2)  # 0.4 + 0.01*canny <= 0.5 for canny <= 10


def test_fused_train_step_learns_on_dp_mesh():
    """One fused (crop+fwd+bwd) step program, batch sharded over 8 devices:
    loss must drop over a few steps on learnable synthetic data."""
    assert jax.device_count() == 8
    mesh = make_mesh()
    # learnable=True: labels carry a geometric signature, so the loss trend
    # tests actual learning rather than class-prior fitting (which is too
    # seed-sensitive at batch 16 to assert on)
    data = SyntheticGraspData(batch_size=16, cloud_points=512, num_classes=2,
                              learnable=True)
    state, tx = _tiny_state(k=2, lr=0.003)
    state = replicate_tree(state, mesh)
    step_fn = make_fused_train_step(tx, num_points=64, min_point_limit=5)
    sharding = batch_sharding(mesh)

    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(16):
        grasps, clouds, transforms, labels, weights = data.next_batch()
        args = [jax.device_put(a, sharding)
                for a in (grasps, clouds, transforms, labels, weights)]
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, *args, sub)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert 0.0 <= float(metrics["valid_frac"]) <= 1.0
    # single-step deltas are noisy at batch 16; compare half-means so the
    # assertion tests the trend, not one step's resampling luck
    assert np.mean(losses[8:]) < np.mean(losses[:8])  # it learns something
    assert min(losses) < 0.7 * losses[0]
    assert int(state.step) == 16


def test_fused_train_step_bf16_learns_masters_stay_f32():
    """Mixed-precision step (compute_dtype=bf16): loss drops on learnable
    data; master params, Adam moments, and BN stats all remain fp32."""
    data = SyntheticGraspData(batch_size=16, cloud_points=512, num_classes=2,
                              learnable=True, seed=3)
    state, tx = _tiny_state(k=2, lr=0.003)
    step_fn = make_fused_train_step(tx, num_points=64, min_point_limit=5,
                                    compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(16):
        batch = tuple(map(jnp.asarray, data.next_batch()))
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, *batch, sub)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert np.mean(losses[8:]) < np.mean(losses[:8])
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.bn_state):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype


def test_fused_train_step_remat_matches_exact():
    """remat=True (jax.checkpoint forward rematerialization) must produce
    numerically identical params and metrics to the default step — it only
    changes WHAT is stored between forward and backward."""
    data = SyntheticGraspData(batch_size=8, cloud_points=256, num_classes=2,
                              learnable=True, seed=5)
    outs = {}
    for remat in (False, True):
        st, tx = _tiny_state(k=2, lr=0.003)
        step_fn = make_fused_train_step(tx, num_points=64, min_point_limit=5,
                                        remat=remat)
        d = SyntheticGraspData(batch_size=8, cloud_points=256, num_classes=2,
                               learnable=True, seed=5)
        key = jax.random.PRNGKey(0)
        ms = []
        for i in range(3):
            batch = tuple(map(jnp.asarray, d.next_batch()))
            key, sub = jax.random.split(key)
            st, metrics = step_fn(st, *batch, sub)
            ms.append(metrics)
        outs[remat] = (st, ms)
    a, b = outs[False], outs[True]
    for la, lb in zip(jax.tree_util.tree_leaves(a[0].params),
                      jax.tree_util.tree_leaves(b[0].params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-6, rtol=1e-6)
    for ma, mb in zip(a[1], b[1]):
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)


def test_dp_matches_single_device():
    """The same batch 8-way sharded vs single-device must produce the same
    loss and gradients (global-batch BN + psum grad all-reduce == local math).
    Gradients, not post-Adam params: Adam's step-1 g/sqrt(g^2) amplifies
    reduction-order noise on near-zero grads into +-lr sign flips."""
    from pointnetgpd_tpu.models.pointnet import apply_pointnet_cls
    from pointnetgpd_tpu.ops.crop import collect_grasp_clouds

    data = SyntheticGraspData(batch_size=16, cloud_points=256, num_classes=2)
    grasps, clouds, transforms, labels, weights = data.next_batch()
    # run in float64 so fp rounding noise (~1e-12) can't mask a real
    # semantic difference between the sharded and local programs
    grasps, clouds, transforms, weights = (
        a.astype(np.float64) for a in (grasps, clouds, transforms, weights))
    key = jax.random.PRNGKey(1)
    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=2,
                                   dtype=jnp.float64)

    @jax.jit
    def loss_and_grad(params, grasps, clouds, transforms, labels, weights, key):
        keys = jax.random.split(key, grasps.shape[0])

        def crop_one(g, pc, t, k):
            pts, _, valid = collect_grasp_clouds(
                g[None], pc, t, k, num_out=32, min_point_limit=5)
            return pts[0], valid[0]

        cropped, crop_valid = jax.vmap(crop_one)(grasps, clouds, transforms, keys)
        w = weights * crop_valid.astype(weights.dtype)

        def loss_fn(p):
            (logp, _), _ = apply_pointnet_cls(p, bn, cropped, train=True)
            return masked_nll_loss(logp, labels, w)

        return jax.value_and_grad(loss_fn)(params)

    def run(sharded: bool):
        if sharded:
            mesh = make_mesh()
            p = replicate_tree(params, mesh)
            sharding = batch_sharding(mesh)
            args = [jax.device_put(a, sharding)
                    for a in (grasps, clouds, transforms, labels, weights)]
        else:
            p = params
            args = [jnp.asarray(a) for a in (grasps, clouds, transforms, labels, weights)]
        return loss_and_grad(p, *args, key)

    l1, g1 = run(False)
    l8, g8 = run(True)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-9)


def test_optimizer_schedule_steplr():
    """lr halves every 30 epochs (the reference's *intended* StepLR)."""
    tx = make_optimizer(lr=0.005, step_size=30, gamma=0.5, steps_per_epoch=10)
    # peek the schedule through optax's injected hyperparams by applying to
    # a dummy param at different step counts
    params = {"w": jnp.ones((1,))}
    state = tx.init(params)
    # fast-forward: the schedule maps step -> epoch -> factor
    import optax

    sched = lambda step: 0.005 * (0.5 ** ((step // 10) // 30))
    assert sched(0) == 0.005
    assert sched(299) == 0.005
    assert sched(300) == 0.0025
    assert sched(600) == 0.00125


def test_checkpoint_roundtrip(tmp_path):
    from pointnetgpd_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    state, tx = _tiny_state(k=3)
    # mutate step so the checkpoint name is distinctive
    state = state._replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path), state)
    path = latest_checkpoint(str(tmp_path))
    assert path and path.endswith("step_7")
    template, _ = _tiny_state(k=3)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restores_across_opt_state_layouts(tmp_path):
    """A checkpoint saved with a DIFFERENT optimizer-state layout (e.g.
    pre-optax.flatten: 44-leaf Adam moment trees instead of one vector)
    must still restore params/BN/step, with the optimizer state reset and
    a warning — not fail the resume."""
    import warnings

    import optax

    from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
    from pointnetgpd_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from pointnetgpd_tpu.training.train import init_train_state

    params, bn = init_pointnet_cls(jax.random.PRNGKey(3), input_chann=3, k=3)
    # "old" layout: unflattened Adam (tree-shaped moments)
    old_state = init_train_state(params, bn, optax.adam(1e-3))
    old_state = old_state._replace(step=jnp.asarray(11, jnp.int32))
    save_checkpoint(str(tmp_path), old_state)
    path = latest_checkpoint(str(tmp_path))

    # current layout: make_optimizer wraps in optax.flatten
    template = init_train_state(params, bn, make_optimizer(1e-3))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        restored = restore_checkpoint(path, template)
    assert any("optimizer state" in str(w.message) for w in caught)
    assert int(restored.step) == 11
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(old_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state keeps the template's (fresh) structure
    assert (jax.tree_util.tree_structure(restored.opt_state)
            == jax.tree_util.tree_structure(template.opt_state))


def test_checkpoint_corrupt_same_layout_fails_loudly(tmp_path):
    """A damaged checkpoint whose opt_state layout MATCHES the template must
    raise, not silently reset the Adam moments: the layout-migration
    fallback is decided structurally from orbax metadata, never from a
    restore error (round-3 advisor finding)."""
    import os

    import pytest

    from pointnetgpd_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    state, _ = _tiny_state(k=3)
    save_checkpoint(str(tmp_path), state)
    path = latest_checkpoint(str(tmp_path))
    # corrupt the array data (keep the structure metadata readable)
    for root, _dirs, files in os.walk(path):
        for f in files:
            full = os.path.join(root, f)
            if os.path.getsize(full) > 4096:
                with open(full, "r+b") as fh:
                    fh.truncate(64)
    template, _ = _tiny_state(k=3)
    with pytest.raises(Exception):
        restore_checkpoint(path, template)


def test_pre_cropped_train_step():
    """The non-fused step (pre-cropped clouds) also runs and learns."""
    state, tx = _tiny_state(k=3, lr=0.005)
    step_fn = make_train_step(tx)
    rng = np.random.RandomState(0)
    clouds = jnp.asarray(rng.randn(8, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, 8))
    weights = jnp.ones((8,), jnp.float32)
    l0 = None
    for i in range(4):
        state, metrics = step_fn(state, clouds, labels, weights)
        if l0 is None:
            l0 = float(metrics["loss"])
    assert float(metrics["loss"]) < l0


def test_gpd_trainer_with_eval():
    """GPD variant: train + eval paths both run (CPU mesh, tiny shapes)."""
    import tempfile

    from pointnetgpd_tpu.training.data import SyntheticGraspData
    from pointnetgpd_tpu.training.loop import TrainConfig, Trainer

    tmp = tempfile.mkdtemp()
    cfg = TrainConfig(num_classes=2, grasp_points_num=64, batch_size=8,
                      epochs=1, steps_per_epoch=2, eval_steps=1,
                      min_point_limit=5, gpd=True, project_chann=3,
                      tag="gpd_eval", model_path=f"{tmp}/m",
                      log_dir=f"{tmp}/l")
    data = SyntheticGraspData(batch_size=8, cloud_points=256)
    tr = Trainer(cfg, data, SyntheticGraspData(batch_size=8, cloud_points=256,
                                               seed=7))
    tr.fit()
    acc, loss = tr.evaluate(jax.random.PRNGKey(0))
    assert acc is not None and np.isfinite(loss)


def test_learnable_synthetic_accuracy_improves():
    """On the learnable synthetic task the full fused pipeline must reach
    well-above-chance accuracy — validates learning dynamics end to end
    (BN updates, Adam, masking, on-device crop)."""
    from pointnetgpd_tpu.training.data import SyntheticGraspData

    data = SyntheticGraspData(batch_size=32, cloud_points=1024,
                              num_classes=2, seed=0, learnable=True)
    state, tx = _tiny_state(k=2, lr=0.002)
    step_fn = make_fused_train_step(tx, num_points=64, min_point_limit=5)
    key = jax.random.PRNGKey(0)
    accs = []
    for i in range(30):
        batch = data.next_batch()
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, *[jnp.asarray(a) for a in batch], sub)
        accs.append(float(metrics["acc"]))
    # late-training accuracy far above the ~0.5 chance level
    assert np.mean(accs[-5:]) > 0.85, accs[-5:]


def test_all_masked_batch_keeps_params_finite():
    """A batch where every sample is rejected (all label weights zero) must
    not NaN the loss or the parameters, and training must recover on the
    next real batch (the reference's my_collate would simply produce an
    empty batch; here masking carries the semantics)."""
    from pointnetgpd_tpu.training.data import SyntheticGraspData
    from pointnetgpd_tpu.training.train import (
        init_train_state,
        make_fused_train_step,
        make_optimizer,
    )

    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=2)
    tx = make_optimizer(0.005)
    state = init_train_state(params, bn, tx)
    step = make_fused_train_step(tx, num_points=32, min_point_limit=1)
    data = SyntheticGraspData(batch_size=8, cloud_points=128)
    grasps, clouds, transforms, labels, weights = data.next_batch()

    state, m = step(state, grasps, clouds, transforms, labels,
                    np.zeros_like(weights), jax.random.PRNGKey(1))
    assert float(m["loss"]) == 0.0
    assert bool(jnp.all(jnp.isfinite(state.params["fc3"]["w"])))
    state, m2 = step(state, grasps, clouds, transforms, labels, weights,
                     jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))


def test_checkpoint_resume_round_trip():
    """Crash-resume: a fresh Trainer pointed at the same model_path restores
    the exact params, optimizer state, and epoch offset (the reference never
    checkpoints the optimizer — main_1v.py:60 recreates it; SURVEY §5
    checkpoint/resume)."""
    import tempfile

    from pointnetgpd_tpu.training.data import SyntheticGraspData
    from pointnetgpd_tpu.training.loop import TrainConfig, Trainer

    tmp = tempfile.mkdtemp()
    cfg = TrainConfig(num_classes=2, grasp_points_num=32, batch_size=8,
                      epochs=2, steps_per_epoch=3, eval_steps=1,
                      min_point_limit=1, save_interval=1, tag="resume",
                      model_path=f"{tmp}/m", log_dir=f"{tmp}/l", seed=3)
    data = SyntheticGraspData(batch_size=8, cloud_points=256)
    tr1 = Trainer(cfg, data)
    tr1.fit()
    step1 = int(tr1.state.step)
    assert step1 == cfg.epochs * cfg.steps_per_epoch
    w1 = np.asarray(tr1.state.params["fc3"]["w"])
    mom1 = jax.tree_util.tree_leaves(tr1.state.opt_state)

    # a brand-new process would build a fresh Trainer and call maybe_resume
    tr2 = Trainer(cfg, data)
    assert not np.allclose(np.asarray(tr2.state.params["fc3"]["w"]), w1)
    path = tr2.maybe_resume()
    assert path is not None
    assert int(tr2.state.step) == step1
    np.testing.assert_array_equal(np.asarray(tr2.state.params["fc3"]["w"]),
                                  w1)
    # optimizer moments restored too (the reference loses them)
    mom2 = jax.tree_util.tree_leaves(tr2.state.opt_state)
    for a, b in zip(mom1, mom2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # epoch offset advances from the restored step
    assert tr2._epoch0 == cfg.epochs
    # and training continues from there without error
    tr2.cfg = TrainConfig(**{**cfg.__dict__, "epochs": 3})
    tr2.fit()
    assert int(tr2.state.step) == 3 * cfg.steps_per_epoch


def test_infer_cli_resolves_checkpoint_dir(tmp_path, capsys):
    """`--load-model <train --model-path dir>` must resolve to the newest
    step_N checkpoint (the train CLI writes step_N subdirs; requiring the
    user to name one was a UX trap found by driving the CLIs)."""
    import numpy as np

    from pointnetgpd_tpu.cli.infer import load_scorer, build_parser
    from pointnetgpd_tpu.models.pointnet import init_pointnet_cls
    from pointnetgpd_tpu.training import checkpoint as ckpt_lib
    from pointnetgpd_tpu.training.train import (init_train_state,
                                                make_optimizer)

    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3, k=3)
    tx = make_optimizer()
    state = init_train_state(params, bn, tx)
    ckpt_lib.save_checkpoint(str(tmp_path / "ck"), state)          # step_0
    ckpt_lib.save_checkpoint(str(tmp_path / "ck"),
                             state._replace(step=state.step + 4))  # step_4

    args = build_parser().parse_args(
        ["--load-model", str(tmp_path / "ck"), "--k", "3"])
    scorer = load_scorer(args)
    assert "step_4" in capsys.readouterr().out
    pred, prob, _ = scorer.score_clouds(
        np.random.RandomState(0).rand(1, 500, 3).astype(np.float32))
    assert np.isfinite(prob).all()

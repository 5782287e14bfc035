"""Training: loss, optimizer schedule, and the pjit data-parallel train step.

Reproduces the reference training semantics (reference: PointNetGPD/main_1v.py:59-110):
NLL loss on the model's log_softmax outputs, Adam(lr), StepLR(step=30,
gamma=0.5) — but as ONE jitted step over a `jax.sharding.Mesh`: the batch
axis is sharded across chips ('dp'), parameters/optimizer state are
replicated, and XLA inserts the psum gradient all-reduce from the sharding
annotations (replacing nn.DataParallel, main_1v.py:162-165).

BatchNorm under DP: batch statistics are computed over the GLOBAL batch
(XLA emits the cross-chip reduction automatically because the activations
are sharded and the mean/var reduce over the batch axis), so results match
the reference's single-device semantics at any chip count.

Reference quirks handled explicitly:
- The reference re-creates the optimizer AND scheduler inside ``train()``
  every epoch (main_1v.py:60-62), which resets Adam moments each epoch and
  makes StepLR a no-op (the schedule never reaches step 30). We implement
  the *documented intent* (persistent Adam, lr halved every 30 epochs) as
  the default; ``reset_optimizer_each_epoch=True`` reproduces the quirk.
- Invalid samples (crop < min_point_limit, or score in the skip band) are
  dropped by the reference's collate (main_1v.py:48-50); here batches are
  fixed-shape and a per-sample weight masks them out of loss and metrics.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.pointnet import apply_pointnet_cls
from ..ops.crop import collect_grasp_clouds, collect_grasp_clouds_batched


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray  # global step counter


def step_lr(base_lr: float, step_size: int = 30, gamma: float = 0.5):
    """StepLR(epoch) == base_lr * gamma**(epoch // step_size) (torch semantics).

    Returned as an optax schedule over EPOCHS; pass the epoch index, not the
    global step (the caller maps step -> epoch).
    """

    def schedule(epoch):
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def make_optimizer(lr: float = 0.005, step_size: int = 30, gamma: float = 0.5,
                   steps_per_epoch: int = 1):
    """Adam with the reference's intended StepLR decay.

    Wrapped in ``optax.flatten``: the model's 44 parameter leaves would
    otherwise lower the update to ~130 tiny elementwise kernels whose
    launch overhead alone measured 3.2 ms/step on a v5e chip (vs ~0.3 ms
    flattened — the moments live in one contiguous vector and the update
    is a single fused elementwise pass). Semantics identical (Adam is
    elementwise).
    """
    sched = lambda step: lr * (gamma ** ((step // steps_per_epoch) // step_size))
    return optax.flatten(optax.adam(learning_rate=sched))


def masked_nll_loss(log_probs, labels, weights):
    """F.nll_loss over valid samples only (weights in {0,1})."""
    per_sample = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(per_sample * weights) / denom


def make_train_step(tx, *, dual: bool = False):
    """Build the jitted train step: (state, clouds, labels, weights) -> ...

    ``clouds``: (B, N, C) pre-cropped gripper-frame point clouds;
    ``weights``: (B,) 1.0 for valid samples, 0.0 for masked ones.
    Shard the batch arrays over the mesh 'dp' axis and replicate the state;
    jit + XLA handle the psum gradient all-reduce.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, clouds, labels, weights):
        def loss_fn(params):
            (logp, trans), new_bn = apply_pointnet_cls(
                params, state.bn_state, clouds, train=True, dual=dual
            )
            loss = masked_nll_loss(logp, labels, weights)
            return loss, (new_bn, logp)

        (loss, (new_bn, logp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        pred = jnp.argmax(logp, axis=-1)
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        acc = jnp.sum((pred == labels) * weights) / denom
        metrics = {"loss": loss, "acc": acc, "valid_frac": jnp.mean(weights)}
        return TrainState(new_params, new_bn, new_opt, state.step + 1), metrics

    return train_step


def make_eval_step(*, dual: bool = False):
    @jax.jit
    def eval_step(params, bn_state, clouds, labels, weights):
        (logp, _), _ = apply_pointnet_cls(params, bn_state, clouds, train=False, dual=dual)
        loss = masked_nll_loss(logp, labels, weights)
        pred = jnp.argmax(logp, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        return {"loss_sum": loss * jnp.maximum(jnp.sum(weights), 1.0),
                "correct": correct, "count": jnp.sum(weights)}

    return eval_step


def make_fused_train_step(tx, *, num_points: int, min_point_limit: int = 50,
                          dual: bool = False, compute_dtype=None,
                          remat: bool = False, fused_maxpool: bool = False):
    """Train step with the closing-region crop fused INTO the device program.

    Input is the raw per-sample data (grasp rows, per-sample view clouds,
    transforms) instead of pre-cropped points; the crop + resample runs
    on-device in the same jit as the forward/backward pass, replacing the
    reference's 32-process host dataloader crop (main_1v.py:125,
    dataset.py:15-76). label_weights masks samples the host already rejected
    (skip-band scores); crop validity is ANDed in on device. The crop is the
    batched rank-select program (collect_grasp_clouds_batched): one shared
    shuffle amortized over the batch, per-sample rank windows.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``): mixed-precision forward +
    backward — activations and the params' compute copies are cast, while
    master params, gradients (cast back by astype's vjp), Adam moments, BN
    statistics (see models/layers.batchnorm), and the loss stay fp32. The
    step is HBM-bandwidth-bound on the two (B, N, 1024) trunk stages, so
    halving activation bytes is the main single-chip lever (docs/SCALING.md
    roofline). Default None = pure fp32 (bit-for-bit the parity semantics).

    ``remat``: rematerialize the forward in the backward pass
    (``jax.checkpoint``) instead of storing the (B, N, 1024) activations —
    trades ~1 extra forward of (cheap) FLOPs for HBM traffic on the
    bandwidth-bound stages. Gradients are bit-identical (tested); whether
    it is a speed win is measured in docs/SCALING.md.

    ``fused_maxpool``: route the two conv3->BN->max stages through the
    streamed custom-VJP op (models/fused_maxpool.py) — the (B, N, 1024)
    activation exists in neither the forward nor the backward; the BN
    coupling collapses to (F, F) quadratic forms. Gradients match the
    unfused path to fp32 tolerance (tests/test_fused_maxpool.py); the
    measured step time lives in docs/SCALING.md.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, grasps, clouds, transforms, labels,
                   label_weights, key):
        cropped, _, crop_valid = collect_grasp_clouds_batched(
            grasps, clouds, transforms, key,
            num_out=num_points, min_point_limit=min_point_limit,
        )
        weights = label_weights * crop_valid.astype(label_weights.dtype)

        fwd = lambda p, s, x: apply_pointnet_cls(
            p, s, x, train=True, dual=dual, fused_maxpool=fused_maxpool)
        if remat:
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            if compute_dtype is not None:
                params = jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype), params)
                x = cropped.astype(compute_dtype)
            else:
                x = cropped
            (logp, _), new_bn = fwd(params, state.bn_state, x)
            logp = logp.astype(jnp.float32)
            return masked_nll_loss(logp, labels, weights), (new_bn, logp)

        (loss, (new_bn, logp)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        pred = jnp.argmax(logp, axis=-1)
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        acc = jnp.sum((pred == labels) * weights) / denom
        metrics = {"loss": loss, "acc": acc, "valid_frac": jnp.mean(weights)}
        return TrainState(new_params, new_bn, new_opt, state.step + 1), metrics

    return train_step


def init_train_state(params, bn_state, tx) -> TrainState:
    return TrainState(params, bn_state, tx.init(params), jnp.zeros((), jnp.int32))


def make_gpd_feature_fn(*, num_points: int, project_chann: int = 3,
                        min_point_limit: int = 50, knn_k: int = 30):
    """Per-sample GPD feature extractor: crop -> KNN normals -> projection
    images (shared by the GPD train and eval steps)."""
    from ..ops.cloud import estimate_normals_knn
    from ..ops.projection import gpd_projection_features

    def features_one(grasp, pc, transform, k):
        pts, counts, valid = collect_grasp_clouds(
            grasp[None], pc, transform, k,
            num_out=num_points, min_point_limit=min_point_limit)
        pts = pts[0]
        cam = jnp.asarray([-1.0, 0.0, 0.0], pts.dtype)
        normals = estimate_normals_knn(pts, cam, k=knn_k,
                                       chunk=min(256, num_points))
        width = grasp[6]
        feats = gpd_projection_features(
            pts, normals, jnp.ones((num_points,), bool), width,
            project_chann=project_chann)
        return feats, valid[0]

    return features_one


def make_gpd_eval_step(*, num_points: int, project_chann: int = 3,
                       min_point_limit: int = 50, knn_k: int = 30):
    """Masked eval for the GPD baseline (counterpart of make_eval_step)."""
    from ..models.gpd import apply_gpd_classifier

    features_one = make_gpd_feature_fn(
        num_points=num_points, project_chann=project_chann,
        min_point_limit=min_point_limit, knn_k=knn_k)

    @jax.jit
    def eval_step(params, grasps, clouds, transforms, labels, label_weights,
                  key):
        keys = jax.random.split(key, grasps.shape[0])
        feats, crop_valid = jax.vmap(features_one)(grasps, clouds, transforms,
                                                   keys)
        weights = label_weights * crop_valid.astype(label_weights.dtype)
        logp = apply_gpd_classifier(params, feats, train=False)
        loss = masked_nll_loss(logp, labels, weights)
        pred = jnp.argmax(logp, axis=-1)
        correct = jnp.sum((pred == labels) * weights)
        return {"loss_sum": loss * jnp.maximum(jnp.sum(weights), 1.0),
                "correct": correct, "count": jnp.sum(weights)}

    return eval_step


def make_gpd_train_step(tx, *, num_points: int, project_chann: int = 3,
                        min_point_limit: int = 50, knn_k: int = 30):
    """Train step for the GPD projection-CNN baseline
    (reference: PointNetGPD/main_1v_gpd.py — GPDClassifier on 60x60
    projection features, Adam + StepLR(30, 0.1), persistent optimizer).

    Fused on device per sample: closing-region crop -> KNN surface normals ->
    occupancy/normal projection images -> CNN fwd/bwd. Deviation (documented):
    the reference estimates normals on the FULL transformed cloud with an
    open3d KDTree and then selects the crop's rows (dataset.py:93-95); we
    estimate them within the cropped neighborhood — the same local geometry
    at a fraction of the cost.

    The GPD model is stateless (no BN); TrainState.bn_state holds an empty
    dict.
    """
    from ..models.gpd import apply_gpd_classifier

    features_one = make_gpd_feature_fn(
        num_points=num_points, project_chann=project_chann,
        min_point_limit=min_point_limit, knn_k=knn_k)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, grasps, clouds, transforms, labels,
                   label_weights, key):
        b = grasps.shape[0]
        keys = jax.random.split(key, b)
        feats, crop_valid = jax.vmap(features_one)(grasps, clouds, transforms,
                                                   keys)
        weights = label_weights * crop_valid.astype(label_weights.dtype)

        def loss_fn(params):
            logp = apply_gpd_classifier(params, feats, train=True)
            return masked_nll_loss(logp, labels, weights), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        pred = jnp.argmax(logp, axis=-1)
        denom = jnp.maximum(jnp.sum(weights), 1.0)
        acc = jnp.sum((pred == labels) * weights) / denom
        metrics = {"loss": loss, "acc": acc, "valid_frac": jnp.mean(weights)}
        return TrainState(new_params, state.bn_state, new_opt,
                          state.step + 1), metrics

    return train_step

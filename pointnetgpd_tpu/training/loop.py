"""The training loop driver: epochs, eval, logging, checkpoints, DP sharding.

Equivalent of the reference's main()/train()/test()
(reference: PointNetGPD/main_1v.py:59-183): per-epoch train + eval with
train_loss/train_acc/test_acc/test_loss scalars (tensorboardX when available,
always a metrics.jsonl), periodic checkpoints, resume. Data-parallel over a
``jax.sharding.Mesh`` with the batch axis sharded and the state replicated.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.pointnet import init_pointnet_cls
from ..parallel.mesh import batch_sharding, make_mesh, replicate_tree
from . import checkpoint as ckpt_lib
from .train import (
    init_train_state,
    make_eval_step,
    make_fused_train_step,
    make_optimizer,
)


class MetricsLogger:
    """tensorboardX scalars (if available) + append-only metrics.jsonl."""

    def __init__(self, log_dir: str, tag: str):
        self.dir = os.path.join(log_dir, tag)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(self.dir)
        except Exception:
            self._tb = None

    def scalar(self, name: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"name": name, "value": float(value), "step": int(step),
                 "t": time.time()}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None

    def __del__(self):  # avoid unclosed-file warnings when tests drop Trainers
        try:
            self.close()
        except Exception:
            pass


@dataclass
class TrainConfig:
    """Canonical configs mirror the reference entry points (README.md:183-191):
    main_1v -> k=2, 750 pts; main_1v_mc -> k=3; main_fullv -> 1000 pts, ..."""

    num_classes: int = 2
    grasp_points_num: int = 750
    input_chann: int = 3
    batch_size: int = 128
    lr: float = 0.005
    lr_step: int = 30
    lr_gamma: float = 0.5
    epochs: int = 200
    steps_per_epoch: int = 100
    eval_steps: int = 10
    min_point_limit: int = 50
    save_interval: int = 1          # epochs between checkpoints (main_1v.py:31)
    log_interval: int = 10          # steps between scalar logs (main_1v.py:30)
    gpd: bool = False                # GPD projection-CNN baseline variant
    project_chann: int = 3           # GPD input channels (3 or 12)
    tag: str = "default"
    model_path: str = "./assets/learned_models"
    log_dir: str = "./assets/log"
    seed: int = 0
    n_devices: int | None = None    # None = all


class Trainer:
    def __init__(self, cfg: TrainConfig, train_data, eval_data=None):
        self.cfg = cfg
        self.train_data = train_data
        self.eval_data = eval_data
        self.mesh = make_mesh(cfg.n_devices)
        self.logger = MetricsLogger(cfg.log_dir, cfg.tag)

        key = jax.random.PRNGKey(cfg.seed)
        self.tx = make_optimizer(cfg.lr, cfg.lr_step, cfg.lr_gamma,
                                 steps_per_epoch=cfg.steps_per_epoch)
        if cfg.gpd:
            from ..models.gpd import init_gpd_classifier
            from .train import make_gpd_train_step

            params = init_gpd_classifier(key, cfg.project_chann)
            state = init_train_state(params, {}, self.tx)
            self.train_step = make_gpd_train_step(
                self.tx, num_points=cfg.grasp_points_num,
                project_chann=cfg.project_chann,
                min_point_limit=cfg.min_point_limit,
            )
        else:
            params, bn_state = init_pointnet_cls(
                key, input_chann=cfg.input_chann, k=cfg.num_classes
            )
            state = init_train_state(params, bn_state, self.tx)
            self.train_step = make_fused_train_step(
                self.tx, num_points=cfg.grasp_points_num,
                min_point_limit=cfg.min_point_limit,
            )
        self.state = replicate_tree(state, self.mesh)
        self.eval_step = make_eval_step()
        self._data_sharding = batch_sharding(self.mesh)
        self._epoch0 = 0

    # ------------------------------------------------------------------
    def maybe_resume(self):
        path = ckpt_lib.latest_checkpoint(self.cfg.model_path)
        if path:
            self.state = ckpt_lib.restore_checkpoint(path, self.state)
            self.state = replicate_tree(self.state, self.mesh)
            self._epoch0 = int(self.state.step) // self.cfg.steps_per_epoch
        return path

    def _shard(self, *arrays):
        return tuple(
            jax.device_put(a, self._data_sharding) for a in arrays
        )

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, key):
        cfg = self.cfg
        it = iter(self.train_data)
        acc_sum = loss_sum = 0.0
        for step in range(cfg.steps_per_epoch):
            grasps, clouds, transforms, labels, weights = next(it)
            grasps, clouds, transforms, labels, weights = self._shard(
                grasps, clouds, transforms, labels, weights
            )
            key, sub = jax.random.split(key)
            self.state, metrics = self.train_step(
                self.state, grasps, clouds, transforms, labels, weights, sub
            )
            if step % cfg.log_interval == 0:
                loss = float(metrics["loss"])
                self.logger.scalar("train_loss", loss,
                                   epoch * cfg.steps_per_epoch + step)
                # progress line like the reference's per-interval print
                # (main_1v.py:77-83); scalars also land in tensorboard/jsonl
                print(f"Train Epoch: {epoch} [{step}/{cfg.steps_per_epoch}]"
                      f"\tLoss: {loss:.6f}", flush=True)
            acc_sum += float(metrics["acc"])
            loss_sum += float(metrics["loss"])
        return acc_sum / cfg.steps_per_epoch, loss_sum / cfg.steps_per_epoch

    def evaluate(self, key):
        if self.eval_data is None:
            return None, None
        cfg = self.cfg
        if cfg.gpd:
            from .train import make_gpd_eval_step

            if not hasattr(self, "_gpd_eval"):
                self._gpd_eval = make_gpd_eval_step(
                    num_points=cfg.grasp_points_num,
                    project_chann=cfg.project_chann,
                    min_point_limit=cfg.min_point_limit)
            it = iter(self.eval_data)
            tot = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
            for _ in range(cfg.eval_steps):
                grasps, clouds, transforms, labels, weights = next(it)
                key, sub = jax.random.split(key)
                out = self._gpd_eval(self.state.params, jnp.asarray(grasps),
                                     jnp.asarray(clouds),
                                     jnp.asarray(transforms),
                                     jnp.asarray(labels), jnp.asarray(weights),
                                     sub)
                for k_ in tot:
                    tot[k_] += float(out[k_])
            count = max(tot["count"], 1.0)
            return tot["correct"] / count, tot["loss_sum"] / count
        it = iter(self.eval_data)
        tot = {"loss_sum": 0.0, "correct": 0.0, "count": 0.0}
        for _ in range(cfg.eval_steps):
            grasps, clouds, transforms, labels, weights = next(it)
            # eval uses the same fused crop path via a fresh key
            key, sub = jax.random.split(key)
            from ..ops.crop import collect_grasp_clouds_batched

            cropped, _, crop_valid = collect_grasp_clouds_batched(
                jnp.asarray(grasps), jnp.asarray(clouds),
                jnp.asarray(transforms), sub,
                num_out=cfg.grasp_points_num,
                min_point_limit=cfg.min_point_limit)
            w = jnp.asarray(weights) * crop_valid.astype(jnp.float32)
            out = self.eval_step(self.state.params, self.state.bn_state,
                                 cropped, jnp.asarray(labels), w)
            for k_ in tot:
                tot[k_] += float(out[k_])
        count = max(tot["count"], 1.0)
        return tot["correct"] / count, tot["loss_sum"] / count

    # ------------------------------------------------------------------
    def fit(self):
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed + 1)
        for epoch in range(self._epoch0, cfg.epochs):
            key, k_train, k_eval = jax.random.split(key, 3)
            train_acc, train_loss = self.train_epoch(epoch, k_train)
            self.logger.scalar("train_acc", train_acc, epoch)
            eval_acc, eval_loss = self.evaluate(k_eval)
            if eval_acc is not None:
                self.logger.scalar("test_acc", eval_acc, epoch)
                self.logger.scalar("test_loss", eval_loss, epoch)
                print(f"Epoch {epoch}: train_acc={train_acc:.4f} "
                      f"test_acc={eval_acc:.4f} test_loss={eval_loss:.4f}",
                      flush=True)
            else:
                print(f"Epoch {epoch}: train_acc={train_acc:.4f} "
                      f"train_loss={train_loss:.4f}", flush=True)
            if epoch % cfg.save_interval == 0:
                ckpt_lib.save_checkpoint(cfg.model_path, self.state)
        return self.state

"""Inference CLI: the main_test.py equivalent.

(reference: PointNetGPD/main_test.py) — load a checkpoint by --model_type or
path (reference pickled-torch files AND our orbax checkpoints both work),
resample the local gripper-frame cloud ``repeat`` times, score each resample,
and majority-vote — except the repeats run as ONE batched device call
(inference/scorer.py) instead of a host loop.

Usage:
  python -m pointnetgpd_tpu.cli.infer --model_type 3class --input cloud.npy
  python -m pointnetgpd_tpu.cli.infer --load-model ckpt_dir/step_100 --k 2
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# --model_type shortcuts (main_test.py:34-41)
MODEL_TYPES = {
    "100": ("../data/pointgpd_chann3_local.model", 3),
    "50": ("../data/pointgpd_50_points.model", 3),
    "3class": ("../data/pointnetgpd_3class.model", 3),
}


def build_parser():
    p = argparse.ArgumentParser(description="pointnetgpd_tpu inference")
    p.add_argument("--load-model", type=str,
                   default="../data/pointnetgpd_3class.model")
    p.add_argument("--model_type", type=str, default=None)
    p.add_argument("--k", type=int, default=3, help="classes (orbax ckpts)")
    p.add_argument("--input", type=str, default="",
                   help=".npy (N, 3) local gripper-frame cloud; random demo "
                        "cloud when omitted (main_test.py:81)")
    p.add_argument("--num-point", type=int, default=500)
    p.add_argument("--repeat", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ref-path", type=str, default="",
                   help="path containing the reference model package for "
                        "unpickling whole-module checkpoints")
    p.add_argument("--exact", action="store_true",
                   help="fp32-highest matmuls for bit-accurate parity vs the "
                        "reference (SURVEY.md hard parts: TPU matmul "
                        "precision); default uses the backend's fast path")
    return p


def load_scorer(args):
    from ..inference.scorer import GraspScorer

    path = args.load_model
    if args.model_type in MODEL_TYPES:
        path, _ = MODEL_TYPES[args.model_type]
    if path.endswith(".model") or path.endswith(".pt") or path.endswith(".pth"):
        ref_paths = [args.ref_path] if args.ref_path else []
        return GraspScorer.from_torch_checkpoint(
            path, ref_paths=ref_paths, num_points=args.num_point,
            repeat=args.repeat)
    # orbax TrainState checkpoint
    import os

    import jax

    from ..models.pointnet import init_pointnet_cls
    from ..training.checkpoint import latest_checkpoint, restore_checkpoint
    from ..training.train import init_train_state, make_optimizer

    # accept the train CLI's --model-path directory directly: resolve to
    # its newest step_N checkpoint (cli/train.py writes step_N subdirs)
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "_METADATA")):
        resolved = latest_checkpoint(path)
        if resolved is not None:
            print(f"resolved {path} -> {resolved}")
            path = resolved
    params, bn = init_pointnet_cls(jax.random.PRNGKey(0), input_chann=3,
                                   k=args.k)
    template = init_train_state(params, bn, make_optimizer())
    state = restore_checkpoint(path, template)
    return GraspScorer(params=state.params, state=state.bn_state, k=args.k,
                       num_points=args.num_point, repeat=args.repeat)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.exact:
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
    scorer = load_scorer(args)

    if args.input:
        local_pc = np.load(args.input)[:, :3].astype(np.float32)
    else:
        local_pc = np.random.random([500, 3]).astype(np.float32)  # demo

    pred, prob, votes = scorer.score_clouds(local_pc[None], seed=args.seed)
    print("voting:", votes[0].tolist())
    print("Test result:", int(pred[0]))
    print("class probabilities:", np.round(prob[0], 4).tolist())
    return 0


if __name__ == "__main__":
    sys.exit(main())

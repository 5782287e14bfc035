"""Offline grasp-label dataset generation: the generate-dataset-canny driver.

Re-design of the reference pipeline (reference:
dex-net/apps/generate-dataset-canny.py): instead of 50 worker processes each
looping per-grasp quality evaluations (do_job/worker, :34-143), one host
process drives batched device programs — antipodal sampling, friction-ladder
labeling, and Ferrari-Canny scoring each evaluate hundreds of grasps per
call. Output format matches the reference exactly: per-object ``.npy`` of
12-column rows (10-dim configuration + score_friction + score_canny,
:48-54) plus a pickle of (config, fc, canny) tuples.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.io import read_obj, read_sdf
from ..grasping.evaluation import (
    FC_LIST_FULL,
    FC_LIST_LESS_CLASS,
    evaluate_ferrari_canny,
    friction_boundary_labels,
)
from ..grasping.gripper import Gripper
from ..grasping.samplers import antipodal_sample_grasps


class LabelResult(NamedTuple):
    """``label_grasps_for_object`` output: reference-format rows + yield
    accounting (the reference's while-loop prints only a progress line,
    generate-dataset-canny.py:134; the quota shortfall is the number most
    predictive of downstream training quality, so we keep the books)."""

    rows: np.ndarray      # (N, 12) float32, reference .npy format
    counts: np.ndarray    # (n_fc,) accepted rows per friction class
    stats: dict           # rounds/attempts/accepted/exhausted/quota_met


def label_grasps_for_object(
    sdf,
    center_of_mass,
    gripper: Gripper,
    key,
    *,
    fc_list=None,
    grasps_per_class: int = 20,
    batch_attempts: int = 256,
    max_rounds: int | None = None,
    patience: int = 12,
    friction_coef_sampling: float = 2.0,
    num_samples_loa: int | None = None,
) -> LabelResult:
    """Sample + label grasps until every friction class has enough examples
    (the reference's while-loop, generate-dataset-canny.py:109-134; here the
    while-loop is host-side over fixed-shape device batches).

    Runs until the per-class quota is met, like the reference's unbounded
    while-loop — with two escape hatches the reference lacks: ``max_rounds``
    caps the total attempt budget (None = 40 rounds per quota grasp, scaled
    so bigger quotas get proportionally more budget), and ``patience``
    rounds with zero accepted rows declare the object's remaining classes
    exhausted (e.g. a sphere has no grasps that are force-closure ONLY at
    high friction — every diametric pair is antipodal at any mu).

    Returns LabelResult(rows (N, 12) float32, counts (n_fc,), stats).
    """
    fc_list = FC_LIST_LESS_CLASS if fc_list is None else np.asarray(fc_list)
    n_fc = len(fc_list)
    fc_dev = jnp.asarray(fc_list.astype(np.float32))
    counts = np.zeros(n_fc, dtype=int)
    rows = []
    if num_samples_loa is None:
        # resolution-adaptive line-of-action density (the reference's
        # samples_per_grid scaling, grasp.py:464-466): fixed 40 silently
        # finds NO contacts on fine prepare_objects grids (docs/QUIRKS.md)
        from ..grasping.grasp import adaptive_num_samples

        num_samples_loa = adaptive_num_samples(sdf, gripper.max_width)
    if max_rounds is None:
        max_rounds = 40 * max(1, -(-grasps_per_class // 20))
    rounds = accepted_total = 0
    stale = 0  # consecutive rounds with no accepted row

    for _ in range(max_rounds):
        rounds += 1
        key, k_sample = jax.random.split(key)
        sampled = antipodal_sample_grasps(
            sdf, k_sample, max_width=gripper.max_width,
            min_width=gripper.min_width,
            friction_coef=friction_coef_sampling,
            num_attempts=batch_attempts, num_samples_loa=num_samples_loa)
        keep = np.asarray(sampled.valid)
        configs = np.asarray(sampled.configs)[keep]
        if len(configs) == 0:
            stale += 1
            if stale >= patience:
                break
            continue
        # coverage rejection against this round's picks (the reference's
        # generate_grasps pruning, grasp_sampler.py:153-234)
        from ..grasping.samplers import dedupe_grasps

        configs = dedupe_grasps(configs, min_dist=0.0025)

        # bucket-pad to a multiple of 64 (repeating the first row) so the
        # jitted labeling programs compile once per BUCKET, not once per
        # round: the post-dedupe count differs every round, and each fresh
        # count otherwise recompiles friction_boundary_labels +
        # evaluate_ferrari_canny (~10-40 s each on a cold chip)
        n_real = len(configs)
        bucket = -(-n_real // 64) * 64
        if bucket > n_real:
            configs_padded = np.concatenate(
                [configs, np.repeat(configs[:1], bucket - n_real, axis=0)])
        else:
            configs_padded = configs
        configs_dev = jnp.asarray(configs_padded)
        label_fc, label_idx, valid = friction_boundary_labels(
            sdf, configs_dev, fc_dev, num_samples=num_samples_loa,
            n_fc=n_fc)
        canny, _ = evaluate_ferrari_canny(
            sdf, configs_dev, jnp.asarray(center_of_mass), label_fc,
            num_samples=num_samples_loa)

        label_fc = np.asarray(label_fc)[:n_real]
        label_idx = np.asarray(label_idx)[:n_real]
        valid = np.asarray(valid)[:n_real]
        canny = np.asarray(canny)[:n_real]

        accepted = 0
        for cfg, fc, idx, ok, cq in zip(configs, label_fc, label_idx, valid,
                                        canny):
            if not ok or counts[idx] >= grasps_per_class:
                continue
            counts[idx] += 1
            accepted += 1
            rows.append(np.concatenate([cfg[:10], [fc, cq]]).astype(np.float32))
        accepted_total += accepted
        stale = 0 if accepted else stale + 1

        if np.all(counts >= grasps_per_class):
            break
        if stale >= patience:
            break  # remaining classes exhausted for this object

    quota_met = bool(np.all(counts >= grasps_per_class))
    stats = {
        "rounds": rounds,
        "attempts": rounds * batch_attempts,
        "accepted": accepted_total,
        "quota_met": quota_met,
        "exhausted": not quota_met and stale >= patience,
        "per_class": counts.tolist(),
        "fc_list": np.asarray(fc_list, np.float32).round(2).tolist(),
    }
    return LabelResult(
        np.stack(rows) if rows else np.zeros((0, 12), np.float32),
        counts, stats)


def generate_for_object_dir(obj_dir: str, out_dir: str, gripper: Gripper,
                            seed: int = 0, *, filename_prefix: str = "default",
                            less_class: bool = True, **kwargs):
    """Process one YCB object directory (reference layout:
    {obj}/google_512k/nontextured.obj/.sdf — generate-dataset-canny.py:75-77).
    Writes {prefix}_{object}_{n}.npy + .pickle like the reference (:44-54)."""
    object_name = os.path.basename(obj_dir.rstrip("/"))
    obj_path = os.path.join(obj_dir, "google_512k", "nontextured.obj")
    sdf_path = os.path.join(obj_dir, "google_512k", "nontextured.sdf")
    if not (os.path.exists(obj_path) and os.path.exists(sdf_path)):
        print(f"can not find obj/sdf for {object_name}")
        return None

    from ..geometry.mesh import center_of_mass as mesh_com

    verts, faces = read_obj(obj_path)
    sdf = read_sdf(sdf_path)
    com = mesh_com(verts, faces)

    fc_list = FC_LIST_LESS_CLASS if less_class else FC_LIST_FULL
    rows, counts, stats = label_grasps_for_object(
        sdf, com, gripper, jax.random.PRNGKey(seed), fc_list=fc_list, **kwargs)
    stats["object"] = object_name
    stats["n_rows"] = int(len(rows))
    if len(rows) == 0:
        print(f"finished job {object_name}: 0 rows ({stats})")
        return None, stats

    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(out_dir, f"{filename_prefix}_{object_name}_{len(rows)}")
    np.save(base + ".npy", rows)
    with open(base + ".pickle", "wb") as f:
        pickle.dump([(r[:10], r[10], r[11]) for r in rows], f)
    status = "quota met" if stats["quota_met"] else (
        "EXHAUSTED" if stats["exhausted"] else "budget spent")
    print(f"finished job {object_name}: counts={counts.tolist()} "
          f"({status}, {stats['rounds']} rounds x "
          f"{stats['attempts'] // max(stats['rounds'], 1)} attempts)")
    return base + ".npy", stats


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="grasp-label dataset generation")
    p.add_argument("prefix", nargs="?", default="default")
    p.add_argument("--data-root",
                   default=os.environ.get("PointNetGPD_FOLDER", ""))
    p.add_argument("--out-dir", default="./generated_grasps")
    p.add_argument("--gripper", default="robotiq_85")
    p.add_argument("--grasps-per-class", type=int, default=20)
    # The reference hardcodes less_class=True "to accelerate the dataset
    # generate" (generate-dataset-canny.py:88-90), but its OWN training
    # thresholds only produce a 3-class (or balanced 2-class) task with the
    # full ladder: less_class frictions are {2.0, 1.6, 0.6}, and score =
    # fc + 0.01*canny can then never reach the main_1v_mc "good" band
    # (score <= 0.5, main_1v_mc.py thresh_good) — every row lands in class
    # 0/1 and training degenerates to majority-class. The full ladder
    # reaches 0.4 and makes all classes populated (docs/QUIRKS.md).
    p.add_argument("--ladder", choices=("less", "full"), default="less",
                   help="friction ladder: 'less' = [2.0, 1.6, 0.6] "
                   "(reference default), 'full' = 2.0..0.4 (required for "
                   "the 1v_mc/fullv_mc thresholds to see class 2)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-rounds", type=int, default=None,
                   help="attempt-budget escape hatch per object (rounds of "
                   "256 batched attempts); default scales with the quota")
    args = p.parse_args(argv)
    args.less_class = args.ladder == "less"

    gripper = Gripper.named(args.gripper)
    file_dir = os.path.join(args.data_root,
                            "PointNetGPD/data/ycb-tools/models/ycb")
    if not os.path.isdir(file_dir):
        p.error(
            f"no YCB object models at {file_dir!r} — point --data-root (or "
            "$PointNetGPD_FOLDER) at a directory containing "
            "PointNetGPD/data/ycb-tools/models/ycb (the reference's layout)")
    objects = sorted(
        os.path.join(file_dir, d) for d in os.listdir(file_dir)
        if os.path.isdir(os.path.join(file_dir, d)))
    # per-object fault tolerance: a failing object is logged and skipped,
    # like the reference's job-pool refill keeping generation going when a
    # worker dies (generate-dataset-canny.py:171-179)
    all_stats = []
    os.makedirs(args.out_dir, exist_ok=True)
    for i, obj_dir in enumerate(objects):
        try:
            _, stats = generate_for_object_dir(
                obj_dir, args.out_dir, gripper, seed=args.seed + i,
                filename_prefix=args.prefix, less_class=args.less_class,
                grasps_per_class=args.grasps_per_class,
                max_rounds=args.max_rounds)
            all_stats.append(stats)
        except Exception as e:
            with open(os.path.join(args.out_dir, "exceptions.txt"), "a") as f:
                f.write(f"{obj_dir}: {e}\n")
            print(f"FAILED {obj_dir}: {e}")
    # yield accounting: per-object per-class counts + quota status (the
    # number most predictive of training quality; the reference only prints
    # a progress line, generate-dataset-canny.py:134)
    if all_stats:
        rows_per_obj = [s["n_rows"] for s in all_stats]
        summary = {
            "grasps_per_class": args.grasps_per_class,
            "n_classes": len(all_stats[0]["fc_list"]),
            "target_rows_per_object": (args.grasps_per_class
                                       * len(all_stats[0]["fc_list"])),
            "total_rows": int(sum(rows_per_obj)),
            "rows_min": int(min(rows_per_obj)),
            "rows_median": float(np.median(rows_per_obj)),
            "rows_max": int(max(rows_per_obj)),
            "objects_quota_met": sum(s["quota_met"] for s in all_stats),
            "objects_exhausted": sum(s["exhausted"] for s in all_stats),
            "objects": all_stats,
        }
        with open(os.path.join(args.out_dir, "yield_summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
    print("All job done.")


if __name__ == "__main__":
    main()

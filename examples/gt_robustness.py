"""Ground-truth robustness checks on an existing integrated-workflow tree:
re-run the detect stage (a) with a different GPG sampler seed on the same
scene and (b) on a different 3-object scene (the next-largest objects),
against the SAME trained checkpoint — does the classifier's
top-k-beats-pool ground-truth result survive a fresh candidate pool and a
fresh scene? (Reference context: kinect2grasp.py publishes whatever the
model approves per frame; it has no ground-truth check at all.)

Usage: python examples/gt_robustness.py --root /tmp/wf5 [--seed 7]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.integrated_workflow import detect_stage  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/wf5")
    p.add_argument("--seed", type=int, default=7,
                   help="GPG sampler seed for the same-scene re-run")
    p.add_argument("--num-seeds", type=int, default=400)
    p.add_argument("--num-point", type=int, default=750)
    p.add_argument("--skip-same-scene", action="store_true")
    p.add_argument("--skip-new-scene", action="store_true")
    p.add_argument("--out", default=None,
                   help="write results JSON here (default <root>/gt_robustness.json)")
    args = p.parse_args(argv)

    root = os.path.abspath(args.root)
    ckpt = os.path.join(root, "learned_models")
    base = os.path.join(root, "PointNetGPD/data/ycb-tools/models/ycb")
    names = sorted(os.listdir(base))

    out = {}
    if not args.skip_same_scene:
        det = detect_stage(root, ckpt, names, seed=args.seed,
                           num_classes=2, num_seeds=args.num_seeds,
                           num_point=args.num_point)
        out["same_scene_new_sampler_seed"] = {"seed": args.seed, **det}
        print("same-scene seed", args.seed, "->",
              json.dumps(det["production"]["ground_truth"]), flush=True)

    if not args.skip_new_scene:
        # drop the original picks so detect_stage's 3-largest rule lands on
        # the NEXT trio — a different scene, same trained model
        prev = out.get("same_scene_new_sampler_seed", {}).get("scene_objects")
        if prev is None:
            det0 = json.load(open(os.path.join(root, "det.json")))
            prev = det0["scene_objects"]
        rest = [n for n in names if n not in set(prev)]
        det2 = detect_stage(root, ckpt, rest, seed=0, num_classes=2,
                            num_seeds=args.num_seeds,
                            num_point=args.num_point)
        out["new_scene"] = det2
        print("new scene", det2["scene_objects"], "->",
              json.dumps(det2["production"]["ground_truth"]), flush=True)

    dst = args.out or os.path.join(root, "gt_robustness.json")
    json.dump(out, open(dst, "w"), indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

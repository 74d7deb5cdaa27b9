"""Measure the host-structure stochasticity trade-off (round-4 verdict
item 6): TRAIN.host_structure=True reuses ONE order permutation per batch
across every pooling stage (the host-precomputed CPE maps are only valid in
the unshuffled cascade), while the reference redraws the permutation after
each pooling (SerializedPooling, model.py:220-224) — the False setting here.

Same-seed short-horizon A/B: for each seed, train the release-config policy
twice (host_structure on/off) on the learnable synthetic store and record
the loss curves. Emits one JSON artifact (HOST_STRUCT_AB_r05.json) with the
curves and the final/percentile losses per arm, so the default is justified
by data rather than prose.

  python scripts/host_structure_ab.py --steps 600 --seeds 0 1 2 \
      --out HOST_STRUCT_AB_r05.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _config(workdir, steps, seed, host_structure, scale="release"):
    from robot3dlotus_tpu.configs.node import ConfigNode
    from scripts.e2e_learning_proof import _config as base_config
    cfg = base_config(workdir, steps, scale)
    cfg.SEED = seed
    cfg.TRAIN.host_structure = host_structure
    cfg.TRAIN.log_steps = max(steps // 60, 1)
    cfg.output_dir = os.path.join(
        workdir, f"hs{int(host_structure)}_seed{seed}")
    return cfg


def run_arm(workdir, steps, seed, host_structure, scale):
    from robot3dlotus_tpu.train import train_simple_policy
    cfg = _config(workdir, steps, seed, host_structure, scale)
    cfg.freeze()
    train_simple_policy.main(cfg)
    metrics = [json.loads(line) for line in
               open(os.path.join(cfg.output_dir, "logs", "metrics.jsonl"))]
    return [{"step": m["step"], "total": round(m["total"], 4),
             "pos": round(m.get("pos", float("nan")), 4)}
            for m in metrics if "total" in m]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="HOST_STRUCT_AB_r05.json")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--scale", choices=("release", "tiny"),
                    default="release")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)
    workdir = args.workdir or tempfile.mkdtemp(prefix="hs_ab_")

    arms = {}
    for hs in (True, False):
        for seed in args.seeds:
            key = f"host_structure={hs} seed={seed}"
            print(f"=== {key} ===", flush=True)
            arms[key] = run_arm(workdir, args.steps, seed, hs, args.scale)

    def final_mean(hs):
        vals = [arms[f"host_structure={hs} seed={s}"][-1]["total"]
                for s in args.seeds]
        return round(float(np.mean(vals)), 4), \
            round(float(np.std(vals)), 4)

    on_mean, on_std = final_mean(True)
    off_mean, off_std = final_mean(False)
    out = {
        "what": "same-seed loss-curve A/B of the host-structure "
                "single-perm-per-batch trade-off vs the reference's "
                "per-stage order redraw (TRAIN.host_structure False)",
        "scale": args.scale, "steps": args.steps, "seeds": args.seeds,
        "final_total_host_structure_on": {"mean": on_mean, "std": on_std},
        "final_total_host_structure_off": {"mean": off_mean,
                                           "std": off_std},
        "curves": arms,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "curves"}))


if __name__ == "__main__":
    main()

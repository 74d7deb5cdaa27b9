"""Audit the PTv3 per-stage pooling capacities against real cloud statistics.

The TPU backbone runs on padded dense tensors: stage s holds at most cap[s]
points, and pooling segments whose unique-parent count exceeds the child
stage's capacity silently DROP geometry (ops/pooling.py; telemetry:
pool_overflow). The default schedule halves capacity per stage
(models/ptv3.py _stage_caps) — this script measures the actual worst-case
unique-parent counts per stage over clouds produced by the release
preprocessing chain, so release capacities are data-driven, not a guess
(round-2 verdict item 8). The reference has no cap to diverge from
(model.py:683-790 pools ragged tensors), so overflow==0 is the parity bar.

Usage:
  python scripts/audit_pool_capacity.py                      # synthetic store
  python scripts/audit_pool_capacity.py --data-dir <gembench voxel1cm dir>
  python scripts/audit_pool_capacity.py --stage-caps 4096,2048,1024,512,256

Exits non-zero if any stage overflows the audited capacity schedule.
Prints one JSON record with per-stage maxima and the recommended
`MODEL.ptv3_config.stage_caps` override when the default would drop points.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def unique_parent_counts(xyz, grid_size, depth, num_stages):
    """Per-stage unique-voxel counts for one cloud under the backbone's
    grid/serialization semantics (models/ptv3.py compute_grid_coord: floor
    after per-cloud min shift; pooling halves the grid per stage)."""
    gc = np.floor((xyz - xyz.min(0, keepdims=True)) /
                  np.float32(grid_size)).astype(np.int64)
    np.clip(gc, 0, (1 << depth) - 1, out=gc)
    counts = []
    for s in range(num_stages):
        if s > 0:
            gc = gc >> 1
        key = (gc[:, 0] << (2 * depth)) | (gc[:, 1] << depth) | gc[:, 2]
        counts.append(int(np.unique(key).size))
    return counts


def default_caps(n0, num_stages, min_patch=128):
    caps = [n0]
    for _ in range(1, num_stages):
        caps.append(max(caps[-1] // 2, min_patch))
    return caps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="synthetic",
                    help="GemBench voxel1cm LMDB root, or 'synthetic'")
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--num-stages", type=int, default=5)
    ap.add_argument("--serial-depth", type=int, default=10)
    ap.add_argument("--grid-size", type=float, default=0.01)
    ap.add_argument("--min-patch", type=int, default=128)
    ap.add_argument("--samples", type=int, default=64,
                    help="max (episode x augmentation) samples to audit")
    ap.add_argument("--augment-seeds", type=int, default=4,
                    help="augmentation draws per step (training augments, "
                    "so the worst case must include rotated clouds)")
    ap.add_argument("--stage-caps", default=None,
                    help="comma-separated capacities to audit instead of "
                    "the halve-per-stage default")
    args = ap.parse_args()

    from robot3dlotus_tpu.train.datasets.store import open_store
    from robot3dlotus_tpu.train.datasets.keystep_dataset import KeystepDataset

    store = open_store(args.data_dir)
    maxima = [0] * args.num_stages
    worst = [None] * args.num_stages
    n_samples = 0
    for aug_seed in range(args.augment_seeds):
        ds = KeystepDataset(
            store, num_points=args.num_points, xyz_shift="center",
            xyz_norm=False, use_height=True, rot_type="euler_disc",
            rm_table=True, rm_robot="box_keep_gripper", augment_pc=True,
            aug_max_rot=180, pos_type="disc",
            rng=np.random.RandomState(1000 + aug_seed))
        for idx in range(len(ds)):
            if n_samples >= args.samples:
                break
            for s_i, sample in enumerate(ds[idx]):
                xyz = sample["pc_fts"][:, :3]
                cs = unique_parent_counts(
                    xyz, args.grid_size, args.serial_depth, args.num_stages)
                for s, c in enumerate(cs):
                    if c > maxima[s]:
                        maxima[s] = c
                        worst[s] = f"{ds.data_ids[idx]}-t{s_i}"
                n_samples += 1
        if n_samples >= args.samples:
            break

    if args.stage_caps:
        caps = [int(c) for c in args.stage_caps.split(",")]
        assert len(caps) == args.num_stages
        schedule = "explicit"
    else:
        caps = default_caps(args.num_points, args.num_stages,
                            args.min_patch)
        schedule = "default //2"
    overflow = [max(0, m - c) for m, c in zip(maxima, caps)]
    rec = {
        "data_dir": args.data_dir,
        "samples_audited": n_samples,
        "num_points": args.num_points,
        "stage_max_unique": maxima,
        "audited_caps": caps,
        "cap_schedule": schedule,
        "stage_overflow": overflow,
        "worst_sample_per_stage": worst,
        "ok": not any(overflow),
    }
    if any(overflow):
        # measured max + ~10% headroom, rounded up to a patch-size multiple
        # (keeps attention patch tiling clean); capped at num_points
        rec["recommended_stage_caps"] = [
            min(args.num_points,
                int(-(-int(m * 1.1) // args.min_patch)) * args.min_patch)
            for m in maxima]
    print(json.dumps(rec, indent=1))
    sys.exit(0 if rec["ok"] else 1)


if __name__ == "__main__":
    main()

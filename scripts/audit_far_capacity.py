"""Audit the windowed-conv far-list capacities against real cloud statistics.

The stem and CPE convs realize neighbor links inside a sorted window on the
device (ops/pallas_stem.py, ops/pallas_conv.py); links OUTSIDE the window
ride host-shipped per-tap far lists whose per-tap capacity (Fk) is a static
shape. Oversized capacities are pure waste: the far gather/scatter fusions
are row-count-bound on this chip (~8 ns/row measured, BENCH_NOTES r05), so
every unused slot costs the same as a real link every step — the r04 stem
capacity of 512/tap put 1.02M far rows per batch through three >8 ms
fusions while the worst measured per-tap count was ~350. Undersized
capacities DROP links (non-silent: stem_far_dropped / cpe_far_dropped{s}
telemetry), which breaks parity with the reference's exact sparse conv
(model.py:616-622 gathers every link).

This script measures the raw (pre-compaction) per-tap far-count
distribution over clouds from the release preprocessing chain — including
rotation augmentation and every serialization-order draw, both of which
reshuffle SFC locality — and recommends per-family capacities at
`--margin` (default 1.25x) over the observed per-tap maximum, rounded up
to a multiple of 8.

Usage:
  python scripts/audit_far_capacity.py                  # synthetic store
  python scripts/audit_far_capacity.py --data-dir <gembench voxel1cm dir>

Exits non-zero if the CURRENT defaults would drop links on the audited
clouds. Prints one JSON record.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def far_tap_counts(nm, halo, P):
    """Raw far-link count per (cloud, tap) for a window of tile P and halo
    `halo` — the same geometry as structure._far_lists_np, without the
    capacity compaction. nm: (B, cap, K) int16, -1 = missing."""
    B, cap, K = nm.shape
    Wn = min(cap, P + 2 * halo)
    if Wn == cap:
        return None
    row = np.arange(cap, dtype=np.int32)
    ws = np.clip((row // P) * P - halo, 0, max(cap - Wn, 0)).astype(np.int32)
    nmT = nm.transpose(0, 2, 1).astype(np.int32)
    rel = nmT - ws[None, None, :]
    fm = (rel < 0) | (rel >= Wn)
    fm &= nmT >= 0
    return fm.sum(axis=-1)  # (B, K)


def round8(x):
    return int(-(-int(x) // 8) * 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="synthetic")
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--batches", type=int, default=24,
                    help="release-shape batches (16 clouds each) to audit")
    ap.add_argument("--margin", type=float, default=1.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from robot3dlotus_tpu.train.datasets.store import open_store
    from robot3dlotus_tpu.train.datasets.keystep_dataset import KeystepDataset
    from robot3dlotus_tpu.train.datasets.collate import (
        collate_keystep_samples)
    from robot3dlotus_tpu.train.datasets.structure import (
        attach_host_structure, structure_cfg_from_model,
        _stage_knob_np, _choose_tile_np)
    from robot3dlotus_tpu.ops.pallas_stem import (
        DEFAULT_STEM_HALO, DEFAULT_STEM_FAR_PER_TAP, _stem_tile)
    from robot3dlotus_tpu.ops.pallas_conv import DEFAULT_CONV_FAR_PER_TAP
    from __graft_entry__ import RELEASE_PTV3, RELEASE_ACT

    scfg = structure_cfg_from_model({
        "model_class": "SimplePolicyPTV3CA",
        "ptv3_config": dict(RELEASE_PTV3),
        "action_config": RELEASE_ACT})

    store = open_store(args.data_dir)
    rng = np.random.RandomState(args.seed)
    ds = KeystepDataset(
        store, num_points=args.num_points, xyz_shift="center",
        xyz_norm=False, use_height=True, rot_type="euler_disc",
        rm_table=True, rm_robot="box_keep_gripper", augment_pc=True,
        aug_max_rot=180, pos_type="disc",
        rng=np.random.RandomState(args.seed + 1))
    steps = []
    for idx in range(len(ds)):
        steps.extend(ds[idx])
        if len(steps) >= 16 * max(args.batches // 4, 1):
            break

    fams = ["stem"] + [f"s{s}" for s in range(scfg["num_stages"])]
    counts = {f: [] for f in fams}
    for _ in range(args.batches):
        chunk = [steps[int(j)]
                 for j in rng.randint(0, len(steps), 16)]
        batch = collate_keystep_samples(chunk, args.num_points)
        batch = attach_host_structure(batch, scfg, rng)
        nm = np.asarray(batch["stem_nmap"])
        c = far_tap_counts(nm, DEFAULT_STEM_HALO, _stem_tile(nm.shape[1]))
        if c is not None:
            counts["stem"].append(c)
        for s in range(scfg["num_stages"]):
            key = f"cpe_nmap{s}"
            if key not in batch:
                continue
            nms = np.asarray(batch[key])
            c = far_tap_counts(
                nms, _stage_knob_np(scfg.get("conv_halo", 256), s),
                _choose_tile_np(nms.shape[1]))
            if c is not None:
                counts[f"s{s}"].append(c)

    cur = {"stem": int(DEFAULT_STEM_FAR_PER_TAP)}
    for s in range(scfg["num_stages"]):
        cur[f"s{s}"] = _stage_knob_np(
            scfg.get("conv_far_per_tap", DEFAULT_CONV_FAR_PER_TAP), s)

    rec = {"data_dir": args.data_dir, "batches": args.batches,
           "clouds": args.batches * 16, "margin": args.margin,
           "families": {}}
    would_drop = False
    for f in fams:
        if not counts[f]:
            rec["families"][f] = {"far": 0, "note": "window covers cloud"}
            continue
        a = np.concatenate(counts[f], 0)
        tot = a.sum(-1)
        tap_max = int(a.max())
        recommend = max(round8(tap_max * args.margin), 8)
        entry = {
            "taps": int(a.shape[1]),
            "tap_max": tap_max,
            "tap_mean": round(float(a.mean()), 1),
            "tap_p99": int(np.percentile(a, 99)),
            "cloud_total_max": int(tot.max()),
            "cloud_total_mean": int(tot.mean()),
            "current_cap": cur[f],
            "current_rows_per_cloud": cur[f] * int(a.shape[1]),
            "recommended_cap": recommend,
            "current_would_drop": bool(tap_max > cur[f]),
        }
        would_drop |= entry["current_would_drop"]
        rec["families"][f] = entry

    out = json.dumps(rec, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    return 1 if would_drop else 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate the real-C-lmdb interchange fixture (round-3 verdict item 6).

Run this on ANY host where the `lmdb` Python binding (the real liblmdb)
exists — the dev image is zero-egress and ships neither the binding nor
liblmdb, so the fixture must be produced elsewhere and committed:

  python scripts/make_lmdb_fixture.py   # writes tests/fixtures/lmdb_gembench/

It writes a <=1 MB GemBench-format LMDB directory (keysteps_bbox_pcd/
voxel1cm layout: one env per taskvar, episode keys, msgpack_numpy values —
reference genrobo3d/train/datasets/simple_policy_dataset.py:67-68) with the
REAL C library, plus a manifest of expected contents. The committed fixture
makes tests/test_lmdb_format.py::test_real_lmdb_fixture_roundtrip read
real-lmdb bytes through the pure-Python reader UNCONDITIONALLY.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "lmdb_gembench")
TASKVARS = ("close_jar+0", "push_button+0")
EPISODES = 2


def episode_record(tv_index: int, ep_index: int):
    """Small deterministic GemBench-shaped episode (~50 KB packed)."""
    rng = np.random.RandomState(1000 + tv_index * 31 + ep_index)
    T = 2
    xyz = [rng.rand(400, 3).astype(np.float32) for _ in range(T)]
    rgb = [rng.randint(0, 256, (400, 3)).astype(np.uint8) for _ in range(T)]
    action = rng.rand(T + 1, 8).astype(np.float32)
    return {"xyz": xyz, "rgb": rgb, "action": action}


def main():
    import lmdb  # the real binding — this script runs where it exists
    from robot3dlotus_tpu.train.datasets.store import _pack_np

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    manifest = {"taskvars": list(TASKVARS), "episodes": EPISODES,
                "lmdb_version": lmdb.version()}
    for ti, tv in enumerate(TASKVARS):
        path = os.path.join(FIXTURE_DIR, tv)
        env = lmdb.open(path, map_size=4 * 1024 * 1024)
        with env.begin(write=True) as txn:
            for ei in range(EPISODES):
                txn.put(f"episode{ei}".encode(),
                        _pack_np(episode_record(ti, ei)))
        env.close()
        # drop the lock file (useless in a committed fixture)
        lock = os.path.join(path, "lock.mdb")
        if os.path.exists(lock):
            os.remove(lock)
    with open(os.path.join(FIXTURE_DIR, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    total = sum(os.path.getsize(os.path.join(r, x))
                for r, _, fs in os.walk(FIXTURE_DIR) for x in fs)
    print(f"fixture written to {FIXTURE_DIR} ({total/1024:.0f} KB)")
    assert total <= 1024 * 1024, "fixture must stay <= 1 MB"


if __name__ == "__main__":
    main()

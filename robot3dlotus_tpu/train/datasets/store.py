"""Episode stores: where keystep episodes live on the host.

The reference uses LMDB+msgpack (simple_policy_dataset.py:62-79). This
framework supports three interchangeable backends behind one API:

  * LmdbStore       — reads the reference's GemBench LMDB layout verbatim
                      (via the `lmdb` binding when present, else the pure-
                      Python format reader in pylmdb.py).
  * MsgpackDirStore — our own dependency-light format: one .msgpack file per
                      episode under <root>/<taskvar>/<episode>.msgpack.
  * SyntheticStore  — procedurally generated episodes with the exact field
                      layout of the GemBench keysteps_bbox_pcd records; used
                      for tests and benchmarking when no dataset is present.

Episode record fields (GemBench voxel1cm layout, preprocess/
gen_simple_policy_data.py:45-117):
  xyz:   list[t] of (n_t, 3) float   voxelized world-space points
  rgb:   list[t] of (n_t, 3) uint8
  action: (t+1, 8) float — gripper pose+open per keystep
  bbox_info / pose_info: dict[str] -> (t, ...) arrays for RobotBox
"""
from __future__ import annotations

import os
import io
from typing import Iterator, List, Tuple

import numpy as np
import msgpack


def _pack_np(obj):
    """msgpack encode with msgpack_numpy's exact wire format for ndarrays
    (b'nd'/b'type'/b'kind'/b'shape'/b'data') so our bytes are readable by
    the reference's msgpack_numpy-patched loaders and vice versa
    (simple_policy_dataset.py:62-79, generate_dataset_keysteps.py:100-147).
    numpy scalars are lowered to plain python numbers (reference records
    only carry arrays/lists/strings at the scalar positions)."""
    def default(o):
        if isinstance(o, np.ndarray):
            if o.dtype.kind == "V":
                raise TypeError("structured ndarrays unsupported")
            return {b"nd": True, b"type": o.dtype.str, b"kind": b"",
                    b"shape": list(o.shape), b"data": o.tobytes()}
        if isinstance(o, np.bool_):
            return bool(o)
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        raise TypeError(type(o))
    return msgpack.packb(obj, default=default, use_bin_type=True)


def _unpack_np(buf):
    """msgpack decode accepting msgpack_numpy's wire format (what GemBench
    LMDB values and our own _pack_np contain) plus this repo's legacy
    '__nd__' convention from pre-round-3 MsgpackDirStore files."""
    def object_hook(o):
        nd = o.get(b"nd", o.get("nd"))
        if nd is True:
            d = o.get(b"data", o.get("data"))
            t = o.get(b"type", o.get("type"))
            s = o.get(b"shape", o.get("shape"))
            return np.frombuffer(d, dtype=np.dtype(t)).reshape(s)
        if nd is False:  # msgpack_numpy numpy scalar
            d = o.get(b"data", o.get("data"))
            t = o.get(b"type", o.get("type"))
            return np.frombuffer(d, dtype=np.dtype(t))[0]
        if o.get(b"__nd__") or o.get("__nd__"):
            d = o.get(b"d", o.get("d"))
            t = o.get(b"t", o.get("t"))
            s = o.get(b"s", o.get("s"))
            return np.frombuffer(d, dtype=np.dtype(t)).reshape(s)
        return o
    return msgpack.unpackb(buf, object_hook=object_hook, raw=False,
                           strict_map_key=False)


class MsgpackDirStore:
    """<root>/<taskvar>/<episode>.msgpack"""

    def __init__(self, root: str):
        self.root = root

    def taskvars(self) -> List[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)))

    def episodes(self, taskvar: str) -> List[str]:
        d = os.path.join(self.root, taskvar)
        return sorted(f[:-8] for f in os.listdir(d) if f.endswith(".msgpack"))

    def get(self, taskvar: str, episode: str):
        path = os.path.join(self.root, taskvar, episode + ".msgpack")
        with open(path, "rb") as f:
            return _unpack_np(f.read())

    def put(self, taskvar: str, episode: str, record) -> None:
        d = os.path.join(self.root, taskvar)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, episode + ".msgpack"), "wb") as f:
            f.write(_pack_np(record))


class LmdbStore:
    """Reads the reference GemBench LMDB layout (one env per taskvar).

    Uses the `lmdb` binding when importable; otherwise the pure-Python
    format reader (pylmdb.LmdbFileReader) parses data.mdb directly, so a
    GemBench checkout is readable on this image with no native deps.

    Thread-safety: LMDB environments may be shared across threads, but a
    read TRANSACTION must only be used by one thread at a time — the
    loader's worker pool calls get() concurrently, so transactions are
    cached per-thread (threading.local) while environments are shared
    under a lock. (The pure reader is stateless after open and needs no
    per-thread handling.)"""

    def __init__(self, root: str):
        import threading
        try:
            import lmdb  # optional dependency
        except ImportError:
            lmdb = None
        self.root = root
        self._lmdb = lmdb
        self._envs = {}
        self._env_lock = threading.Lock()
        self._local = threading.local()

    def taskvars(self):
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)))

    def _env(self, taskvar):
        env = self._envs.get(taskvar)
        if env is None:
            with self._env_lock:
                env = self._envs.get(taskvar)
                if env is None:
                    path = os.path.join(self.root, taskvar)
                    if self._lmdb is not None:
                        env = self._lmdb.open(path, readonly=True,
                                              lock=False)
                    else:
                        from .pylmdb import LmdbFileReader
                        env = LmdbFileReader(path)
                    self._envs[taskvar] = env
        return env

    def _txn(self, taskvar):
        txns = getattr(self._local, "txns", None)
        if txns is None:
            txns = self._local.txns = {}
        txn = txns.get(taskvar)
        if txn is None:
            txn = txns[taskvar] = self._env(taskvar).begin()
        return txn

    def episodes(self, taskvar):
        if self._lmdb is None:
            return [k.decode() for k in self._env(taskvar).keys()]
        txn = self._txn(taskvar)
        return [k.decode() for k in txn.cursor().iternext(values=False)]

    def get(self, taskvar, episode):
        if self._lmdb is None:
            raw = self._env(taskvar).get(episode.encode())
        else:
            raw = self._txn(taskvar).get(episode.encode())
        return _unpack_np(raw)


class LmdbWriterStore:
    """Writes the reference GemBench LMDB layout (one env per taskvar,
    msgpack values — preprocess/generate_dataset_keysteps.py:100-147).

    With the `lmdb` binding each put() is its own write txn, matching the
    reference's incremental flow. Without it, records are buffered and the
    pure-Python single-commit writer (pylmdb.write_lmdb) emits each env on
    close() — same bytes-on-disk contract, readable by the real binding."""

    def __init__(self, root: str, map_size=int(1024 ** 4)):
        try:
            import lmdb
        except ImportError:
            lmdb = None
        self.root = root
        self._lmdb = lmdb
        self.map_size = map_size
        self._envs = {}
        self._pending = {}  # pure-writer buffers: taskvar -> {key: bytes}
        self._flushed = set()  # pure-writer: taskvars already on disk
        os.makedirs(root, exist_ok=True)

    def _env(self, taskvar):
        if taskvar not in self._envs:
            self._envs[taskvar] = self._lmdb.open(
                os.path.join(self.root, taskvar), map_size=self.map_size)
        return self._envs[taskvar]

    def put(self, taskvar: str, episode: str, record) -> None:
        if self._lmdb is None:
            # single-commit writer: buffer per taskvar, flush whenever the
            # (taskvar-major) producer moves on — bounds RAM to one taskvar.
            # write_lmdb replaces the whole env, so revisiting a flushed
            # taskvar would silently drop its earlier episodes: enforce the
            # taskvar-major contract instead of assuming it
            if taskvar in self._flushed:
                raise ValueError(
                    f"LmdbWriterStore (pure-Python path): taskvar "
                    f"{taskvar!r} was already flushed to disk; writes must "
                    f"be taskvar-major (group all episodes of a taskvar "
                    f"together), or use the real lmdb binding for "
                    f"incremental writes")
            for done in [tv for tv in self._pending if tv != taskvar]:
                self._flush(done)
            self._pending.setdefault(taskvar, {})[
                episode.encode("ascii")] = _pack_np(record)
            return
        env = self._env(taskvar)
        with env.begin(write=True) as txn:
            txn.put(episode.encode("ascii"), _pack_np(record))

    def _flush(self, taskvar):
        from .pylmdb import write_lmdb
        write_lmdb(os.path.join(self.root, taskvar),
                   self._pending.pop(taskvar))
        self._flushed.add(taskvar)

    def close(self):
        for env in self._envs.values():
            env.close()
        self._envs = {}
        for taskvar in list(self._pending):
            self._flush(taskvar)


def open_output_store(path: str, kind: str = "auto"):
    """Writable episode store: 'lmdb' (reference layout — via the binding
    or the pure-Python writer) or 'msgpack' (this framework's own dependency-
    light format). 'auto' = lmdb: the reference layout needs no native deps
    anymore (pylmdb)."""
    if kind in ("auto", "lmdb"):
        return LmdbWriterStore(path)
    return MsgpackDirStore(path)


class SyntheticStore:
    """Procedural GemBench-shaped episodes (deterministic per episode id).

    Episodes are generated once and memoized as *encoded* msgpack bytes;
    every `get` decodes them, so repeated reads cost exactly what an
    LmdbStore read costs (decode only). Without this, loader benchmarks
    measured the procedural generator (dominated by the voxel dedup) rather
    than the input pipeline."""

    def __init__(self, num_taskvars=4, episodes_per_taskvar=8,
                 steps_per_episode=4, points_per_step=12000, seed=0,
                 action_mode="random"):
        """action_mode:
          'random' — keystep actions are i.i.d. draws (episode-memorization
            is the only signal; the default for loader/shape benchmarks).
          'reach'  — a LEARNABLE synthetic task: every next-keystep action
            is a deterministic function of the current observation (reach
            the object-blob centroid, canonical orientation, gripper
            alternating by step), so a policy trained on some episodes
            generalizes to held-out ones — the sim-free end-to-end
            learning proof (scripts/e2e_learning_proof.py) trains on 8
            episodes/task and evaluates ReplayEnv success on 16."""
        self._tv = [f"synthetic_task{i}+0" for i in range(num_taskvars)]
        self._eps = [f"episode{j}" for j in range(episodes_per_taskvar)]
        self.steps = steps_per_episode
        self.npts = points_per_step
        self.seed = seed
        self.action_mode = action_mode
        self._cache = {}

    def taskvars(self):
        return list(self._tv)

    def episodes(self, taskvar):
        return list(self._eps)

    def get(self, taskvar, episode):
        key = (taskvar, episode)
        if key not in self._cache:
            self._cache[key] = _pack_np(self._generate(taskvar, episode))
        return _unpack_np(self._cache[key])

    def _generate(self, taskvar, episode):
        tvi = self._tv.index(taskvar)
        epi = self._eps.index(episode)
        rng = np.random.RandomState(
            self.seed * 100003 + tvi * 1009 + epi)
        T, n = self.steps, self.npts
        ws_z = 0.7505
        xyz, rgb = [], []
        blob_centroids = []
        for t in range(T):
            # a tabletop-ish scene: slab + a few blobs above the table
            base = rng.uniform([-0.1, -0.35, ws_z + 0.001],
                               [0.5, 0.35, ws_z + 0.002], (n // 2, 3))
            blobs = rng.randn(n - n // 2, 3) * 0.05 + \
                rng.uniform([0.0, -0.2, ws_z + 0.05],
                            [0.4, 0.2, ws_z + 0.3], (1, 3))
            blob_centroids.append(blobs.mean(0).astype(np.float32))
            pts = np.concatenate([base, blobs], 0).astype(np.float32)
            # voxel-dedup at 1 cm like the preprocessing chain; coords are
            # bounded (|x|<~2 m -> |vox|<200) so a packed 1-D key makes the
            # unique a plain int64 sort instead of a structured-axis sort
            vox = np.round(pts / 0.01).astype(np.int64) + 512
            key = (vox[:, 0] << 20) | (vox[:, 1] << 10) | vox[:, 2]
            _, idx = np.unique(key, return_index=True)
            pts = pts[np.sort(idx)]
            xyz.append(pts)
            rgb.append(rng.randint(0, 256, (len(pts), 3)).astype(np.uint8))
        if self.action_mode == "reach":
            # next-keystep action is a FUNCTION of the current cloud:
            # reach the blob centroid, canonical quat, gripper by parity —
            # learnable from the observation, so training transfers to
            # episodes never seen (ReplayEnv scores within 5 cm + gripper)
            pos = np.stack([blob_centroids[0]]
                           + blob_centroids)            # (T+1, 3)
            quat = np.tile(np.array([0, 0, 0, 1], np.float32), (T + 1, 1))
            grip = (np.arange(T + 1) % 2).astype(np.float32)[:, None]
            action = np.concatenate([pos, quat, grip], 1).astype(np.float32)
        else:
            quat = rng.randn(T + 1, 4)
            quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
            action = np.concatenate([
                rng.uniform([-0.1, -0.3, ws_z], [0.5, 0.3, ws_z + 0.4],
                            (T + 1, 3)),
                quat,
                rng.randint(0, 2, (T + 1, 1)).astype(np.float64),
            ], axis=1).astype(np.float32)

        bbox_info, pose_info = {}, {}
        from ...utils.robot_box import RLBENCH_ARM_LINKS, RLBENCH_GRIPPER_LINKS
        for link in RLBENCH_ARM_LINKS + RLBENCH_GRIPPER_LINKS:
            kind = "visual" if link in ("Panda_link0", "Panda_rightfinger",
                                        "Panda_leftfinger", "Panda_gripper") \
                else "respondable"
            bb = np.tile(np.array([-0.04, 0.04, -0.04, 0.04, -0.08, 0.08],
                                  np.float32), (T, 1))
            pos = rng.uniform([-0.3, -0.4, ws_z], [0.0, 0.4, ws_z + 0.6],
                              (T, 3))
            q = rng.randn(T, 4)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            bbox_info[f"{link}_{kind}_bbox"] = bb
            pose_info[f"{link}_{kind}_pose"] = np.concatenate(
                [pos, q], 1).astype(np.float32)
        return {
            "xyz": xyz, "rgb": rgb, "action": action,
            "bbox_info": bbox_info, "pose_info": pose_info,
        }


class SyntheticMotionStore(SyntheticStore):
    """Synthetic episodes with the motion_keysteps_bbox_pcd layout
    (xyz/rgb/sem/trajs/ee_pose/is_new_keystep)."""

    def get(self, taskvar, episode):
        rec = super().get(taskvar, episode)
        tvi = self._tv.index(taskvar)
        epi = self._eps.index(episode)
        rng = np.random.RandomState(self.seed * 7919 + tvi * 131 + epi + 17)
        T = self.steps
        rec["sem"] = [rng.randint(0, 100, (len(x),)).astype(np.int32)
                      for x in rec["xyz"]]
        rec["ee_pose"] = rec["action"][:T]
        trajs = []
        for t in range(T):
            L = rng.randint(1, 6)
            q = rng.randn(L, 4)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            trajs.append(np.concatenate([
                rng.uniform([-0.1, -0.3, 0.76], [0.5, 0.3, 1.1], (L, 3)),
                q, rng.randint(0, 2, (L, 1)).astype(np.float64),
            ], 1).astype(np.float32))
        rec["trajs"] = trajs
        new_ks = np.zeros(T, bool)
        new_ks[0] = True
        if T > 2:
            new_ks[T // 2] = True
        rec["is_new_keystep"] = new_ks
        return rec


def open_store(path_or_kind):
    """'synthetic' | 'synthetic_motion' | a directory of LMDB envs | a
    MsgpackDirStore root."""
    if path_or_kind == "synthetic":
        return SyntheticStore()
    if path_or_kind == "synthetic_motion":
        return SyntheticMotionStore()
    if isinstance(path_or_kind, str) and \
            path_or_kind.startswith("synthetic_reach"):
        # 'synthetic_reach' (8 episodes/task) or 'synthetic_reach<N>'
        # (N episodes/task — the learning proof holds out episodes by
        # training on the 8-episode store and replaying the 16-episode one;
        # episode generation is id-deterministic so the first 8 coincide)
        n = path_or_kind[len("synthetic_reach"):]
        return SyntheticStore(action_mode="reach",
                              episodes_per_taskvar=int(n) if n else 8)
    # sniff: LMDB dirs contain data.mdb
    sub = [d for d in os.listdir(path_or_kind)
           if os.path.isdir(os.path.join(path_or_kind, d))]
    if sub and os.path.exists(os.path.join(path_or_kind, sub[0], "data.mdb")):
        return LmdbStore(path_or_kind)
    return MsgpackDirStore(path_or_kind)

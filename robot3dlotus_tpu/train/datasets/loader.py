"""Host data loading: episode sampling, per-process sharding, background
prefetch to device.

Replaces the reference's torch DataLoader + DistributedSampler + PrefetchLoader
stack (train/datasets/loader.py:90-166): a thread pool prepares fixed-shape
numpy batches while the accelerator runs the previous step; jax.device_put
overlaps the H2D copy with compute.
"""
from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, Optional

import numpy as np
import jax

from .collate import collate_keystep_samples

LOGGER = logging.getLogger("robot3dlotus_tpu.loader")

# consecutive per-episode failures before the loader gives up (a bad disk /
# corrupt store should fail loudly, not spin forever; reference-level parity:
# the torch DataLoader would crash on the first one)
MAX_CONSECUTIVE_FAILURES = 16


class KeystepBatchLoader:
    """Yields fixed-shape numpy batches of `num_clouds` keystep samples.

    Episode-granular sampling like all_step_in_batch=True: each episode
    contributes all its keysteps, and batches are re-chunked to a fixed
    cloud count (the reference's variable clouds-per-batch becomes static).
    """

    def __init__(self, dataset, num_clouds, num_points,
                 shuffle=True, seed=0, shuffle_seed=None, process_index=None,
                 process_count=None, infinite=True, collate_fn=None,
                 num_workers=0):
        self.dataset = dataset
        self.num_clouds = num_clouds
        self.num_points = num_points
        self.shuffle = shuffle
        self.seed = seed
        # the shuffle permutation must be IDENTICAL on every host or the
        # ids[rank::world] shards overlap/miss episodes (DistributedSampler
        # uses one world-shared seed for exactly this reason) — callers that
        # pass a per-process `seed` (for augmentation diversity) must pass
        # the process-invariant base seed here
        self.shuffle_seed = seed if shuffle_seed is None else shuffle_seed
        self.infinite = infinite
        # worker-pool parity with the reference DataLoader num_workers=4
        # (loader.py:155-164): a thread pool prepares episodes ahead of the
        # consumer in submission order. Threads (not processes) because the
        # per-episode work is numpy/LMDB which releases the GIL, and LMDB
        # handles don't pickle; 0 = fully synchronous.
        self.num_workers = int(num_workers)
        if collate_fn is None:
            collate_fn = lambda chunk: collate_keystep_samples(
                chunk, self.num_points, num_clouds=self.num_clouds)
        self.collate_fn = collate_fn
        self.process_index = (process_index if process_index is not None
                              else jax.process_index())
        self.process_count = (process_count if process_count is not None
                              else jax.process_count())

    def _epoch_ids(self, epoch):
        n = len(self.dataset)
        ids = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.shuffle_seed + epoch)
            rng.shuffle(ids)
        # per-host shard (DistributedSampler equivalent)
        return ids[self.process_index::self.process_count]

    def _episodes(self, epoch) -> Iterator:
        """Yields loaded episodes for one epoch, optionally via the pool."""
        ids = self._epoch_ids(epoch)
        if self.num_workers <= 0:
            for idx in ids:
                yield int(idx), self._load(int(idx))
            return
        from concurrent.futures import ThreadPoolExecutor
        from collections import deque
        depth = self.num_workers * 2
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = deque()
            it = iter(ids)
            for idx in it:
                pending.append((int(idx),
                                pool.submit(self._load, int(idx), epoch)))
                if len(pending) >= depth:
                    i, fut = pending.popleft()
                    yield i, fut.result()
            while pending:
                i, fut = pending.popleft()
                yield i, fut.result()

    def _load(self, idx, epoch=0):
        try:
            if self.num_workers > 0 and \
                    hasattr(self.dataset, "get_episode_samples"):
                # per-episode derived RNG: pool threads drawing from the
                # dataset's one shared RandomState would make augmentation
                # depend on thread scheduling, voiding seeded repro (the
                # reference DataLoader derives per-worker seeds the same way)
                rng = np.random.RandomState(
                    (self.seed * 1000003 + epoch * 9176 + idx) % (2 ** 31))
                tv, ep = self.dataset.data_ids[idx]
                return self.dataset.get_episode_samples(tv, ep, rng=rng)
            return self.dataset[idx]
        except Exception as e:  # marshalled to the consumer thread
            return e

    def __iter__(self) -> Iterator[dict]:
        epoch = 0
        buf = []
        consecutive_failures = 0
        if self.infinite and len(self._epoch_ids(0)) == 0:
            # a finite loader with an empty shard legitimately yields
            # nothing; an INFINITE one would spin forever yielding nothing
            raise ValueError(
                f"empty per-host shard: dataset has {len(self.dataset)} "
                f"episodes over {self.process_count} processes (host "
                f"{self.process_index}) — the infinite loader would spin "
                "forever yielding nothing")
        while True:
            for idx, samples in self._episodes(epoch):
                if isinstance(samples, Exception):
                    consecutive_failures += 1
                    LOGGER.warning(
                        "episode %d failed to load (%d consecutive): %r",
                        idx, consecutive_failures, samples)
                    if consecutive_failures >= MAX_CONSECUTIVE_FAILURES:
                        raise samples
                    continue
                consecutive_failures = 0
                buf.extend(samples)
                while len(buf) >= self.num_clouds:
                    chunk, buf = buf[:self.num_clouds], buf[self.num_clouds:]
                    yield self.collate_fn(chunk)
            epoch += 1
            if not self.infinite:
                if buf:
                    yield self.collate_fn(buf)
                    buf = []
                return


class MetaLoader:
    """Multi-task loader with ratio sampling — reference MetaLoader parity
    (train/datasets/loader.py:18-75) minus the NCCL broadcast: instead of
    rank 0 drawing a task id and broadcasting it, every process seeds an
    identical RNG and draws the same task sequence deterministically, so
    all hosts train the same task each step with zero collectives (the
    TPU-idiomatic replacement for `dist.broadcast(task_id, 0)`).

    `loaders` maps name -> iterable or (iterable, ratio). Iterates forever,
    yielding (task_name, batch); the drawn task is held constant for
    `accum_steps` consecutive batches, like the reference.
    """

    def __init__(self, loaders, accum_steps: int = 1, seed: int = 0):
        assert isinstance(loaders, dict) and loaders
        self.names, ratios, self.name2iter, self.name2loader = [], [], {}, {}
        for n, l in loaders.items():
            r = 1.0
            if isinstance(l, tuple):
                l, r = l
            self.names.append(n)
            self.name2loader[n] = l
            self.name2iter[n] = iter(l)
            ratios.append(float(r))
        p = np.asarray(ratios, np.float64)
        self.probs = p / p.sum()
        self.accum_steps = max(int(accum_steps), 1)
        self.rng = np.random.RandomState(seed)
        self.step = 0

        self._task_id = 0

    def __iter__(self):
        # step AND task_id live on self: a re-created iterator mid-accum-
        # window (validation break, preemption resume) must keep serving
        # the window's drawn task, or hosts desync from the shared RNG
        while True:
            if self.step % self.accum_steps == 0:
                self._task_id = int(
                    self.rng.choice(len(self.names), p=self.probs))
            self.step += 1
            task = self.names[self._task_id]
            try:
                batch = next(self.name2iter[task])
            except StopIteration:
                self.name2iter[task] = iter(self.name2loader[task])
                batch = next(self.name2iter[task])
            yield task, batch


class PrefetchToDevice:
    """Background thread: host batch -> device (sharded) ahead of compute.

    `close()` releases the producer thread and the queued device batches —
    call it when abandoning the iterator early (the driver does on exit),
    otherwise up to depth+1 device-resident batches stay pinned and the
    upstream loader chain stays alive for the rest of the process."""

    def __init__(self, it, mesh=None, depth=2):
        self.it = iter(it)
        self.mesh = mesh
        self.q = queue.Queue(maxsize=depth)
        self._closed = False
        self._done = False
        self.thread = threading.Thread(target=self._work, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        """put that gives up when close() was called (the consumer is gone;
        blocking forever would pin the queued device buffers)."""
        while not self._closed:
            try:
                self.q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _work(self):
        from ...parallel.mesh import shard_batch
        try:
            for batch in self.it:
                if self._closed:
                    return
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                if not self._put(batch):
                    return
        except Exception as e:  # surface errors on the consumer side
            self._put(e)
        self._put(StopIteration())

    def __iter__(self):
        return self

    def __next__(self):
        # once exhausted, keep raising StopIteration (iterator protocol)
        # instead of blocking forever on an empty queue
        if self._done:
            raise StopIteration
        item = self.q.get()
        if isinstance(item, StopIteration):
            self._done = True
            raise item
        if isinstance(item, Exception):
            raise item
        return item

    def _drain(self):
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass

    def close(self):
        self._closed = True
        self._done = True
        # drain -> join -> drain: the producer may complete one pending
        # put after the first drain (it was already blocked inside
        # q.put when _closed flipped); only after the thread exits is the
        # queue guaranteed to stay empty
        self._drain()
        self.thread.join(timeout=10)
        self._drain()

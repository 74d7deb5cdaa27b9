"""Producer/consumer closed-loop evaluation server.

Reference topology (evaluation/eval_simple_policy_server.py:230-291): N
producer processes each own an RLBench/CoppeliaSim instance and roll episodes;
ONE consumer process owns the accelerator and serves policy queries through
queues. Completed taskvars (already in results.jsonl) are skipped; per-taskvar
success rates are appended under a file lock.

This module keeps the host topology identical (multiprocessing spawn +
queues); the consumer's policy is the jitted TPU Actioner. RLBench itself is
an optional host dependency: when the simulator stack is unavailable the
producers can run a `ReplayEnv` (recorded observations) so the full
server/queue/result machinery is testable anywhere.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import queue as queue_mod
import sys
from typing import Callable, Dict, List, Optional

import numpy as np

from .common import write_to_file


def consumer_fn(actioner_builder, batch_queue, result_queues,
                stop_token="STOP", max_batch=None, stateful=False):
    """Owns the accelerator; answers policy queries
    (reference eval_simple_policy_server.py:59-74).

    Dynamic batching: after the blocking get, pending queries from other
    producers are drained (non-blocking, up to `max_batch`) and served in ONE
    batched forward via `actioner.predict_batch` when the actioner supports
    it. Each producer blocks on its own result queue between steps, so the
    natural batch size is however many producers have a query in flight —
    the accelerator stops serializing B=1 forwards across sim workers.
    `stateful` topologies (the 3D-LOTUS++ pipeline's per-episode cache
    round-trips through the payloads) and actioners without `predict_batch`
    keep the reference one-at-a-time behavior."""
    if max_batch is None:
        max_batch = int(os.environ.get("ROBOT3DLOTUS_EVAL_MAX_BATCH", "8"))
    actioner = actioner_builder()
    can_batch = (not stateful and max_batch > 1
                 and hasattr(actioner, "predict_batch"))
    consecutive_errors = 0
    batch_failures = 0
    saw_stop = False
    while not saw_stop:
        item = batch_queue.get()
        if item == stop_token:
            break
        items = [item]
        while can_batch and len(items) < max_batch:
            try:
                nxt = batch_queue.get_nowait()
            except queue_mod.Empty:
                break
            if nxt == stop_token:  # answer what we already drained first
                saw_stop = True
                break
            items.append(nxt)
        results = None
        if len(items) > 1:
            try:
                results = actioner.predict_batch([p for _, p in items])
                consecutive_errors = 0
                batch_failures = 0
            except Exception:
                import traceback
                traceback.print_exc()
                # a poisoned payload inside a batch shouldn't zero its
                # batch-mates: fall through to per-item serving below. A
                # batch path that fails EVERY time (a predict_batch bug,
                # not a bad payload) would silently degrade the whole
                # sweep to sequential-with-traceback-spam — disable it
                # loudly instead.
                batch_failures += 1
                if batch_failures >= 3:
                    can_batch = False
                    print("consumer: predict_batch failed 3x in a row — "
                          "disabling dynamic batching for this run")
        if results is None:
            results = []
            for _, payload in items:
                try:  # fail the episode, not the run...
                    results.append(actioner.predict(**payload))
                    consecutive_errors = 0
                except Exception as e:
                    consecutive_errors += 1
                    import traceback
                    traceback.print_exc()
                    # ...unless every call fails — that's a model/config
                    # bug, and recording sr=0 for the sweep would hide it
                    if consecutive_errors >= 8:
                        raise
                    results.append({"action": np.zeros(8, np.float32),
                                    "error": str(e)})
        for (k, _), out in zip(items, results):
            result_queues[k].put(out)


class QueueActioner:
    """Actioner proxy living in a producer process: routes predict() calls
    through the queues to the single accelerator-owning consumer, carrying the
    per-episode pipeline cache when stateful (reference
    eval_robot_pipeline_server.py:155-213)."""

    def __init__(self, proc_id, batch_queue, result_queue, stateful=False):
        self.proc_id = proc_id
        self.batch_queue = batch_queue
        self.result_queue = result_queue
        self.stateful = stateful
        self._cache = None

    def predict(self, **payload):
        if self.stateful:
            if payload.get("step_id") == 0:
                self._cache = None
            payload["cache"] = self._cache
        self.batch_queue.put((self.proc_id, payload))
        out = self.result_queue.get()
        if self.stateful:
            self._cache = out.get("cache")
        return out


def producer_fn_sim(
    proc_id, taskvars, env_builder, batch_queue, result_queue, result_file,
    num_demos=20, max_steps=25, seed=100, checkpoint=None, stateful=False,
):
    """Producer that owns a full simulator adapter exposing `evaluate()`
    (RLBenchEnv) instead of the reset/step Replay API."""
    env = env_builder()
    actioner = QueueActioner(proc_id, batch_queue, result_queue, stateful)
    for taskvar in taskvars:
        task_str, variation = taskvar.split("+")
        try:
            sr = env.evaluate(
                task_str, int(variation), max_episodes=max_steps,
                num_demos=num_demos, log_dir=None, actioner=actioner,
                max_tries=10)
        except Exception as e:
            print(f"{taskvar} failed: {e}")
            continue
        write_to_file(result_file, {
            "checkpoint": checkpoint, "task": task_str,
            "variation": int(variation),
            "num_demos": num_demos, "sr": sr,
        })


def load_done_taskvars(result_file) -> set:
    done = set()
    if os.path.exists(result_file):
        with open(result_file) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                    done.add(f"{rec['task']}+{rec['variation']}")
                except (json.JSONDecodeError, KeyError):
                    continue
    return done


def producer_fn(
    proc_id, taskvars, env_builder, batch_queue, result_queue, result_file,
    num_demos=20, max_steps=25, seed=100, checkpoint=None, stateful=False,
):
    """Owns one simulator; rolls episodes and queries the consumer
    (reference eval_simple_policy_server.py:76-227). With `stateful=True`
    the per-episode pipeline cache round-trips producer<->consumer each step
    (reference eval_robot_pipeline_server.py:197-213) — the consumer is
    stateless across queries so any producer can interleave."""
    env = env_builder()
    for taskvar in taskvars:
        task_str, variation = taskvar.split("+")
        success = 0
        for demo_id in range(num_demos):
            try:
                obs = env.reset(task_str, int(variation), demo_id, seed=seed)
            except Exception as e:
                # counted as a failed demo, never silent (an env that can't
                # reset this taskvar at all yields sr=0 WITH the reason on
                # the worker log — reference behavior is a hard crash)
                print(f"[producer {proc_id}] reset failed "
                      f"{taskvar} demo {demo_id}: {e!r}", file=sys.stderr,
                      flush=True)
                continue
            reward = 0.0
            cache = None
            for step_id in range(max_steps):
                payload = {
                    "task_str": task_str, "variation": variation,
                    "step_id": step_id, "obs_state_dict": obs,
                    "episode_id": demo_id,
                    "instructions": env.instructions(taskvar),
                }
                if stateful:
                    payload["cache"] = cache
                batch_queue.put((proc_id, payload))
                out = result_queue.get()
                if stateful:
                    cache = out.get("cache")
                try:
                    obs, reward, done = env.step(out["action"])
                except Exception:
                    reward, done = 0.0, True
                if done or reward == 1:
                    break
            success += int(reward == 1)
        write_to_file(result_file, {
            "checkpoint": checkpoint, "task": task_str,
            "variation": int(variation),
            "num_demos": num_demos, "sr": success / max(num_demos, 1),
        })
    env.close()


def run_eval_server(
    taskvars: List[str], actioner_builder: Callable, env_builder: Callable,
    result_file: str, num_workers=4, num_demos=20, max_steps=25, seed=100,
    checkpoint=None, stateful=False, sim_env=False, max_batch=None,
):
    """Reference main (eval_simple_policy_server.py:230-291). `checkpoint`
    is recorded in every result row so multi-checkpoint validation sweeps
    (scripts/summarize_val_results.py) can tell runs apart. `stateful=True`
    gives the pipeline-server topology (eval_robot_pipeline_server.py:259-357)
    where the episode cache round-trips through the queues."""
    os.makedirs(os.path.dirname(result_file) or ".", exist_ok=True)
    done = load_done_taskvars(result_file)
    todo = [tv for tv in taskvars if tv not in done]
    if not todo:
        return

    ctx = mp.get_context("spawn")
    batch_queue = ctx.Queue()
    result_queues = [ctx.Queue() for _ in range(num_workers)]
    consumer = ctx.Process(
        target=consumer_fn,
        args=(actioner_builder, batch_queue, result_queues, "STOP",
              max_batch, stateful))
    consumer.start()

    shards = [todo[i::num_workers] for i in range(num_workers)]
    producers = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        target = producer_fn_sim if sim_env else producer_fn
        p = ctx.Process(target=target, args=(
            i, shard, env_builder, batch_queue, result_queues[i],
            result_file, num_demos, max_steps, seed, checkpoint, stateful))
        p.start()
        producers.append(p)
    for p in producers:
        p.join()
    batch_queue.put("STOP")
    consumer.join()


class ReplayEnv:
    """Simulator stand-in: replays recorded episodes from a Store; an action
    within 5 cm + correct gripper of the recorded keystep pose 'succeeds'.
    Lets the whole server stack run without CoppeliaSim."""

    def __init__(self, store, taskvar_instructions=None):
        self.store = store
        self.taskvar_instructions = taskvar_instructions or {}
        self._ep = None
        self._step = 0

    def instructions(self, taskvar):
        return self.taskvar_instructions.get(taskvar, ["do the task"])

    def reset(self, task_str, variation, demo_id, seed=100):
        taskvar = f"{task_str}+{variation}"
        eps = self.store.episodes(taskvar)
        self._ep = self.store.get(taskvar, eps[demo_id % len(eps)])
        self._step = 0
        return self._obs()

    def _obs(self):
        t = self._step
        ep = self._ep
        xyz = np.asarray(ep["xyz"][t], np.float32)
        rgb_f = np.asarray(ep["rgb"][t], np.float32)
        arm = ({k: np.asarray(v[t]) for k, v in ep["bbox_info"].items()},
               {k: np.asarray(v[t]) for k, v in ep["pose_info"].items()})
        obs = {
            "rgb": [rgb_f], "pc": [xyz], "gripper": ep["action"][t],
            "arm_links_info": arm,
        }
        if "sem" in ep:  # GT masks for the oracle-vision pipeline
            obs["gt_mask"] = [np.asarray(ep["sem"][t])]
        return obs

    def step(self, action):
        tgt = self._ep["action"][self._step + 1]
        pos_ok = np.linalg.norm(action[:3] - tgt[:3]) < 0.05
        open_ok = (action[-1] > 0.5) == (tgt[-1] > 0.5)
        self._step += 1
        done = self._step >= len(self._ep["xyz"]) - 1
        reward = float(pos_ok and open_ok and done)
        return (self._obs() if not done else None), reward, done

    def close(self):
        pass

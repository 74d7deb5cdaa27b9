"""Dynamic batching in the eval server.

The reference consumer answers one query per forward
(eval_simple_policy_server.py:59-74). Our consumer drains pending producer
queries and serves them in one batched forward (Actioner.predict_batch).
Locks: (a) batched results match sequential predict() per observation,
including empty-cloud guard slots and padding rows; (b) the consumer routes
every result to the right producer queue, batches when queries are pending,
falls back per-item when a batch fails, and answers drained items even when
the stop token arrives mid-drain.
"""
import queue

import numpy as np
import pytest

from robot3dlotus_tpu.eval.server import consumer_fn

from test_actioner_flat import _actioner

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models


def _payload(i, xyz, rgb, step_id=0):
    return {
        "task_str": "t", "variation": i % 2, "step_id": step_id,
        "episode_id": i,
        "obs_state_dict": {
            "rgb": [rgb], "pc": [xyz],
            "gripper": np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1],
                                  np.float32),
        },
        "instructions": ["do the task"],
    }


def test_predict_batch_matches_sequential(tmp_path):
    a = _actioner(tmp_path)
    rng = np.random.RandomState(0)
    ws_lo, ws_hi = np.array([-0.3, -0.5, 0.76]), np.array([0.7, 0.5, 1.6])

    payloads = []
    for i in range(3):
        n = 90 + 7 * i  # < num_points so no random subsampling step
        xyz = (rng.uniform(0, 1, (n, 3)) * (ws_hi - ws_lo) + ws_lo
               ).astype(np.float32)
        rgb = rng.uniform(0, 255, (n, 3)).astype(np.float32)
        payloads.append(_payload(i, xyz, rgb, step_id=i))
    # an empty-after-crop cloud must take the zero-action guard slot without
    # shifting its batch-mates' outputs
    far = np.full((50, 3), 99.0, np.float32)
    payloads.insert(1, _payload(9, far, np.zeros((50, 3), np.float32)))

    seq = [a.predict(**p) for p in payloads]
    got = a.predict_batch(payloads)

    assert len(got) == len(seq)
    table_clamp = a.TABLE_HEIGHT + 0.005
    assert got[1]["action"][2] == pytest.approx(table_clamp)
    assert np.all(got[1]["action"][[0, 1, 3, 4, 5, 6, 7]] == 0)
    for s, g in zip(seq, got):
        np.testing.assert_allclose(s["action"], g["action"],
                                   atol=1e-5, rtol=1e-5)


def test_predict_batch_single_defers_to_predict(tmp_path):
    a = _actioner(tmp_path)
    rng = np.random.RandomState(1)
    xyz = rng.uniform(-0.2, 0.6, (80, 3)).astype(np.float32)
    xyz[:, 2] = rng.uniform(0.8, 1.5, 80)
    p = _payload(0, xyz, np.zeros((80, 3), np.float32))
    np.testing.assert_allclose(a.predict_batch([p])[0]["action"],
                               a.predict(**p)["action"], atol=1e-6)


def test_predict_batch_chunks_past_top_bucket(tmp_path):
    """More payloads than the largest batch bucket must chunk, not crash
    (_bucket clamps to buckets[-1]; the fill loop must never index past
    the allocated batch)."""
    a = _actioner(tmp_path)
    a._BATCH_BUCKETS = (1, 2)  # top bucket 2 so 5 payloads force 3 chunks
    rng = np.random.RandomState(2)
    ws_lo, ws_hi = np.array([-0.3, -0.5, 0.76]), np.array([0.7, 0.5, 1.6])
    payloads = []
    for i in range(5):
        n = 70 + 5 * i
        xyz = (rng.uniform(0, 1, (n, 3)) * (ws_hi - ws_lo) + ws_lo
               ).astype(np.float32)
        payloads.append(_payload(i, xyz,
                                 rng.uniform(0, 255, (n, 3)).astype(
                                     np.float32), step_id=i))
    seq = [a.predict(**p) for p in payloads]
    got = a.predict_batch(payloads)
    for s, g in zip(seq, got):
        np.testing.assert_allclose(s["action"], g["action"],
                                   atol=1e-5, rtol=1e-5)


class _FakeBatchActioner:
    def __init__(self, fail_batch=False, fail_items=()):
        self.batch_sizes = []
        self.fail_batch = fail_batch
        self.fail_items = set(fail_items)

    def _act(self, payload):
        if payload["episode_id"] in self.fail_items:
            raise ValueError(f"poisoned {payload['episode_id']}")
        return {"action": np.full(8, float(payload["episode_id"]),
                                  np.float32)}

    def predict(self, **payload):
        self.batch_sizes.append(1)
        return self._act(payload)

    def predict_batch(self, payloads):
        self.batch_sizes.append(len(payloads))
        if self.fail_batch:
            raise RuntimeError("batch path down")
        return [self._act(p) for p in payloads]


def _run_consumer(actioner, items, num_queues=4, max_batch=8):
    batch_queue = queue.Queue()
    result_queues = [queue.Queue() for _ in range(num_queues)]
    for it in items:
        batch_queue.put(it)
    batch_queue.put("STOP")
    consumer_fn(lambda: actioner, batch_queue, result_queues,
                max_batch=max_batch)
    return result_queues


def test_consumer_drains_and_routes():
    act = _FakeBatchActioner()
    items = [(k, {"episode_id": 10 + k}) for k in (0, 1, 2)]
    qs = _run_consumer(act, items)
    # all three were pending at the first get -> one batched call, and the
    # stop token seen mid-drain still let the drained items be answered
    assert act.batch_sizes == [3]
    for k in (0, 1, 2):
        out = qs[k].get_nowait()
        assert out["action"][0] == 10 + k
        assert qs[k].empty()


def test_consumer_batch_failure_falls_back_per_item():
    act = _FakeBatchActioner(fail_items={11})
    items = [(k, {"episode_id": 10 + k}) for k in (0, 1, 2)]
    qs = _run_consumer(act, items)
    # batch call raised on the poisoned item -> per-item retries
    assert act.batch_sizes[0] == 3
    ok0, bad, ok2 = (qs[k].get_nowait() for k in (0, 1, 2))
    assert ok0["action"][0] == 10 and "error" not in ok0
    assert bad["action"][0] == 0 and "error" in bad
    assert ok2["action"][0] == 12 and "error" not in ok2


def test_consumer_without_predict_batch_stays_sequential():
    class SeqOnly:
        def __init__(self):
            self.calls = 0

        def predict(self, **payload):
            self.calls += 1
            return {"action": np.full(8, float(payload["episode_id"]))}

    act = SeqOnly()
    qs = _run_consumer(act, [(k, {"episode_id": k}) for k in range(3)])
    assert act.calls == 3
    for k in range(3):
        assert qs[k].get_nowait()["action"][0] == k


def test_consumer_max_batch_one_disables_draining():
    act = _FakeBatchActioner()
    _run_consumer(act, [(k, {"episode_id": k}) for k in range(3)],
                  max_batch=1)
    assert act.batch_sizes == [1, 1, 1]


def test_consumer_stateful_forces_sequential():
    """The pipeline topology round-trips a per-episode cache through the
    payloads; batching would drop it even if the actioner grew a
    predict_batch — stateful must force one-at-a-time explicitly."""
    act = _FakeBatchActioner()
    batch_queue = queue.Queue()
    result_queues = [queue.Queue() for _ in range(3)]
    for k in range(3):
        batch_queue.put((k, {"episode_id": k}))
    batch_queue.put("STOP")
    consumer_fn(lambda: act, batch_queue, result_queues,
                max_batch=8, stateful=True)
    assert act.batch_sizes == [1, 1, 1]


def test_consumer_disables_batching_after_repeated_batch_failures():
    """A predict_batch that fails every time (a code bug, not a poisoned
    payload) must not silently degrade the whole sweep into
    retry-then-sequential on every round: after 3 consecutive batch
    failures the consumer turns batching off for the run."""
    act = _FakeBatchActioner(fail_batch=True)
    items = [(k % 2, {"episode_id": k}) for k in range(10)]
    qs = _run_consumer(act, items, num_queues=2, max_batch=2)
    # exactly 3 failed batch attempts (each followed by per-item predict
    # fallbacks, recorded as 1s), then batching is off: the last 4 items
    # are served without any further predict_batch attempt
    assert [b for b in act.batch_sizes if b > 1] == [2, 2, 2]
    assert act.batch_sizes[-4:] == [1, 1, 1, 1]
    got = []
    for k in (0, 1):
        while not qs[k].empty():
            got.append(qs[k].get_nowait()["action"][0])
    assert sorted(got) == list(range(10))


def test_consumer_single_item_failure_predicts_once():
    """A failing single-item query must not be re-run a second time (the
    per-item fallback exists for batches, not singles)."""

    class Failing:
        def __init__(self):
            self.calls = 0

        def predict(self, **payload):
            self.calls += 1
            raise ValueError("always fails")

    act = Failing()
    batch_queue = queue.Queue()
    result_queues = [queue.Queue()]
    batch_queue.put((0, {"episode_id": 0}))
    batch_queue.put("STOP")
    consumer_fn(lambda: act, batch_queue, result_queues, max_batch=8)
    assert act.calls == 1
    out = result_queues[0].get_nowait()
    assert "error" in out and np.all(out["action"] == 0)


def test_actioner_device_preprocess_path(tmp_path):
    """Drives Actioner._device_predict (fused on-device preprocessing,
    single packed readback). The tiny config has no rm_robot, so this
    also regression-tests the disabled-OBB recipe: a wrong 'disabled'
    parameterization removes EVERY voxel and the count guard would emit
    the zero action."""
    a = _actioner(tmp_path, device_preprocess=True)
    assert a.device_preprocess
    rng = np.random.RandomState(4)
    ws_lo, ws_hi = np.array([-0.3, -0.5, 0.76]), np.array([0.7, 0.5, 1.6])
    xyz = (rng.uniform(0, 1, (600, 3)) * (ws_hi - ws_lo) + ws_lo
           ).astype(np.float32)
    rgb = rng.uniform(0, 255, (600, 3)).astype(np.float32)
    p = _payload(0, xyz, rgb)
    out = a.predict(**p)["action"]
    assert out.shape == (8,) and np.all(np.isfinite(out))
    zero_guard = a._zero_action()
    assert not np.array_equal(out, zero_guard), \
        "fused path emitted the empty-cloud guard action: OBB removal " \
        "likely removed everything"
    assert out[-1] in (0.0, 1.0)

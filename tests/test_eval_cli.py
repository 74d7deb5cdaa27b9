"""End-to-end CLI flow: train a tiny policy, evaluate it through the
eval-server CLI against the ReplayEnv, summarize the results
(reference eval_simple_policy_server.py:230-291 +
scripts/summarize_{val,tst}_results.py)."""
import json
import os

import numpy as np
import pytest

from robot3dlotus_tpu.scripts.summarize_val_results import (
    load_results, summarize,
)
from robot3dlotus_tpu.scripts.summarize_tst_results import (
    load_seed_results, summarize_split,
)


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, monkeypatch):
    from tests.test_training_driver import _make_config
    from robot3dlotus_tpu.train import train_simple_policy
    from robot3dlotus_tpu.eval import eval_simple_policy_server

    # The eval server spawns its consumer/producers with the inherited
    # environment. On the axon dev rig that would hand them
    # JAX_PLATFORMS=axon — making this "hermetic" CPU test silently depend
    # on (and block on) the real TPU tunnel. Pin the children to a plain
    # 1-device CPU client; the in-process side is already pinned by
    # conftest's jax.config.
    import os as _os
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", repo_root)
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_backend_optimization_level=0"
                       " --xla_llvm_disable_expensive_passes=true")

    cfg = _make_config(tmp_path, "SimplePolicyPTV3CA", "synthetic")
    train_simple_policy.main(cfg)

    result_file = eval_simple_policy_server.main([
        "--expr_dir", cfg.output_dir, "--ckpt_step", "3",
        "--taskvar", "synthetic_task0+0", "--env", "replay",
        "--num_demos", "1", "--num_workers", "1", "--max_steps", "2",
        "--seed", "100",
    ])
    assert result_file and os.path.exists(result_file)
    recs = [json.loads(l) for l in open(result_file)]
    assert len(recs) == 1
    assert recs[0]["checkpoint"] == "model_step_3"
    assert recs[0]["task"] == "synthetic_task0"
    assert 0.0 <= recs[0]["sr"] <= 1.0

    # missing checkpoint -> graceful exit
    assert eval_simple_policy_server.main([
        "--expr_dir", cfg.output_dir, "--ckpt_step", "999",
        "--taskvar", "synthetic_task0+0", "--env", "replay"]) is None

    # challenge wrapper + HTTP wire round trip on the same trained model
    # (reference challenges/actioner.py:32-66 + server.py:27-45)
    from robot3dlotus_tpu.eval.serving import (
        ThreeDLotusActioner, PolicyHTTPServer, PolicyHTTPClient)
    from robot3dlotus_tpu.train.datasets.store import SyntheticStore
    store = SyntheticStore(points_per_step=512)
    ep = store.get(store.taskvars()[0], store.episodes("x")[0])
    obs = {
        "rgb": [np.asarray(ep["rgb"][0], np.float32).reshape(-1, 3)],
        "pc": [np.asarray(ep["xyz"][0], np.float32)],
        "gripper": np.asarray([0.3, 0, 1.0, 0, 0, 0, 1, 1], np.float32),
        "arm_links_info": (
            {k: np.asarray(v[0]) for k, v in ep["bbox_info"].items()},
            {k: np.asarray(v[0]) for k, v in ep["pose_info"].items()}),
    }
    actioner = ThreeDLotusActioner(cfg.output_dir, ckpt_step=3)
    server = PolicyHTTPServer(actioner, port=13917)
    server.start_background()
    try:
        client = PolicyHTTPClient("http://127.0.0.1:13917")
        res = client.predict(
            taskvar="synthetic_task0+0", episode_id=0, step_id=0,
            instruction="do the task", obs_state_dict=obs)
        action = np.asarray(res["action"])
        assert action.shape == (8,) and np.isfinite(action).all()
    finally:
        server.shutdown()


def test_summarize_val_results(tmp_path):
    result_file = tmp_path / "results.jsonl"
    rows = [
        {"checkpoint": "model_step_10", "task": "a", "variation": 0,
         "num_demos": 20, "sr": 0.5},
        {"checkpoint": "model_step_10", "task": "b", "variation": 1,
         "num_demos": 20, "sr": 0.7},
        {"checkpoint": "model_step_20", "task": "a", "variation": 0,
         "num_demos": 20, "sr": 0.9},
        {"checkpoint": "model_step_20", "task": "b", "variation": 1,
         "num_demos": 20, "sr": 0.8},
        # duplicate from a resumed run: first record wins
        {"checkpoint": "model_step_20", "task": "b", "variation": 1,
         "num_demos": 20, "sr": 0.0},
    ]
    with open(result_file, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    results = load_results(str(result_file))
    ckpts, taskvars, matrix, avg, best = summarize(results)
    assert ckpts == ["model_step_10", "model_step_20"]
    assert best[0] == "model_step_20"
    np.testing.assert_allclose(best[1], 0.85)
    np.testing.assert_allclose(matrix[("a", 0)], [0.5, 0.9])

    # ckpt_step filter
    only20 = load_results(str(result_file), ckpt_step=20)
    assert list(only20.keys()) == ["model_step_20"]


def test_summarize_tst_results(tmp_path):
    for seed, srs in [(200, (0.4, 0.6)), (300, (0.6, 0.8))]:
        d = tmp_path / f"seed{seed}"
        d.mkdir()
        with open(d / "results.jsonl", "w") as f:
            for tv, sr in zip(["a+0", "b+1"], srs):
                task, var = tv.split("+")
                f.write(json.dumps({
                    "checkpoint": 150000, "task": task,
                    "variation": int(var), "num_demos": 20, "sr": sr}) + "\n")

    results = load_seed_results(str(tmp_path), [200, 300], 150000)
    means, stds, seed_mean, seed_std = summarize_split(results, ["a+0", "b+1"])
    np.testing.assert_allclose(means, [50.0, 70.0])
    np.testing.assert_allclose(seed_mean, 60.0)
    np.testing.assert_allclose(seed_std, 10.0)


def test_asset_resolver(tmp_path, monkeypatch):
    from robot3dlotus_tpu.utils.assets import resolve_asset
    # existing path passes through
    f = tmp_path / "x.json"
    f.write_text("{}")
    assert resolve_asset(str(f)) == str(f)
    # env root resolution
    root = tmp_path / "assets_root"
    (root / "assets").mkdir(parents=True)
    (root / "assets" / "y.json").write_text("{}")
    monkeypatch.setenv("GEMBENCH_ASSETS_ROOT", str(root))
    assert resolve_asset("assets/y.json") == str(root / "assets" / "y.json")
    # vendored-copy resolution (repo-root assets/, no env var, no upstream)
    monkeypatch.delenv("GEMBENCH_ASSETS_ROOT")
    monkeypatch.chdir(tmp_path)  # force the repo-root branch, not cwd
    p = resolve_asset("assets/taskvars_train.json")
    assert "/root/reference" not in p
    assert len(json.load(open(p))) == 31  # L1 split size (SURVEY §6)
    # None passes through
    assert resolve_asset(None) is None


def test_http_client_closed_loop(tmp_path):
    """Challenge client driver (reference challenges/client.py:21-128):
    ReplayEnv episodes rolled against a live HTTP policy server; SR record
    written to jsonl."""
    import json
    import numpy as np
    from robot3dlotus_tpu.eval.serving import (
        PolicyHTTPClient, PolicyHTTPServer, RandomActioner, run_client)
    from robot3dlotus_tpu.eval.server import ReplayEnv
    from robot3dlotus_tpu.train.datasets.store import SyntheticStore

    server = PolicyHTTPServer(RandomActioner(), port=0)
    server.start_background()
    try:
        env = ReplayEnv(SyntheticStore(points_per_step=256))
        client = PolicyHTTPClient(f"http://127.0.0.1:{server.port}")
        out = tmp_path / "client_results.jsonl"
        rec = run_client("synthetic_task0+0", client, env,
                         num_episodes=2, max_steps=3, output_file=str(out))
        assert rec["task"] == "synthetic_task0"
        assert 0.0 <= rec["sr"] <= 1.0
        rows = [json.loads(l) for l in open(out)]
        assert rows == [rec]
    finally:
        server.shutdown()


def test_http_actioner_instruction_per_episode():
    """One instruction per episode, reused across its steps (reference
    challenge client behavior); deterministic instructions[0] when no
    episode boundary exists; interleaved episodes don't thrash the cache."""
    from robot3dlotus_tpu.eval.serving import HTTPActioner

    class FakeClient:
        def __init__(self):
            self.calls = []

        def predict(self, **kw):
            self.calls.append(kw)
            return {"action": [0.0] * 8}

    client = FakeClient()
    a = HTTPActioner(client)
    instrs = [f"instr{i}" for i in range(50)]

    # steps of one episode share the instruction
    for step in range(4):
        a.predict(task_str="t", variation=0, step_id=step,
                  obs_state_dict={}, episode_id=7, instructions=instrs)
    ep7 = {c["instruction"] for c in client.calls}
    assert len(ep7) == 1

    # interleaved episodes keep their own instruction (bounded dict, not a
    # single slot that clears on every switch)
    client.calls.clear()
    for step in range(3):
        for ep in (1, 2):
            a.predict(task_str="t", variation=0, step_id=step,
                      obs_state_dict={}, episode_id=ep, instructions=instrs)
    by_ep = {}
    for c in client.calls:
        by_ep.setdefault(c["episode_id"], set()).add(c["instruction"])
    assert all(len(v) == 1 for v in by_ep.values()), by_ep
    # ...and the cache keys them independently (a regression to a
    # taskvar-only or single-slot cache would still pass the set check)
    assert {("t+0", 1), ("t+0", 2)} <= set(a._episode_instr)

    # step 0 re-rolls even for a previously-seen (taskvar, episode_id):
    # a reused demo key across two evaluate() runs must draw fresh, like
    # the reference client does at every episode reset
    import random
    random.seed(0)
    draws = set()
    for _ in range(20):
        a.predict(task_str="t", variation=0, step_id=0,
                  obs_state_dict={}, episode_id=7, instructions=instrs)
        draws.add(a._episode_instr[("t+0", 7)])
    assert len(draws) > 1, "step-0 reset never re-rolled the instruction"

    # the cache is bounded: >32 distinct episodes evict FIFO rather than
    # growing without bound
    for ep in range(100, 140):
        a.predict(task_str="t", variation=0, step_id=0,
                  obs_state_dict={}, episode_id=ep, instructions=instrs)
    assert len(a._episode_instr) <= 32

    # no episode_id: deterministic first instruction on every call
    client.calls.clear()
    for step in range(3):
        a.predict(task_str="t", variation=1, step_id=step,
                  obs_state_dict={}, episode_id=None, instructions=instrs)
    assert {c["instruction"] for c in client.calls} == {"instr0"}

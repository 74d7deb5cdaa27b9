"""CI-sized run of the sim-free learning-proof harness
(scripts/e2e_learning_proof.py; the committed release-scale artifact is
E2E_LEARNING_r05.json): the learnable synthetic store, the training
driver, both checkpoints, the spawn-based eval server against ReplayEnv,
and the random baseline all wired through one entry point. At tiny scale
the policy does not master the task — the assertions cover the plumbing
plus a materially decreasing loss."""
import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_learning_proof_harness(tmp_path, monkeypatch):
    import os as _os
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    # hermetic children (see test_eval_cli.py): pin the spawned
    # producers/consumer to a plain CPU client
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", repo_root)
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_backend_optimization_level=0"
                       " --xla_llvm_disable_expensive_passes=true")
    from scripts.e2e_learning_proof import main

    out_path = str(tmp_path / "proof.json")
    out = main(["--scale", "tiny", "--steps", "30", "--num-demos", "2",
                "--out", out_path, "--workdir", str(tmp_path / "wd")])
    assert os.path.exists(out_path)
    rec = json.load(open(out_path))
    assert rec["loss_last"] < rec["loss_first"], rec
    for k in ("sr_trained", "sr_untrained", "sr_random"):
        assert rec[k] is not None and 0.0 <= rec[k] <= 1.0, (k, rec[k])
    assert len(rec["loss_curve"]) >= 5
    # the learnable store really is learnable: targets are a function of
    # the observation (identical blob centroid -> identical next action)
    from robot3dlotus_tpu.train.datasets.store import open_store
    st = open_store("synthetic_reach")
    ep = st.get("synthetic_task0+0", "episode0")
    a = np.asarray(ep["action"])
    assert np.allclose(a[:, 3:7], [0, 0, 0, 1])
    assert set(np.unique(a[:, 7])) <= {0.0, 1.0}

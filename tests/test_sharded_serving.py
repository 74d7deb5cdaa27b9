"""Sharded serving: an Actioner with a dp x sp x tp serving mesh
(parallel/mesh.py variables_shardings — the trainer's Megatron TP rules
plus point-axis sp sharding applied to inference variables) must produce
the same actions as the plain single-device actioner, for both the
single-obs predict() (B=1, replicated inputs under dp>1) and
predict_batch (dict-batch inputs committed dp/sp)."""
import numpy as np
import pytest

from test_actioner_flat import _actioner
from test_eval_batching import _payload

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models


def _payloads(n, seed=0):
    rng = np.random.RandomState(seed)
    ws_lo, ws_hi = np.array([-0.3, -0.5, 0.76]), np.array([0.7, 0.5, 1.6])
    out = []
    for i in range(n):
        m = 80 + 6 * i
        xyz = (rng.uniform(0, 1, (m, 3)) * (ws_hi - ws_lo) + ws_lo
               ).astype(np.float32)
        rgb = rng.uniform(0, 255, (m, 3)).astype(np.float32)
        out.append(_payload(i, xyz, rgb, step_id=i))
    return out


def test_mesh_actioner_matches_plain(tmp_path, monkeypatch):
    import jax
    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    plain = _actioner(tmp_path)
    # same config + PRNGKey(0) init -> identical variables before sharding;
    # the env var is the interface the eval-server consumer builder uses
    monkeypatch.setenv("ROBOT3DLOTUS_SERVE_MESH", "dp=2,sp=2,tp=2")
    meshed = _actioner(tmp_path)
    monkeypatch.delenv("ROBOT3DLOTUS_SERVE_MESH")
    assert meshed.mesh is not None
    assert meshed.mesh.shape == {"dp": 2, "sp": 2, "tp": 2}
    # the TP rules actually shard something (mlp/cpe pairs)
    n_tp = sum(1 for leaf in jax.tree_util.tree_leaves(meshed.variables)
               if "tp" in tuple(getattr(leaf.sharding, "spec", ())))
    assert n_tp > 0, "no tp-sharded variable leaves"

    payloads = _payloads(4)
    # single-obs path: B=1 is not divisible by dp=2 -> replicated inputs
    for p in payloads[:2]:
        ref = plain.predict(**p)["action"]
        got = meshed.predict(**p)["action"]
        np.testing.assert_allclose(ref, got, atol=2e-4, rtol=2e-4)
    # batched path: B=4 commits dp on the batch axis, sp on the point axis
    ref = [plain.predict(**p)["action"] for p in payloads]
    got = meshed.predict_batch(payloads)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g["action"], atol=2e-4, rtol=2e-4)


def test_mp_engine_mesh_matches_plain(tmp_path):
    """The motion-planner engine under a serving mesh (dict-batch program,
    sp/tp-sharded) reproduces the flat single-device path."""
    from robot3dlotus_tpu.eval.robot_pipeline import MotionPlannerEngine
    from test_robot_pipeline import _write_mp_config

    cfg = _write_mp_config(tmp_path)
    plain = MotionPlannerEngine(cfg)
    meshed = MotionPlannerEngine(cfg, mesh="sp=2,tp=2")
    assert meshed.mesh is not None

    rng = np.random.RandomState(3)
    n = plain.num_points - 5
    pc_ft = rng.uniform(-0.4, 0.4, (n, plain._feat_dim())).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int32)
    txt = rng.randn(2, 512).astype(np.float32)
    ee = np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1], np.float32)
    kw = dict(pc_centroid=np.zeros(3), pc_radius=1.0, table_height=-10.0)
    np.testing.assert_allclose(
        plain.predict(pc_ft, labels, txt, ee, **kw),
        meshed.predict(pc_ft, labels, txt, ee, **kw),
        atol=2e-4, rtol=2e-4)


def test_parse_mesh_spec():
    import pytest
    from robot3dlotus_tpu.parallel.mesh import parse_mesh_spec
    assert parse_mesh_spec("dp=2, tp=2") == {"dp": 2, "tp": 2}
    assert parse_mesh_spec("sp=2;tp=4") == {"sp": 2, "tp": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("ep=2")  # unknown axis
    with pytest.raises(ValueError):
        parse_mesh_spec("tp")  # missing size
    with pytest.raises(ValueError):
        parse_mesh_spec("dp=0")  # non-positive


def test_ensemble_predict_valid(tmp_path):
    """The ensemble path (num_ensembles shuffled forwards averaged, with
    euler-space rotation averaging) shares _dict_batch with the other
    paths; it must produce a finite, normalized action."""
    a = _actioner(tmp_path, num_ensembles=2)
    p = _payloads(1, seed=7)[0]
    out = a.predict(**p)["action"]
    assert out.shape == (8,) and np.all(np.isfinite(out))
    assert abs(np.linalg.norm(out[3:7]) - 1.0) < 1e-5  # unit quaternion
    assert out[-1] in (0.0, 1.0)


def test_actioner_serves_torch_checkpoint(tmp_path):
    """Migration affordance: the Actioner pointed at a reference-layout
    torch .pt must serve the converted weights — same actions as the
    actioner whose variables the .pt was exported from."""
    from robot3dlotus_tpu.train.torch_convert import save_torch_checkpoint
    from test_actioner_flat import TINY_ACT
    from test_training_driver import TINY_PTV3

    a1 = _actioner(tmp_path)
    model_cfg = {
        "model_class": "SimplePolicyPTV3CA",
        "ptv3_config": dict(TINY_PTV3),
        "action_config": dict(TINY_ACT),
    }
    pt = tmp_path / "model_step_7.pt"
    save_torch_checkpoint(str(pt), a1.variables["params"],
                          a1.variables["batch_stats"], model_cfg)
    assert pt.exists(), "torch unavailable? save fell back to .npz"

    a2 = _actioner(tmp_path, checkpoint=str(pt))
    for p in _payloads(2, seed=11):
        np.testing.assert_allclose(
            a1.predict(**p)["action"], a2.predict(**p)["action"],
            atol=1e-5, rtol=1e-5)


def test_mesh_constructor_spec(tmp_path):
    """Constructor wiring: Actioner(mesh='tp=2') parses the spec, shards
    the variables, and predicts; device_preprocess yields to the mesh."""
    a = _actioner(tmp_path, mesh="tp=2", device_preprocess=True)
    assert a.mesh is not None and a.mesh.shape["tp"] == 2
    assert a.device_preprocess is False
    p = _payloads(1, seed=5)[0]
    out = a.predict(**p)
    assert np.all(np.isfinite(out["action"])) and out["action"].shape == (8,)

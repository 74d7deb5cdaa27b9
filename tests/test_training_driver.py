"""End-to-end smoke of the shared training driver: both policy families train
a few steps on synthetic stores, checkpoint, and run the validation loop
(reference train_simple_policy.py:53-319, train_motion_planner.py:42-318).

Uses a 2-stage / 2-order / patch-16 model so the whole test compiles fast."""
import json
import os

import numpy as np
import pytest

from robot3dlotus_tpu.configs.node import ConfigNode
from robot3dlotus_tpu.train import train_simple_policy, train_motion_planner

TINY_PTV3 = {
    "in_channels": 7,
    "orders": ["z", "z-trans"],
    "stride": [2],
    "enc_depths": [1, 1], "enc_channels": [16, 32], "enc_num_head": [2, 2],
    "enc_patch_size": [16, 16],
    "dec_depths": [1], "dec_channels": [16], "dec_num_head": [2],
    "dec_patch_size": [16],
    "qkv_bias": True, "qk_norm": True,
    "attn_drop": 0.1, "proj_drop": 0.1, "drop_path": 0.0,
    "shuffle_orders": True, "serial_depth": 5, "stem_kernel": 3,
}


def _make_config(tmp_path, model_class, data_dir, extra_act=None,
                 extra_ds=None, extra_top=None):
    act = {
        "voxel_size": 0.01, "context_channels": 32, "txt_ft_size": 512,
        "use_ee_pose": False, "use_step_id": False, "max_steps": 30,
        "reduce": "max", "dim_actions": 7,
        "pos_pred_type": "heatmap_disc", "pos_heatmap_temp": 0.1,
        "rot_pred_type": "euler_disc", "dropout": 0.1,
        "pos_bins": 5, "pos_bin_size": 0.01, "best_disc_pos": "max",
        "euler_resolution": 5,
    }
    act.update(extra_act or {})
    ds = {
        "data_dir": data_dir,
        "num_points": 128,
        "pos_bins": 5,
        "pos_type": "disc",
        "augment_pc": False,
    }
    ds.update(extra_ds or {})
    cfg = ConfigNode({
        "SEED": 7,
        "output_dir": str(tmp_path / "run"),
        "TRAIN": {
            "resume_training": True,
            # divisible by the 8-device virtual CPU mesh (conftest)
            "train_batch_size": 8,
            "val_batch_size": 8,
            "num_train_steps": 3,
            "warmup_steps": 1,
            "log_steps": 1,
            "save_steps": 3,
            "val_steps": 3,
            "optim": "adamw",
            "learning_rate": 1e-4,
            "lr_sched": "cosine",
            "betas": [0.9, 0.98],
            "weight_decay": 0.05,
            "grad_norm": 10,
        },
        "TRAIN_DATASET": ds,
        "VAL_DATASET": dict(ds, use_val=True),
        "MODEL": {
            "model_class": model_class,
            "ptv3_config": TINY_PTV3,
            "action_config": act,
            "loss_config": {"pos_weight": 1.0, "rot_weight": 1.0},
        },
    })
    for k, v in (extra_top or {}).items():
        cfg[k] = v
    cfg.freeze()
    return cfg


def _read_metrics(output_dir):
    path = os.path.join(output_dir, "logs", "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


@pytest.mark.slow
def test_simple_policy_driver_with_validation(tmp_path):
    cfg = _make_config(tmp_path, "SimplePolicyPTV3CA", "synthetic")
    state = train_simple_policy.main(cfg)
    assert int(state.step) == 3

    recs = _read_metrics(cfg.output_dir)
    train_recs = [r for r in recs if "total" in r]
    assert train_recs and all(np.isfinite(r["total"]) for r in train_recs)
    val_recs = [r for r in recs if "val_total_loss" in r]
    assert val_recs, "validation never ran"
    for key in ("val_pos_loss", "val_open_acc", "val_pos_l1_loss"):
        assert key in val_recs[-1], val_recs[-1]
        assert np.isfinite(val_recs[-1][key])
    assert 0.0 <= val_recs[-1]["val_open_acc"] <= 1.0

    ckpts = os.listdir(os.path.join(cfg.output_dir, "ckpts"))
    assert "model_step_3.msgpack" in ckpts
    assert "train_state_latest.msgpack" in ckpts


@pytest.mark.slow
def test_motion_planner_driver_with_validation(tmp_path):
    cfg = _make_config(
        tmp_path, "MotionPlannerPTV3AdaNorm", "synthetic_motion",
        extra_act={"max_traj_len": 5, "traj_embed_size": 16,
                   "pc_label_channels": 8, "txt_reduce": "mean"},
        extra_ds={"max_traj_len": 5})
    state = train_motion_planner.main(cfg)
    assert int(state.step) == 3

    recs = _read_metrics(cfg.output_dir)
    val_recs = [r for r in recs if "val_total_loss" in r]
    assert val_recs, "validation never ran"
    for key in ("val_pos_loss", "val_stop_loss", "val_open_acc",
                "val_stop_acc"):
        assert key in val_recs[-1], val_recs[-1]
        assert np.isfinite(val_recs[-1][key])

    ckpts = os.listdir(os.path.join(cfg.output_dir, "ckpts"))
    assert "model_step_3.msgpack" in ckpts


@pytest.mark.slow
def test_remat_and_profiler(tmp_path):
    """remat=True must produce the same param tree and finite losses; the
    profiler hook must write a trace directory."""
    cfg = _make_config(tmp_path, "SimplePolicyPTV3CA", "synthetic")
    cfg.defrost()
    cfg.MODEL.ptv3_config["remat"] = True
    cfg.TRAIN.profile_start_step = 1
    cfg.TRAIN.profile_num_steps = 1
    cfg.freeze()
    state = train_simple_policy.main(cfg)
    assert int(state.step) == 3
    recs = _read_metrics(cfg.output_dir)
    assert all(np.isfinite(r["total"]) for r in recs if "total" in r)
    prof = os.path.join(cfg.output_dir, "profile")
    assert os.path.isdir(prof) and os.listdir(prof)


@pytest.mark.slow
def test_warm_start_from_checkpoint(tmp_path):
    """Reference `config.checkpoint` warm start (train_simple_policy.py:
    154-173): shape-filtered partial load of a pretrained model into a
    fresh run — matching shapes load, mismatches keep their init, no
    error on architecture drift; encoder_only keeps only backbone encoder
    weights."""
    import jax
    from flax import serialization
    from robot3dlotus_tpu.models.factory import build_model
    from robot3dlotus_tpu.train.checkpoint import warm_start_variables
    from robot3dlotus_tpu.train.torch_convert import flatten_tree
    from robot3dlotus_tpu.train.trainer import init_variables
    import __graft_entry__ as g

    batch = g._fake_batch(B=2, N=128, T=4, pos_bins=5)
    cfg1 = _make_config(tmp_path / "pre", "SimplePolicyPTV3CA", "synthetic")
    src_model = build_model(cfg1.MODEL)
    src_vars = init_variables(src_model, batch, jax.random.PRNGKey(0))
    src = {"params": src_vars["params"],
           "batch_stats": src_vars["batch_stats"]}
    ckpt = str(tmp_path / "model_step_3.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(src))
    src_flat = flatten_tree(src)

    # fresh init with a DIFFERENT context width: those shapes must skip
    cfg2 = _make_config(tmp_path / "arch", "SimplePolicyPTV3CA", "synthetic",
                        extra_act={"context_channels": 48})
    model = build_model(cfg2.MODEL)
    fresh = init_variables(model, batch, jax.random.PRNGKey(1))
    fresh = {"params": fresh["params"], "batch_stats": fresh["batch_stats"]}
    fresh_flat = flatten_tree(fresh)

    merged, n_loaded, n_skipped = warm_start_variables(dict(fresh), ckpt)
    assert n_loaded > 0 and n_skipped > 0, (n_loaded, n_skipped)
    m_flat = flatten_tree(merged)
    for k, v in m_flat.items():
        if k in src_flat and np.shape(src_flat[k]) == np.shape(v):
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(src_flat[k]))
        else:  # shape mismatch (context width) keeps the fresh init
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(fresh_flat[k]))

    # encoder_only: backbone encoder loads; decoder stages and the action
    # head keep their fresh init
    enc_only, n_enc, _ = warm_start_variables(dict(fresh), ckpt,
                                              encoder_only=True)
    assert 0 < n_enc < n_loaded
    e_flat = flatten_tree(enc_only)
    saw_dec = saw_head = False
    for k, v in e_flat.items():
        if "/dec0_" in k or "act_proj_head" in k:
            saw_dec = saw_dec or "/dec0_" in k
            saw_head = saw_head or "act_proj_head" in k
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(fresh_flat[k]))
    assert saw_dec and saw_head

    # strict (reference checkpoint_strict_load): the filtered checkpoint
    # must cover every model tensor — the context-width mismatch above
    # leaves some uninitialized, so strict raises
    with pytest.raises(ValueError, match="checkpoint_strict_load"):
        warm_start_variables(dict(fresh), ckpt, strict=True)
    # ...and passes when the architectures agree exactly
    model_same = build_model(cfg1.MODEL)
    fresh_same = init_variables(model_same, batch, jax.random.PRNGKey(2))
    _, n_all, _ = warm_start_variables(
        {"params": fresh_same["params"],
         "batch_stats": fresh_same["batch_stats"]}, ckpt, strict=True)
    assert n_all > 0
    # strict + encoder_only: only the eligible (encoder) tensors must be
    # covered — the deliberately-filtered decoder/head keys don't raise
    _, n_enc2, _ = warm_start_variables(
        {"params": fresh_same["params"],
         "batch_stats": fresh_same["batch_stats"]}, ckpt,
        encoder_only=True, strict=True)
    assert 0 < n_enc2 < n_all


@pytest.mark.slow
def test_warm_start_driver_wiring(tmp_path):
    """Driver-level `config.checkpoint` wiring: a fresh run warm-starts
    from the given checkpoint (auto-resume absent) and says so in the log;
    training proceeds to completion from the loaded weights."""
    import jax
    from flax import serialization
    from robot3dlotus_tpu.models.factory import build_model
    from robot3dlotus_tpu.train.trainer import init_variables
    import __graft_entry__ as g

    cfg1 = _make_config(tmp_path / "pre", "SimplePolicyPTV3CA", "synthetic")
    src_model = build_model(cfg1.MODEL)
    src_vars = init_variables(src_model, g._fake_batch(B=2, N=128, T=4,
                                                       pos_bins=5),
                              jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "pretrained.msgpack")
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(
            {"params": src_vars["params"],
             "batch_stats": src_vars["batch_stats"]}))

    cfg3 = _make_config(tmp_path / "warm", "SimplePolicyPTV3CA", "synthetic",
                        extra_top={"checkpoint": ckpt})
    state = train_simple_policy.main(cfg3)
    assert int(state.step) == 3
    log = open(os.path.join(cfg3.output_dir, "logs", "log.txt")).read()
    assert "warm start from" in log, log[-2000:]


@pytest.mark.slow
def test_zero1_manual_driver(tmp_path):
    """TRAIN.zero1_manual=True trains through run_training with the manual
    reduce-scatter ZeRO-1 step on the 8-device mesh: the trainer's own
    compiled program must carry literal reduce-scatter collectives, the
    optimizer state must live dp-sharded, and training must produce finite
    decreasing-ish losses + a resumable checkpoint."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg = _make_config(tmp_path / "z1m", "SimplePolicyPTV3CA", "synthetic",
                       extra_top=None)
    cfg.defrost()
    cfg.TRAIN.zero1_manual = True
    cfg.freeze()
    state = train_simple_policy.main(cfg)
    assert int(state.step) == 3
    metrics = _read_metrics(cfg.output_dir)
    assert all(np.isfinite(m["total"]) for m in metrics if "total" in m)
    # optimizer state is genuinely dp-sharded (ZeRO-1 memory claim)
    import math
    per = rep = 0
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        if hasattr(leaf, "sharding") and leaf.ndim:
            n = math.prod(leaf.shape) * leaf.dtype.itemsize
            per += math.prod(
                leaf.sharding.shard_shape(leaf.shape)) * leaf.dtype.itemsize
            rep += n
    assert per / rep <= 0.2, per / rep

    # the step run_training built carries LITERAL reduce-scatter/all-gather
    from robot3dlotus_tpu.models.factory import build_model
    from robot3dlotus_tpu.models.simple_policy import compute_loss
    from robot3dlotus_tpu.parallel.mesh import make_mesh, shard_batch
    from robot3dlotus_tpu.parallel.zero import make_manual_zero1_train_step
    import __graft_entry__ as g
    mesh = make_mesh(jax.devices(), tp=1, sp=1)
    model = build_model(cfg.MODEL)
    act = dict(cfg.MODEL.action_config)
    act.setdefault("pos_heatmap_type", "dist")
    loss_cfg = dict(cfg.MODEL.loss_config)
    batch = g._fake_batch(B=8, N=128, T=4, pos_bins=5)
    step = make_manual_zero1_train_step(
        model, lambda p, b: compute_loss(p, b, act, loss_cfg),
        dict(cfg.TRAIN), state, mesh)
    txt = step.lower(state, shard_batch(batch, mesh),
                     jax.random.PRNGKey(0)).compile().as_text()
    assert txt.count("reduce-scatter") > 0, "no literal RS on trainer path"
    assert txt.count("all-gather") > 0

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
                 extra_ds=None):
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
    cfg.freeze()
    return cfg


def _read_metrics(output_dir):
    path = os.path.join(output_dir, "logs", "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f]


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

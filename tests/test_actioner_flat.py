"""The Actioner's single-buffer H2D path must reproduce the dict-batch
program bit-for-bit: the flat packing (eval/actioner.py:_predict_fn_flat_batch)
is a transport optimization for RPC-priced device links, not a model
change. Packs random observations both ways and compares decoded actions.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from robot3dlotus_tpu.configs.node import ConfigNode
from robot3dlotus_tpu.eval.actioner import Actioner
from robot3dlotus_tpu.train.datasets.collate import TXT_BUCKETS, _bucket

from test_training_driver import TINY_PTV3

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models


TINY_ACT = {
    "voxel_size": 0.01, "context_channels": 32, "txt_ft_size": 64,
    "use_ee_pose": False, "use_step_id": False, "max_steps": 30,
    "reduce": "max", "dim_actions": 7,
    "pos_pred_type": "heatmap_disc", "pos_heatmap_temp": 0.1,
    "rot_pred_type": "euler_disc", "dropout": 0.0,
    "pos_bins": 5, "pos_bin_size": 0.01, "best_disc_pos": "max",
    "euler_resolution": 5,
}


def _actioner(tmp_path, **kwargs):
    act = dict(TINY_ACT)
    cfg = ConfigNode({
        "SEED": 3,
        "output_dir": str(tmp_path / "run"),
        "TRAIN_DATASET": {"data_dir": "synthetic", "num_points": 128,
                          "pos_bins": 5, "pos_type": "disc"},
        "MODEL": {
            "model_class": "SimplePolicyPTV3CA",
            "ptv3_config": dict(TINY_PTV3),
            "action_config": act,
        },
    })
    cfg.freeze()
    f = tmp_path / "config.yaml"
    with open(f, "w") as fh:
        cfg.dump(fh)
    return Actioner(str(f), **kwargs)


def test_flat_predict_matches_dict_batch(tmp_path):
    a = _actioner(tmp_path)
    rng = np.random.RandomState(0)
    N = a.num_points
    n = N - 17  # partial cloud exercises the mask/count path
    cin = int(a.config.MODEL.ptv3_config.in_channels)
    pc_ft = rng.uniform(-0.4, 0.4, (n, cin)).astype(np.float32)
    instr_embed = rng.randn(3, 64).astype(np.float32)
    ee = np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1], np.float32)
    step_id = 2

    # dict-batch program (the ensemble path's layout)
    pc = np.zeros((1, N, cin), np.float32)
    pc[0, :n] = pc_ft
    mask = np.zeros((1, N), bool)
    mask[0, :n] = True
    T = _bucket(instr_embed.shape[0], TXT_BUCKETS)
    txt = np.zeros((1, T, instr_embed.shape[-1]), np.float32)
    txt[0, :3] = instr_embed
    txt_mask = np.zeros((1, T), bool)
    txt_mask[0, :3] = True
    batch = {
        "pc_fts": jnp.asarray(pc), "pc_mask": jnp.asarray(mask),
        "pc_counts": jnp.asarray([n], jnp.int32),
        "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(txt_mask),
        "ee_poses": jnp.asarray(ee[None]),
        "step_ids": jnp.asarray([step_id], jnp.int32),
    }
    ref = np.asarray(a._predict_fn(T)(a.variables, batch))[0]

    # flat-buffer program (the single-obs path: the B=1 row of the shared
    # batched unpacker)
    flat = np.zeros((1, N * (cin + 1) + 10), np.float32)
    a._pack_flat_row(flat[0], pc_ft, ee, step_id)
    txt_dev, txt_mask_dev = a._staged_txt("instr", instr_embed, batched=True)
    got = np.asarray(a._predict_fn_flat_batch(cin)(
        a.variables, jnp.asarray(flat), txt_dev, txt_mask_dev))[0]

    np.testing.assert_array_equal(ref, got)


def test_mp_flat_predict_matches_dict_batch(tmp_path):
    """Same lock for the motion-planner engine's flat packing (the layout
    has an extra labels lane and is hand-duplicated between predict() and
    the jitted unpacker)."""
    from robot3dlotus_tpu.eval.robot_pipeline import MotionPlannerEngine
    from robot3dlotus_tpu.models.motion_planner import decode_mp_actions
    import jax
    from test_robot_pipeline import _write_mp_config

    eng = MotionPlannerEngine(_write_mp_config(tmp_path))
    rng = np.random.RandomState(1)
    N = eng.num_points
    n = N - 9
    cin = eng._feat_dim()
    pc_ft = rng.uniform(-0.4, 0.4, (n, cin)).astype(np.float32)
    labels = rng.randint(0, 4, n).astype(np.int32)
    txt = rng.randn(2, 512).astype(np.float32)
    ee = np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1], np.float32)

    # dict-batch reference program over _pad_batch
    batch = eng._pad_batch(pc_ft, labels, txt, ee)

    @jax.jit
    def run_dict(variables, batch):
        preds = eng.model.apply(variables, batch, deterministic=True)
        return decode_mp_actions(preds, eng.act_cfg)

    ref = np.array(run_dict(eng.variables, batch))[0]
    ref[:, 7:] = 1.0 / (1.0 + np.exp(-ref[:, 7:]))

    got = eng.predict(pc_ft, labels, txt, ee, pc_centroid=np.zeros(3),
                      pc_radius=1.0, table_height=-10.0)
    np.testing.assert_array_equal(ref, got)


def test_host_structure_flat_path_matches(tmp_path):
    """ROBOT3DLOTUS_EVAL_STRUCT=1 (host-built stencil maps ride the H2D
    buffer, device builds no occupancy tables) must reproduce the
    device-built-tables program exactly. Off by default — the map build +
    transfer measured net-slower at B=1 on an RPC-priced link
    (BENCH_NOTES.md round-3 A/B) — but the path stays correct for hosts
    with PCIe-attached devices."""
    a = _actioner(tmp_path)
    rng = np.random.RandomState(11)
    N = a.num_points
    n = N // 2 - 5
    cin = int(a.config.MODEL.ptv3_config.in_channels)
    pc_ft = rng.uniform(-0.4, 0.4, (n, cin)).astype(np.float32)
    instr_embed = rng.randn(3, 64).astype(np.float32)
    ee = np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1], np.float32)

    pc_sorted = a._presort(pc_ft)
    Nb = _bucket(n, a._point_buckets)
    flat = np.zeros((1, Nb * (cin + 1) + 10), np.float32)
    a._pack_flat_row(flat[0], pc_sorted, ee, 2, N=Nb)
    txt_dev, txt_mask_dev = a._staged_txt("instr", instr_embed, batched=True)

    assert not a.host_structure  # default off (latency A/B, BENCH_NOTES)
    ref = np.asarray(a._predict_fn_flat_batch(cin, Nb)(
        a.variables, jnp.asarray(flat), txt_dev, txt_mask_dev))[0]

    a.host_structure = True
    smap = a._struct_buf([pc_sorted], Nb)
    got = np.asarray(a._predict_fn_flat_batch(cin, Nb)(
        a.variables, jnp.asarray(flat), txt_dev, txt_mask_dev,
        jnp.asarray(smap)))[0]
    np.testing.assert_array_equal(ref, got)


def test_bucketed_presorted_path_matches_full_capacity_model(tmp_path):
    """The latency path (host presort into the stage-0 SFC frame +
    assume_sorted backbone + point-capacity bucketing) must reproduce the
    ground-truth program: the plain backbone (device entry sort) at full
    num_points capacity on the unsorted cloud."""
    import jax
    from robot3dlotus_tpu.models.simple_policy import decode_actions

    a = _actioner(tmp_path)
    rng = np.random.RandomState(7)
    N = a.num_points
    n = N // 4 + 3  # lands in the smallest point bucket
    cin = int(a.config.MODEL.ptv3_config.in_channels)
    pc_ft = rng.uniform(-0.4, 0.4, (n, cin)).astype(np.float32)
    instr_embed = rng.randn(3, 64).astype(np.float32)
    ee = np.asarray([0.1, -0.2, 0.9, 0, 0, 0, 1, 1], np.float32)

    # ground truth: plain model (assume_sorted=False), full capacity,
    # UNSORTED input — the device does the entry sort
    pc = np.zeros((1, N, cin), np.float32)
    pc[0, :n] = pc_ft
    mask = np.zeros((1, N), bool)
    mask[0, :n] = True
    T = _bucket(instr_embed.shape[0], TXT_BUCKETS)
    txt = np.zeros((1, T, instr_embed.shape[-1]), np.float32)
    txt[0, :3] = instr_embed
    txt_mask = np.zeros((1, T), bool)
    txt_mask[0, :3] = True
    batch = {
        "pc_fts": jnp.asarray(pc), "pc_mask": jnp.asarray(mask),
        "pc_counts": jnp.asarray([n], jnp.int32),
        "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(txt_mask),
        "ee_poses": jnp.asarray(ee[None]),
        "step_ids": jnp.asarray([2], jnp.int32),
    }

    @jax.jit
    def run_plain(variables, batch):
        preds = a.model.apply(variables, batch, deterministic=True)
        return decode_actions(preds, a.act_cfg)

    ref = np.asarray(run_plain(a.variables, batch))[0]

    # latency path: host presort + smallest bucket + assume_sorted program
    pc_sorted = a._presort(pc_ft)
    assert pc_sorted.shape == pc_ft.shape
    assert sorted(map(tuple, pc_sorted.tolist())) == \
        sorted(map(tuple, pc_ft.tolist()))  # a permutation, nothing lost
    Nb = _bucket(n, a._point_buckets)
    assert Nb < N
    flat = np.zeros((1, Nb * (cin + 1) + 10), np.float32)
    a._pack_flat_row(flat[0], pc_sorted, ee, 2, N=Nb)
    txt_dev, txt_mask_dev = a._staged_txt("instr", instr_embed, batched=True)
    got = np.asarray(a._predict_fn_flat_batch(cin, Nb)(
        a.variables, jnp.asarray(flat), txt_dev, txt_mask_dev))[0]

    np.testing.assert_allclose(ref, got, atol=1e-5, rtol=1e-5)

"""Parity of the fused on-device eval preprocessing (ops/eval_preprocess.py)
against the host numpy chain used by the Actioner / the reference
(eval_simple_policy.py:151-251): workspace crop, 1 cm voxelize-with-trace,
robot OBB removal, sampling, center/normalize."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robot3dlotus_tpu.configs.rlbench.constants import get_robot_workspace
from robot3dlotus_tpu.ops.eval_preprocess import (
    device_preprocess, obb_params_np,
)
from robot3dlotus_tpu.ops.voxel import voxelize_pcd_np, workspace_mask_np
from robot3dlotus_tpu.utils.robot_box import RobotBox
from robot3dlotus_tpu.train.datasets.store import SyntheticStore

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models


def _raw_obs(points=20000, seed=0):
    store = SyntheticStore(points_per_step=points)
    ep = store.get(store.taskvars()[0], store.episodes("x")[0])
    xyz = np.asarray(ep["xyz"][0], np.float32)
    rgb = np.asarray(ep["rgb"][0], np.float32)
    arm = ({k: np.asarray(v[0]) for k, v in ep["bbox_info"].items()},
           {k: np.asarray(v[0]) for k, v in ep["pose_info"].items()})
    return xyz, rgb, arm


def _host_chain(xyz, rgb, arm, ws, rm_robot=True):
    keep = workspace_mask_np(xyz, ws, rm_table=True)
    xyz, rgb = xyz[keep], rgb[keep]
    xyz, first = voxelize_pcd_np(xyz, 0.01)
    rgb = rgb[first]
    if rm_robot:
        box = RobotBox(arm, keep_gripper=True)
        m = ~box.point_mask(xyz)
        xyz, rgb = xyz[m], rgb[m]
    return xyz.astype(np.float32), rgb.astype(np.float32)


def test_device_preprocess_matches_host_no_subsample():
    xyz, rgb, arm = _raw_obs()
    ws = get_robot_workspace()
    host_xyz, host_rgb = _host_chain(xyz, rgb, arm, ws)
    assert len(host_xyz) > 50

    cap = 32768
    raw_xyz = np.zeros((cap, 3), np.float32)
    raw_rgb = np.zeros((cap, 3), np.float32)
    raw_xyz[:len(xyz)] = xyz
    raw_rgb[:len(rgb)] = rgb
    valid = np.zeros(cap, bool)
    valid[:len(xyz)] = True

    box = RobotBox(arm, keep_gripper=True)
    obb = obb_params_np(box)
    N = len(host_xyz) + 64  # no subsampling: capacity exceeds survivors
    ee = np.asarray([0.3, 0, 1.0, 0, 0, 0, 1, 1], np.float32)
    pc_ft, mask, count, centroid, radius, ee_n, ovf = device_preprocess(
        jnp.asarray(raw_xyz), jnp.asarray(raw_rgb), jnp.asarray(valid),
        jnp.asarray(obb["obb_rot"]), jnp.asarray(obb["obb_off"]),
        jnp.asarray(obb["obb_half"]), jnp.asarray(ee),
        jax.random.PRNGKey(0), workspace=ws, num_points=N,
        voxel_size=0.01, vox_capacity=8192)
    pc_ft, mask = np.asarray(pc_ft), np.asarray(mask)

    assert int(count) == len(host_xyz)

    # compare as SETS (host orders voxels lexicographically, device by
    # z-order then random keys): sort both by xyz rows
    host_centroid = host_xyz.mean(0)
    host_height = (host_xyz[:, 2] - ws["TABLE_HEIGHT"])[:, None]
    host_ft = np.concatenate(
        [host_xyz - host_centroid, (host_rgb / 255.0) * 2 - 1, host_height],
        1)

    def canon(a):
        return a[np.lexsort(a[:, :3].T[::-1])]

    np.testing.assert_allclose(np.asarray(centroid), host_centroid, atol=1e-5)
    np.testing.assert_allclose(
        canon(pc_ft[mask]), canon(host_ft), atol=1e-4)
    np.testing.assert_allclose(float(radius), 1.0)
    np.testing.assert_allclose(np.asarray(ee_n)[:3], ee[:3] - host_centroid,
                               atol=1e-5)


def test_device_preprocess_subsamples_to_capacity():
    xyz, rgb, arm = _raw_obs(points=12000, seed=1)
    ws = get_robot_workspace()
    host_xyz, _ = _host_chain(xyz, rgb, arm, ws)
    N = max(len(host_xyz) // 2, 8)  # force subsampling

    cap = 16384
    raw_xyz = np.zeros((cap, 3), np.float32)
    raw_rgb = np.zeros((cap, 3), np.float32)
    raw_xyz[:len(xyz)] = xyz
    raw_rgb[:len(rgb)] = rgb
    valid = np.zeros(cap, bool)
    valid[:len(xyz)] = True
    box = RobotBox(arm, keep_gripper=True)
    obb = obb_params_np(box)
    ee = np.asarray([0.3, 0, 1.0, 0, 0, 0, 1, 1], np.float32)

    pc_ft, mask, count, centroid, radius, _, ovf = device_preprocess(
        jnp.asarray(raw_xyz), jnp.asarray(raw_rgb), jnp.asarray(valid),
        jnp.asarray(obb["obb_rot"]), jnp.asarray(obb["obb_off"]),
        jnp.asarray(obb["obb_half"]), jnp.asarray(ee),
        jax.random.PRNGKey(7), workspace=ws, num_points=N,
        voxel_size=0.01, vox_capacity=8192)
    mask = np.asarray(mask)
    assert int(count) == N == mask.sum()
    # every selected point is one of the host-surviving voxels (up to the
    # voxel-mean arithmetic): nearest host voxel within half a voxel
    # (kd-tree, not an (n_sel, n_host, 3) broadcast matrix)
    from scipy.spatial import cKDTree
    sel = np.asarray(pc_ft)[mask][:, :3] + np.asarray(centroid)
    d, _ = cKDTree(host_xyz).query(sel, k=1)
    assert float(d.max()) < 0.005

    # different keys -> different subsets (randomness is live)
    pc2, mask2, *_ = device_preprocess(
        jnp.asarray(raw_xyz), jnp.asarray(raw_rgb), jnp.asarray(valid),
        jnp.asarray(obb["obb_rot"]), jnp.asarray(obb["obb_off"]),
        jnp.asarray(obb["obb_half"]), jnp.asarray(ee),
        jax.random.PRNGKey(8), workspace=ws, num_points=N,
        voxel_size=0.01, vox_capacity=8192)
    assert not np.allclose(np.asarray(pc2), np.asarray(pc_ft))


def test_fused_obs_to_action_matches_host_pipeline():
    """Full fused program (preprocess + forward + decode + un-normalize,
    make_obs_to_action) vs the host chain + the same model/decode, same
    weights, no-subsample regime: final actions must agree (the model's
    serialization re-sorts points, so the different point orderings of the
    two paths cannot change the result beyond fp reassociation)."""
    from robot3dlotus_tpu.models.simple_policy import (
        SimplePolicyTPU, decode_actions,
    )
    from robot3dlotus_tpu.ops.eval_preprocess import make_obs_to_action
    from test_policy import PTV3_CFG, ACT_CFG

    xyz, rgb, arm = _raw_obs(points=1500, seed=2)
    ws = get_robot_workspace()
    host_xyz, host_rgb = _host_chain(xyz, rgb, arm, ws)
    N = 2048
    assert 50 < len(host_xyz) <= N  # no-subsample regime

    act = dict(ACT_CFG, txt_ft_size=128)
    ptv3 = dict(PTV3_CFG, in_channels=7)
    model = SimplePolicyTPU(ptv3_cfg=ptv3, act_cfg=act, variant="ca")
    T = 4
    rng = np.random.RandomState(5)
    txt = rng.randn(T, 128).astype(np.float32)
    ee = np.asarray([0.3, 0, 1.0, 0, 0, 0, 1, 1], np.float32)

    # host-path batch
    height = host_xyz[:, 2] - ws["TABLE_HEIGHT"]
    centroid = host_xyz.mean(0)
    pc_ft = np.concatenate(
        [host_xyz - centroid, (host_rgb / 255.0) * 2 - 1, height[:, None]], 1)
    n = len(pc_ft)
    pc = np.zeros((1, N, 7), np.float32)
    pc[0, :n] = pc_ft
    mask = np.zeros((1, N), bool)
    mask[0, :n] = True
    ee_h = ee.copy()
    ee_h[:3] -= centroid
    batch = {
        "pc_fts": jnp.asarray(pc), "pc_mask": jnp.asarray(mask),
        "pc_counts": jnp.asarray([n], np.int32),
        "txt_embeds": jnp.asarray(txt[None]),
        "txt_mask": jnp.ones((1, T), bool),
        "ee_poses": jnp.asarray(ee_h[None]),
        "step_ids": jnp.zeros((1,), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key, "shuffle": key},
                           batch, deterministic=True)
    preds = model.apply(variables, batch, deterministic=True)
    host_action = np.array(decode_actions(preds, act))[0]
    host_action[:3] += centroid
    host_action[2] = max(host_action[2], ws["TABLE_HEIGHT"] + 0.005)

    # fused path
    data_cfg = dict(rm_table=True, rm_robot="box_keep_gripper",
                    xyz_shift="center", xyz_norm=False, use_height=True)
    fused = make_obs_to_action(model, act, data_cfg, ws, N,
                               vox_capacity=4096)
    cap = 16384
    raw_xyz = np.zeros((cap, 3), np.float32)
    raw_rgb = np.zeros((cap, 3), np.float32)
    raw_xyz[:len(xyz)] = xyz
    raw_rgb[:len(rgb)] = rgb
    valid = np.zeros(cap, bool)
    valid[:len(xyz)] = True
    box = RobotBox(arm, keep_gripper=True)
    obb = obb_params_np(box)
    obb_vec = np.concatenate([
        np.ascontiguousarray(obb["obb_rot"], np.float32).ravel(),
        obb["obb_off"], obb["obb_half"]]).astype(np.float32)
    step_ee_key = np.concatenate(
        [[np.float32(0)], ee, [np.float32(3)]]).astype(np.float32)
    packed = np.asarray(fused(
        variables, jnp.asarray(raw_xyz), jnp.asarray(raw_rgb),
        np.int32(len(xyz)), jnp.asarray(obb_vec), jnp.asarray(txt),
        jnp.ones(T, bool), jnp.asarray(step_ee_key)))
    dev_action = packed[:8]  # one packed readback: [action|count|overflow]
    assert int(packed[8]) == len(host_xyz)
    assert int(packed[9]) == 0

    np.testing.assert_allclose(dev_action[:3], host_action[:3], atol=2e-4,
                               err_msg="position")
    np.testing.assert_allclose(dev_action[3:7], host_action[3:7], atol=1e-4,
                               err_msg="quaternion")
    np.testing.assert_allclose(dev_action[7], host_action[7], atol=1e-3,
                               err_msg="open logit")


def test_obb_disabled_removes_nothing_and_empty_box_degrades():
    """Negative half extents are the remove-nothing recipe; all-zero
    parameters would remove EVERYTHING (|p@0 - 0| <= 0 holds). An empty
    RobotBox degrades to the remove-nothing recipe like the host path."""
    from robot3dlotus_tpu.ops.eval_preprocess import obb_params_disabled

    xyz, rgb, arm = _raw_obs(points=4000)
    ws = get_robot_workspace()
    cap = 8192
    raw_xyz = np.zeros((cap, 3), np.float32)
    raw_rgb = np.zeros((cap, 3), np.float32)
    raw_xyz[:len(xyz)] = xyz
    raw_rgb[:len(rgb)] = rgb
    valid = np.arange(cap) < len(xyz)

    def run(obb):
        out = device_preprocess(
            jnp.asarray(raw_xyz), jnp.asarray(raw_rgb), jnp.asarray(valid),
            jnp.asarray(obb["obb_rot"]), jnp.asarray(obb["obb_off"]),
            jnp.asarray(obb["obb_half"]),
            jnp.asarray([0, 0, 1, 0, 0, 0, 1, 1], jnp.float32),
            jax.random.PRNGKey(0), workspace=ws, num_points=1024,
            voxel_size=0.01, vox_capacity=4096, rm_robot=True)
        return int(out[2])  # count

    n_disabled = run(obb_params_disabled())
    host_xyz, _ = _host_chain(xyz, rgb, arm, ws, rm_robot=False)
    assert n_disabled == min(len(host_xyz), 1024)

    # an empty box list must behave like the disabled recipe, not crash
    class _EmptyBox:
        boxes = []

    obb_empty = obb_params_np(_EmptyBox())
    assert np.all(obb_empty["obb_half"] < 0)
    assert run(obb_empty) == n_disabled


def test_make_obs_to_action_rejects_small_capacity():
    from robot3dlotus_tpu.ops.eval_preprocess import make_obs_to_action
    with pytest.raises(ValueError, match="vox_capacity"):
        make_obs_to_action(None, {}, {}, get_robot_workspace(),
                           num_points=4096, vox_capacity=2048)


def test_voxelize_fixed_jnp_drops_out_of_extent_loudly():
    """Points whose grid coordinate exceeds the 2^depth extent are DROPPED
    and counted in overflow — clipping them into a boundary voxel would
    silently corrupt that voxel's mean/first gather."""
    from robot3dlotus_tpu.ops.voxel import voxelize_fixed_jnp

    xyz = np.array([[0.0, 0.0, 0.0],
                    [0.05, 0.0, 0.0],
                    [9.99, 0.0, 0.0]],  # 999 cells past a 2^6=64 extent
                   np.float32)
    mask = np.ones(3, bool)
    means, vmask, first, overflow = voxelize_fixed_jnp(
        jnp.asarray(xyz), jnp.asarray(mask), 0.01, capacity=16, depth=6)
    assert int(overflow) == 1  # the far point, not a clipped merge
    assert int(vmask.sum()) == 2
    got = np.asarray(means)[np.asarray(vmask)]
    np.testing.assert_allclose(sorted(got[:, 0]), [0.0, 0.05], atol=1e-6)

    # capacity overflow still counts on top (exact integer coords so no
    # float-division cell merging)
    many = np.arange(32, dtype=np.float32)[:, None] * \
        np.array([1.0, 0, 0], np.float32)
    _, vm2, _, ovf2 = voxelize_fixed_jnp(
        jnp.asarray(many), jnp.ones(32, bool), 1.0, capacity=8, depth=6)
    assert int(ovf2) == 24 and int(vm2.sum()) == 8


def test_voxelize_pcd_np_float64_stays_numpy():
    """float64 input must NOT be routed through the float32 native path:
    the cast moves boundary points across voxel edges, so results would
    depend on compiler availability. (0.00999999999999999 rounds to
    exactly 0.01f.)"""
    xyz64 = np.array([[0.0, 0.0, 0.0],
                      [0.00999999999999999, 0.0, 0.0],
                      [0.02, 0.0, 0.0]], np.float64)
    means, first = voxelize_pcd_np(xyz64, 0.01)
    assert means.dtype == np.float64
    assert len(means) == 2  # pts 0+1 share the first voxel in f64
    means32, _ = voxelize_pcd_np(xyz64.astype(np.float32), 0.01)
    assert len(means32) == 3  # after the f32 cast they do not

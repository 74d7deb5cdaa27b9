"""Offline data-generation chain (reference preprocess/*):
microsteps -> keysteps -> voxelized pcd -> motion substeps -> text embeds,
all simulator-free, ending in stores the training datasets load."""
import json
import os

import numpy as np
import pytest

from robot3dlotus_tpu.preprocess.generate_keysteps import (
    keysteps_from_microstep_record, select_keysteps,
    microstep_record_to_demo,
)
from robot3dlotus_tpu.preprocess.gen_simple_policy_data import (
    voxelize_keystep_record,
)
from robot3dlotus_tpu.preprocess.gen_motion_planner_data import (
    generate_action_trajectories, expand_action_trajectories,
    resegment_episode,
)
from robot3dlotus_tpu.preprocess.gen_text_embeds import (
    collect_action_names, encode_to_file,
)
from robot3dlotus_tpu.preprocess.evaluate_microsteps import (
    MicrostepReplayActioner,
)
from robot3dlotus_tpu.rlbench.coord_transforms import (
    PointWorld2Image, world_to_image, quaternion_to_discrete_euler,
    discrete_euler_to_quaternion,
)
from robot3dlotus_tpu.configs.rlbench.constants import get_robot_workspace
from robot3dlotus_tpu.train.datasets.store import (
    MsgpackDirStore, SyntheticMotionStore, SyntheticStore,
)
from robot3dlotus_tpu.utils.robot_box import (
    RLBENCH_ARM_LINKS, RLBENCH_GRIPPER_LINKS,
)


def make_microstep_record(T=40, n_keypoints=3, cams=2, hw=16, seed=0):
    """Synthetic microstep episode: the arm 'stops' (zero joint velocities
    for a stretch) at known frames and toggles the gripper once."""
    rng = np.random.RandomState(seed)
    ws_z = 0.7505
    vels = rng.uniform(0.5, 1.0, (T, 7))
    gripper_open = np.ones(T, np.float32)
    # stop at frame 15 (sustained zeros), gripper toggle at frame 28
    vels[13:18] = 0.0
    gripper_open[28:] = 0.0
    xyz = rng.uniform([-0.1, -0.3, ws_z + 0.01], [0.5, 0.3, ws_z + 0.4],
                      (T, cams, hw, hw, 3)).astype(np.float32)
    rgb = rng.randint(0, 256, (T, cams, hw, hw, 3)).astype(np.uint8)
    q = rng.randn(T, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    gripper = np.concatenate([
        rng.uniform([-0.1, -0.3, ws_z], [0.5, 0.3, ws_z + 0.4], (T, 3)),
        q, gripper_open[:, None]], axis=1).astype(np.float32)
    mask = rng.randint(0, 20, (T, cams, hw, hw)).astype(np.int32)
    bbox_info, pose_info = {}, {}
    for link in RLBENCH_ARM_LINKS + RLBENCH_GRIPPER_LINKS:
        kind = "visual" if link in ("Panda_link0", "Panda_rightfinger",
                                    "Panda_leftfinger", "Panda_gripper") \
            else "respondable"
        bbox_info[f"{link}_{kind}_bbox"] = np.tile(
            np.array([-0.04, 0.04, -0.04, 0.04, -0.08, 0.08], np.float32),
            (T, 1))
        pose_info[f"{link}_{kind}_pose"] = np.concatenate([
            rng.uniform([-0.4, -0.4, ws_z], [-0.2, 0.4, ws_z + 0.6], (T, 3)),
            np.tile(np.array([0, 0, 0, 1], np.float32), (T, 1))], 1)
    # simple pinhole cameras
    intr = np.array([[110.0, 0, hw / 2], [0, 110.0, hw / 2], [0, 0, 1]],
                    np.float32)
    extr = np.eye(4, dtype=np.float32)
    extr[2, 3] = 2.0  # camera 2m up
    camera_info = {}
    for cam in ("left_shoulder", "right_shoulder", "wrist", "front"):
        camera_info[f"{cam}_intrinsics"] = np.tile(intr, (T, 1, 1))
        camera_info[f"{cam}_extrinsics"] = np.tile(extr, (T, 1, 1))
    return {
        "rgb": rgb, "pc": xyz, "mask": mask, "gripper": gripper,
        "joint_velocities": vels, "gripper_open": gripper_open,
        "bbox_info": bbox_info, "pose_info": pose_info,
        "camera_info": camera_info,
    }


def test_keystep_detection_and_stacking():
    rec = make_microstep_record()
    demo = microstep_record_to_demo(rec)
    keys = select_keysteps(demo, "push_button")
    assert keys[0] == 0
    assert any(13 <= k < 18 for k in keys), keys   # sustained stop window
    assert 28 in keys, keys        # gripper toggle
    assert keys[-1] == len(demo) - 1

    out = keysteps_from_microstep_record(rec, "push_button")
    T = len(keys)
    assert out["rgb"].shape[0] == T
    assert out["pc"].shape == (T, 2, 16, 16, 3)
    assert out["action"].shape == (T, 8)
    np.testing.assert_array_equal(out["key_frameids"], keys)
    for v in out["bbox_info"].values():
        assert v.shape[0] == T
    # gripper image projection exists per camera per keystep
    assert len(out["gripper_pose"]) == T
    assert set(out["gripper_pose"][0]) == {
        "left_shoulder", "right_shoulder", "wrist", "front"}


def test_voxelize_keystep_record_and_dataset_roundtrip(tmp_path):
    """Full chain: microsteps -> keysteps -> voxel pcd store -> KeystepDataset
    sample."""
    from robot3dlotus_tpu.train.datasets.keystep_dataset import KeystepDataset

    rec = make_microstep_record()
    ks = keysteps_from_microstep_record(rec, "push_button")
    ws = get_robot_workspace()
    vox = voxelize_keystep_record(ks, ws, voxel_size=0.01)
    T = len(ks["key_frameids"])
    assert len(vox["xyz"]) == T
    raw = ks["pc"].reshape(len(vox["xyz"]), -1, 3)
    for t, xyz in enumerate(vox["xyz"]):
        assert 0 < len(xyz) <= raw.shape[1]
        # workspace crop applied
        assert (xyz[:, 2] > ws["Z_BBOX"][0]).all()
        assert (xyz[:, 0] > ws["X_BBOX"][0]).all()
        # voxel means stay within the raw cloud's bounds
        assert xyz.min() >= raw[t].min() - 1e-5
        assert xyz.max() <= raw[t].max() + 1e-5

    store = MsgpackDirStore(str(tmp_path / "pcd"))
    store.put("push_button+0", "episode0", vox)
    ds = KeystepDataset(store, num_points=512, augment_pc=False,
                        rng=np.random.RandomState(0))
    samples = ds[0]
    assert len(samples) == T - 1  # last keystep has no next action
    s = samples[0]
    assert s["pc_fts"].shape[-1] == 7  # xyz + rgb + height
    assert np.isfinite(s["pc_fts"]).all()


def test_action_trajectory_generation():
    """Re-segmentation semantics (reference gen_motion_planner_data.py:21-66)."""
    actions = np.stack([np.concatenate([np.full(7, i, np.float32), [1.0]])
                        for i in range(6)])
    actions[:5, -1] = [1, 1, 0, 0, 1]  # close at 2, open at 4
    new_ids = [0, 2, 4, -1]
    traj_ids, trajs, end_open = generate_action_trajectories(
        actions, new_ids, sep_open_keystep_ids=[4])
    assert [list(t) for t in traj_ids] == [[1, 2], [3, 4], [5]]
    # gripper-open separation: the 2nd trajectory's last action keeps the
    # previous openness (0) and is flagged
    assert end_open == [False, True, False]
    assert trajs[1][-1][-1] == 0.0

    new_trajs, new_end_open, is_new = expand_action_trajectories(
        traj_ids, trajs, end_open)
    assert len(new_trajs) == 6  # one per original action
    assert is_new == [True, False, True, False, True, False]
    # microstep 1 (inside traj 0) sees only the remaining future actions
    assert len(new_trajs[1]) == 1
    np.testing.assert_array_equal(new_trajs[0][0], actions[1])


def test_resegment_episode_feeds_motion_dataset(tmp_path):
    from robot3dlotus_tpu.train.datasets.motion_dataset import (
        MotionPlannerDataset,
    )
    rec = make_microstep_record()
    ks = keysteps_from_microstep_record(rec, "push_button")
    ws = get_robot_workspace()
    vox = voxelize_keystep_record(ks, ws)
    # fake semantic masks (the synthetic microsteps have none)
    vox["sem"] = [np.random.RandomState(1).randint(0, 20, len(x))
                  for x in vox["xyz"]]
    T = len(vox["xyz"])
    out = resegment_episode(vox, [0, -1], task_num_keysteps=[T])
    assert out is not None
    assert len(out["trajs"]) == T
    assert out["is_new_keystep"][0]

    store = MsgpackDirStore(str(tmp_path / "motion"))
    store.put("push_button+0", "episode0", out)
    ds = MotionPlannerDataset(store, num_points=256, max_traj_len=5,
                              augment_pc=False,
                              rng=np.random.RandomState(0))
    samples = ds[0]
    assert len(samples) >= 1
    s = samples[0]
    # euler_disc rot: pos(3) + disc-euler(3) + open(1)
    assert s["gt_trajs"].shape[-1] == 7
    assert s["pc_labels"].max() <= 3
    # invalid keystep count -> rejected
    assert resegment_episode(vox, [0, -1], task_num_keysteps=[T + 5]) is None


def test_text_embed_cache(tmp_path):
    class FakeEncoder:
        def encode_tokens(self, text):
            return np.full((4, 8), len(text), np.float32)

    out = encode_to_file(["press the button", "pull the lever"],
                         str(tmp_path / "instr_embeds_clip.npy"),
                         encoder=FakeEncoder())
    cache = np.load(out, allow_pickle=True).item()
    assert set(cache) == {"press the button", "pull the lever"}
    assert cache["pull the lever"].shape == (4, 8)

    labels = {"t+0": [
        {"action": "grasp", "object": {"name": "red cube"}},
        {"action": "move grasped object",
         "object": {"name": "red cube"}, "target": {"name": "plate"}},
    ]}
    f = tmp_path / "labels.json"
    f.write_text(json.dumps(labels))
    names = collect_action_names(str(f), include_objects=True)
    assert "grasp red cube" in names
    assert "move grasped object red cube to plate" in names
    names = collect_action_names(str(f), include_objects=False)
    assert names == ["grasp", "move grasped object"]


def test_coord_transforms():
    intr = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    extr = np.eye(4)
    extr[:3, 3] = [0, 0, 2.0]  # camera at z=2 looking along +z
    pts = np.array([[0.5, 0.25, 4.0]])
    vu = world_to_image(pts, extr, intr)
    # camera coords = world - [0,0,2] -> (0.5, 0.25, 2) -> u=100*0.5/2+64
    assert vu[0][1] == 89 and vu[0][0] == int(round(100 * 0.25 / 2 + 64))

    import tempfile
    params = {
        "front_camera_extrinsics": extr.tolist(),
        "front_camera_intrinsics": intr.tolist(),
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(params, f)
        path = f.name
    p2i = PointWorld2Image(path)
    outs = p2i(["front"], pts.T[None])  # (1, 3, 1)
    assert outs[0].shape == (1, 2, 1)
    assert outs[0][0, 1, 0] == 89
    os.unlink(path)

    # euler disc round trip (reference coord_transforms.py:86-97)
    q = np.array([0.2, -0.4, 0.1, 0.88])
    q /= np.linalg.norm(q)
    disc = quaternion_to_discrete_euler(q, 5)
    q2 = discrete_euler_to_quaternion(disc, 5)
    disc2 = quaternion_to_discrete_euler(q2, 5)
    np.testing.assert_array_equal(disc, disc2)


def test_microstep_replay_actioner_store_mode():
    store = SyntheticStore()
    actioner = MicrostepReplayActioner(store=store)
    out0 = actioner.predict(task_str="synthetic_task0", variation=0,
                            step_id=0, episode_id="episode0")
    rec = store.get("synthetic_task0+0", "episode0")
    np.testing.assert_allclose(out0["action"], rec["action"][1])
    # beyond the recorded horizon: zero action
    out = actioner.predict(task_str="synthetic_task0", variation=0,
                           step_id=99, episode_id="episode0")
    np.testing.assert_array_equal(out["action"], np.zeros(8))

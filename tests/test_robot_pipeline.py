"""3D-LOTUS++ closed-loop tests: GT-oracle pipeline end-to-end against the
ReplayEnv (no simulator), the full RobotPipeline orchestration with an
injected fake VLM, and the stateful (cache round-trip) eval server
(reference robot_pipeline.py:27-426, robot_pipeline_gt.py:61-362,
eval_robot_pipeline_server.py:197-357)."""
import json
import os

import numpy as np
import pytest

from robot3dlotus_tpu.configs.node import ConfigNode
from robot3dlotus_tpu.eval.robot_pipeline import (
    ActionTextEmbedder, GroundtruthRobotPipeline, GroundtruthVision,
    MotionPlannerEngine, RobotPipeline,
)
from robot3dlotus_tpu.eval.server import ReplayEnv, run_eval_server
from robot3dlotus_tpu.train.datasets.store import SyntheticMotionStore

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models

TINY_MP_MODEL = {
    "model_class": "MotionPlannerPTV3AdaNorm",
    "ptv3_config": {
        "in_channels": 12,  # xyz+height (4) + pc-label embedding (8)
        "orders": ["z", "z-trans"],
        "stride": [2],
        "enc_depths": [1, 1], "enc_channels": [16, 32],
        "enc_num_head": [2, 2], "enc_patch_size": [16, 16],
        "dec_depths": [1], "dec_channels": [16], "dec_num_head": [2],
        "dec_patch_size": [16],
        "qkv_bias": True, "qk_norm": True,
        "attn_drop": 0.0, "proj_drop": 0.0, "drop_path": 0.0,
        "shuffle_orders": False, "serial_depth": 5, "stem_kernel": 3,
    },
    "action_config": {
        "voxel_size": 0.01, "context_channels": 32, "txt_ft_size": 512,
        "use_ee_pose": False, "max_steps": 30,
        "reduce": "max", "dim_actions": 7,
        "pos_pred_type": "heatmap_disc", "pos_heatmap_temp": 0.1,
        "rot_pred_type": "euler_disc", "dropout": 0.0,
        "pos_bins": 5, "pos_bin_size": 0.01, "best_disc_pos": "max",
        "euler_resolution": 5, "max_traj_len": 5, "traj_embed_size": 16,
        "pc_label_channels": 8, "txt_reduce": "mean",
    },
    "loss_config": {"pos_weight": 1.0, "rot_weight": 1.0},
}

GT_PLAN = """# taskvar: synthetic_task0+0
# query: do the task
ret = grasp(object="blob")
move_grasped_object(target="table")
release()
"""


def _write_mp_config(tmp_path):
    cfg = ConfigNode({
        "MODEL": TINY_MP_MODEL,
        "TRAIN_DATASET": {
            "data_dir": "synthetic_motion", "num_points": 128,
            "xyz_shift": "center", "xyz_norm": False, "use_height": True,
            "rm_robot": "box_keep_gripper",
            "same_npoints_per_example": False,
            "pc_label_type": "coarse",
        },
    })
    path = tmp_path / "mp_config.yaml"
    with open(path, "w") as f:
        cfg.dump(f)
    return str(path)


def _write_gt_assets(tmp_path):
    plan_file = tmp_path / "gt_plans.txt"
    plan_file.write_text(GT_PLAN)
    # per-highlevel-step (release excluded) object/target gt mask labels
    labels = {"synthetic_task0+0": [
        {"object": {"coarse": [1, 2, 3], "fine": [1, 2, 3]}},
        {"object": {"coarse": [1, 2], "fine": [1, 2]},
         "target": {"coarse": [4, 5], "fine": [4, 5],
                    "zrange": [0.7, 1.2]}},
    ]}
    label_file = tmp_path / "gt_labels.json"
    label_file.write_text(json.dumps(labels))
    return str(plan_file), str(label_file)


@pytest.fixture(scope="module")
def mp_engine(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    return MotionPlannerEngine(_write_mp_config(tmp))


def _gt_pipeline(tmp_path, mp_engine):
    plan_file, label_file = _write_gt_assets(tmp_path)
    config = {
        "llm_planner": {"use_groundtruth": True, "gt_plan_file": plan_file},
        "object_grounding": {"gt_label_file": label_file},
        "motion_planner": {
            "config_file": None, "checkpoint": None, "run_action_step": 5,
        },
        "pipeline": {"restart": False},
    }
    return GroundtruthRobotPipeline(config, motion_planner=mp_engine,
                                    text_embedder=ActionTextEmbedder())


def test_gt_pipeline_episode_end_to_end(tmp_path, mp_engine):
    """A GT-mode episode runs planner -> gt vision -> motion planner ->
    decoded trajectory through the ReplayEnv observations."""
    pipeline = _gt_pipeline(tmp_path, mp_engine)
    env = ReplayEnv(SyntheticMotionStore())
    obs = env.reset("synthetic_task0", 0, 0)

    cache = None
    actions = []
    cached_traj = None
    for step_id in range(6):
        out = pipeline.predict(
            task_str="synthetic_task0", variation=0, step_id=step_id,
            obs_state_dict=obs, episode_id=0,
            instructions=["do the task"], cache=cache)
        cache = out["cache"]
        a = np.asarray(out["action"])
        assert a.shape == (8,)
        assert np.isfinite(a).all()
        if cached_traj is not None and len(cached_traj):
            # a cached trajectory step must be replayed verbatim
            np.testing.assert_allclose(a, cached_traj[0][:8])
        cached_traj = list(cache["valid_actions"])
        actions.append(a)
        nxt, reward, done = env.step(a)
        if done:
            break
        obs = nxt
    # cache round-trips through pickle (the eval-server queue contract)
    import pickle
    pickle.loads(pickle.dumps(cache))
    # either the plan advanced (stop bit fired) or a trajectory was cached
    assert cache["highlevel_step_id"] >= 1 or len(actions) > 1
    # quaternion actions are unit whenever the motion planner produced them
    q = actions[0][3:7]
    assert abs(np.linalg.norm(q) - 1.0) < 1e-4


def test_gt_pipeline_release_opens_gripper(tmp_path, mp_engine):
    pipeline = _gt_pipeline(tmp_path, mp_engine)
    env = ReplayEnv(SyntheticMotionStore())
    obs = env.reset("synthetic_task0", 0, 0)
    # force the plan pointer at the 'release' step
    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=0,
        obs_state_dict=obs, episode_id=0, instructions=["do the task"])
    cache = out["cache"]
    cache["valid_actions"] = []
    cache["highlevel_step_id"] = 2  # release()
    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=1,
        obs_state_dict=obs, episode_id=0, instructions=["do the task"],
        cache=cache)
    assert out["action"][7] == 1
    assert out["cache"]["highlevel_step_id"] == 3
    # past the end of the plan: zero action (restart=False)
    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=2,
        obs_state_dict=obs, episode_id=0, instructions=["do the task"],
        cache=out["cache"])
    np.testing.assert_array_equal(out["action"], np.zeros(8))


def test_gt_vision_labels(tmp_path):
    """GT masks map to 4-way labels with zrange filtering."""
    _, label_file = _write_gt_assets(tmp_path)
    vision = GroundtruthVision(label_file, num_points=256, rm_robot="none",
                               use_height=True)
    n = 600
    rng = np.random.RandomState(0)
    xyz = rng.uniform([-0.1, -0.3, 0.76], [0.5, 0.3, 1.2], (n, 3))
    sem = rng.randint(0, 8, n)
    env = ReplayEnv(SyntheticMotionStore())
    arm = env.reset("synthetic_task0", 0, 0)["arm_links_info"]
    out = vision("synthetic_task0+0", 1, xyz, sem,
                 np.array([0.1, 0, 0.9, 0, 0, 0, 1, 1], np.float32), arm)
    labels = out["pc_labels"]
    assert labels.shape[0] == out["pc_fts"].shape[0]
    assert set(np.unique(labels)) <= {0, 1, 2, 3}
    assert (labels == 2).any(), "object labels missing"
    # target labels must respect the zrange crop
    tgt_z = out["pc_fts"][labels == 3][:, 2] * out["pc_radius"] + \
        out["pc_centroids"][2]
    if len(tgt_z):
        assert tgt_z.min() > 0.7 and tgt_z.max() < 1.2


class _FakeVLM:
    """Stands in for the OWLv2+SAM pipeline: fixed objects, caption-keyed
    grounding."""

    def __init__(self, objects):
        self.objects = objects

    def run(self, rgb_images, pcd_images, arm_links_info):
        return {"objects": self.objects}

    def ground_object_with_query(self, text, objects=None, return_sims=False):
        objects = objects or self.objects
        for i, o in enumerate(objects):
            if o.captions and o.captions[0] != "robot" and \
                    o.captions[0] in text:
                return (i, objects[i], [1.0]) if return_sims else (i, objects[i])
        # fall back to the first uncaptioned object
        for i, o in enumerate(objects):
            if not o.captions:
                return (i, objects[i], [0.5]) if return_sims else (i, objects[i])
        return (None, None, []) if return_sims else (None, None)


def _fake_objects():
    from robot3dlotus_tpu.vlm.pipeline import ObjectInfo
    rng = np.random.RandomState(3)

    def obj(center, caption=None):
        xyz = rng.randn(80, 3).astype(np.float32) * 0.02 + center
        return ObjectInfo(pcd_xyz=xyz,
                          pcd_rgb=rng.randint(0, 255, (80, 3)),
                          captions=[caption] if caption else [])

    return [
        obj([0.2, 0.1, 0.8], "cube"),
        obj([0.3, -0.1, 0.8], "drawer"),
        obj([0.0, 0.0, 0.9], "robot"),
        obj([0.4, 0.2, 0.85]),
    ]


def test_full_robot_pipeline_with_fake_vlm(tmp_path, mp_engine):
    plan_file, _ = _write_gt_assets(tmp_path)
    config = {
        "llm_planner": {"use_groundtruth": True, "gt_plan_file": plan_file},
        "motion_planner": {"config_file": None, "checkpoint": None,
                           "run_action_step": 5},
        "pipeline": {"restart": False, "seed": 11},
    }
    pipeline = RobotPipeline(
        config, motion_planner=mp_engine, vlm_pipeline=_FakeVLM(_fake_objects()),
        text_embedder=ActionTextEmbedder())
    env = ReplayEnv(SyntheticMotionStore())
    obs = env.reset("synthetic_task0", 0, 0)

    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=0,
        obs_state_dict=obs, episode_id=0, instructions=["grasp the cube"])
    cache = out["cache"]
    assert np.asarray(out["action"]).shape == (8,)
    assert len(cache["highlevel_plans"]) == 3
    # the grasp plan grounded an object and remembered it as a variable
    assert "ret" in cache["ret_objs"]
    assert cache["grasped_obj_name"] == "ret"

    # later 'move grasped object' steps shift the remembered cloud
    before = cache["ret_objs"]["ret"].mean(0).copy()
    for step_id in range(1, 5):
        out = pipeline.predict(
            task_str="synthetic_task0", variation=0, step_id=step_id,
            obs_state_dict=obs, episode_id=0,
            instructions=["grasp the cube"], cache=out["cache"])
        if out["cache"]["highlevel_step_id"] >= 2:
            break
    assert np.isfinite(out["action"]).all()


def test_pipeline_restart_rewinds_plan(tmp_path, mp_engine):
    """pipeline.restart=True past plan exhaustion must rewind to plan 0
    with the plan LIST intact (reference :305-312) — wiping the plans
    would index an empty list on every later step."""
    plan_file, _ = _write_gt_assets(tmp_path)
    config = {
        "llm_planner": {"use_groundtruth": True, "gt_plan_file": plan_file},
        "motion_planner": {"config_file": None, "checkpoint": None,
                           "run_action_step": 5},
        "pipeline": {"restart": True, "seed": 3},
    }
    pipeline = RobotPipeline(
        config, motion_planner=mp_engine,
        vlm_pipeline=_FakeVLM(_fake_objects()),
        text_embedder=ActionTextEmbedder())
    env = ReplayEnv(SyntheticMotionStore())
    obs = env.reset("synthetic_task0", 0, 0)

    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=0,
        obs_state_dict=obs, episode_id=0,
        instructions=["grasp the cube"])
    cache = out["cache"]
    n_plans = len(cache["highlevel_plans"])
    assert n_plans > 0

    # force plan exhaustion: the next call takes the restart branch
    cache["highlevel_step_id"] = n_plans
    cache["valid_actions"] = []
    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=1,
        obs_state_dict=obs, episode_id=0,
        instructions=["grasp the cube"], cache=cache)
    cache = out["cache"]
    assert np.isfinite(np.asarray(out["action"])).all()
    assert len(cache["highlevel_plans"]) == n_plans, \
        "restart wiped the plan list"
    assert cache["highlevel_step_id"] < n_plans
    # ...and the rewound episode keeps serving real plans
    out = pipeline.predict(
        task_str="synthetic_task0", variation=0, step_id=2,
        obs_state_dict=obs, episode_id=0,
        instructions=["grasp the cube"], cache=cache)
    assert np.isfinite(np.asarray(out["action"])).all()


def test_zrange_estimation_for_drawer(tmp_path, mp_engine):
    plan_file = tmp_path / "drawer_plan.txt"
    plan_file.write_text(
        "# taskvar: synthetic_task0+0\n"
        'ret = grasp(object="bottom drawer handle")\n'
        "release()\n")
    config = {
        "llm_planner": {"use_groundtruth": True,
                        "gt_plan_file": str(plan_file)},
        "motion_planner": {"config_file": None, "checkpoint": None,
                           "run_action_step": 1},
        "pipeline": {"restart": False},
    }
    pipeline = RobotPipeline(
        config, motion_planner=mp_engine,
        vlm_pipeline=_FakeVLM(_fake_objects()),
        text_embedder=ActionTextEmbedder())
    plan = {"action": "grasp", "object": "bottom drawer handle",
            "target": None, "ret_val": "ret"}
    zrange = pipeline._estimate_zrange(plan, "synthetic_task0",
                                       _fake_objects())
    assert zrange is not None and zrange.shape == (2,)
    assert zrange[0] < zrange[1]
    # offsets are in world z (table height added)
    assert zrange[0] >= pipeline.workspace["TABLE_HEIGHT"] - 1e-6


# ---------------------------------------------------------------------- #
# stateful eval server (cache round-trip through mp queues)

def _server_actioner_builder(plan_file, label_file, mp_config_file):
    config = {
        "llm_planner": {"use_groundtruth": True, "gt_plan_file": plan_file},
        "object_grounding": {"gt_label_file": label_file},
        "motion_planner": {"config_file": mp_config_file, "checkpoint": None,
                           "run_action_step": 5},
        "pipeline": {"restart": False},
    }
    return GroundtruthRobotPipeline(config,
                                    text_embedder=ActionTextEmbedder())


def _server_env_builder():
    return ReplayEnv(SyntheticMotionStore())


@pytest.mark.slow
def test_pipeline_eval_server_cache_roundtrip(tmp_path, monkeypatch):
    """The producer/consumer server with stateful=True carries the episode
    cache through the queues and writes checkpoint-tagged results."""
    from functools import partial
    # pin spawned consumer/producers to a plain CPU client (see
    # test_eval_cli.py — without this they inherit the rig's
    # JAX_PLATFORMS=axon and block on the real TPU tunnel)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", repo_root)
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_backend_optimization_level=0"
                       " --xla_llvm_disable_expensive_passes=true")
    plan_file, label_file = _write_gt_assets(tmp_path)
    mp_config_file = _write_mp_config(tmp_path)
    result_file = str(tmp_path / "results.jsonl")

    run_eval_server(
        ["synthetic_task0+0"],
        partial(_server_actioner_builder, plan_file, label_file,
                mp_config_file),
        _server_env_builder,
        result_file, num_workers=1, num_demos=1, max_steps=3,
        checkpoint="model_step_0", stateful=True)

    with open(result_file) as f:
        recs = [json.loads(line) for line in f]
    assert len(recs) == 1
    assert recs[0]["task"] == "synthetic_task0"
    assert recs[0]["checkpoint"] == "model_step_0"
    assert 0.0 <= recs[0]["sr"] <= 1.0


def test_som_images_and_caption_hook():
    import numpy as np
    from robot3dlotus_tpu.vlm.pipeline import VLMPipeline, ObjectInfo

    pipe = VLMPipeline.__new__(VLMPipeline)  # no models needed
    rgb = np.zeros((2, 32, 32, 3), np.uint8)
    m = np.zeros((32, 32), bool)
    m[8:16, 8:16] = True
    ring = np.zeros((32, 32), bool)  # center-outside-mask branch
    ring[4:28, 4:6] = True
    ring[4:28, 26:28] = True
    empty = np.zeros((32, 32), bool)  # empty mask: no marker drawn
    sam = [{"masks": [m, ring, empty], "scores": [0.9, 0.8, 0.7]}, None]
    som, counts = pipe.prepare_som_images(rgb, sam)
    # counts align with views (None view -> 0) and count markers actually
    # drawn (the empty mask is skipped)
    assert som[1] is None and counts == [2, 0]
    assert np.asarray(som[0]).sum() > 0  # markers drawn
    # opposite-corner blobs: both median coordinates land in the empty gap
    # and both axis slices are empty — the old code crashed on
    # int(median(empty)) = int(NaN); the anchor must snap to a mask pixel
    corner = np.zeros((32, 32), bool)
    corner[4:7, 4:7] = True
    corner[26:29, 26:29] = True
    som2, counts2 = pipe.prepare_som_images(
        rgb[:1], [{"masks": [corner], "scores": [0.9]}])
    assert counts2 == [1] and np.asarray(som2[0]).sum() > 0

    objs = [ObjectInfo(captions=["obstacle"]),
            ObjectInfo(captions=["red cube"])]
    objs[1].pcd_xyz = np.zeros((5, 3), np.float32)
    out = pipe.generate_3d_captions(
        objs, caption_3d_model=lambda xyz, caps: "a red cube on a table")
    assert getattr(out[1], "caption_3d", None) == "a red cube on a table"
    assert not hasattr(out[0], "caption_3d") or out[0].caption_3d is None

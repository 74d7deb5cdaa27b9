"""3D-LOTUS++ closed-loop robot pipeline (reference
evaluation/robot_pipeline.py:27-426 and robot_pipeline_gt.py:61-362).

Per environment step the pipeline:
  1. on step 0, asks the LLM task planner (or the GT oracle) for a high-level
     plan and parses it into action primitives (common.parse_code);
  2. pops cached trajectory actions if the last motion-planner call returned
     more than one step (reference :253-272);
  3. handles 'release' plans directly (open gripper, advance plan, :318-323);
  4. runs the VLM grounding pipeline (OWLv2+SAM+merge) or the GT-mask vision
     to label every point 0=obstacle/1=robot/2=object/3=target;
  5. estimates a z-range via the LLM for drawers/safes (:334-359);
  6. assembles a motion-planner batch and predicts a trajectory; executes up
     to run_action_step actions, advancing the plan when the stop bit fires;
  7. tracks the grasped object's point cloud across steps so later plan steps
     can reference it as a variable (:224-232, 418-423).

TPU-first differences from the reference:
  * the motion-planner forward + full trajectory decode is ONE jitted XLA
    program on static padded shapes (the reference syncs to host mid-predict);
  * episode state ('cache') is a plain picklable dict so it round-trips the
    producer/consumer queues of the pipeline eval server
    (eval_robot_pipeline_server.py:197-213);
  * CLIP action-name embeddings come from the precomputed cache file when
    available, the live CLIP encoder otherwise, with a deterministic crc32
    pseudo-embedding fallback matching the synthetic training stores.
"""
from __future__ import annotations

import copy
import json
import os
import zlib
from typing import Dict, List, Optional

import numpy as np
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from ..configs import get_config
from ..configs.rlbench.constants import get_robot_workspace
from ..models.factory import build_model
from ..models.motion_planner import decode_mp_actions
from ..ops.voxel import voxelize_pcd_np, workspace_mask_np
from ..utils.assets import resolve_asset
from ..utils.robot_box import RobotBox
from ..train.checkpoint import load_any_model_ckpt
from ..train.datasets.collate import TXT_BUCKETS, _bucket
from ..vlm.llm_planner import GroundtruthTaskPlanner, heuristic_height_range
from .common import parse_code


class ActionTextEmbedder:
    """Action-name -> per-token text embedding, cached.

    Resolution order: precomputed .npy cache (preprocess/gen_action_text_embeds
    equivalent) -> live CLIP text encoder -> deterministic crc32 pseudo
    embedding (matches the synthetic stores' fallback so GT pipelines work
    against synthetic-trained planners)."""

    def __init__(self, action_embed_file=None, txt_embed_dim=512):
        self.txt_embed_dim = txt_embed_dim
        self.cache: Dict[str, np.ndarray] = {}
        action_embed_file = resolve_asset(action_embed_file)
        if action_embed_file and os.path.exists(action_embed_file):
            self.cache.update(
                np.load(action_embed_file, allow_pickle=True).item())
        self._clip = None
        self._clip_failed = False

    def __call__(self, action_name: str) -> np.ndarray:
        if action_name in self.cache:
            return np.asarray(self.cache[action_name], np.float32)
        embed = None
        if not self._clip_failed:
            try:
                if self._clip is None:
                    from ..vlm.clip_encoder import ClipTextEncoder
                    self._clip = ClipTextEncoder()
                embed = self._clip.encode_tokens(action_name)
            except Exception:
                self._clip_failed = True
        if embed is None:
            h = zlib.crc32(action_name.encode("utf-8")) % (2 ** 31)
            embed = np.random.RandomState(h).randn(
                3, self.txt_embed_dim).astype(np.float32)
        self.cache[action_name] = embed
        return embed


class MotionPlannerEngine:
    """Loads a trained motion planner from its dumped train config and serves
    single-cloud trajectory predictions as one jitted program per text bucket
    (reference build_motion_planner, robot_pipeline.py:71-79, plus the decode
    at :382-389)."""

    def __init__(self, config_file, checkpoint=None, cli_opts=None,
                 mesh=None):
        self.config = get_config(config_file, cli_opts)
        self.data_cfg = dict(self.config.TRAIN_DATASET)
        self.act_cfg = dict(self.config.MODEL.action_config)
        self.num_points = int(self.data_cfg.get("num_points", 4096))
        self.model = build_model(self.config.MODEL)

        rng = jax.random.PRNGKey(0)
        txt_dim = int(self.act_cfg.get("txt_ft_size", 512))
        dummy = self._pad_batch(
            np.zeros((8, self._feat_dim()), np.float32),
            np.zeros(8, np.int32), np.zeros((4, txt_dim), np.float32),
            np.asarray([0, 0, 0, 0, 0, 0, 1, 1], np.float32))
        from ..train.trainer import init_variables
        self.variables = init_variables(self.model, dummy, rng)
        if checkpoint:
            # .msgpack or a reference-layout torch .pt (converted on load)
            self.variables = dict(load_any_model_ckpt(
                checkpoint, self.variables, self.config.MODEL))
        # sharded serving, same spec/env as the Actioner (one env var
        # shards both engines of a 3D-LOTUS++ pipeline server)
        mesh = mesh if mesh is not None else \
            os.environ.get("ROBOT3DLOTUS_SERVE_MESH") or None
        self.mesh = None
        if mesh:
            from ..parallel.mesh import mesh_from_spec, shard_variables
            self.mesh = mesh_from_spec(mesh)
            self.variables = shard_variables(self.variables, self.mesh)
        self._jit_cache = {}
        self._txt_dev_cache = {}

    def _feat_dim(self):
        d = 3
        if self.data_cfg.get("use_height", True):
            d += 1
        if self.data_cfg.get("use_color", False):
            d += 3
        return d

    def _pad_batch(self, pc_ft, pc_label, txt_embed, ee_pose):
        N = self.num_points
        n = min(len(pc_ft), N)
        pc = np.zeros((1, N, pc_ft.shape[-1]), np.float32)
        pc[0, :n] = pc_ft[:n]
        labels = np.zeros((1, N), np.int32)
        labels[0, :n] = pc_label[:n]
        mask = np.zeros((1, N), bool)
        mask[0, :n] = True
        T = _bucket(txt_embed.shape[0], TXT_BUCKETS)
        t = min(txt_embed.shape[0], T)
        txt = np.zeros((1, T, txt_embed.shape[-1]), np.float32)
        txt[0, :t] = txt_embed[:t]
        txt_mask = np.zeros((1, T), bool)
        txt_mask[0, :t] = True
        return {
            "pc_fts": jnp.asarray(pc), "pc_labels": jnp.asarray(labels),
            "pc_mask": jnp.asarray(mask),
            "pc_counts": jnp.asarray([n], jnp.int32),
            "txt_embeds": jnp.asarray(txt), "txt_mask": jnp.asarray(txt_mask),
            "ee_poses": jnp.asarray(np.asarray(ee_pose, np.float32)[None]),
            "step_ids": jnp.zeros((1,), jnp.int32),
        }

    def _predict_fn_flat(self, cin):
        """Per-call inputs ride ONE flat H2D buffer (on a tunneled device
        each separate transfer costs an RPC round trip — see
        eval/actioner.py:_predict_fn_flat_batch); the sub-goal text embedding is
        content-cached on device since plan steps repeat across an episode.
        Layout: pc (N*cin) | labels (N) | mask (N) | count | ee (8)."""
        key = ("flat", cin)
        if key not in self._jit_cache:
            model, act_cfg, N = self.model, self.act_cfg, self.num_points

            @jax.jit
            def run(variables, flat, txt_dev, txt_mask_dev):
                pc = flat[:N * cin].reshape(1, N, cin)
                labels = flat[N * cin:N * (cin + 1)].reshape(
                    1, N).astype(jnp.int32)
                mask = flat[N * (cin + 1):N * (cin + 2)].reshape(1, N) > 0.5
                count = flat[N * (cin + 2)].astype(jnp.int32)[None]
                ee = flat[N * (cin + 2) + 1:N * (cin + 2) + 9].reshape(1, 8)
                batch = {
                    "pc_fts": pc, "pc_labels": labels, "pc_mask": mask,
                    "pc_counts": count, "txt_embeds": txt_dev[None],
                    "txt_mask": txt_mask_dev[None], "ee_poses": ee,
                    "step_ids": jnp.zeros((1,), jnp.int32),
                }
                preds = model.apply(variables, batch, deterministic=True)
                return decode_mp_actions(preds, act_cfg)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _staged_txt(self, txt_embed):
        # bytes key, not hash(): dict equality rules out collision aliasing
        ckey = txt_embed.tobytes()
        cached = self._txt_dev_cache.get(ckey)
        if cached is None:
            T = _bucket(txt_embed.shape[0], TXT_BUCKETS)
            t = min(txt_embed.shape[0], T)
            txt = np.zeros((T, txt_embed.shape[-1]), np.float32)
            txt[:t] = txt_embed[:t]
            tmask = np.zeros(T, bool)
            tmask[:t] = True
            cached = (jnp.asarray(txt), jnp.asarray(tmask))
            self._txt_dev_cache[ckey] = cached
        return cached

    def _predict_fn_dict(self):
        """Dict-batch program for the sharded-serving path (the mesh needs
        the (B, N, C) layout visible to commit dp/sp shardings)."""
        if "dict" not in self._jit_cache:
            model, act_cfg = self.model, self.act_cfg

            @jax.jit
            def run(variables, batch):
                preds = model.apply(variables, batch, deterministic=True)
                return decode_mp_actions(preds, act_cfg)

            self._jit_cache["dict"] = run
        return self._jit_cache["dict"]

    def predict(self, pc_ft, pc_label, txt_embed, ee_pose,
                pc_centroid, pc_radius, table_height):
        """-> (L, 9) [pos(3) quat(4) open stop], un-normalized, open/stop as
        probabilities, z clamped above the table (reference :382-389)."""
        N = self.num_points
        n = min(len(pc_ft), N)
        cin = pc_ft.shape[-1]
        if self.mesh is not None:
            from ..parallel.mesh import stage_eval_batch
            batch = stage_eval_batch(self._pad_batch(
                np.asarray(pc_ft, np.float32), np.asarray(pc_label),
                np.asarray(txt_embed, np.float32),
                np.asarray(ee_pose, np.float32)), self.mesh)
            actions = np.array(self._predict_fn_dict()(
                self.variables, batch))[0]
        else:
            flat = np.zeros(N * (cin + 2) + 9, np.float32)
            flat[:n * cin] = np.asarray(pc_ft[:n], np.float32).ravel()
            flat[N * cin:N * cin + n] = pc_label[:n]
            flat[N * (cin + 1):N * (cin + 1) + n] = 1.0
            flat[N * (cin + 2)] = n
            flat[N * (cin + 2) + 1:] = np.asarray(ee_pose, np.float32)
            txt_dev, txt_mask_dev = self._staged_txt(
                np.asarray(txt_embed, np.float32))
            run = self._predict_fn_flat(cin)
            actions = np.array(run(self.variables, jnp.asarray(flat),
                                   txt_dev, txt_mask_dev))[0]  # writable
        actions[:, 7:] = 1.0 / (1.0 + np.exp(-actions[:, 7:]))
        actions[:, :3] = actions[:, :3] * pc_radius + pc_centroid
        actions[:, 2] = np.maximum(actions[:, 2], table_height + 0.005)
        return actions


def normalize_pcd(pcd_xyz, gripper_pose, xyz_shift="center", xyz_norm=False):
    """Shared centroid/radius normalization (reference :167-178)."""
    if xyz_shift == "none":
        pc_centroid = np.zeros(3)
    elif xyz_shift == "center":
        pc_centroid = np.mean(pcd_xyz, 0)
    else:  # gripper
        pc_centroid = copy.deepcopy(gripper_pose[:3])
    if xyz_norm:
        pc_radius = float(np.max(np.sqrt(
            np.sum((pcd_xyz - pc_centroid) ** 2, axis=1))))
    else:
        pc_radius = 1.0
    pcd_xyz = (pcd_xyz - pc_centroid) / pc_radius
    gripper_pose = np.asarray(gripper_pose, np.float32).copy()
    gripper_pose[:3] = (gripper_pose[:3] - pc_centroid) / pc_radius
    return pcd_xyz, gripper_pose, pc_centroid, pc_radius


def sample_points(n_total, num_points, same_npoints_per_example, rng):
    if n_total > num_points:
        return rng.permutation(n_total)[:num_points]
    if same_npoints_per_example:
        return rng.choice(n_total, num_points, replace=True)
    return np.arange(n_total)


class GroundtruthVision:
    """Sim GT masks -> 4-way pc_labels + normalized motion-planner inputs
    (reference robot_pipeline_gt.py:61-181)."""

    def __init__(self, gt_label_file, num_points=4096, voxel_size=0.01,
                 same_npoints_per_example=False, rm_robot="box_keep_gripper",
                 xyz_shift="center", xyz_norm=False, use_height=True,
                 pc_label_type="coarse", use_color=False, rng=None):
        self.taskvar_gt_target_labels = json.load(
            open(resolve_asset(gt_label_file)))
        self.workspace = get_robot_workspace(real_robot=False)
        self.TABLE_HEIGHT = self.workspace["TABLE_HEIGHT"]
        self.num_points = num_points
        self.voxel_size = voxel_size
        self.pc_label_type = pc_label_type
        self.same_npoints_per_example = same_npoints_per_example
        self.rm_robot = rm_robot
        self.xyz_shift = xyz_shift
        self.xyz_norm = xyz_norm
        self.use_height = use_height
        self.use_color = use_color
        self.rng = rng or np.random.RandomState()

    def __call__(self, taskvar, step_id, pcd_images, sem_images, gripper_pose,
                 arm_links_info, rgb_images=None):
        pcd_xyz = np.asarray(pcd_images).reshape(-1, 3)
        pcd_sem = np.asarray(sem_images).reshape(-1)
        pcd_rgb = (np.asarray(rgb_images).reshape(-1, 3)
                   if self.use_color else None)

        # remove background and table points (get_pc_foreground_mask equiv)
        fg = workspace_mask_np(pcd_xyz, self.workspace, rm_table=True)
        pcd_xyz, pcd_sem = pcd_xyz[fg], pcd_sem[fg]
        if pcd_rgb is not None:
            pcd_rgb = pcd_rgb[fg]

        pcd_xyz, idxs = voxelize_pcd_np(pcd_xyz, self.voxel_size)
        pcd_sem = pcd_sem[idxs]
        if pcd_rgb is not None:
            pcd_rgb = pcd_rgb[idxs]

        if self.rm_robot != "none":
            box = RobotBox(arm_links_info,
                           keep_gripper=self.rm_robot == "box_keep_gripper")
            keep = ~box.point_mask(pcd_xyz)
            pcd_xyz, pcd_sem = pcd_xyz[keep], pcd_sem[keep]
            if pcd_rgb is not None:
                pcd_rgb = pcd_rgb[keep]

        if len(pcd_xyz) <= 10:
            return None  # emptied cloud: caller emits the safe zero action
        point_idxs = sample_points(
            len(pcd_xyz), self.num_points, self.same_npoints_per_example,
            self.rng)
        pcd_xyz, pcd_sem = pcd_xyz[point_idxs], pcd_sem[point_idxs]
        height = pcd_xyz[:, 2] - self.TABLE_HEIGHT
        if pcd_rgb is not None:
            pcd_rgb = pcd_rgb[point_idxs]

        # 0=obstacle, 1=robot (gripper points that survived rm_robot),
        # 2=object, 3=target (reference :134-148)
        pcd_label = np.zeros(len(pcd_xyz), np.int32)
        full_box = RobotBox(arm_links_info, keep_gripper=False)
        pcd_label[full_box.point_mask(pcd_xyz)] = 1
        step_labels = self.taskvar_gt_target_labels[taskvar][step_id]
        for query_key, label_id in zip(["object", "target"], [2, 3]):
            if query_key not in step_labels:
                continue
            gt = step_labels[query_key]
            qmask = np.zeros(len(pcd_sem), bool)
            for x in gt[self.pc_label_type]:
                qmask |= pcd_sem == x
            if "zrange" in gt:
                qmask &= (pcd_xyz[:, 2] > gt["zrange"][0]) & \
                    (pcd_xyz[:, 2] < gt["zrange"][1])
            pcd_label[qmask] = label_id

        pcd_xyz, gripper_pose, pc_centroid, pc_radius = normalize_pcd(
            pcd_xyz, gripper_pose, self.xyz_shift, self.xyz_norm)

        pcd_ft = pcd_xyz
        if self.use_height:
            pcd_ft = np.concatenate([pcd_ft, height[:, None]], -1)
        if pcd_rgb is not None:
            pcd_ft = np.concatenate(
                [pcd_ft, (pcd_rgb / 255.0) * 2 - 1], -1)
        return {
            "pc_fts": pcd_ft.astype(np.float32), "pc_labels": pcd_label,
            "pc_centroids": pc_centroid, "pc_radius": pc_radius,
            "ee_poses": gripper_pose,
        }


def _plan_action_name(plan, instr_include_objects=False):
    """Action-name text for the CLIP embed (reference :197-208)."""
    action_name = plan["action"]
    if plan["target"] in ("up", "down", "out", "in"):
        action_name = action_name + " " + plan["target"]
    if instr_include_objects:
        if plan.get("object"):
            obj = "".join(c for c in plan["object"] if not c.isdigit())
            action_name = f"{action_name} {obj.replace('_', ' ').strip()}"
        if plan.get("target") and plan["target"] not in (
                "up", "down", "out", "in"):
            tgt = "".join(c for c in plan["target"] if not c.isdigit())
            action_name = f"{action_name} to {tgt.replace('_', ' ').strip()}"
    return action_name


def _new_episode_cache(gripper_pose, episode_outdir=None):
    return {
        "valid_actions": [], "highlevel_plans": [], "highlevel_step_id": 0,
        "highlevel_step_id_norelease": 0, "ret_objs": {},
        "grasped_obj_name": None,
        "prev_ee_pose": np.asarray(gripper_pose, np.float32).copy(),
        "episode_outdir": episode_outdir,
    }


def _move_grasped_obj_xyz(cur_action, prev_pose, obj_xyz):
    """Track the grasped object's cloud through the commanded motion
    (reference :224-232; in-place like the reference).

    Reference-faithful quirks kept verbatim for behavior parity: the
    relative rotation is composed by SUBTRACTING Euler angles (not
    R_cur * R_prev^-1) and applied about the WORLD origin after the
    translation (not about the gripper). Exact only for pure translations
    — which the benchmark's move-grasped plans overwhelmingly are."""
    translation = cur_action[:3] - prev_pose[:3]
    rotation = R.from_quat(cur_action[3:7]).as_euler("xyz") - \
        R.from_quat(prev_pose[3:7]).as_euler("xyz")
    obj_xyz += translation
    obj_xyz[:] = R.from_euler("xyz", rotation).apply(obj_xyz)
    return obj_xyz


class GroundtruthRobotPipeline:
    """GT planner + GT vision + learned motion planner
    (reference robot_pipeline_gt.py:184-362)."""

    def __init__(self, config, motion_planner: MotionPlannerEngine = None,
                 text_embedder: ActionTextEmbedder = None):
        self.config = config
        self.llm_planner = GroundtruthTaskPlanner(
            resolve_asset(config["llm_planner"]["gt_plan_file"]))
        mp_cfg = config["motion_planner"]
        self.motion_planner = motion_planner or MotionPlannerEngine(
            mp_cfg["config_file"], mp_cfg.get("checkpoint"))
        data_cfg = self.motion_planner.data_cfg
        self.instr_include_objects = data_cfg.get(
            "instr_include_objects", False)
        pc_label_type = mp_cfg.get("pc_label_type") or data_cfg.get(
            "pc_label_type", "coarse")
        self.vision = GroundtruthVision(
            config["object_grounding"]["gt_label_file"],
            num_points=int(data_cfg.get("num_points", 4096)),
            voxel_size=self.motion_planner.act_cfg.get("voxel_size", 0.01),
            same_npoints_per_example=data_cfg.get(
                "same_npoints_per_example", False),
            rm_robot=data_cfg.get("rm_robot", "box_keep_gripper"),
            xyz_shift=data_cfg.get("xyz_shift", "center"),
            xyz_norm=data_cfg.get("xyz_norm", False),
            use_height=data_cfg.get("use_height", True),
            pc_label_type=pc_label_type,
            use_color=data_cfg.get("use_color", False))
        self.text_embedder = text_embedder or ActionTextEmbedder(
            mp_cfg.get("action_embed_file"))
        self.run_action_step = int(mp_cfg.get("run_action_step", 1))
        self.restart = bool(config.get("pipeline", {}).get("restart", False))
        self.save_obs_outs = bool(mp_cfg.get("save_obs_outs", False))
        self.pred_dir = mp_cfg.get("pred_dir")

    def predict(self, task_str=None, variation=None, step_id=0,
                obs_state_dict=None, episode_id=None, instructions=None,
                cache=None):
        taskvar = f"{task_str}+{variation}"
        obs = obs_state_dict
        gripper_pose = copy.deepcopy(np.asarray(obs["gripper"]))

        if step_id == 0:
            outdir = None
            if self.save_obs_outs and self.pred_dir:
                outdir = os.path.join(self.pred_dir, "obs_outs", taskvar,
                                      str(episode_id))
                os.makedirs(outdir, exist_ok=True)
            cache = _new_episode_cache(gripper_pose, outdir)
            plans = self.llm_planner(taskvar)
            cache["highlevel_plans"] = [parse_code(x) for x in plans]

        # cached trajectory steps remaining (reference :246-258)
        if cache["valid_actions"]:
            cur = np.asarray(cache["valid_actions"][0][:8])
            cache["valid_actions"] = cache["valid_actions"][1:]
            return {"action": cur, "cache": cache}

        if cache["highlevel_step_id"] >= len(cache["highlevel_plans"]):
            if self.restart:
                cache["highlevel_step_id"] = 0
                cache["highlevel_step_id_norelease"] = 0
            else:
                return {"action": np.zeros(8), "cache": cache}

        plan = cache["highlevel_plans"][cache["highlevel_step_id"]]
        if plan is None:
            return {"action": np.zeros(8), "cache": cache}

        if plan["action"] == "release":
            action = gripper_pose.copy()
            action[7] = 1
            cache["highlevel_step_id"] += 1
            return {"action": action, "cache": cache}

        inputs = self.vision(
            taskvar, cache["highlevel_step_id_norelease"],
            obs["pc"], obs["gt_mask"], gripper_pose,
            obs["arm_links_info"], rgb_images=obs.get("rgb"))
        if inputs is None:  # crop/robot-removal emptied the cloud
            return {"action": np.zeros(8), "cache": cache}

        action_name = _plan_action_name(plan, self.instr_include_objects)
        txt_embed = self.text_embedder(action_name)

        pred_actions = self.motion_planner.predict(
            inputs["pc_fts"], inputs["pc_labels"], txt_embed,
            inputs["ee_poses"], inputs["pc_centroids"], inputs["pc_radius"],
            self.vision.TABLE_HEIGHT)

        valid_actions = []
        for t, a in enumerate(pred_actions):
            valid_actions.append(a)
            if t + 1 >= self.run_action_step or a[-1] > 0.5:
                break
        if valid_actions[-1][-1] > 0.5:
            cache["highlevel_step_id"] += 1
            cache["highlevel_step_id_norelease"] += 1
        cache["valid_actions"] = [np.asarray(a) for a in valid_actions[1:]]

        if cache["episode_outdir"]:
            np.save(os.path.join(cache["episode_outdir"], f"{step_id}.npy"),
                    {"obs": obs, "valid_actions": valid_actions})
        return {"action": np.asarray(valid_actions[0][:8]), "cache": cache}


class RobotPipeline:
    """Full 3D-LOTUS++: LLM planner + VLM grounding + motion planner
    (reference robot_pipeline.py:27-426)."""

    def __init__(self, config, motion_planner: MotionPlannerEngine = None,
                 vlm_pipeline=None, llm_planner=None,
                 text_embedder: ActionTextEmbedder = None):
        self.config = config
        self.env_name = ("real" if config.get("pipeline", {}).get(
            "real_robot", False) else "rlbench")

        llm_cfg = config["llm_planner"]
        if llm_planner is not None:
            self.llm_planner = llm_planner
        elif llm_cfg.get("use_groundtruth", False):
            self.llm_planner = GroundtruthTaskPlanner(
                resolve_asset(llm_cfg["gt_plan_file"]))
        else:
            from ..vlm.llm_planner import LLMTaskPlanner
            self.llm_planner = LLMTaskPlanner(
                prompt_dir=resolve_asset(llm_cfg.get("prompt_dir")),
                asset_dir=resolve_asset(llm_cfg.get("asset_dir")),
                cache_file=llm_cfg.get("cache_file"))

        if vlm_pipeline is not None:
            self.vlm_pipeline = vlm_pipeline
        else:
            from ..vlm.pipeline import VLMPipeline
            self.vlm_pipeline = VLMPipeline(env_name=self.env_name)

        mp_cfg = config["motion_planner"]
        self.motion_planner = motion_planner or MotionPlannerEngine(
            mp_cfg["config_file"], mp_cfg.get("checkpoint"))
        self.mp_data_cfg = self.motion_planner.data_cfg
        self.text_embedder = text_embedder or ActionTextEmbedder(
            mp_cfg.get("action_embed_file"))
        self.run_action_step = int(mp_cfg.get("run_action_step", 1))
        self.restart = bool(config.get("pipeline", {}).get("restart", False))
        self.save_obs_outs = bool(mp_cfg.get("save_obs_outs", False))
        self.pred_dir = mp_cfg.get("pred_dir")
        self.workspace = get_robot_workspace(
            real_robot=self.env_name == "real", use_vlm=True)
        seed = config.get("pipeline", {}).get("seed", 0)
        # seed 0 is a valid explicit seed (`or None` would silently unseed)
        self.rng = np.random.RandomState(
            None if seed is None else int(seed))

    # ------------------------------------------------------------------ #

    def prepare_motion_planner_input(
            self, objects, plan, arm_links_info, gripper_pose,
            zrange=None, target_var_xyz=None):
        """Grounded objects -> labeled, voxelized, normalized model input
        (reference robot_pipeline.py:81-222)."""
        cfg = self.mp_data_cfg
        voxel_size = self.motion_planner.act_cfg.get("voxel_size", 0.01)

        pcd_xyz = [np.asarray(o.pcd_xyz, np.float32) for o in objects]
        pcd_rgb = [np.asarray(o.pcd_rgb) if o.pcd_rgb is not None
                   else np.zeros((len(x), 3)) for o, x in zip(objects, pcd_xyz)]
        pcd_label = [np.zeros(len(x), np.int32) for x in pcd_xyz]
        for k, o in enumerate(objects):
            if o.captions and o.captions[0] == "robot":
                pcd_label[k][:] = 1

        mani_obj = None
        for query_key, label_id in (("object", 2), ("target", 3)):
            if plan.get(query_key) is None:
                continue
            query = plan[query_key]
            best_obj_id, _, _ = self.vlm_pipeline.ground_object_with_query(
                query, objects=objects, return_sims=True)
            if best_obj_id is None:
                continue
            if query_key == "object":
                pcd_label[best_obj_id][:] = 2
                mani_obj = {"pcd_xyz": pcd_xyz[best_obj_id],
                            "name": plan.get("ret_val")}
            else:
                if target_var_xyz is not None:
                    # match the remembered object variable by chamfer distance
                    # over uncaptioned objects (reference :114-123)
                    from ..ops.chamfer import chamfer_distance_np
                    cand = [k for k, o in enumerate(objects)
                            if not o.captions]
                    if cand:
                        dists = [chamfer_distance_np(
                            target_var_xyz, pcd_xyz[k]) + chamfer_distance_np(
                            pcd_xyz[k], target_var_xyz) for k in cand]
                        best_obj_id = cand[int(np.argmin(dists))]
                pcd_label[best_obj_id][:] = 3
            if zrange is not None:
                z = pcd_xyz[best_obj_id][:, 2]
                pcd_label[best_obj_id][(z < zrange[0]) | (z > zrange[1])] = 0

        pcd_xyz = np.concatenate(pcd_xyz)
        pcd_rgb = np.concatenate(pcd_rgb)
        pcd_label = np.concatenate(pcd_label)

        pcd_xyz, idxs = voxelize_pcd_np(pcd_xyz, voxel_size)
        pcd_label = pcd_label[idxs]
        pcd_rgb = pcd_rgb[idxs]

        rm_robot = cfg.get("rm_robot", "none")
        if rm_robot != "none":
            box = RobotBox(arm_links_info,
                           keep_gripper=rm_robot == "box_keep_gripper",
                           env_name=self.env_name)
            keep = ~box.point_mask(pcd_xyz)
            pcd_xyz, pcd_label, pcd_rgb = \
                pcd_xyz[keep], pcd_label[keep], pcd_rgb[keep]

        num_points = int(cfg.get("num_points", 4096))
        if len(pcd_xyz) <= 10:
            # everything was cleaned/cropped away: signal the caller to emit
            # the safe zero action (the Actioner's tiny-cloud guard) instead
            # of sampling an empty array into a NaN centroid/forward
            return None, mani_obj
        point_idxs = sample_points(
            len(pcd_xyz), num_points,
            cfg.get("same_npoints_per_example", False), self.rng)
        pcd_xyz = pcd_xyz[point_idxs]
        pcd_label = pcd_label[point_idxs]
        pcd_height = pcd_xyz[:, 2] - self.workspace["TABLE_HEIGHT"]
        pcd_rgb = pcd_rgb[point_idxs]

        pcd_xyz, gripper_pose, pc_centroid, pc_radius = normalize_pcd(
            pcd_xyz, gripper_pose, cfg.get("xyz_shift", "center"),
            cfg.get("xyz_norm", False))

        pcd_ft = pcd_xyz
        if cfg.get("use_height", True):
            pcd_ft = np.concatenate([pcd_ft, pcd_height[:, None]], -1)
        if cfg.get("use_color", False):
            pcd_ft = np.concatenate(
                [pcd_ft, (pcd_rgb / 255.0) * 2 - 1], -1)

        inputs = {
            "pc_fts": pcd_ft.astype(np.float32), "pc_labels": pcd_label,
            "pc_centroids": pc_centroid, "pc_radius": pc_radius,
            "ee_poses": gripper_pose,
        }
        return inputs, mani_obj

    def _estimate_zrange(self, plan, task_str, objects):
        """Drawer/safe z-range via the planner's height-range estimator
        (reference :334-359)."""
        query = None
        if plan.get("object") is not None and "drawer" in plan["object"]:
            query = plan["object"]
        elif plan.get("target") is not None and "safe" in task_str and (
                "safe" in plan["target"] or "shelf" in plan["target"]):
            query = plan["target"]
        if query is None:
            return None
        heights = np.concatenate([
            o.pcd_xyz[:, 2] for o in objects
            if not o.captions or o.captions[0] != "robot"], 0)
        obj_height = np.percentile(heights, 99) - heights.min()
        if hasattr(self.llm_planner, "estimate_height_range"):
            zrange = self.llm_planner.estimate_height_range(query, obj_height)
        else:
            zrange = heuristic_height_range(query, obj_height)
        if zrange is not None:
            zrange = np.asarray(zrange) + self.workspace["TABLE_HEIGHT"]
        return zrange

    # ------------------------------------------------------------------ #

    def predict(self, task_str=None, variation=None, step_id=0,
                obs_state_dict=None, episode_id=None, instructions=None,
                cache=None):
        taskvar = f"{task_str}+{variation}"
        obs = obs_state_dict
        gripper_pose = copy.deepcopy(np.asarray(obs["gripper"]))

        if step_id == 0:
            outdir = None
            if self.save_obs_outs and self.pred_dir:
                outdir = os.path.join(self.pred_dir, "obs_outs", taskvar,
                                      str(episode_id))
                os.makedirs(outdir, exist_ok=True)
            cache = _new_episode_cache(gripper_pose, outdir)
            if isinstance(self.llm_planner, GroundtruthTaskPlanner):
                plans = self.llm_planner(taskvar)
            else:
                _, plans = self.llm_planner(instructions[0])
            cache["highlevel_plans"] = [parse_code(x) for x in plans]
            if outdir:
                with open(os.path.join(outdir, "highlevel_plans.json"),
                          "w") as f:
                    json.dump({
                        # GT-planner callers may omit instructions entirely
                        "instruction": instructions[0] if instructions
                        else None,
                        "plans": plans,
                        "parsed_plans": cache["highlevel_plans"]}, f)

        # cached trajectory steps remaining (reference :253-272)
        if cache["valid_actions"]:
            cur = np.asarray(cache["valid_actions"][0][:8])
            cache["valid_actions"] = cache["valid_actions"][1:]
            # reference-faithful quirk (:257): the generating plan is
            # reconstructed as plans[step_id - 1], which is the PREVIOUS
            # plan whenever the stop bit did not fire (step_id was not
            # advanced) — kept verbatim for behavior parity
            plan = cache["highlevel_plans"][cache["highlevel_step_id"] - 1] \
                if cache["highlevel_step_id"] > 0 else None
            if plan is not None and cache["grasped_obj_name"] is not None \
                    and cache["grasped_obj_name"] in cache["ret_objs"] \
                    and plan["action"].startswith("move grasped object"):
                _move_grasped_obj_xyz(
                    cur, cache["prev_ee_pose"],
                    cache["ret_objs"][cache["grasped_obj_name"]])
            cache["prev_ee_pose"] = cur
            return {"action": cur, "cache": cache}

        if cache["highlevel_step_id"] >= len(cache["highlevel_plans"]):
            if self.restart:
                # reference :305-312: rewind to plan 0 and clear the episode
                # state but KEEP the plan list (the LLM only plans at step 0
                # — wiping the plans here would index an empty list forever)
                plans = cache["highlevel_plans"]
                cache.update(_new_episode_cache(
                    gripper_pose, cache["episode_outdir"]))
                cache["highlevel_plans"] = plans
            else:
                return {"action": np.zeros(8), "cache": cache}

        plan = cache["highlevel_plans"][cache["highlevel_step_id"]]
        if plan is None:
            return {"action": np.zeros(8), "cache": cache}

        if plan["action"] == "release":
            action = gripper_pose.copy()
            action[7] = 1
            cache["highlevel_step_id"] += 1
            cache["grasped_obj_name"] = None
            return {"action": action, "cache": cache}

        vlm_results = self.vlm_pipeline.run(
            obs["rgb"], obs["pc"], obs["arm_links_info"])
        objects = vlm_results["objects"] if isinstance(vlm_results, dict) \
            else vlm_results.objects

        target_var_xyz = None
        if plan.get("is_target_variable") and \
                plan["target"] in cache["ret_objs"]:
            target_var_xyz = cache["ret_objs"][plan["target"]]

        zrange = self._estimate_zrange(plan, task_str, objects)

        inputs, mani_obj = self.prepare_motion_planner_input(
            objects, plan, obs["arm_links_info"], gripper_pose,
            zrange=zrange, target_var_xyz=target_var_xyz)
        if inputs is None:  # cleanup/crop emptied the cloud
            return {"action": np.zeros(8), "cache": cache}

        if mani_obj is not None and mani_obj["name"]:
            cache["ret_objs"][mani_obj["name"]] = mani_obj["pcd_xyz"]
            if plan["action"] == "grasp":
                cache["grasped_obj_name"] = mani_obj["name"]

        action_name = _plan_action_name(
            plan, self.mp_data_cfg.get("instr_include_objects", False))
        txt_embed = self.text_embedder(action_name)

        pred_actions = self.motion_planner.predict(
            inputs["pc_fts"], inputs["pc_labels"], txt_embed,
            inputs["ee_poses"], inputs["pc_centroids"], inputs["pc_radius"],
            self.workspace["TABLE_HEIGHT"])

        valid_actions = []
        for t, a in enumerate(pred_actions):
            valid_actions.append(a)
            if t + 1 >= self.run_action_step or a[-1] > 0.5:
                break
        if valid_actions[-1][-1] > 0.5:
            cache["highlevel_step_id"] += 1
        cache["valid_actions"] = [np.asarray(a) for a in valid_actions[1:]]
        out_action = np.asarray(valid_actions[0][:8])

        if cache["episode_outdir"]:
            np.save(os.path.join(cache["episode_outdir"], f"{step_id}.npy"),
                    {"obs": obs, "valid_actions": valid_actions})

        if cache["grasped_obj_name"] is not None and \
                cache["grasped_obj_name"] in cache["ret_objs"] and \
                plan["action"].startswith("move grasped object"):
            _move_grasped_obj_xyz(
                out_action, cache["prev_ee_pose"],
                cache["ret_objs"][cache["grasped_obj_name"]])
        cache["prev_ee_pose"] = out_action
        return {"action": out_action, "cache": cache}

"""Eval-time Actioner: obs dict -> action, TPU inference path.

Parity with the reference Actioner (evaluation/eval_simple_policy.py:67-357):
multi-camera obs -> workspace crop -> 1 cm voxel downsample w/ trace ->
robot-box removal -> <=num_points sampling -> center/normalize -> model ->
decode -> un-normalize + table clamp.

TPU-first differences:
  * the model forward AND the disc-position/rotation decode are one jitted
    program (the reference syncs to host numpy mid-predict,
    simple_policy_ptv3.py:254-295);
  * inputs are padded to point-capacity buckets (num_points/4, /2, /1 by
    default), so every call hits a cached executable sized for the cloud,
    and are host-presorted into the stage-0 serialized frame so the device
    entry argsort vanishes (assume_sorted backbone);
  * CLIP embeddings come from the precomputed cache; unseen instructions are
    encoded on demand via transformers when available.
"""
from __future__ import annotations

import copy
import json
import os
from functools import partial
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import get_config
from ..configs.rlbench.constants import get_robot_workspace
from ..models.factory import build_model
from ..models.simple_policy import decode_actions
from ..utils.assets import resolve_asset
from ..utils.robot_box import RobotBox
from ..ops.voxel import voxelize_pcd_np, workspace_mask_np
from ..train.checkpoint import load_any_model_ckpt
from ..train.datasets.collate import TXT_BUCKETS, _bucket


class Actioner:
    def __init__(self, exp_config, checkpoint=None, cli_opts=None,
                 best_disc_pos="max", num_ensembles=1, real_robot=False,
                 save_obs_outs_dir=None, device_preprocess=None, mesh=None):
        self.config = get_config(exp_config, cli_opts)
        self.data_cfg = dict(self.config.TRAIN_DATASET)
        self.act_cfg = dict(self.config.MODEL.action_config)
        self.act_cfg["best_disc_pos"] = best_disc_pos
        self.num_ensembles = num_ensembles
        self.real_robot = real_robot
        self.save_obs_outs_dir = save_obs_outs_dir
        if save_obs_outs_dir:
            os.makedirs(save_obs_outs_dir, exist_ok=True)

        self.WORKSPACE = get_robot_workspace(real_robot=real_robot)
        self.TABLE_HEIGHT = self.WORKSPACE["TABLE_HEIGHT"]
        self.num_points = int(self.data_cfg.get("num_points", 4096))

        self.model = build_model(self.config.MODEL)
        # eval twin that trusts host-presorted inputs: process_point_clouds
        # returns clouds already sorted by the stage-0 SFC code (host numpy,
        # <1 ms), so the backbone's entry argsort — device sorts are slow on
        # TPU — drops off the latency path (ptv3 assume_sorted; safe for the
        # shuffled-ensemble program too, which re-sorts whenever order
        # shuffling is active). Same params: the flag only gates a permute.
        eval_model_cfg = {k: (dict(v, assume_sorted=True)
                              if k == "ptv3_config" else v)
                          for k, v in dict(self.config.MODEL).items()}
        self.model_eval = build_model(eval_model_cfg)
        _p3 = self.config.MODEL.ptv3_config
        self._presort_cfg = (
            tuple(_p3.get("order") or _p3.get("orders")
                  or ("z", "z-trans", "hilbert", "hilbert-trans"))[0],
            int(_p3.get("serial_depth", 10)),
            float(self.act_cfg.get("voxel_size", 0.01)),
        )
        # eval-side point-capacity buckets (mirrors collate.py's text
        # buckets): 1 cm-voxelized robot-removed clouds are typically 1-2k
        # points, so most steps compile/run at a fraction of num_points
        pb = os.environ.get("ROBOT3DLOTUS_POINT_BUCKETS")
        if pb:
            self._point_buckets = tuple(
                sorted({min(int(x), self.num_points) for x in pb.split(",")}))
            # validate up front: deep inside the Pallas window-map build a
            # non-tile-multiple bucket trips an opaque trace-time assert
            tile = int(min(_p3.get("enc_patch_size", [128])))
            bad = [b for b in self._point_buckets if b % tile or b <= 0]
            if bad:
                raise ValueError(
                    f"ROBOT3DLOTUS_POINT_BUCKETS: bucket size(s) {bad} must "
                    f"be positive multiples of {tile} (the attention patch "
                    f"/ conv tile of this model config)")
        else:
            self._point_buckets = tuple(sorted({
                max(self.num_points // 4, 256), self.num_points // 2,
                self.num_points}))
        # host-built structure maps for the flat path: clouds are already
        # host-presorted, so the stem + per-stage CPE stencil maps
        # (train/datasets/structure.py) can ship as ONE extra int16 H2D
        # buffer and the device builds no occupancy tables. Default OFF:
        # at B=1 the map build (~3.5 ms numpy) + the ~0.5-1 MB transfer
        # sit ON the latency critical path and measured net-slower than
        # letting the device build its own tables (A/B in BENCH_NOTES.md
        # round 3; training keeps maps on because the loader thread
        # overlaps them with device compute). ROBOT3DLOTUS_EVAL_STRUCT=1
        # enables it for hosts where H2D is PCIe-fast and cores are free.
        from ..train.datasets.structure import structure_cfg_from_model
        self._struct_cfg = structure_cfg_from_model(dict(self.config.MODEL))
        self.host_structure = os.environ.get(
            "ROBOT3DLOTUS_EVAL_STRUCT", "0") == "1"
        rng = jax.random.PRNGKey(0)
        sample = self._dummy_batch()
        from ..train.trainer import init_variables
        self.variables = init_variables(self.model, sample, rng)
        if checkpoint:
            # .msgpack (native) or a reference-layout torch .pt converted
            # on the fly — released upstream checkpoints serve directly
            self.variables = dict(load_any_model_ckpt(
                checkpoint, self.variables, self.config.MODEL))

        self.instr_embeds = {}
        f = resolve_asset(self.data_cfg.get("instr_embed_file"))
        if f and os.path.exists(f):
            self.instr_embeds = np.load(f, allow_pickle=True).item()
            if self.data_cfg.get("instr_embed_type", "all") == "last":
                self.instr_embeds = {k: v[-1:] for k, v in
                                     self.instr_embeds.items()}
        tf = resolve_asset(self.data_cfg.get("taskvar_instr_file"))
        self.taskvar_instrs = json.load(open(tf)) if tf and os.path.exists(tf) \
            else {}
        self._clip = None  # lazy on-demand CLIP text encoder

        self._jit_cache = {}
        self._txt_dev_cache = {}
        # fused on-device preprocessing (ops/eval_preprocess.py): the whole
        # crop->voxelize->robot-rm->sample->normalize->forward->decode chain
        # is ONE jitted program; the host only stacks camera buffers and the
        # ~11 link-box parameters. Worth it when the host->device link is
        # fast relative to host CPU (bench.py reports both decompositions).
        if device_preprocess is None:
            device_preprocess = bool(int(os.environ.get(
                "ROBOT3DLOTUS_DEVICE_PREPROCESS", "0")))
        self.device_preprocess = device_preprocess and num_ensembles == 1
        self._obs_to_action = None
        self._step_counter = 0

        # sharded serving: commit the variables to a dp x sp x tp mesh (the
        # same Megatron TP rules and point-axis sp sharding the trainer
        # uses, parallel/mesh.py) and run the dict-batch program against
        # those layouts — tp/sp cut single-obs latency, dp scales
        # predict_batch throughput. Spec: Actioner(mesh="sp=2,tp=2") or
        # ROBOT3DLOTUS_SERVE_MESH=... . Mutually exclusive with the fused
        # single-obs preprocess program (a Pallas pipeline jit cannot
        # partition): the mesh wins and the host preprocess path is used.
        mesh = mesh if mesh is not None else \
            os.environ.get("ROBOT3DLOTUS_SERVE_MESH") or None
        self.mesh = None
        if mesh:
            from ..parallel.mesh import mesh_from_spec, shard_variables
            self.mesh = mesh_from_spec(mesh)
            missing = {"dp", "sp", "tp"} - set(self.mesh.shape)
            if missing:  # a Mesh object passed through mesh_from_spec
                raise ValueError(
                    f"serving mesh lacks axes {sorted(missing)}; build it "
                    "with parallel.mesh.make_mesh (dp, sp, tp)")
            self.variables = shard_variables(self.variables, self.mesh)
            if self.device_preprocess:
                import logging
                logging.getLogger(__name__).warning(
                    "serve mesh set: disabling the fused device-preprocess "
                    "path (not mesh-partitionable); using host preprocess")
                self.device_preprocess = False

    # ------------------------------------------------------------------ #

    def _dummy_batch(self, T=8):
        N = self.num_points
        cin = int(self.config.MODEL.ptv3_config.in_channels)
        txt_dim = int(self.act_cfg.get("txt_ft_size", 512))
        return {
            "pc_fts": jnp.zeros((1, N, cin), jnp.float32),
            "pc_mask": jnp.ones((1, N), bool),
            "pc_counts": jnp.full((1,), N, jnp.int32),
            "txt_embeds": jnp.zeros((1, T, txt_dim), jnp.float32),
            "txt_mask": jnp.ones((1, T), bool),
            "ee_poses": jnp.asarray(
                [[0, 0, 0, 0, 0, 0, 1, 1]], jnp.float32),
            "step_ids": jnp.zeros((1,), jnp.int32),
        }

    def _predict_fn(self, T):
        if T not in self._jit_cache:
            model, act_cfg = self.model_eval, self.act_cfg

            @jax.jit
            def run(variables, batch):
                preds = model.apply(variables, batch, deterministic=True)
                return decode_actions(preds, act_cfg)

            self._jit_cache[T] = run
        return self._jit_cache[T]

    def _predict_fn_flat_batch(self, cin, N=None):
        """Flat path, single obs and batches alike: B observations ride ONE
        (B, row) H2D buffer unpacked by static slices inside the jitted
        program, plus the stacked text context. On a tunneled/remote device
        every separate transfer pays an RPC round trip (~1 ms each on the
        dev rig — 7 arrays cost more than the whole host preprocess), so
        inputs are packed host-side. The single-obs `predict` runs this at
        B=1; `predict_batch` (the eval-server consumer draining queued
        queries from several sim producers) at bucketed B — ONE program
        definition, so the row layout cannot drift between the two.
        jax.jit retraces per (B, T) shape; N is the point-capacity bucket
        (one executable per bucket, chosen per cloud)."""
        N = self.num_points if N is None else N
        key = ("flatb", cin, N, self.host_structure)
        if key not in self._jit_cache:
            model, act_cfg = self.model_eval, self.act_cfg
            row = N * (cin + 1) + 10
            segs = self._struct_segments(N) if self.host_structure else ()

            @jax.jit
            def run(variables, flat, txt_dev, txt_mask_dev, smap=None):
                B = flat.shape[0]
                assert flat.shape[1] == row
                pc = flat[:, :N * cin].reshape(B, N, cin)
                mask = flat[:, N * cin:N * (cin + 1)] > 0.5
                count = flat[:, N * (cin + 1)].astype(jnp.int32)
                ee = flat[:, N * (cin + 1) + 1:N * (cin + 1) + 9]
                step_id = flat[:, N * (cin + 1) + 9].astype(jnp.int32)
                batch = {
                    "pc_fts": pc, "pc_mask": mask, "pc_counts": count,
                    "txt_embeds": txt_dev, "txt_mask": txt_mask_dev,
                    "ee_poses": ee, "step_ids": step_id,
                }
                if smap is not None:  # packed host structure (int16)
                    off = 0
                    for skey, rows_, taps in segs:
                        batch[skey] = smap[:, off:off + rows_ * taps] \
                            .reshape(B, rows_, taps)
                        off += rows_ * taps
                preds = model.apply(variables, batch, deterministic=True)
                return decode_actions(preds, act_cfg)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _struct_segments(self, N):
        """Static layout of the packed structure buffer at point bucket N:
        [(batch_key, rows, taps), ...] — stem first, then the per-stage
        CPE maps at the capacities the model computes for this bucket."""
        from ..train.datasets.structure import _stage_caps_np
        caps = _stage_caps_np(self._struct_cfg, N)
        segs = [("stem_nmap", N, self._struct_cfg["stem_kernel"] ** 3)]
        for s in range(self._struct_cfg["num_stages"]):
            segs.append((f"cpe_nmap{s}", caps[s], 27))
        return segs

    def _struct_buf(self, rows, N):
        """rows: list of presorted pc_ft arrays (one per query). Returns the
        packed (len(rows), S) int16 structure buffer for point bucket N."""
        from ..train.datasets.structure import build_structure_maps
        from ..ops.serialization import sfc_encode_np
        order0, depth, gs = self._presort_cfg
        B = len(rows)
        grid = np.zeros((B, N, 3), np.int32)
        codes = np.full((B, N), np.iinfo(np.int32).max, np.int32)
        counts = np.zeros(B, np.int32)
        for b, pc_ft in enumerate(rows):
            n = min(len(pc_ft), N)
            counts[b] = n
            if n == 0:
                continue
            xyz = pc_ft[:n, :3]
            gc = np.floor((xyz - xyz.min(0, keepdims=True)) /
                          np.float32(gs)).astype(np.int32)
            np.clip(gc, 0, (1 << depth) - 1, out=gc)
            grid[b, :n] = gc
            codes[b, :n] = sfc_encode_np(gc, order0, depth)
        # with_far=False: the packed int16 buffer ships only the stencil
        # maps; at B=1 the device's own per-tap far compaction is cheap and
        # keeps the host off the latency-critical path
        maps = build_structure_maps(grid, codes, counts, self._struct_cfg,
                                    depth=depth, with_far=False)
        return np.concatenate(
            [maps[key].reshape(B, -1) for key, _, _ in
             self._struct_segments(N)], axis=1)

    def _staged_txt(self, instr, instr_embed, batched=False):
        """Device-staged (txt_embeds (T, D), txt_mask (T,)) per embedding —
        ((1, T, D), (1, T)) when `batched`, the flat-batch program's layout —
        T padded to the standard buckets. Keyed by the embedding CONTENT,
        not the instruction string: in synthetic-store mode the embedding
        derives from the taskvar, so two taskvars can share an instruction
        string while needing different embeddings. A bytes key makes the
        dict compare by equality (no hash-collision aliasing)."""
        key = (instr_embed.tobytes(), batched)
        cached = self._txt_dev_cache.get(key)
        if cached is None:
            T = _bucket(instr_embed.shape[0], TXT_BUCKETS)
            txt = np.zeros((T, instr_embed.shape[-1]), np.float32)
            t = min(instr_embed.shape[0], T)
            txt[:t] = instr_embed[:t]
            tmask = np.zeros(T, bool)
            tmask[:t] = True
            if batched:
                txt, tmask = txt[None], tmask[None]
            cached = (jnp.asarray(txt), jnp.asarray(tmask))
            self._txt_dev_cache[key] = cached
        return cached

    # ------------------------------------------------------------------ #
    # shared per-payload host logic (predict and predict_batch must not
    # drift: one definition each for prep, row packing, and decode tail)

    def _host_prep(self, task_str, variation, obs, instructions):
        """Instruction embedding + the host point-cloud chain for one
        payload. Returns (instructions, instr_embed, pc_ft, centroid,
        radius, ee_pose); pc_ft is None when the crop emptied the cloud."""
        taskvar = f"{task_str}+{variation}"
        if instructions is None:
            instructions = self.taskvar_instrs.get(taskvar, ["do the task"])
        instr_embed = self._encode_instruction(
            instructions[0], taskvar=taskvar)
        pc_ft, centroid, radius, ee_pose = self.process_point_clouds(
            np.stack(obs["pc"], 0), np.stack(obs["rgb"], 0),
            ee_pose=copy.deepcopy(np.asarray(obs["gripper"])),
            arm_links_info=obs.get("arm_links_info"), taskvar=taskvar)
        return instructions, instr_embed, pc_ft, centroid, radius, ee_pose

    def _pack_flat_row(self, out, pc_ft, ee_pose, step_id, N=None):
        """One observation into one row of the flat H2D buffer (the layout
        `_predict_fn_flat_batch` unpacks)."""
        N = self.num_points if N is None else N
        cin = pc_ft.shape[-1]
        n = min(len(pc_ft), N)
        out[:n * cin] = pc_ft[:n].ravel()
        out[N * cin:N * cin + n] = 1.0
        out[N * (cin + 1)] = n
        out[N * (cin + 1) + 1:N * (cin + 1) + 9] = ee_pose
        out[N * (cin + 1) + 9] = step_id

    def _zero_action(self):
        """Safe action for an emptied cloud: origin, gripper closed, z at
        the table clamp (reference predict's guard)."""
        action = np.zeros(8, np.float32)
        action[2] = self.TABLE_HEIGHT + 0.005
        return action

    def _finish_action(self, action, centroid, radius):
        """Decode tail shared by every path: threshold the open logit,
        un-normalize the position, clamp z above the table."""
        action[-1] = float(1.0 / (1.0 + np.exp(-action[-1])) > 0.5)
        action[:3] = action[:3] * radius + centroid
        action[2] = max(action[2], self.TABLE_HEIGHT + 0.005)
        return action

    def _save_obs_out(self, taskvar, episode_id, step_id, obs, action):
        if self.save_obs_outs_dir:
            np.save(os.path.join(
                self.save_obs_outs_dir,
                f"{taskvar}-{episode_id}-{step_id}.npy"),
                {"obs": obs, "action": action})

    # ------------------------------------------------------------------ #
    # sharded serving (self.mesh): dict-batch arrays with committed
    # dp/sp shardings instead of the flat single-buffer transport — on a
    # pod the per-array DMA is cheap and GSPMD needs the (B, N, C) layout
    # visible to shard the point axis

    def _dict_batch(self, rows, B, T):
        """(B, ...) dict-batch arrays from [(pc_ft, ee_pose, instr_embed,
        step_id)] rows; padding rows replicate row 0 (outputs discarded)."""
        N = self.num_points
        cin = rows[0][0].shape[-1]
        pc = np.zeros((B, N, cin), np.float32)
        mask = np.zeros((B, N), bool)
        counts = np.zeros(B, np.int32)
        txt = np.zeros((B, T, rows[0][2].shape[-1]), np.float32)
        tmask = np.zeros((B, T), bool)
        ee = np.zeros((B, 8), np.float32)
        steps = np.zeros(B, np.int32)
        for r in range(B):
            pc_ft, ee_pose, instr_embed, step_id = \
                rows[r] if r < len(rows) else rows[0]
            n = min(len(pc_ft), N)
            pc[r, :n] = pc_ft[:n]
            mask[r, :n] = True
            counts[r] = n
            t = min(instr_embed.shape[0], T)
            txt[r, :t] = instr_embed[:t]
            tmask[r, :t] = True
            ee[r] = ee_pose
            steps[r] = step_id
        return {"pc_fts": pc, "pc_mask": mask, "pc_counts": counts,
                "txt_embeds": txt, "txt_mask": tmask, "ee_poses": ee,
                "step_ids": steps}

    def _mesh_predict_rows(self, rows, B, T):
        """rows -> (len(rows), 8) raw decoded actions on the serving mesh."""
        from ..parallel.mesh import stage_eval_batch
        batch = stage_eval_batch(self._dict_batch(rows, B, T), self.mesh)
        out = np.array(self._predict_fn(T)(self.variables, batch))
        return out[:len(rows)]

    def _predict_fn_shuffled(self, T):
        """Forward with serialized-order shuffling active — the eval-time
        randomness the reference ensembles over (model.py:130-134,
        eval_simple_policy.py:319-328)."""
        key = ("shuffled", T)
        if key not in self._jit_cache:
            model, act_cfg = self.model_eval, self.act_cfg

            @jax.jit
            def run(variables, batch, rng):
                preds = model.apply(variables, batch, deterministic=True,
                                    rngs={"shuffle": rng})
                return decode_actions(preds, act_cfg)

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def _ensemble_predict(self, T, batch):
        """num_ensembles forwards with different order shuffles; average pos
        and open, mean the rotations in euler space
        (reference eval_simple_policy.py:316-330)."""
        from scipy.spatial.transform import Rotation as R
        run = self._predict_fn_shuffled(T)
        key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))
        actions = [np.asarray(run(self.variables, batch,
                                  jax.random.fold_in(key, i)))[0]
                   for i in range(self.num_ensembles)]
        stacked = np.stack(actions, 0)          # (E, 8)
        avg = stacked.mean(0)
        eulers = np.stack([R.from_quat(a[3:7]).as_euler("xyz")
                           for a in actions], 0)
        quat = R.from_euler("xyz", eulers.mean(0)).as_quat()
        return np.concatenate([avg[:3], quat, avg[-1:]], 0)

    def _encode_instruction(self, instr, taskvar=None):
        if instr in self.instr_embeds:
            return self.instr_embeds[instr]
        if not self.data_cfg.get("instr_embed_file") and taskvar:
            # synthetic-store mode: the model was trained on the dataset's
            # deterministic per-taskvar pseudo-embedding
            # (keystep_dataset.py _instr_embed) — reproduce it exactly
            import zlib
            h = zlib.crc32(taskvar.encode("utf-8")) % (2 ** 31)
            rng = np.random.RandomState(h)
            dim = int(self.act_cfg.get("txt_ft_size", 512))
            return rng.randn(4, dim).astype(np.float32)
        if self._clip is None:
            from ..vlm.clip_encoder import ClipTextEncoder
            self._clip = ClipTextEncoder()
        embed = self._clip.encode_tokens(instr)
        if self.data_cfg.get("instr_embed_type", "all") == "last":
            embed = embed[-1:]
        self.instr_embeds[instr] = embed
        return embed

    def process_point_clouds(self, xyz, rgb, ee_pose=None,
                             arm_links_info=None, taskvar=None):
        """Host preprocessing (reference eval_simple_policy.py:151-251)."""
        xyz = np.ascontiguousarray(xyz.reshape(-1, 3), np.float32)
        rgb = rgb.reshape(-1, 3)
        rm_table = self.data_cfg.get("rm_table", True)
        voxel_size = self.act_cfg.get("voxel_size", 0.01)
        # fused C++ crop+voxelize skips the mask materialization and the
        # two full-cloud fancy-index copies of the separate path; `first`
        # indexes the ORIGINAL cloud so rgb gathers directly
        from ..native import crop_voxelize_trace_native
        fused = crop_voxelize_trace_native(
            xyz, voxel_size, self.WORKSPACE, rm_table=rm_table)
        if fused is not None:
            xyz, first, _ = fused
            if len(xyz) == 0:
                return None, None, None, None
            rgb = rgb[first].astype(np.float32)
        else:
            rgb = rgb.astype(np.float32)
            in_mask = workspace_mask_np(xyz, self.WORKSPACE,
                                        rm_table=rm_table)
            xyz, rgb = xyz[in_mask], rgb[in_mask]
            if len(xyz) == 0:
                return None, None, None, None
            xyz, first = voxelize_pcd_np(xyz, voxel_size)
            rgb = rgb[first]

        if self.data_cfg.get("rm_robot", "none").startswith("box"):
            box = RobotBox(
                arm_links_info,
                keep_gripper=self.data_cfg["rm_robot"] == "box_keep_gripper",
                env_name="real" if self.real_robot else "rlbench")
            keep = ~box.point_mask(xyz)
            xyz, rgb = xyz[keep], rgb[keep]

        if len(xyz) > self.num_points:
            idxs = np.random.choice(len(xyz), self.num_points, replace=False)
            xyz, rgb = xyz[idxs], rgb[idxs]
        height = xyz[:, 2] - self.TABLE_HEIGHT

        shift = self.data_cfg.get("xyz_shift", "center")
        if shift == "none":
            centroid = np.zeros(3, np.float32)
        elif shift == "center":
            centroid = xyz.mean(0)
        else:
            centroid = copy.deepcopy(ee_pose[:3])
        radius = float(np.max(np.linalg.norm(xyz - centroid, axis=1))) \
            if self.data_cfg.get("xyz_norm", False) else 1.0

        xyz = (xyz - centroid) / radius
        height = height / radius
        ee_pose = np.asarray(ee_pose, np.float32).copy()
        ee_pose[:3] = (ee_pose[:3] - centroid) / radius
        rgb = (rgb / 255.0) * 2 - 1
        pc_ft = np.concatenate([xyz, rgb], 1)
        # default True: must match the training dataset's default
        # (keystep_dataset.py use_height=True), since eval reloads the
        # dumped train config which may omit the key
        if self.data_cfg.get("use_height", True):
            pc_ft = np.concatenate([pc_ft, height[:, None]], 1)
        return self._presort(pc_ft.astype(np.float32)), centroid, radius, \
            ee_pose

    def _presort(self, pc_ft):
        """Sort the cloud by the backbone's stage-0 SFC code on the host —
        the exact order the device entry sort would compute (float32 grid
        math identical to ptv3.compute_grid_coord + sfc_encode, bit-match
        enforced by tests/test_serialization.py) — so the eval programs run
        with assume_sorted and skip the device argsort. Row order is
        semantically irrelevant to every consumer (actions are per-cloud),
        so presorting unconditionally is safe even for programs built
        without the flag."""
        from ..ops.serialization import sfc_encode_np
        order0, depth, grid_size = self._presort_cfg
        xyz = pc_ft[:, :3]
        gc = np.floor(
            (xyz - xyz.min(0, keepdims=True)) / np.float32(grid_size)
        ).astype(np.int32)
        np.clip(gc, 0, (1 << depth) - 1, out=gc)
        code = sfc_encode_np(gc, order0, depth)
        return pc_ft[np.argsort(code, kind="stable")]

    # ------------------------------------------------------------------ #
    # fused on-device path (ops/eval_preprocess.py)

    _RAW_BUCKETS = (65536, 131072, 262144, 524288, 1048576)

    def _fused_fn(self):
        if self._obs_to_action is None:
            from ..ops.eval_preprocess import make_obs_to_action
            self._obs_to_action = make_obs_to_action(
                self.model, self.act_cfg, self.data_cfg,
                self.WORKSPACE, self.num_points,
                vox_capacity=int(os.environ.get(
                    "ROBOT3DLOTUS_VOX_CAPACITY", "8192")))
        return self._obs_to_action

    def _device_predict(self, xyz, rgb, ee_pose, arm_links_info,
                        instr_embed, instr, step_id):
        from ..ops.eval_preprocess import obb_params_np
        from ..train.datasets.collate import _bucket

        xyz = xyz.reshape(-1, 3).astype(np.float32)
        rgb = rgb.reshape(-1, 3).astype(np.float32)
        cap = _bucket(len(xyz), self._RAW_BUCKETS)
        if len(xyz) > cap:
            import logging
            logging.getLogger(__name__).warning(
                "raw cloud (%d points) exceeds the largest fused-path "
                "bucket (%d); trailing points (cameras) are DROPPED — "
                "use the host preprocessing path for this camera setup",
                len(xyz), cap)
        raw_xyz = np.zeros((cap, 3), np.float32)
        raw_rgb = np.zeros((cap, 3), np.float32)
        n = min(len(xyz), cap)
        raw_xyz[:n] = xyz[:n]
        raw_rgb[:n] = rgb[:n]

        if str(self.data_cfg.get("rm_robot", "none")).startswith("box"):
            box = RobotBox(
                arm_links_info,
                keep_gripper=self.data_cfg["rm_robot"] == "box_keep_gripper",
                env_name="real" if self.real_robot else "rlbench")
            obb = obb_params_np(box)
        else:  # negative half extents: the inside test never fires
            from ..ops.eval_preprocess import obb_params_disabled
            obb = obb_params_disabled()
        obb_vec = np.concatenate([
            np.ascontiguousarray(obb["obb_rot"], np.float32).ravel(),
            obb["obb_off"], obb["obb_half"]]).astype(np.float32)

        txt_dev, txt_mask_dev = self._staged_txt(instr, instr_embed)

        self._step_counter += 1
        step_ee_key = np.concatenate([
            [np.float32(step_id)], np.asarray(ee_pose, np.float32),
            [np.float32(self._step_counter % (1 << 22))]]).astype(np.float32)
        fn = self._fused_fn()
        # ONE packed readback: [action (8) | count | vox_overflow] — three
        # separate fetches would pay three link round trips per step
        packed = np.array(fn(
            self.variables, jnp.asarray(raw_xyz), jnp.asarray(raw_rgb),
            np.int32(n), jnp.asarray(obb_vec), txt_dev, txt_mask_dev,
            jnp.asarray(step_ee_key)))
        action, count, vox_overflow = packed[:8], int(packed[8]), \
            int(packed[9])
        if vox_overflow > 0:
            # surfaced BEFORE the tiny-cloud guard: a capacity far too
            # small manifests exactly as count<=10, and the operator needs
            # the diagnosis, not just silent zero actions
            import logging
            logging.getLogger(__name__).warning(
                "fused voxelizer dropped %d occupied voxels/points "
                "(capacity exceeded — a contiguous workspace corner — "
                "and/or points past the 2^depth grid extent); raise "
                "ROBOT3DLOTUS_VOX_CAPACITY or check voxel_size",
                vox_overflow)
        # host path's empty/tiny-cloud guard (predict below): a cloud the
        # crop/robot-removal emptied must yield the safe zero action, not
        # a forward over pure padding
        if count <= 10:
            return self._zero_action()
        action[-1] = float(1.0 / (1.0 + np.exp(-action[-1])) > 0.5)
        return action

    def predict(self, task_str=None, variation=None, step_id=0,
                obs_state_dict=None, episode_id=None, instructions=None):
        taskvar = f"{task_str}+{variation}"
        obs = obs_state_dict

        if self.device_preprocess:
            if instructions is None:
                instructions = self.taskvar_instrs.get(
                    taskvar, ["do the task"])
            instr_embed = self._encode_instruction(
                instructions[0], taskvar=taskvar)
            action = self._device_predict(
                np.stack(obs["pc"], 0), np.stack(obs["rgb"], 0),
                np.asarray(obs["gripper"], np.float32),
                obs.get("arm_links_info"), instr_embed, instructions[0],
                step_id)
            self._save_obs_out(taskvar, episode_id, step_id, obs, action)
            return {"action": action}

        instructions, instr_embed, pc_ft, centroid, radius, ee_pose = \
            self._host_prep(task_str, variation, obs, instructions)
        if pc_ft is None or len(pc_ft) <= 10:
            return {"action": self._zero_action()}

        cin = pc_ft.shape[-1]
        if self.num_ensembles > 1:
            T = _bucket(instr_embed.shape[0], TXT_BUCKETS)
            batch = {k: jnp.asarray(v) for k, v in self._dict_batch(
                [(pc_ft, ee_pose, instr_embed, step_id)], 1, T).items()}
            action = self._ensemble_predict(T, batch)
        elif self.mesh is not None:
            # the mesh path keeps the full static capacity: the point axis
            # is sp-sharded, so its extent must stay divisible by the mesh
            T = _bucket(instr_embed.shape[0], TXT_BUCKETS)
            action = self._mesh_predict_rows(
                [(pc_ft, ee_pose, instr_embed, step_id)], 1, T)[0].copy()
        else:
            N = _bucket(len(pc_ft), self._point_buckets)
            flat = np.zeros((1, N * (cin + 1) + 10), np.float32)
            self._pack_flat_row(flat[0], pc_ft, ee_pose, step_id, N=N)
            txt_dev, txt_mask_dev = self._staged_txt(
                instructions[0], instr_embed, batched=True)
            run = self._predict_fn_flat_batch(cin, N)
            args = (self.variables, jnp.asarray(flat), txt_dev, txt_mask_dev)
            if self.host_structure:
                args += (jnp.asarray(self._struct_buf([pc_ft], N)),)
            # np.array: device arrays view as read-only numpy
            action = np.array(run(*args))[0]
        action = self._finish_action(action, centroid, radius)
        self._save_obs_out(taskvar, episode_id, step_id, obs, action)
        return {"action": action}

    _BATCH_BUCKETS = (1, 2, 4, 8, 16)

    def predict_batch(self, payloads):
        """Serve several queued `predict` queries in batched forwards.

        The reference consumer answers one query per forward
        (eval_simple_policy_server.py:59-74); with N sim producers the
        accelerator sits idle between their interleaved single-obs calls.
        Here the eval-server consumer drains pending queries and this method
        stacks their preprocessed clouds into (B, N, C) batches — bucketed B
        so every size hits a cached executable, padding rows replicating row
        0 (their outputs are discarded), batches larger than the top bucket
        split into chunks. Per-row prep/packing/decode is the same code
        `predict` runs, so the two cannot drift.

        Ensemble and fused-device-preprocess modes stay sequential: the
        former averages multiple shuffled forwards per obs, the latter is a
        single-obs program by construction."""
        if self.num_ensembles > 1 or self.device_preprocess or \
                len(payloads) == 1:
            return [self.predict(**p) for p in payloads]

        outs: list = [None] * len(payloads)
        prepped = []
        for i, p in enumerate(payloads):
            _, instr_embed, pc_ft, centroid, radius, ee_pose = \
                self._host_prep(p.get("task_str"), p.get("variation"),
                                p["obs_state_dict"], p.get("instructions"))
            if pc_ft is None or len(pc_ft) <= 10:
                outs[i] = {"action": self._zero_action()}
                continue
            prepped.append((i, pc_ft, centroid, radius, ee_pose,
                            instr_embed, int(p.get("step_id") or 0)))
        if not prepped:
            return outs

        cin = prepped[0][1].shape[-1]
        cap = self._BATCH_BUCKETS[-1]
        # double-buffered chunking (round-4 verdict item 7): a full
        # top-bucket batch splits into two half-bucket chunks, and every
        # chunk's packing + H2D staging happens while the PREVIOUS chunk's
        # device program runs — jax dispatch is async, so the only
        # synchronization is the deferred np.array() collect at the end
        # (device compute of chunk k overlaps host work of chunk k+1 and
        # the decode of earlier chunks).
        chunk_size = cap
        if len(prepped) >= cap and cap // 2 in self._BATCH_BUCKETS:
            chunk_size = cap // 2

        pending = []  # (chunk, device-futures or ndarray)
        for c0 in range(0, len(prepped), chunk_size):
            chunk = prepped[c0:c0 + chunk_size]
            B = _bucket(len(chunk), self._BATCH_BUCKETS)
            T = _bucket(max(pr[5].shape[0] for pr in chunk), TXT_BUCKETS)
            if self.mesh is not None:
                actions = self._mesh_predict_rows(
                    [(pc_ft, ee_pose, instr_embed, step_id)
                     for _, pc_ft, _, _, ee_pose, instr_embed, step_id
                     in chunk], B, T)
                pending.append((chunk, actions))
                continue
            # point capacity bucketed on the chunk's largest cloud
            Nb = _bucket(max(len(pr[1]) for pr in chunk),
                         self._point_buckets)
            run = self._predict_fn_flat_batch(cin, Nb)
            flat = np.zeros((B, Nb * (cin + 1) + 10), np.float32)
            txt = np.zeros((B, T, chunk[0][5].shape[-1]), np.float32)
            txt_mask = np.zeros((B, T), bool)
            for r, (_, pc_ft, _, _, ee_pose, instr_embed, step_id) in \
                    enumerate(chunk):
                self._pack_flat_row(flat[r], pc_ft, ee_pose, step_id,
                                    N=Nb)
                t = min(instr_embed.shape[0], T)
                txt[r, :t] = instr_embed[:t]
                txt_mask[r, :t] = True
            for r in range(len(chunk), B):  # padding rows: row 0 again
                flat[r] = flat[0]
                txt[r] = txt[0]
                txt_mask[r] = txt_mask[0]
            args = (self.variables, jnp.asarray(flat),
                    jnp.asarray(txt), jnp.asarray(txt_mask))
            if self.host_structure:
                struct_rows = [pr[1] for pr in chunk]
                struct_rows += [chunk[0][1]] * (B - len(chunk))
                args += (jnp.asarray(self._struct_buf(struct_rows, Nb)),)
            # dispatch only: the returned device array is a future
            pending.append((chunk, run(*args)))

        for chunk, actions in pending:
            actions = np.asarray(actions)  # blocks on this chunk only
            for r, (i, _, centroid, radius, _, _, _) in enumerate(chunk):
                action = self._finish_action(actions[r].copy(),
                                             centroid, radius)
                outs[i] = {"action": action}
                p = payloads[i]
                self._save_obs_out(
                    f"{p.get('task_str')}+{p.get('variation')}",
                    p.get("episode_id"), p.get("step_id"),
                    p["obs_state_dict"], action)
        return outs

"""Checkpointing: msgpack-serialized flax state + reference-layout converter.

Reference behavior (train/utils/save.py:20-45): `model_step_{N}.pt` holds the
flat model state_dict; `train_state_latest.pt` holds {step, optimizer} and is
overwritten each save; resume scans for the latest pair
(train_simple_policy.py:135-152).

This module mirrors that layout with flax/msgpack artifacts:
  model_step_{N}.msgpack        — serialized {params, batch_stats}
  train_state_latest.msgpack    — {step, opt_state}
plus save_training_meta dumping the resolved YAML config for eval-side
reconstruction (save.py:12-18; eval reloads it, eval_simple_policy_server.py:236).
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_training_meta(output_dir, config):
    os.makedirs(os.path.join(output_dir, "logs"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "ckpts"), exist_ok=True)
    with open(os.path.join(output_dir, "logs", "training_config.yaml"),
              "w") as f:
        config.dump(f)


class ModelSaver:
    def __init__(self, output_dir):
        self.ckpt_dir = os.path.join(output_dir, "ckpts")
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def save(self, state, step, save_latest_optim=True):
        model = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        path = os.path.join(self.ckpt_dir, f"model_step_{step}.msgpack")
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(model))
        if save_latest_optim:
            latest = {
                "step": np.int64(step),
                "opt_state": jax.device_get(state.opt_state),
            }
            lpath = os.path.join(self.ckpt_dir, "train_state_latest.msgpack")
            with open(lpath, "wb") as f:
                f.write(serialization.to_bytes(latest))
        return path


def find_resume_step(output_dir) -> Optional[int]:
    ckpt_dir = os.path.join(output_dir, "ckpts")
    if not os.path.isdir(ckpt_dir):
        return None
    if not os.path.exists(os.path.join(ckpt_dir, "train_state_latest.msgpack")):
        return None
    steps = [int(m.group(1)) for f in os.listdir(ckpt_dir)
             if (m := re.match(r"model_step_(\d+)\.msgpack$", f))]
    return max(steps) if steps else None


def load_model_ckpt(path, target_model):
    """target_model: {'params': ..., 'batch_stats': ...} template."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target_model, f.read())


def _merge_tree(dst, src, ckpt, path=""):
    """Converted torch tree into an initialized template: every converted
    leaf must exist in the model with the same shape (load it loudly or
    not at all)."""
    out = dict(dst)
    for k, v in src.items():
        if k not in out:
            raise KeyError(
                f"{ckpt}: converted key {path}/{k} not in the model tree")
        if isinstance(v, dict):
            out[k] = _merge_tree(out[k], v, ckpt, f"{path}/{k}")
        else:
            if tuple(out[k].shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"{ckpt}: {path}/{k} shape {np.shape(v)} vs model "
                    f"{tuple(out[k].shape)}")
            out[k] = np.asarray(v).astype(out[k].dtype)
    return out


def warm_start_variables(variables, path, model_cfg=None,
                         encoder_only=False, strict=False):
    """Shape-filtered partial load for warm-starting training from a
    pretrained model (reference train_simple_policy.py:154-173: only keys
    that exist in the target with matching shapes load; everything else
    keeps its fresh init; no error on architecture mismatch). With
    `encoder_only`, only backbone encoder weights load (the reference's
    resume_encoder_only filters decoder-prefixed keys — its prefixes are
    from an older pretraining model, so here the filter is expressed on
    this tree's own names: ptv3_model/* minus dec{s}_*). Accepts .msgpack
    or a reference-layout torch .pt (needs model_cfg).

    Returns (variables, n_loaded, n_skipped)."""
    from .torch_convert import flatten_tree, unflatten_tree
    if str(path).endswith((".pt", ".pth")):
        if model_cfg is None:
            raise ValueError("torch checkpoints need model_cfg")
        from .torch_convert import load_torch_checkpoint
        params_tree, bstats_tree, _, _ = load_torch_checkpoint(
            path, model_cfg)
        src = {"params": params_tree, "batch_stats": bstats_tree}
    else:
        with open(path, "rb") as f:
            src = serialization.msgpack_restore(f.read())
    src_flat = flatten_tree(src)
    dst_flat = flatten_tree({"params": variables["params"],
                             "batch_stats": variables.get("batch_stats",
                                                          {})})
    n_loaded = n_skipped = 0
    loaded_keys = set()
    for k, v in src_flat.items():
        keep = (not encoder_only) or (
            "/ptv3_model/" in k and not re.search(r"/dec\d+_", k))
        if keep and k in dst_flat and \
                tuple(np.shape(v)) == tuple(dst_flat[k].shape):
            dst_flat[k] = np.asarray(v).astype(dst_flat[k].dtype)
            loaded_keys.add(k)
            n_loaded += 1
        else:
            n_skipped += 1
    if strict:
        # reference checkpoint_strict_load: the checkpoint must cover every
        # model tensor. Under encoder_only, only the filter-eligible
        # (encoder) tensors must be covered — torch's strict load would
        # always raise on the deliberately-filtered rest, which makes the
        # combination unusable, so this is the sensible reading.
        want = {k for k in dst_flat
                if (not encoder_only) or (
                    "/ptv3_model/" in k and not re.search(r"/dec\d+_", k))}
        uncovered = sorted(want - loaded_keys)
        if uncovered:
            raise ValueError(
                f"checkpoint_strict_load: {path} leaves {len(uncovered)} "
                f"model tensors uninitialized, e.g. {uncovered[:5]}")
    return unflatten_tree(dst_flat), n_loaded, n_skipped


def load_any_model_ckpt(path, variables, model_cfg=None):
    """Checkpoint -> {'params', 'batch_stats'}, dispatching on format:
    native .msgpack (flax serialization), or a reference-layout torch
    .pt/.pth converted on the fly (torch_convert.build_name_map; needs the
    MODEL config). Lets eval point straight at a released upstream
    checkpoint. Returns merged copies of the given initialized template."""
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    if not str(path).endswith((".pt", ".pth")):
        return load_model_ckpt(path, template)
    if model_cfg is None:
        raise ValueError("torch checkpoints need model_cfg for conversion")
    from .torch_convert import load_torch_checkpoint
    params_tree, bstats_tree, missing, unexpected = load_torch_checkpoint(
        path, model_cfg)
    if missing or unexpected:
        import logging
        logging.getLogger(__name__).warning(
            "torch checkpoint %s: %d missing / %d unexpected keys "
            "(missing: %s...; unexpected: %s...)", path,
            len(missing), len(unexpected), missing[:3], unexpected[:3])
    return {"params": _merge_tree(template["params"], params_tree, path),
            "batch_stats": _merge_tree(template["batch_stats"], bstats_tree,
                                       path)}


def load_train_state_latest(output_dir, opt_state_template):
    lpath = os.path.join(output_dir, "ckpts", "train_state_latest.msgpack")
    with open(lpath, "rb") as f:
        target = {"step": np.int64(0), "opt_state": opt_state_template}
        return serialization.from_bytes(target, f.read())


def resume_or_init(state, output_dir):
    """Returns (state, start_step). Mirrors auto-resume
    (train_simple_policy.py:135-152)."""
    step = find_resume_step(output_dir)
    if step is None:
        return state, 0
    model = load_model_ckpt(
        os.path.join(output_dir, "ckpts", f"model_step_{step}.msgpack"),
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})
    latest = load_train_state_latest(output_dir,
                                     jax.device_get(state.opt_state))
    state = state.replace(
        params=model["params"], batch_stats=model["batch_stats"],
        opt_state=latest["opt_state"], step=int(latest["step"]))
    return state, int(latest["step"])

"""Model factory mirroring the reference MODEL_FACTORY mapping
(train/train_simple_policy.py:40-48)."""
from __future__ import annotations

from .simple_policy import SimplePolicyTPU

_VARIANTS = {
    "SimplePolicyPTV3AdaNorm": ("simple", "adanorm"),
    "SimplePolicyPTV3CA": ("simple", "ca"),
    "SimplePolicyPTV3Concat": ("simple", "concat"),
    "MotionPlannerPTV3AdaNorm": ("motion", "adanorm"),
    "MotionPlannerPTV3CA": ("motion", "ca"),
}

MODEL_FACTORY = dict(_VARIANTS)


def build_model(model_cfg):
    """model_cfg: ConfigNode/dict with model_class, ptv3_config, action_config."""
    cls = model_cfg["model_class"]
    kind, variant = _VARIANTS[cls]
    ptv3_cfg = dict(model_cfg["ptv3_config"])
    act_cfg = dict(model_cfg["action_config"])
    if kind == "simple":
        return SimplePolicyTPU(ptv3_cfg=ptv3_cfg, act_cfg=act_cfg,
                               variant=variant)
    from .motion_planner import MotionPlannerTPU
    return MotionPlannerTPU(ptv3_cfg=ptv3_cfg, act_cfg=act_cfg,
                            variant=variant)

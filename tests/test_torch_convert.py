"""Checkpoint converter tests: the name map must exactly cover the flax
parameter tree of the flagship models, and flax->torch->flax must round-trip
bit-exactly."""
import numpy as np
import jax
import pytest

from robot3dlotus_tpu.train.torch_convert import (
    build_name_map, flatten_tree, torch_to_flax, flax_to_torch,
)
from robot3dlotus_tpu.models.simple_policy import SimplePolicyTPU
from tests.conftest import reference_available
from tests.test_policy import PTV3_CFG, ACT_CFG, fake_batch

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not reference_available(), reason="golden-parity vs the upstream checkout; no reference present")]  # compile-heavy golden-parity tier


def make_model_cfg(variant="ca"):
    cls = {"ca": "SimplePolicyPTV3CA", "adanorm": "SimplePolicyPTV3AdaNorm"}
    act = dict(ACT_CFG)
    if variant == "adanorm":
        act["use_ee_pose"] = True
    return {
        "model_class": cls[variant],
        "ptv3_config": dict(PTV3_CFG),
        "action_config": act,
    }


@pytest.mark.parametrize("variant", ["ca"])
def test_name_map_covers_flax_tree(variant):
    cfg = make_model_cfg(variant)
    model = SimplePolicyTPU(ptv3_cfg=cfg["ptv3_config"],
                            act_cfg=cfg["action_config"], variant=variant)
    from conftest import abstract_init
    batch = fake_batch()
    key = jax.random.PRNGKey(0)
    variables = abstract_init(
        model, {"params": key, "dropout": key, "shuffle": key},
        batch, deterministic=True)
    flat_params = flatten_tree(variables["params"])
    flat_stats = flatten_tree(variables["batch_stats"])

    name_map = build_name_map(cfg)
    mapped_params = {p for p, tf in name_map.values()
                     if not p.startswith("BS:")}
    mapped_stats = {p[3:] for p, tf in name_map.values()
                    if p.startswith("BS:")}

    missing = set(flat_params) - mapped_params
    extra = mapped_params - set(flat_params)
    assert not missing, f"flax params not covered: {sorted(missing)[:10]}"
    assert not extra, f"map targets not in tree: {sorted(extra)[:10]}"
    missing_bs = set(flat_stats) - mapped_stats
    assert not missing_bs, f"batch stats not covered: {sorted(missing_bs)[:10]}"


def test_roundtrip_bit_exact():
    cfg = make_model_cfg("ca")
    model = SimplePolicyTPU(ptv3_cfg=cfg["ptv3_config"],
                            act_cfg=cfg["action_config"], variant="ca")
    from conftest import distinct_init
    batch = fake_batch()
    key = jax.random.PRNGKey(1)
    variables = distinct_init(
        model, {"params": key, "dropout": key, "shuffle": key},
        batch, deterministic=True)
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    torch_sd = flax_to_torch(params, stats, cfg)
    p2, b2, missing, unexpected = torch_to_flax(torch_sd, cfg)
    assert not missing and not unexpected, (missing[:5], unexpected[:5])

    f1, f2 = flatten_tree(params), flatten_tree(p2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k], err_msg=k)
    s1, s2 = flatten_tree(stats), flatten_tree(b2)
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k], err_msg=k)

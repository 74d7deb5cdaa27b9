"""Host-precomputed batch structure (train/datasets/structure.py) must be
a pure re-plumbing: presorted batch + order_perm + stem_nmap through the
model == the unsorted batch through the model's own on-device machinery.
"""
import copy

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from robot3dlotus_tpu.models.simple_policy import (
    SimplePolicyTPU, compute_loss,
)
from robot3dlotus_tpu.train.datasets.structure import (
    attach_host_structure, structure_cfg_from_model,
)

from test_policy import ACT_CFG, LOSS_CFG, PTV3_CFG, fake_batch

pytestmark = pytest.mark.slow  # compile-heavy: policy-scale models


def _np_batch(b):
    return {k: np.array(v) for k, v in b.items()}


def _cfgs(orders):
    ptv3 = dict(PTV3_CFG, orders=orders, shuffle_orders=False,
                lookup_extent=32)
    model_cfg = {"ptv3_config": ptv3, "action_config": dict(ACT_CFG)}
    scfg = structure_cfg_from_model(model_cfg)
    return ptv3, scfg


@pytest.mark.parametrize("shuffle", [False, True])
def test_host_structure_matches_device_path(shuffle):
    orders = ("z", "z-trans", "hilbert")
    ptv3, scfg = _cfgs(orders)
    scfg["shuffle"] = shuffle
    batch = _np_batch(fake_batch(B=2, N=256))

    structured = attach_host_structure(
        copy.deepcopy(batch), scfg, np.random.RandomState(5))
    perm = structured["order_perm"]
    if not shuffle:
        np.testing.assert_array_equal(perm, np.arange(len(orders)))
    # the presort is a permutation of the valid prefix
    for b in range(2):
        n = int(batch["pc_counts"][b])
        assert sorted(map(tuple, structured["pc_fts"][b, :n].tolist())) == \
            sorted(map(tuple, batch["pc_fts"][b, :n].tolist()))

    # reference program: NO structure, orders statically permuted to match
    # the host's choice (the only shuffle-free way to pin the device path)
    ref_model = SimplePolicyTPU(
        ptv3_cfg=dict(ptv3, orders=tuple(orders[i] for i in perm)),
        act_cfg=dict(ACT_CFG), variant="ca")
    rngs = {"params": jax.random.PRNGKey(0)}
    ref_vars = ref_model.init(rngs, batch, deterministic=True)

    def run(model, variables, b):
        preds = model.apply(variables, b, deterministic=True)
        losses = compute_loss(preds, b, ACT_CFG, LOSS_CFG)
        return preds, losses

    ref_preds, ref_losses = run(ref_model, ref_vars, batch)

    # structured program: same params, original order tuple, host structure
    model = SimplePolicyTPU(ptv3_cfg=ptv3, act_cfg=dict(ACT_CFG),
                            variant="ca")
    preds, losses = run(model, ref_vars, structured)

    for k in ("pos", "rot", "open"):
        np.testing.assert_allclose(
            np.asarray(preds[k]), np.asarray(ref_preds[k]),
            atol=2e-5, rtol=2e-5, err_msg=k)
    np.testing.assert_allclose(
        float(losses["total"]), float(ref_losses["total"]), rtol=1e-5)
    assert int(preds["pool_overflow"]) == int(ref_preds["pool_overflow"])


def test_host_structure_motion_planner_matches():
    """The motion planner's structured path must also be a pure re-plumbing
    — its stem consumes categorical pc_labels, which ride the presort on
    the host (structure._POINT_KEYS) instead of the device sort."""
    from robot3dlotus_tpu.models.motion_planner import (
        MotionPlannerTPU, compute_mp_loss,
    )
    from robot3dlotus_tpu.train.datasets.store import SyntheticMotionStore
    from robot3dlotus_tpu.train.datasets.motion_dataset import (
        MotionPlannerDataset, collate_motion_samples,
    )
    store = SyntheticMotionStore(num_taskvars=1, episodes_per_taskvar=2,
                                 points_per_step=1200)
    ds = MotionPlannerDataset(
        store, num_points=128, pos_bins=5, max_traj_len=3,
        use_color=False, use_height=True, rng=np.random.RandomState(0))
    batch = collate_motion_samples(ds[0] + ds[1], num_points=128,
                                   max_traj_len=3, num_clouds=2)
    batch = {k: np.array(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}

    orders = ("z", "hilbert")
    ptv3 = dict(PTV3_CFG, in_channels=4, orders=orders,
                shuffle_orders=False, lookup_extent=32)
    act = dict(ACT_CFG, pos_bins=5, max_traj_len=3, traj_embed_size=8,
               pc_label_channels=4, txt_reduce="attn")
    scfg = structure_cfg_from_model(
        {"ptv3_config": ptv3, "action_config": act})
    structured = attach_host_structure(
        copy.deepcopy(batch), scfg, np.random.RandomState(2))
    np.testing.assert_array_equal(structured["order_perm"],
                                  np.arange(len(orders)))

    model = MotionPlannerTPU(ptv3_cfg=ptv3, act_cfg=act, variant="ca")
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           deterministic=True)
    ref_preds = model.apply(variables, batch, deterministic=True)
    preds = model.apply(variables, structured, deterministic=True)
    for k in ("pos", "rot", "open"):
        np.testing.assert_allclose(
            np.asarray(preds[k]), np.asarray(ref_preds[k]),
            atol=2e-5, rtol=2e-5, err_msg=k)
    ref_loss = compute_mp_loss(ref_preds, batch, act, LOSS_CFG)["total"]
    loss = compute_mp_loss(preds, structured, act, LOSS_CFG)["total"]
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_host_structure_loss_grads_match(seed=0):
    """Gradients agree too (the maps are non-differentiable constants)."""
    orders = ("z", "z-trans")
    ptv3, scfg = _cfgs(orders)
    scfg["shuffle"] = False
    batch = _np_batch(fake_batch(B=2, N=128))
    structured = attach_host_structure(
        copy.deepcopy(batch), scfg, np.random.RandomState(seed))

    model = SimplePolicyTPU(ptv3_cfg=ptv3, act_cfg=dict(ACT_CFG),
                            variant="ca")
    variables = model.init({"params": jax.random.PRNGKey(1)}, batch,
                           deterministic=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, b):
        preds = model.apply({"params": p, **rest}, b, deterministic=True)
        return compute_loss(preds, b, ACT_CFG, LOSS_CFG)["total"]

    grad_fn = jax.jit(jax.grad(loss_fn))
    g_ref = grad_fn(params, batch)
    g_struct = grad_fn(params, structured)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_st = jax.tree_util.tree_leaves(g_struct)
    # on the CPU test backend the two programs are bit-identical (the host
    # presort + shipped maps reproduce the device machinery exactly, and the
    # presorted disc_pos_probs line up with the identity sort0); the tiny
    # atol only allows for backends with nondeterministic reductions
    gmax = max(float(np.abs(np.asarray(a)).max()) for a in flat_ref)
    for a, b_ in zip(flat_ref, flat_st):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b_, np.float64),
            atol=1e-5 * max(gmax, 1.0))


def test_host_far_lists_match_device_compaction():
    """structure._stage_far_lists must be bit-identical to the device's
    _compact_far_per_tap (both keep the FIRST Fk far links per tap in
    ascending destination order) — the host-shipped lists swap in for the
    on-device top_k without changing a single link."""
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.pallas_conv import (
        _compact_far_per_tap, _choose_tile)
    from robot3dlotus_tpu.train.datasets.structure import _stage_far_lists

    rng = np.random.RandomState(0)
    B, cap, K, halo, fk = 3, 256, 27, 16, 24
    nm = rng.randint(-1, cap, (B, cap, K)).astype(np.int16)
    cfg = {"conv_halo": halo, "conv_far_per_tap": fk}
    far, dropped, h_halo, h_tile = _stage_far_lists(nm, 0, cfg)
    assert far.shape == (B, K, fk, 2)
    assert (h_halo, h_tile) == (halo, _choose_tile(cap))

    # device twin on the same map
    P = _choose_tile(cap)
    Wn = min(cap, P + 2 * halo)
    row = np.arange(cap)
    ws = np.clip((row // P) * P - halo, 0, max(cap - Wn, 0))
    ok = nm >= 0
    rel = nm.astype(np.int32) - ws[None, :, None]
    near = ok & (rel >= 0) & (rel < Wn)
    q = jnp.asarray(np.maximum(nm, 0).astype(np.int32))
    src_d, dst_d, ok_d, dropped_d = _compact_far_per_tap(
        q, jnp.asarray(ok), jnp.asarray(near), fk)

    ok_h = far[..., 1] >= 0
    np.testing.assert_array_equal(ok_h, np.asarray(ok_d))
    np.testing.assert_array_equal(
        np.where(ok_h, far[..., 0], 0), np.asarray(src_d))
    np.testing.assert_array_equal(
        np.where(ok_h, far[..., 1], 0), np.asarray(dst_d))
    np.testing.assert_array_equal(dropped, np.asarray(dropped_d))
    assert dropped.sum() > 0 or ok_h.sum() > 0, "test needs far links"


def test_host_structure_with_windowed_conv_matches():
    """Full model: host structure INCLUDING shipped far lists through the
    interpreted windowed conv == the same model on the un-structured
    batch (device-side maps + compaction). Covers the cpe_far{s} keys'
    end-to-end path: builder -> host_structure_kwargs -> _make_aux ->
    window_map_from_nmap(host_far=...)."""
    orders = ("z",)
    ptv3, scfg = _cfgs(orders)
    ptv3 = dict(ptv3, conv_impl="pallas_interpret", conv_halo=16,
                conv_far_per_tap=32)
    scfg = structure_cfg_from_model(
        {"ptv3_config": ptv3, "action_config": dict(ACT_CFG)})
    scfg["shuffle"] = False
    batch = _np_batch(fake_batch(B=2, N=256))
    structured = attach_host_structure(
        copy.deepcopy(batch), scfg, np.random.RandomState(5))
    assert any(k.startswith("cpe_far") for k in structured), \
        "test needs at least one partial-window stage shipping far lists"

    model = SimplePolicyTPU(ptv3_cfg=ptv3, act_cfg=dict(ACT_CFG),
                            variant="ca")
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, batch, deterministic=True)
    ref = model.apply(variables, batch, deterministic=True)
    out = model.apply(variables, structured, deterministic=True)
    for k in ("pos", "rot", "open"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]),
            atol=2e-5, rtol=2e-5, err_msg=k)

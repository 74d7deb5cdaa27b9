"""Adversarial-cloud robustness (round-1 verdict item 10): clouds engineered
to break the fast-path assumptions must degrade *loudly* (telemetry) or
*exactly* (automatic fallback), never silently.

Covered failure classes:
  * grid coordinates beyond the dense occupancy-table extent (xyz_norm-style
    layouts / rotated wide scenes): build_neighbor_map must auto-fall back
    to the extent-free searchsorted path and match it bit-for-bit, and the
    backbone must surface conv_out_of_extent > 0;
  * pooled-segment overflow (> capacity/2 unique parents): outputs stay
    finite and pool_overflow > 0 (ops/pooling.py drops overflow segments).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from robot3dlotus_tpu.ops.sparse_conv import (
    build_neighbor_map, _build_neighbor_map_sorted,
)
from robot3dlotus_tpu.models.simple_policy import (
    SimplePolicyTPU, compute_loss,
)

from test_policy import ACT_CFG, LOSS_CFG, PTV3_CFG, fake_batch

pytestmark = pytest.mark.slow  # compile-heavy: builds/applies policy-scale models


def test_neighbor_map_out_of_extent_falls_back_exactly():
    """Any valid coord >= extent -> whole batch uses the searchsorted path."""
    rng = np.random.RandomState(0)
    B, N, depth, extent = 2, 128, 9, 16
    gc = rng.randint(0, 40, (B, N, 3)).astype(np.int32)  # spans > extent
    mask = np.ones((B, N), bool)
    mask[0, 100:] = False
    gc_j, mask_j = jnp.asarray(gc), jnp.asarray(mask)

    with_extent = build_neighbor_map(gc_j, mask_j, 3, depth, extent=extent)
    sorted_ref = _build_neighbor_map_sorted(gc_j, mask_j, 3, depth)
    np.testing.assert_array_equal(np.asarray(with_extent.ok),
                                  np.asarray(sorted_ref.ok))
    np.testing.assert_array_equal(np.asarray(with_extent.idx),
                                  np.asarray(sorted_ref.idx))
    # sanity: some in-stencil neighbors exist beyond the extent boundary
    beyond = (gc.max(-1) >= extent) & mask
    assert np.asarray(with_extent.ok)[beyond].any()


def test_neighbor_map_in_extent_uses_dense_table():
    rng = np.random.RandomState(1)
    B, N, depth, extent = 2, 96, 9, 64
    gc = rng.randint(0, 20, (B, N, 3)).astype(np.int32)
    mask = np.ones((B, N), bool)
    got = build_neighbor_map(jnp.asarray(gc), jnp.asarray(mask), 3, depth,
                             extent=extent)
    ref = _build_neighbor_map_sorted(jnp.asarray(gc), jnp.asarray(mask), 3,
                                     depth)
    np.testing.assert_array_equal(np.asarray(got.ok), np.asarray(ref.ok))
    np.testing.assert_array_equal(np.asarray(got.idx), np.asarray(ref.idx))


def _run_policy(batch, ptv3_overrides):
    cfg = dict(PTV3_CFG, **ptv3_overrides)
    model = SimplePolicyTPU(ptv3_cfg=cfg, act_cfg=dict(ACT_CFG),
                            variant="ca")
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "shuffle": rng},
                           batch, deterministic=True)
    preds = model.apply(variables, batch, deterministic=True)
    losses = compute_loss(preds, batch, dict(ACT_CFG), dict(LOSS_CFG))
    return preds, losses


def test_policy_survives_out_of_extent_cloud():
    """A wide cloud (~3 m span at 1 cm voxels -> grid coords ~300 >> the
    extent) through the FULL policy: finite outputs + nonzero telemetry."""
    batch = fake_batch(B=2, N=256)
    # blow up the spatial span: xyz in [-1.5, 1.5] m
    pc = np.array(batch["pc_fts"])  # writable copy
    pc[..., :3] *= 5.0
    batch["pc_fts"] = jnp.asarray(pc)

    preds, losses = _run_policy(batch, dict(lookup_extent=64,
                                            serial_depth=10))
    out0 = preds["dec_layers"][0]
    assert int(out0["conv_out_of_extent"]) > 0
    for k in ("pos", "rot", "open"):
        assert np.isfinite(np.asarray(preds[k])).all(), k
    assert np.isfinite(float(losses["total"]))


def test_policy_survives_pool_overflow():
    """Every point in its own voxel along a diagonal: each parent is unique,
    so stage-1 pooling sees N parents against a N/2 capacity. Outputs must
    stay finite and pool_overflow must report the drop."""
    batch = fake_batch(B=2, N=256)
    pc = np.array(batch["pc_fts"])  # writable copy
    n = pc.shape[1]
    # strictly increasing voxel diagonal: (i, i, i) * 2 voxels apart so even
    # the >>1 pooled coordinates stay unique
    diag = (np.arange(n)[:, None] * np.array([2, 2, 2])[None]) * 0.01
    pc[:, :, :3] = diag[None]
    batch["pc_fts"] = jnp.asarray(pc)

    preds, losses = _run_policy(batch, dict(lookup_extent=0,
                                            serial_depth=10))
    assert int(preds["pool_overflow"]) > 0
    for k in ("pos", "rot", "open"):
        assert np.isfinite(np.asarray(preds[k])).all(), k
    assert np.isfinite(float(losses["total"]))


def test_stage_caps_override_removes_overflow():
    """The per-stage capacity knob (ptv3_config stage_caps, sized by
    scripts/audit_pool_capacity.py) must eliminate the drop the //2 default
    suffers on worst-case clouds: same diagonal cloud as above, full
    capacity at every stage -> pool_overflow == 0 and finite outputs."""
    batch = fake_batch(B=2, N=256)
    pc = np.array(batch["pc_fts"])
    n = pc.shape[1]
    diag = (np.arange(n)[:, None] * np.array([2, 2, 2])[None]) * 0.01
    pc[:, :, :3] = diag[None]
    batch["pc_fts"] = jnp.asarray(pc)

    n_stages = len(PTV3_CFG["enc_depths"])
    preds, losses = _run_policy(batch, dict(
        lookup_extent=0, serial_depth=10,
        stage_caps=tuple([n] * n_stages)))
    assert int(preds["pool_overflow"]) == 0
    for k in ("pos", "rot", "open"):
        assert np.isfinite(np.asarray(preds[k])).all(), k
    assert np.isfinite(float(losses["total"]))


def test_stage_caps_scaling_for_point_buckets():
    """Explicit caps are audited at the release num_points; smaller input
    capacities (eval point buckets) scale the schedule proportionally in
    patch-size multiples instead of flat-lining at n0."""
    from robot3dlotus_tpu.models.ptv3 import PointTransformerV3TPU
    m = PointTransformerV3TPU(
        enc_depths=(1, 1, 1, 1, 1), enc_channels=(8, 8, 8, 8, 8),
        enc_num_head=(1, 1, 1, 1, 1),
        enc_patch_size=(128, 128, 128, 128, 128),
        dec_depths=(1, 1, 1, 1), dec_channels=(8, 8, 8, 8),
        dec_num_head=(1, 1, 1, 1), dec_patch_size=(128, 128, 128, 128),
        stage_caps=(4096, 2304, 1024, 512, 256))
    assert m._stage_caps(4096) == [4096, 2304, 1024, 512, 256]
    assert m._stage_caps(8192) == [4096, 2304, 1024, 512, 256]
    caps_1k = m._stage_caps(1024)
    assert caps_1k[0] == 1024
    assert caps_1k[1] < 2304 and caps_1k[1] >= 2304 * 1024 // 4096
    assert all(c % 128 == 0 for c in caps_1k)
    assert all(a >= b for a, b in zip(caps_1k, caps_1k[1:]))

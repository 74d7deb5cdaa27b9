"""Golden tests for the disc-position codec vs the reference
(genrobo3d/utils/action_position_utils.py: numpy+einops, importable)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import add_reference_to_path, reference_available
from robot3dlotus_tpu.ops.pos_codec import (
    disc_pos_gt_prob_np, best_pos_from_disc_logits,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

if reference_available():
    add_reference_to_path()
    from genrobo3d.utils.action_position_utils import (  # noqa: E402
        get_disc_gt_pos_prob, get_best_pos_from_disc_pos,
    )


def make_cloud(n=200, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    gt = xyz[rng.randint(n)] + rng.uniform(-0.02, 0.02, 3).astype(np.float32)
    return xyz, gt.astype(np.float32)


@pytest.mark.parametrize("heatmap_type", ["plain", "dist"])
def test_gt_prob_matches_reference(heatmap_type):
    xyz, gt = make_cloud()
    ref = get_disc_gt_pos_prob(
        xyz, gt, pos_bin_size=0.01, pos_bins=40, heatmap_type=heatmap_type
    )
    ours = disc_pos_gt_prob_np(
        xyz, gt, pos_bin_size=0.01, pos_bins=40, heatmap_type=heatmap_type
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gt_prob_robot_mask():
    xyz, gt = make_cloud(seed=1)
    robot_idxs = np.arange(0, 50)
    ref = get_disc_gt_pos_prob(
        xyz, gt, pos_bin_size=0.01, pos_bins=40, heatmap_type="dist",
        robot_point_idxs=robot_idxs,
    )
    ours = disc_pos_gt_prob_np(
        xyz, gt, pos_bin_size=0.01, pos_bins=40, heatmap_type="dist",
        robot_point_idxs=robot_idxs,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_gt_prob_degenerate_axis():
    # target far from every point on one axis -> nearest-candidate fallback
    xyz, _ = make_cloud(seed=2)
    gt = np.array([5.0, 0.0, 0.0], np.float32)
    ref = get_disc_gt_pos_prob(xyz, gt, pos_bins=40, heatmap_type="dist")
    ours = disc_pos_gt_prob_np(xyz, gt, pos_bins=40, heatmap_type="dist")
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("best", ["max", "ens1"])
def test_decode_matches_reference(best):
    rng = np.random.RandomState(3)
    n, pos_bins = 150, 40
    xyz = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    logits = rng.randn(3, n, 2 * pos_bins).astype(np.float32) * 2

    flat = logits.reshape(3, -1)
    prob = np.exp(flat - flat.max(-1, keepdims=True))
    prob = prob / prob.sum(-1, keepdims=True)
    ref = get_best_pos_from_disc_pos(
        prob, xyz, pos_bin_size=0.01, pos_bins=pos_bins, best=best
    )
    ours = np.asarray(best_pos_from_disc_logits(
        jnp.asarray(logits), jnp.asarray(xyz),
        pos_bin_size=0.01, pos_bins=pos_bins, best=best,
    ))
    np.testing.assert_allclose(ours, np.asarray(ref, np.float32), atol=1e-5)


def test_decode_respects_mask():
    rng = np.random.RandomState(4)
    n, pos_bins = 64, 10
    xyz = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    logits = rng.randn(3, n, 2 * pos_bins).astype(np.float32)
    # boost an invalid point's logits; mask must suppress it
    logits[:, -1, :] += 100.0
    mask = np.ones(n, bool)
    mask[-1] = False
    full = np.asarray(best_pos_from_disc_logits(
        jnp.asarray(logits), jnp.asarray(xyz), pos_bins=pos_bins))
    masked = np.asarray(best_pos_from_disc_logits(
        jnp.asarray(logits), jnp.asarray(xyz), mask=jnp.asarray(mask),
        pos_bins=pos_bins))
    ref_masked = np.asarray(best_pos_from_disc_logits(
        jnp.asarray(logits[:, :-1]), jnp.asarray(xyz[:-1]),
        pos_bins=pos_bins))
    assert not np.allclose(full, masked)
    np.testing.assert_allclose(masked, ref_masked, atol=1e-6)


def test_disc_pos_gt_prob_device_matches_host():
    """disc_pos_gt_prob_jnp (built inside the train step, verdict item 3)
    vs the host reference-twin disc_pos_gt_prob_np, on padded clouds with
    robot points, both heatmap types, including the zero-support fallback."""
    import jax.numpy as jnp
    from robot3dlotus_tpu.ops.pos_codec import (
        disc_pos_gt_prob_jnp, disc_pos_gt_prob_np,
    )

    rng = np.random.RandomState(3)
    N, n, pos_bins = 64, 50, 6
    xyz = rng.uniform(-0.3, 0.3, (N, 3)).astype(np.float32)
    valid = np.arange(N) < n
    robot_idxs = rng.choice(n, 7, replace=False)
    robot_mask = np.zeros(N, bool)
    robot_mask[robot_idxs] = True

    for heatmap_type in ("plain", "dist"):
        for gt in (xyz[5] + 0.004,          # in-support target
                   np.array([9.0, 9.0, 9.0], np.float32)):  # zero support
            host = disc_pos_gt_prob_np(
                xyz[:n], gt.astype(np.float32), pos_bin_size=0.01,
                pos_bins=pos_bins, heatmap_type=heatmap_type,
                robot_point_idxs=robot_idxs)  # (3, n*nb)
            dev = np.asarray(disc_pos_gt_prob_jnp(
                jnp.asarray(xyz), jnp.asarray(valid), jnp.asarray(gt),
                robot_mask=jnp.asarray(robot_mask), pos_bin_size=0.01,
                pos_bins=pos_bins, heatmap_type=heatmap_type))
            nb = 2 * pos_bins
            dev_rows = dev.reshape(3, N, nb)
            np.testing.assert_allclose(
                dev_rows[:, :n].reshape(3, -1), host, atol=1e-6,
                err_msg=f"{heatmap_type} gt={gt}")
            assert np.abs(dev_rows[:, n:]).sum() == 0.0  # padding: no mass
            np.testing.assert_allclose(dev.sum(-1), 1.0, atol=1e-5)


def test_build_disc_pos_targets_batched():
    """Batched/trajectory wrappers produce the same rows as the host builder,
    and the loss computed from device-built targets equals the loss from
    collated host probs."""
    import jax.numpy as jnp
    from robot3dlotus_tpu.models.simple_policy import build_disc_pos_targets
    from robot3dlotus_tpu.ops.pos_codec import disc_pos_gt_prob_np

    rng = np.random.RandomState(4)
    B, N, pos_bins = 3, 32, 4
    nb = 2 * pos_bins
    xyz = rng.uniform(-0.2, 0.2, (B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[1, 20:] = False
    robot = (rng.rand(B, N) < 0.2) & mask
    gt = rng.uniform(-0.2, 0.2, (B, 3)).astype(np.float32)

    batch = {"pc_fts": jnp.asarray(xyz), "pc_mask": jnp.asarray(mask),
             "pc_robot_mask": jnp.asarray(robot)}
    act = {"pos_bin_size": 0.01, "pos_heatmap_type": "dist"}
    out = np.asarray(build_disc_pos_targets(
        batch, jnp.asarray(gt), pos_bins, act))  # (B, 3, N*nb)
    for b in range(B):
        nvalid = int(mask[b].sum())
        host = disc_pos_gt_prob_np(
            xyz[b, :nvalid], gt[b], pos_bin_size=0.01, pos_bins=pos_bins,
            heatmap_type="dist",
            robot_point_idxs=np.where(robot[b, :nvalid])[0])
        np.testing.assert_allclose(
            out[b].reshape(3, N, nb)[:, :nvalid].reshape(3, -1), host,
            atol=1e-6)

    # trajectory form (B, L, 3)
    L = 2
    gtl = rng.uniform(-0.2, 0.2, (B, L, 3)).astype(np.float32)
    outl = np.asarray(build_disc_pos_targets(
        batch, jnp.asarray(gtl), pos_bins, act))  # (B, L, 3, N*nb)
    assert outl.shape == (B, L, 3, N * nb)
    np.testing.assert_allclose(
        outl[:, 0], np.asarray(build_disc_pos_targets(
            batch, jnp.asarray(gtl[:, 0]), pos_bins, act)), atol=1e-7)

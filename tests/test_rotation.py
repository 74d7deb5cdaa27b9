"""Golden tests for jnp rotation codecs vs scipy and the reference's
discrete-euler codecs (genrobo3d/utils/rotation_transform.py)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from tests.conftest import add_reference_to_path, reference_available
from robot3dlotus_tpu.ops import rotation as rot


def rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    return (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)


def test_quat_to_matrix_matches_scipy():
    q = rand_quats(256)
    ours = np.asarray(rot.quat_to_matrix(jnp.asarray(q)))
    ref = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_to_quat_roundtrip():
    q = rand_quats(256, seed=1)
    m = R.from_quat(q).as_matrix().astype(np.float32)
    ours = np.asarray(rot.matrix_to_quat(jnp.asarray(m)))
    # sign-insensitive comparison
    dot = np.abs(np.sum(ours * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_euler_matches_scipy():
    q = rand_quats(512, seed=2)
    ours = np.asarray(rot.quat_to_euler(jnp.asarray(q), degrees=True))
    ref = R.from_quat(q).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_euler_to_quat_matches_scipy():
    rng = np.random.RandomState(3)
    e = rng.uniform(-180, 180, size=(256, 3)).astype(np.float32)
    ours = np.asarray(rot.euler_to_quat(jnp.asarray(e), degrees=True))
    ref = R.from_euler("xyz", e, degrees=True).as_quat()
    dot = np.abs(np.sum(ours * ref, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_euler_gimbal_lock_convention():
    # beta = +/-90: scipy zeroes the third angle for extrinsic xyz
    e = np.array([[33.0, 90.0, 0.0], [-21.0, -90.0, 0.0],
                  [10.0, 90.0, 25.0], [10.0, -90.0, 25.0]])
    m = R.from_euler("xyz", e, degrees=True).as_matrix()
    ours = np.asarray(rot.matrix_to_euler(jnp.asarray(m), degrees=True))
    ref = R.from_matrix(m).as_euler("xyz", degrees=True)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_rot6d_roundtrip():
    q = rand_quats(128, seed=4)
    m = R.from_quat(q).as_matrix().astype(np.float32)
    r6 = np.asarray(rot.matrix_to_rot6d(jnp.asarray(m)))
    m2 = np.asarray(rot.rot6d_to_matrix(jnp.asarray(r6)))
    np.testing.assert_allclose(m2, m, atol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="no reference")
def test_discrete_euler_matches_reference():
    add_reference_to_path()
    from genrobo3d.utils.rotation_transform import (
        quaternion_to_discrete_euler, discrete_euler_to_quaternion,
    )
    q = rand_quats(512, seed=5).astype(np.float64)
    # avoid points exactly at the sensitive boundary to dodge FP round-off
    ref_bins = np.stack(
        [quaternion_to_discrete_euler(x, 5) for x in q], 0
    )
    ours = np.asarray(rot.quat_to_discrete_euler(jnp.asarray(q), 5))
    # allow <=2% off-by-one (bin-edge rounding under fp32 vs fp64)
    mismatch = (ours != ref_bins)
    frac = mismatch.mean()
    assert frac <= 0.02, f"bin mismatch fraction {frac}"
    if mismatch.any():
        diff = np.abs(ours[mismatch].astype(int) - ref_bins[mismatch])
        nbins = 72
        diff = np.minimum(diff, nbins - diff)
        assert diff.max() <= 1

    disc = np.stack([quaternion_to_discrete_euler(x, 5) for x in q], 0)
    ref_q = np.stack([discrete_euler_to_quaternion(d, 5) for d in disc], 0)
    ours_q = np.asarray(rot.discrete_euler_to_quat(jnp.asarray(disc), 5))
    dot = np.abs(np.sum(ours_q * ref_q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)

"""Golden tests: our JAX SFC codecs vs the reference's torch implementations
(genrobo3d/models/PointTransformerV3/serialization/{z_order,hilbert,default}.py),
which are pure torch and importable on CPU."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import add_reference_to_path, reference_available
from robot3dlotus_tpu.ops.serialization import (
    z_order_encode, hilbert_encode, sfc_encode, serialize_codes,
    argsort_with_inverse,
)

if reference_available():
    add_reference_to_path()
    import torch
    from genrobo3d.models.PointTransformerV3.serialization.default import (
        encode as ref_encode,
    )

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def rand_grid(n, depth, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2 ** depth, size=(n, 3)).astype(np.int32)


@pytest.mark.parametrize("depth", [4, 7, 10])
@pytest.mark.parametrize("order", ["z", "z-trans", "hilbert", "hilbert-trans"])
def test_codes_match_reference(depth, order):
    gc = rand_grid(512, depth, seed=depth * 31)
    ref = ref_encode(torch.from_numpy(gc), batch=None, depth=depth, order=order)
    ours = sfc_encode(jnp.asarray(gc), order, depth)
    np.testing.assert_array_equal(np.asarray(ours, dtype=np.int64), ref.numpy())


def test_corner_cases():
    depth = 10
    gc = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [2 ** depth - 1] * 3, [2 ** depth - 1, 0, 0]],
        dtype=np.int32,
    )
    for order in ["z", "hilbert"]:
        ref = ref_encode(torch.from_numpy(gc), batch=None, depth=depth, order=order)
        ours = sfc_encode(jnp.asarray(gc), order, depth)
        np.testing.assert_array_equal(np.asarray(ours, dtype=np.int64), ref.numpy())


def test_zorder_is_prefix_stable_under_shift():
    # parent code == child code >> 3 (needed by SerializedPooling semantics,
    # reference model.py:726).
    depth = 8
    gc = rand_grid(256, depth, seed=0)
    child = np.asarray(z_order_encode(jnp.asarray(gc), depth))
    parent = np.asarray(z_order_encode(jnp.asarray(gc >> 1), depth - 1))
    np.testing.assert_array_equal(child >> 3, parent)


def test_hilbert_is_prefix_stable_under_shift():
    depth = 8
    gc = rand_grid(256, depth, seed=1)
    child = np.asarray(hilbert_encode(jnp.asarray(gc), depth))
    parent = np.asarray(hilbert_encode(jnp.asarray(gc >> 1), depth - 1))
    np.testing.assert_array_equal(child >> 3, parent)


def test_serialize_codes_padding_sorts_last():
    depth = 6
    gc = np.stack([rand_grid(64, depth, seed=2), rand_grid(64, depth, seed=3)])
    mask = np.ones((2, 64), bool)
    mask[0, 50:] = False
    codes = serialize_codes(jnp.asarray(gc), jnp.asarray(mask), depth)
    order, inverse = argsort_with_inverse(codes)
    order0 = np.asarray(order[0, 0])  # first order, first cloud
    assert set(order0[50:].tolist()) == set(range(50, 64))
    # inverse really inverts
    inv0 = np.asarray(inverse[0, 0])
    np.testing.assert_array_equal(order0[inv0], np.arange(64))


@pytest.mark.parametrize("depth", [4, 7, 10])
@pytest.mark.parametrize("order", ["z", "z-trans", "hilbert", "hilbert-trans"])
def test_np_twins_bit_match_jnp(depth, order):
    """Host (numpy) encoders — used for eval-time presorting — are
    bit-identical to the device codecs."""
    from robot3dlotus_tpu.ops.serialization import sfc_encode_np
    gc = rand_grid(512, depth, seed=11)
    dev = np.asarray(sfc_encode(jnp.asarray(gc), order, depth))
    host = sfc_encode_np(gc, order, depth)
    np.testing.assert_array_equal(host, dev)

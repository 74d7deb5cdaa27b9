"""One-hot MXU row-permute kernel (ops/pallas_gather.py): exactness vs the
XLA take_along_axis path, VJP correctness with duplicated indices (the
duplicate-pad scheme maps several output rows to one source), and the
fallback guards."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robot3dlotus_tpu.ops.pallas_gather import (
    permute_rows, permute_available, _take_rows,
)

IMPL = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"


def _setup(B=3, N=256, C=40, M=None, seed=0):
    rng = np.random.RandomState(seed)
    M = M or N
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = np.stack([rng.randint(0, N, M) for _ in range(B)])  # duplicates
    return x, jnp.asarray(idx.astype(np.int32)), rng


def test_forward_matches_xla():
    x, idx, _ = _setup()
    out = permute_rows(x, idx, impl=IMPL)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_take_rows(x, idx)))


def test_forward_m_not_equal_n():
    x, idx, _ = _setup(N=256, M=128)
    out = permute_rows(x, idx, impl=IMPL)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(_take_rows(x, idx)))


def test_vjp_sums_duplicates():
    x, idx, rng = _setup()
    g = jnp.asarray(rng.randn(*x.shape[:1], idx.shape[1], x.shape[2])
                    .astype(np.float32))

    def loss(fn):
        return lambda a: jnp.sum(fn(a) * g)

    dx_p = jax.grad(loss(lambda a: permute_rows(a, idx, impl=IMPL)))(x)
    dx_x = jax.grad(loss(lambda a: _take_rows(a, idx)))(x)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                               atol=1e-5, rtol=1e-5)
    # duplicated index rows accumulate > 1 cotangent
    counts = np.zeros((x.shape[0], x.shape[1]))
    for b in range(x.shape[0]):
        np.add.at(counts[b], np.asarray(idx)[b], 1)
    assert (counts > 1).any()


def test_fallbacks():
    x, idx, _ = _setup()
    assert permute_available(x, idx)
    assert not permute_available(x.astype(jnp.int32), idx)  # non-float
    big = jnp.zeros((1, 8192, 1024), jnp.float32)           # > VMEM budget
    assert not permute_available(big, jnp.zeros((1, 8192), jnp.int32))
    # impl='auto' silently uses XLA for those
    out = permute_rows(x.astype(jnp.int32), idx, impl="auto")
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(_take_rows(x.astype(jnp.int32), idx)))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_on_chip_exact_bf16():
    x, idx, rng = _setup(B=4, N=512, C=96)
    xb = x.astype(jnp.bfloat16)
    out = jax.jit(lambda a: permute_rows(a, idx, impl="pallas"))(xb)
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(_take_rows(xb, idx).astype(jnp.float32)))


def test_smallc_gather_matches_xla():
    """Two-level (sqrt-N) one-hot gather for tiny channel counts (the stem
    conv's (B, N*K) tap gather): exact vs take_along_axis, including
    out-of-range sentinel indices (N) which must yield zeros."""
    from robot3dlotus_tpu.ops.pallas_gather import gather_rows_smallc
    rng = np.random.RandomState(0)
    B, N, C, M = 2, 256, 8, 1024
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = rng.randint(0, N, (B, M))
    idx[:, :5] = N  # sentinel: no neighbor -> gathers zeros
    idx = jnp.asarray(idx.astype(np.int32))
    out = gather_rows_smallc(x, idx, interpret=True)
    ref = np.array(_take_rows(x, jnp.clip(idx, 0, N - 1)))
    ref[np.asarray(idx) == N] = 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_smallc_gather_vjp():
    """Two-level gather custom VJP: scatter-add of cotangents (duplicates
    sum; sentinel indices contribute nothing) vs XLA autodiff."""
    from robot3dlotus_tpu.ops.pallas_gather import gather_rows_smallc
    rng = np.random.RandomState(1)
    B, N, C, M = 2, 256, 24, 512
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = rng.randint(0, N, (B, M))
    idx[:, :4] = idx[:, 4:8]  # duplicates
    idx[:, 100] = N           # sentinel
    idx = jnp.asarray(idx.astype(np.int32))
    g = jnp.asarray(rng.randn(B, M, C).astype(np.float32))

    dx_p = jax.grad(lambda a: jnp.sum(
        gather_rows_smallc(a, idx, interpret=True) * g))(x)
    safe = jnp.clip(idx, 0, N - 1)
    live = (idx < N).astype(np.float32)[..., None]
    dx_x = jax.grad(lambda a: jnp.sum(
        _take_rows(a, safe) * g * live))(x)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                               atol=1e-5, rtol=1e-5)


def test_smallc_tile_caps_by_channels():
    """The (P, C*128) fp32 intermediates must fit VMEM: the tile shrinks
    as C grows (full 1024 at the release stem's C=8) and disqualifies
    shapes where no dividing tile fits."""
    from robot3dlotus_tpu.ops.pallas_gather import _smallc_tile
    assert _smallc_tile(4096 * 27, 8) == 1024
    assert _smallc_tile(4096 * 27, 16) <= 512
    assert _smallc_tile(4096 * 27, 32) <= 256
    # a prime M larger than the cap has no qualifying tile
    assert _smallc_tile(104729, 32) is None


def test_gather_rows_smallc_fallback_sentinel_zeros():
    """The XLA fallback (N not a multiple of 128) must honor the
    sentinel contract: idx == N gathers ZERO rows with zero gradient —
    plain take_along_axis would clamp to row N-1 and leak its grad."""
    import jax
    from robot3dlotus_tpu.ops.pallas_gather import gather_rows_smallc

    N = 100  # not a multiple of 128 -> fallback path
    x = jnp.asarray(np.random.RandomState(0).randn(1, N, 4), jnp.float32)
    idx = jnp.asarray([[0, 5, N, N - 1]])  # one sentinel
    out = gather_rows_smallc(x, idx)
    np.testing.assert_array_equal(np.asarray(out[0, 2]), np.zeros(4))
    np.testing.assert_array_equal(np.asarray(out[0, 3]),
                                  np.asarray(x[0, N - 1]))

    g = jax.grad(lambda a: gather_rows_smallc(a, idx)[0, 2].sum())(x)
    assert float(jnp.abs(g).sum()) == 0.0, \
        "sentinel tap leaked gradient into a real row"


def test_permute_rows_forced_pallas_raises_on_unqualified():
    import pytest as _pytest
    from robot3dlotus_tpu.ops.pallas_gather import permute_rows
    x_int = jnp.zeros((1, 8, 4), jnp.int32)  # non-float disqualifies
    idx = jnp.zeros((1, 8), jnp.int32)
    with _pytest.raises(ValueError, match="forced"):
        permute_rows(x_int, idx, impl="pallas")


def test_scatter_rows_add_matches_segment_sum():
    """scatter_rows_add == duplicate-accumulating segment add, with
    out-of-range (sentinel n) rows dropped — on the XLA fallback path and
    in pallas interpret mode (the far-link scatter of ops/pallas_conv.py)."""
    from robot3dlotus_tpu.ops.pallas_gather import scatter_rows_add
    rng = np.random.RandomState(4)
    B, M, N, C = 2, 128, 64, 8
    g = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    idx = rng.randint(0, N + 1, (B, M))  # N = sentinel, must drop
    ref = np.zeros((B, N, C), np.float32)
    for b in range(B):
        for m in range(M):
            if idx[b, m] < N:
                ref[b, idx[b, m]] += np.asarray(g)[b, m]
    for interp in (False, True):
        out = scatter_rows_add(g, jnp.asarray(idx), N, interpret=interp)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5, err_msg=f"interpret={interp}")

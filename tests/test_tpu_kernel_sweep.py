"""Real-TPU Mosaic compile + numerics sweep over every kernel shape the
release configs reach (VERDICT r03 item 2: the r03 bench crash was a
Mosaic-illegal block that only interpret-mode tests could miss).

Runs only with GRAFT_TEST_TPU=1 (tests/conftest.py leaves the TPU platform
active) on a machine with an attached chip:

    GRAFT_TEST_TPU=1 python -m pytest tests/test_tpu_kernel_sweep.py -q

Shapes covered (reference spconv call sites: model.py:845-852 stem k=5,
:616-622 CPE k=3 at every stage width):
  - CPE conv K=27 at Cin=Cout in {64,128,256,512,768}  (enc_channels of
    configs/rlbench/simple_policy_ptv3.yaml:87; dec widths are a subset)
  - stem conv K=125 at Cin=7 (simple policy) and Cin=20 (motion planner,
    4 feat + 16 label-embed channels)
in both fp32 and bf16, forward AND the custom-vjp backward (dx rides the
forward kernel with mirrored weights; dW is its own pallas_call), plus the
release patch-attention shape.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="real-TPU Mosaic lowering sweep (set GRAFT_TEST_TPU=1)")


def _cloud(rng, B, N, span):
    gcs = []
    for _ in range(B):
        seen, pts = set(), []
        while len(pts) < N:
            c = tuple(rng.randint(0, span, 3))
            if c not in seen:
                seen.add(c)
                pts.append(c)
        gcs.append(pts)
    return jnp.asarray(np.array(gcs, np.int32))


# (kernel_size, Cin, Cout) reached by the release configs
CONV_SHAPES = [
    (3, 64, 64), (3, 128, 128), (3, 256, 256), (3, 512, 512), (3, 768, 768),
    (5, 7, 64), (5, 20, 64),
]
DTYPES = [jnp.float32, jnp.bfloat16]


@pytest.mark.parametrize("dtype", DTYPES, ids=["f32", "bf16"])
@pytest.mark.parametrize("k,cin,cout", CONV_SHAPES)
def test_windowed_conv_compiles_and_matches_xla(k, cin, cout, dtype):
    from robot3dlotus_tpu.ops.sparse_conv import subm_conv_apply
    from robot3dlotus_tpu.ops.pallas_conv import (
        build_window_map, subm_conv_windowed)
    rng = np.random.RandomState(0)
    B, N = 1, 256
    gc = _cloud(rng, B, N, span=12)  # dense cloud: real 27-neighborhoods
    mask = jnp.asarray(np.arange(N)[None] < np.array([N - 19])[:, None])
    feat = jnp.asarray(
        rng.randn(B, N, cin).astype(np.float32) * np.asarray(mask)[..., None]
    ).astype(dtype)
    w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.1
                    ).astype(dtype)
    # halo=64 with N=256: window == N (no far links) — the sweep targets the
    # pallas_call lowering, the far path is plain XLA
    wmap = build_window_map(gc, mask, k, 4, halo=64)

    out = jax.jit(lambda f, w: subm_conv_windowed(f, wmap, w))(feat, w)
    ref = jax.jit(lambda f, w: subm_conv_apply(f, wmap.nmap, w))(feat, w)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    err = np.max(np.abs(np.asarray(out, np.float32)
                        - np.asarray(ref, np.float32)))
    scale = max(np.max(np.abs(np.asarray(ref, np.float32))), 1.0)
    assert err / scale < tol, (k, cin, cout, dtype, err, scale)


@pytest.mark.parametrize("k,cin,cout", CONV_SHAPES)
def test_windowed_conv_grads_compile_and_match_xla(k, cin, cout):
    from robot3dlotus_tpu.ops.sparse_conv import subm_conv_apply
    from robot3dlotus_tpu.ops.pallas_conv import (
        build_window_map, subm_conv_windowed)
    rng = np.random.RandomState(1)
    B, N = 1, 256
    gc = _cloud(rng, B, N, span=12)
    mask = jnp.asarray(np.ones((B, N), bool))
    feat = jnp.asarray(rng.randn(B, N, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k ** 3, cin, cout).astype(np.float32) * 0.1)
    wmap = build_window_map(gc, mask, k, 4, halo=64)

    def loss_win(f, w):
        return jnp.sum(subm_conv_windowed(f, wmap, w) ** 2)

    def loss_xla(f, w):
        return jnp.sum(subm_conv_apply(f, wmap.nmap, w) ** 2)

    g = jax.jit(jax.grad(loss_win, argnums=(0, 1)))(feat, w)
    gr = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(feat, w)
    for a, b, name in zip(g, gr, ("dx", "dW")):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.max(np.abs(b)), 1.0)
        assert np.max(np.abs(a - b)) / scale < 5e-4, (k, cin, cout, name)


@pytest.mark.parametrize("dtype", DTYPES, ids=["f32", "bf16"])
def test_release_window_with_far_path_on_chip(dtype):
    """Stage-0 release geometry: N=4096 at halo 64 (Wn=256 windows, T=32
    tiles) with the k-grouped far path ACTIVE — the exact configuration the
    release backbone now runs, including the far gather/bmm/segment-sum
    and the windowed backward."""
    from robot3dlotus_tpu.ops.sparse_conv import subm_conv_apply
    from robot3dlotus_tpu.ops.pallas_conv import (
        build_window_map, subm_conv_windowed)
    rng = np.random.RandomState(3)
    B, N, C = 1, 4096, 64
    gc = _cloud(rng, B, N, span=32)
    mask = jnp.asarray(np.ones((B, N), bool))
    feat = jnp.asarray(rng.randn(B, N, C).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1
                    ).astype(dtype)
    wmap = build_window_map(gc, mask, 3, 6, halo=64, far_capacity=1024)
    assert wmap.window == 256 and wmap.window < N
    assert int(jnp.max(wmap.far_dropped)) == 0
    assert int(jnp.sum(wmap.far_ok)) > 0

    out = jax.jit(lambda f, w: subm_conv_windowed(f, wmap, w))(feat, w)
    ref = jax.jit(lambda f, w: subm_conv_apply(f, wmap.nmap, w))(feat, w)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-4
    err = np.max(np.abs(np.asarray(out, np.float32)
                        - np.asarray(ref, np.float32)))
    scale = max(np.max(np.abs(np.asarray(ref, np.float32))), 1.0)
    assert err / scale < tol, (dtype, err, scale)
    if dtype == jnp.float32:
        g = jax.jit(jax.grad(
            lambda f, w: jnp.sum(subm_conv_windowed(f, wmap, w) ** 2),
            argnums=(0, 1)))(feat, w)
        gr = jax.jit(jax.grad(
            lambda f, w: jnp.sum(subm_conv_apply(f, wmap.nmap, w) ** 2),
            argnums=(0, 1)))(feat, w)
        for a, b, name in zip(g, gr, ("dx", "dW")):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.max(np.abs(b)), 1.0)
            assert np.max(np.abs(a - b)) / scale < 5e-4, name


@pytest.mark.parametrize("dtype", DTYPES, ids=["f32", "bf16"])
def test_patch_attention_compiles_release_shape(dtype):
    """Release attention shape: P=128 patches, H=8? heads vary per stage —
    compile the widest (stage-4: 768 ch, head dim 48) and the narrowest."""
    from robot3dlotus_tpu.ops.pallas_attention import (
        patch_attention, _xla_reference)
    rng = np.random.RandomState(2)
    for H, Dh in ((4, 16), (16, 48)):
        G, P = 4, 128
        q, k, v = (jnp.asarray(rng.randn(G, H, P, Dh).astype(np.float32) * .3
                               ).astype(dtype) for _ in range(3))
        valid = np.ones((G, P), bool)
        valid[0, 90:] = False
        valid = jnp.asarray(valid)
        scale = Dh ** -0.5
        out = jax.jit(lambda q, k, v: patch_attention(q, k, v, valid, scale)
                      )(q, k, v)
        ref = _xla_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                             v.astype(jnp.float32), valid, scale)
        tol = 3e-2 if dtype == jnp.bfloat16 else 2e-4
        err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref)))
        assert err < tol, (H, Dh, dtype, err)

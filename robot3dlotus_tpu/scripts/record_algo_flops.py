"""Record the ALGORITHMIC FLOPs of the release train step.

The one-hot/windowed Pallas kernel family trades extra MXU FLOPs for
avoiding XLA's scattered gathers, so the train step's own cost analysis
overstates algorithmic work (VERDICT weak #3). bench.py reports
`flops_algorithmic` from BENCH_FLOPS_XLA.json when a plain-XLA figure for
the same (model, B, N, dtype) has been recorded; normally a
`BENCH_IMPL=xla` bench run on the device records it, but the figure is a
property of the HLO, not the backend — this script computes it from an
AOT CPU lowering (the kernel family auto-disables off-TPU,
ops/pallas_attention.py use_pallas), no device or execution needed.

Run from the repo root:
    python -m robot3dlotus_tpu.scripts.record_algo_flops [simple|motion]

Self-configuring like __graft_entry__.dryrun_multichip: re-execs a clean
CPU subprocess with the axon TPU sitecustomize scrubbed from PYTHONPATH.
"""
import json
import os
import sys


def _impl(kind: str) -> None:
    import jax
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    import __graft_entry__ as g
    from robot3dlotus_tpu.train.trainer import (
        create_train_state, make_train_step,
    )

    B = int(os.environ.get("BENCH_BATCH", "16"))
    N = int(os.environ.get("BENCH_POINTS", "4096"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    if kind == "motion":
        from robot3dlotus_tpu.models.motion_planner import (
            MotionPlannerTPU, compute_mp_loss as compute_loss,
        )
        act = dict(g.RELEASE_ACT, max_traj_len=5, traj_embed_size=64,
                   pc_label_channels=16)
        model = MotionPlannerTPU(
            ptv3_cfg=dict(g.RELEASE_PTV3, compute_dtype=dtype),
            act_cfg=act, variant="ca")
        batch = g._fake_mp_batch(B=B, N=N, pos_bins=act["pos_bins"])
    else:
        from robot3dlotus_tpu.models.simple_policy import (
            SimplePolicyTPU, compute_loss,
        )
        act = g.RELEASE_ACT
        model = SimplePolicyTPU(
            ptv3_cfg=dict(g.RELEASE_PTV3, compute_dtype=dtype),
            act_cfg=act, variant="ca")
        batch = g._fake_batch(B=B, N=N, T=16, pos_bins=act["pos_bins"])
    train_cfg = dict(learning_rate=1e-4, lr_sched="cosine",
                     warmup_steps=2000, num_train_steps=150000,
                     weight_decay=0.05, grad_norm=10, optim="adamw",
                     betas=[0.9, 0.98])

    # Abstract everything: eval_shape through state creation so the release
    # model is never materialized, then AOT-lower the train step from
    # ShapeDtypeStructs. cost_analysis needs the optimized HLO (compile()),
    # not execution.
    rng = jax.random.PRNGKey(0)
    batch_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)
    # the concrete batch rides as a closure constant (init slices it for
    # its shrunk-shape init); only the rng is an abstract argument
    state_abs = jax.eval_shape(
        lambda r: create_train_state(model, batch, train_cfg, r)[0], rng)
    step_fn = make_train_step(
        model, lambda preds, b: compute_loss(preds, b, act, g.LOSS_CFG),
        mesh=None, donate=True)
    print(f"record_algo_flops: lowering {kind} B={B} N={N} {dtype}...",
          flush=True)
    lowered = step_fn.lower(state_abs, batch_abs, rng)
    print("record_algo_flops: compiling (optimized-HLO cost analysis)...",
          flush=True)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    assert flops > 0, ca

    key = f"{kind}-B{B}-N{N}-{dtype}"
    path = os.path.join(repo, "BENCH_FLOPS_XLA.json")
    book = {}
    if os.path.exists(path):
        try:
            book = json.load(open(path))
        except Exception:
            book = {}
    book[key] = flops
    book["_provenance"] = (
        "AOT XLA cost analysis of the plain-XLA (no Pallas/one-hot) train "
        "step; CPU-backend lowering via record_algo_flops.py — the FLOP "
        "count is an HLO property, no execution involved")
    with open(path, "w") as f:
        json.dump(book, f, indent=1, sort_keys=True)
    print(f"record_algo_flops: {key} = {flops:.4g} ({flops/1e12:.3f} T) "
          f"-> {path}")


def main() -> None:
    kind = sys.argv[1] if len(sys.argv) > 1 else "simple"
    if os.environ.get("_ALGO_FLOPS_CHILD") == "1":
        _impl(kind)
        return
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["_ALGO_FLOPS_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo  # drop /root/.axon_site (TPU sitecustomize)
    env.pop("JAX_PLATFORM_NAME", None)
    proc = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__), kind],
        env=env, cwd=repo, text=True, timeout=3600)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()

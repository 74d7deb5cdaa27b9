"""Optimizer + LR schedule construction (optax).

Parity targets:
  * schedules: reference train/optim/sched.py (noam/linear/inverse_sqrt/
    cosine/cosine_cycle/stepwise with linear warmup; decay-rate floor 1e-5,
    sched.py:95-113).
  * param groups: no weight decay for biases and norm parameters
    (optim/misc.py:13-55). In this flax tree that means every leaf named
    'bias' and the 'scale'/'bias' leaves of norm modules.
  * optimizers: adam/adamax/adamw plus the reference's extra family —
    RAdam (optim/radam.py:7-84), Ralamb = RAdam+LARS trust ratio
    (optim/ralamb.py:5-98), Lookahead wrapper (optim/lookahead.py:12-55),
    RangerLars = Lookahead(Ralamb) (optim/rangerlars.py:12-14) — rebuilt
    as optax gradient transformations (tree-mapped, jit-traceable; no
    per-parameter Python state).
  * lr-multiplier param groups (optim/misc.py:26-32: 'rgb_encoder' lr
    multi) generalised to a {path-substring: multiplier} map.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lr_decay_rate(step, lr_sched, warmup_steps, num_train_steps,
                  num_cosine_cycles=None, lr_decay_step_size=None,
                  lr_decay_gamma=None):
    """Traceable decay-rate schedule with the reference's 1e-5 floor."""
    step = jnp.asarray(step, jnp.float32)
    w = float(max(warmup_steps, 1))
    t = float(max(num_train_steps, 1))
    warm = step / w

    if lr_sched == "linear":
        post = jnp.maximum(0.0, (t - step) / max(t - w, 1.0))
    elif lr_sched == "inverse_sqrt":
        post = (w ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
    elif lr_sched == "noam":
        post = (w ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
    elif lr_sched == "cosine":
        progress = (step - w) / max(t - w, 1.0)
        post = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    elif lr_sched == "cosine_cycle":
        c = float(num_cosine_cycles or 1)
        progress = (step - w) / max(t - w, 1.0)
        post = jnp.where(
            progress >= 1.0, 0.0,
            0.5 * (1.0 + jnp.cos(jnp.pi * ((c * progress) % 1.0))))
    elif lr_sched == "stepwise":
        post = lr_decay_gamma ** jnp.floor(step / lr_decay_step_size)
    else:
        raise NotImplementedError(lr_sched)

    rate = jnp.where(step < w, warm, post)
    return jnp.maximum(rate, 1e-5)


def _is_no_decay(path):
    # reference no_decay = ['bias', 'LayerNorm.bias', 'LayerNorm.weight']
    # (optim/misc.py:15): biases everywhere + norm affine params. In this
    # flax tree 'scale' leaves exist only on norm modules.
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    leaf = str(names[-1]) if names else ""
    return leaf in ("bias", "scale")


def decay_mask(params):
    """True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not _is_no_decay(path), params)


class _FlatAdamState(NamedTuple):
    count: jnp.ndarray
    mu: jnp.ndarray   # (Tpad,) f32 — one buffer for the whole tree
    nu: jnp.ndarray   # (Tpad,) f32


# flat-buffer pad granule: dim0 of the (Tpad,) moments divides any dp axis
# up to 4096, so zero1_leaf_spec can shard them (parallel/mesh.py)
_FLAT_PAD = 4096


def flat_adamw(params, lr_fn, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=0.0, mask_tree=None, max_norm=None,
               mult_tree=None):
    """AdamW over ONE flat parameter-sized buffer — elementwise-identical
    to optax.chain(clip_by_global_norm, adamw(mask), lr-multi/freeze
    scaling) but compiled as a handful of large fusions instead of ~2-3
    tiny ones per parameter leaf (421 leaves at the release config; the
    per-leaf launch overhead of ~20 us each put ~12 ms/step of optimizer
    time on an otherwise idle chip — BENCH_NOTES r05).

    The per-leaf structure is static, so weight-decay mask, lr
    multipliers, and freeze masks become piecewise-constant per-ELEMENT
    vectors baked at build time; update() concatenates the gradient leaves
    (one HLO), runs the whole update on the flat vector, and returns
    updates as static slices (XLA fuses slice+apply per leaf).

    Exactness notes vs the per-leaf chain: the global-norm clip sums
    squares in one reduction instead of per-leaf partial sums (different
    float association, ~1 ulp); everything else is elementwise-identical.
    The (Tpad,) moment buffers are zero-padded to a 4096 multiple so a
    ZeRO-1 dp axis can shard them (state_shardings / zero1_leaf_spec).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    dtypes = [l.dtype for l in leaves]
    total = sum(sizes)
    tpad = -(-total // _FLAT_PAD) * _FLAT_PAD

    def _piecewise(tree, default):
        """Per-leaf scalars -> a builder for the per-ELEMENT flat vector,
        constructed INSIDE the traced program (broadcast + concat of 421
        scalars — XLA fuses it into the consuming elementwise op). Baking
        it as a host constant instead embeds a params-sized literal in the
        HLO, which breaks serialized-compile transports (observed: the
        axon remote-compile tunnel rejects the program with HTTP 413)."""
        if tree is None:
            return None
        vals = jax.tree_util.tree_leaves(tree)
        assert len(vals) == len(leaves)
        if all(v == default for v in vals):
            return None

        def build():
            segs = [jnp.full((sz,), float(v), jnp.float32)
                    for v, sz in zip(vals, sizes)]
            if tpad != total:
                segs.append(jnp.zeros((tpad - total,), jnp.float32))
            return jnp.concatenate(segs)

        return build

    # all-True mask folds to plain scalar decay (wd_flat None)
    wd_flat = _piecewise(mask_tree, True) if weight_decay else None
    mult_flat = _piecewise(mult_tree, 1.0)

    def _flatten(tree):
        tl = jax.tree_util.tree_leaves(tree)
        flat = jnp.concatenate(
            [t.reshape(-1).astype(jnp.float32) for t in tl])
        if tpad != total:
            flat = jnp.pad(flat, (0, tpad - total))
        return flat

    def _unflatten(flat):
        outs, off = [], 0
        for sh, sz, dt in zip(shapes, sizes, dtypes):
            outs.append(flat[off:off + sz].reshape(sh).astype(dt))
            off += sz
        return jax.tree_util.tree_unflatten(treedef, outs)

    def init_fn(params):
        del params
        return _FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((tpad,), jnp.float32),
            nu=jnp.zeros((tpad,), jnp.float32))

    def update_fn(updates, state, params=None):
        g = _flatten(updates)
        if max_norm:
            gnorm = jnp.sqrt(jnp.sum(jnp.square(g)))
            g = g * (jnp.float32(max_norm) /
                     jnp.maximum(gnorm, jnp.float32(max_norm)))
        count_inc = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * jnp.square(g)
        c = count_inc.astype(jnp.float32)
        mhat = mu / (1.0 - jnp.float32(b1) ** c)
        nuhat = nu / (1.0 - jnp.float32(b2) ** c)
        u = mhat / (jnp.sqrt(nuhat) + eps)
        if weight_decay:
            p = _flatten(params)
            dec = weight_decay * p
            u = u + (dec * wd_flat() if wd_flat is not None else dec)
        lr = lr_fn(state.count)
        u = -lr * u
        if mult_flat is not None:
            u = u * mult_flat()
        return _unflatten(u), _FlatAdamState(count_inc, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class _RAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def _radam_coeffs(count, b1, b2):
    """Rectification coefficients of the reference RAdam (radam.py:50-68).

    Returns (n_sma, step_size) where step_size already folds in the
    (1-b2^t) factor and 1/(1-b1^t) bias correction, exactly as the
    reference computes it; when n_sma < 5 the step degrades to
    unrectified momentum-SGD with size 1/(1-b1^t).
    """
    t = count.astype(jnp.float32)
    b2t = b2 ** t
    n_max = 2.0 / (1.0 - b2) - 1.0
    n_sma = n_max - 2.0 * t * b2t / (1.0 - b2t)
    rect = jnp.sqrt(
        (1.0 - b2t) * (n_sma - 4.0) / (n_max - 4.0)
        * (n_sma - 2.0) / jnp.maximum(n_sma, 1e-8)
        * n_max / (n_max - 2.0))
    bias1 = 1.0 - b1 ** t
    step_size = jnp.where(n_sma >= 5.0, rect / bias1, 1.0 / bias1)
    return n_sma, step_size


def scale_by_radam_ref(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
                       decay_mask_tree=None):
    """Reference-semantics RAdam (optim/radam.py:20-84) as a single
    transformation. Emits updates in units of -lr * <step>; combine with
    optax.scale_by_learning_rate. Weight decay here is the reference's
    coupled form p -= wd*lr*p applied before the step, so it is folded
    into the emitted update (requires params)."""

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _RAdamState(
            jnp.zeros([], jnp.int32), zeros,
            jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        n_sma, step_size = _radam_coeffs(count, b1, b2)

        def leaf(m, v, p, wd_on):
            # emitted in "descent" units: scale_by_learning_rate applies -lr
            adaptive = m / (jnp.sqrt(v) + eps)
            step = jnp.where(n_sma >= 5.0, adaptive, m)
            out = step_size * step
            if weight_decay and wd_on:
                out = out + weight_decay * p
            return out

        if decay_mask_tree is not None and weight_decay:
            new_updates = jax.tree_util.tree_map(
                leaf, mu, nu, params, decay_mask_tree)
        else:
            new_updates = jax.tree_util.tree_map(
                lambda m, v, p: leaf(m, v, p, bool(weight_decay)),
                mu, nu, params)
        return new_updates, _RAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_ralamb_ref(b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
                        lr_fn=None, decay_mask_tree=None):
    """Reference Ralamb = RAdam step with a per-tensor LARS trust ratio
    (optim/ralamb.py:46-98). The trust ratio depends on the actual lr
    (candidate new-weight norm), so this transformation takes the lr
    schedule and emits the FINAL additive update (no outer lr scaling).

    trust = clamp(||p||, 0, 10) / ||p*(1-wd*lr) - lr*ss*step||   (1 if
    either norm is 0), applied only to the momentum term, matching the
    reference exactly.
    """
    assert lr_fn is not None

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _RAdamState(
            jnp.zeros([], jnp.int32), zeros,
            jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        lr = jnp.asarray(lr_fn(state.count), jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        n_sma, step_size = _radam_coeffs(count, b1, b2)

        def leaf(m, v, p, wd_on):
            step = jnp.where(n_sma >= 5.0, m / (jnp.sqrt(v) + eps), m)
            p_dec = p - (weight_decay * lr) * p if (weight_decay and wd_on) \
                else p
            cand = p_dec - lr * step_size * step
            radam_norm = jnp.sqrt(jnp.sum(cand.astype(jnp.float32) ** 2))
            weight_norm = jnp.clip(
                jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2)), 0.0, 10.0)
            trust = jnp.where(
                (weight_norm == 0.0) | (radam_norm == 0.0), 1.0,
                weight_norm / radam_norm)
            new_p = p_dec - lr * step_size * trust * step
            return new_p - p

        if decay_mask_tree is not None and weight_decay:
            new_updates = jax.tree_util.tree_map(
                leaf, mu, nu, params, decay_mask_tree)
        else:
            new_updates = jax.tree_util.tree_map(
                lambda m, v, p: leaf(m, v, p, bool(weight_decay)),
                mu, nu, params)
        return new_updates, _RAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class _LookaheadState(NamedTuple):
    count: jnp.ndarray
    initialized: jnp.ndarray
    slow: Any
    inner: Any


def lookahead_ref(base, alpha=0.5, k=6):
    """Reference Lookahead wrapper (optim/lookahead.py:12-55): every k
    fast steps, slow += alpha*(fast - slow) and fast snaps to slow.
    Quirk preserved: the slow buffer is created lazily AT the first sync
    (copying the then-current fast weights, lookahead.py:33-36), so the
    first sync is a no-op. Implemented over updates: fast = p + u; on
    sync steps the emitted update becomes slow_new - p."""

    def init_fn(params):
        return _LookaheadState(
            jnp.zeros([], jnp.int32), jnp.zeros([], bool),
            jax.tree_util.tree_map(jnp.array, params),
            base.init(params))

    def update_fn(updates, state, params=None):
        u, inner = base.update(updates, state.inner, params)
        count = state.count + 1
        sync = (count % k) == 0

        def leaf(p, du, s):
            fast = p + du
            s_eff = jnp.where(state.initialized, s, fast)
            slow_new = s_eff + alpha * (fast - s_eff)
            out = jnp.where(sync, slow_new - p, du)
            s_out = jnp.where(sync, slow_new, s_eff)
            return out, s_out

        pairs = jax.tree_util.tree_map(leaf, params, u, state.slow)
        outs = jax.tree_util.tree_map(
            lambda t: t[0], pairs, is_leaf=lambda t: isinstance(t, tuple))
        slows = jax.tree_util.tree_map(
            lambda t: t[1], pairs, is_leaf=lambda t: isinstance(t, tuple))
        return outs, _LookaheadState(
            count, state.initialized | sync, slows, inner)

    return optax.GradientTransformation(init_fn, update_fn)


def _lr_multi_scaler(params, lr_multi):
    """Per-leaf update multiplier from {path-substring: mult} — the
    generalisation of the reference's rgb_encoder_lr_multi group
    (optim/misc.py:26-32)."""

    def leaf_mult(path, _):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", "")))
                        for p in path)
        m = 1.0
        for frag, mult in lr_multi.items():
            if frag in name:
                m = float(mult)
        return m

    mults = jax.tree_util.tree_map_with_path(leaf_mult, params)
    return optax.GradientTransformation(
        lambda params: optax.EmptyState(),
        lambda updates, state, params=None: (
            jax.tree_util.tree_map(lambda u, m: u * m, updates, mults),
            state))


def _freeze_predicate(train_cfg):
    """TRAIN.freeze_params {encoder,decoder} -> path predicate (or None)."""
    freeze = dict(train_cfg.get("freeze_params") or {})
    if not (freeze.get("encoder") or freeze.get("decoder")):
        return None
    import re

    def _frozen(path, _):
        s = "/".join(str(getattr(p, "key", p)) for p in path)
        if "ptv3_model" not in s:
            return False
        is_dec = re.search(r"dec\d+_", s) is not None
        return bool(freeze.get("decoder") if is_dec
                    else freeze.get("encoder"))

    return _frozen


def _build_fused_adamw(params, train_cfg, tx_schedule, betas, wd,
                       grad_norm, mask_tree):
    """flat_adamw with the chain's lr-multi and freeze links folded into
    one per-leaf multiplier tree (freeze == multiplier 0, exactly what
    optax.masked(set_to_zero) did to the update)."""
    lr_multi = dict(train_cfg.get("lr_multi") or {})
    frozen = _freeze_predicate(train_cfg)

    def leaf_mult(path, _):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", "")))
                        for p in path)
        m = 1.0
        for frag, mult in lr_multi.items():
            if frag in name:
                m = float(mult)
        if frozen is not None and frozen(path, None):
            m = 0.0
        return m

    mult_tree = jax.tree_util.tree_map_with_path(leaf_mult, params)
    tx = flat_adamw(params, tx_schedule, b1=betas[0], b2=betas[1],
                    weight_decay=wd, mask_tree=mask_tree,
                    max_norm=float(grad_norm) if grad_norm else None,
                    mult_tree=mult_tree)
    accum = int(train_cfg.get("gradient_accumulation_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def build_optimizer(params, train_cfg):
    """Returns (optax tx, schedule_fn(step)->decay_rate)."""
    lr = float(train_cfg.get("learning_rate", 1e-4))
    betas = train_cfg.get("betas", [0.9, 0.98])
    wd = float(train_cfg.get("weight_decay", 0.05))
    grad_norm = train_cfg.get("grad_norm", None)

    def schedule(step):
        # the reference additionally floors the applied per-group lr at
        # 1e-8 AFTER the init-lr product (train_simple_policy.py:229
        # `max(init_lrs[kp] * lr_decay_rate, 1e-8)`) — clamp here so both
        # the optimizer (tx_schedule) and the driver's logged lr match.
        return jnp.maximum(lr * lr_decay_rate(
            step,
            train_cfg.get("lr_sched", "cosine"),
            train_cfg.get("warmup_steps", 2000),
            train_cfg.get("num_train_steps", 100000),
            num_cosine_cycles=train_cfg.get("num_cosine_cycles"),
            lr_decay_step_size=train_cfg.get("lr_decay_step_size"),
            lr_decay_gamma=train_cfg.get("lr_decay_gamma"),
        ), 1e-8)

    # optax's update count is 0-based (the k-th update sees count = k-1);
    # the reference evaluates the schedule at its 1-based global_step
    # (train_simple_policy.py:227-229 increments BEFORE setting the lr), so
    # the transformation sees count+1. The returned `schedule` stays
    # step-in = the 1-based step the driver logs with.
    def tx_schedule(count):
        return schedule(count + 1)

    opt_name = train_cfg.get("optim", "adamw")
    mask_tree = decay_mask(params)
    fused = bool(train_cfg.get("fused_optim", True))
    if opt_name == "adamw" and fused:
        # one flat-buffer update program instead of ~2-3 fusions per leaf
        # (see flat_adamw) — elementwise-identical, so it subsumes the
        # clip / lr-multi / freeze links of the per-leaf chain below
        return _build_fused_adamw(params, train_cfg, tx_schedule, betas,
                                  wd, grad_norm, mask_tree), schedule
    if opt_name == "adamw":
        core = optax.adamw(tx_schedule, b1=betas[0], b2=betas[1],
                           weight_decay=wd, mask=mask_tree)
    elif opt_name == "adam":
        core = optax.adam(tx_schedule, b1=betas[0], b2=betas[1])
    elif opt_name == "adamax":
        core = optax.adamax(tx_schedule, b1=betas[0], b2=betas[1])
    elif opt_name == "radam":
        core = optax.chain(
            scale_by_radam_ref(b1=betas[0], b2=betas[1], weight_decay=wd,
                               decay_mask_tree=mask_tree),
            optax.scale_by_learning_rate(tx_schedule))
    elif opt_name in ("ralamb", "rangerlars"):
        core = scale_by_ralamb_ref(
            b1=betas[0], b2=betas[1], weight_decay=wd,
            lr_fn=tx_schedule, decay_mask_tree=mask_tree)
        if opt_name == "rangerlars":
            core = lookahead_ref(
                core, alpha=float(train_cfg.get("lookahead_alpha", 0.5)),
                k=int(train_cfg.get("lookahead_k", 6)))
    else:
        raise ValueError(opt_name)

    chain = []
    if grad_norm:
        chain.append(optax.clip_by_global_norm(float(grad_norm)))
    chain.append(core)
    lr_multi = train_cfg.get("lr_multi") or {}
    if lr_multi:
        chain.append(_lr_multi_scaler(params, dict(lr_multi)))
    # TRAIN.freeze_params {encoder: bool, decoder: bool}: zero the updates
    # of the frozen backbone subtree (the reference flag's intent,
    # train_simple_policy.py:120-123 — its 'mae_encoder' prefixes are from
    # an older pretraining model, so the filter is expressed on this
    # tree's names; see also checkpoint.warm_start_variables encoder_only)
    freeze = dict(train_cfg.get("freeze_params") or {})
    if freeze.get("encoder") or freeze.get("decoder"):
        import re

        def _frozen(path, _):
            s = "/".join(str(getattr(p, "key", p)) for p in path)
            if "ptv3_model" not in s:
                return False
            is_dec = re.search(r"dec\d+_", s) is not None
            return bool(freeze.get("decoder") if is_dec
                        else freeze.get("encoder"))

        chain.append(optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map_with_path(_frozen, params)))
    tx = optax.chain(*chain)

    accum = int(train_cfg.get("gradient_accumulation_steps", 1) or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule

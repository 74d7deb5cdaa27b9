"""End-to-end data pipeline tests: synthetic store -> dataset -> collate ->
model forward/loss for both the keystep policy and the motion planner."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from robot3dlotus_tpu.train.datasets.store import (
    SyntheticStore, SyntheticMotionStore, MsgpackDirStore,
)
from robot3dlotus_tpu.train.datasets.keystep_dataset import KeystepDataset
from robot3dlotus_tpu.train.datasets.motion_dataset import (
    MotionPlannerDataset, collate_motion_samples,
)
from robot3dlotus_tpu.train.datasets.collate import collate_keystep_samples
from tests.test_policy import PTV3_CFG, ACT_CFG, LOSS_CFG


def test_keystep_dataset_and_collate():
    store = SyntheticStore(num_taskvars=2, episodes_per_taskvar=2,
                           points_per_step=3000)
    ds = KeystepDataset(store, num_points=1024, pos_bins=10,
                        rng=np.random.RandomState(0))
    assert len(ds) == 4
    samples = ds[0]
    assert len(samples) >= 1
    s = samples[0]
    assert s["pc_fts"].shape[-1] == 7  # xyz+rgb+height
    assert s["pc_fts"].shape[0] <= 1024
    assert s["gt_actions"].shape == (7,)  # pos3 + disc euler3 + open
    assert 0 <= s["gt_actions"][3:6].min() and s["gt_actions"][3:6].max() < 72
    # the loader ships the robot-point mask; disc-position GT probs are
    # built on device inside the train step (verdict item 3)
    rm = s["robot_point_mask"]
    assert rm.shape == (s["pc_fts"].shape[0],) and rm.dtype == bool

    batch = collate_keystep_samples(samples, num_points=1024,
                                    num_clouds=4)
    assert batch["pc_fts"].shape == (4, 1024, 7)
    assert batch["pc_robot_mask"].shape == (4, 1024)
    # no robot flag on padded slots
    for i in range(4):
        n = batch["pc_counts"][i]
        assert not batch["pc_robot_mask"][i, n:].any()

    # device-built targets normalize and put no mass on padding
    from robot3dlotus_tpu.models.simple_policy import build_disc_pos_targets
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    tgt = np.asarray(build_disc_pos_targets(
        jb, jb["gt_actions"][:, :3], 10,
        {"pos_bin_size": 0.01, "pos_heatmap_type": "dist"}))
    assert tgt.shape == (4, 3, 1024 * 20)
    np.testing.assert_allclose(tgt.sum(-1), 1.0, atol=1e-5)
    pp = tgt.reshape(4, 3, 1024, 20)
    for i in range(4):
        n = batch["pc_counts"][i]
        assert pp[i, :, n:].sum() == 0


def test_msgpack_store_roundtrip(tmp_path):
    syn = SyntheticStore(num_taskvars=1, episodes_per_taskvar=1,
                         steps_per_episode=2, points_per_step=500)
    rec = syn.get(syn.taskvars()[0], "episode0")
    store = MsgpackDirStore(str(tmp_path))
    store.put("task+0", "episode0", rec)
    rec2 = store.get("task+0", "episode0")
    np.testing.assert_allclose(rec2["action"], rec["action"])
    np.testing.assert_allclose(rec2["xyz"][0], rec["xyz"][0])
    assert store.taskvars() == ["task+0"]


@pytest.mark.slow
def test_motion_dataset_and_model():
    from robot3dlotus_tpu.models.motion_planner import (
        MotionPlannerTPU, compute_mp_loss, decode_mp_actions,
    )
    store = SyntheticMotionStore(num_taskvars=1, episodes_per_taskvar=2,
                                 points_per_step=2000)
    ds = MotionPlannerDataset(
        store, num_points=256, pos_bins=5, max_traj_len=3,
        use_color=False, use_height=True,
        rng=np.random.RandomState(0))
    samples = ds[0] + ds[1]
    assert len(samples) >= 2
    s = samples[0]
    assert s["pc_fts"].shape[-1] == 4  # xyz + height
    assert set(np.unique(s["pc_labels"])) <= {0, 1, 2, 3}
    batch_np = collate_motion_samples(
        samples, num_points=256, max_traj_len=3, num_clouds=2)
    assert batch_np["gt_trajs"].shape == (2, 3, 7)
    # per-step disc targets are device-built from gt_trajs + this mask
    assert batch_np["pc_robot_mask"].shape == (2, 256)

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if isinstance(v, np.ndarray)}
    ptv3 = dict(PTV3_CFG, in_channels=4)
    act = dict(ACT_CFG, pos_bins=5, max_traj_len=3, traj_embed_size=8,
               pc_label_channels=4, txt_reduce="attn")
    model = MotionPlannerTPU(ptv3_cfg=ptv3, act_cfg=act, variant="ca")
    key = jax.random.PRNGKey(0)
    variables = jax.jit(lambda b: model.init(
        {"params": key, "dropout": key, "shuffle": key},
        b, deterministic=True))(batch)

    def loss_fn(params):
        preds, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, deterministic=False,
            rngs={"dropout": key, "shuffle": key}, mutable=["batch_stats"])
        return compute_mp_loss(preds, batch, act, LOSS_CFG)["total"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))

    preds = model.apply(variables, batch, deterministic=True)
    acts = decode_mp_actions(preds, act)
    assert acts.shape == (2, 3, 9)  # pos3 + quat4 + open + stop
    assert np.isfinite(np.asarray(acts)).all()


def test_meta_loader_ratio_sampling():
    from robot3dlotus_tpu.train.datasets.loader import MetaLoader
    a = [{"x": i} for i in range(3)]
    b = [{"x": 100 + i} for i in range(2)]
    ml = MetaLoader({"a": (a, 3.0), "b": (b, 1.0)}, accum_steps=2, seed=0)
    names = []
    it = iter(ml)
    for _ in range(200):
        task, batch = next(it)
        names.append(task)
    # accum grouping: tasks constant within each pair
    assert all(names[i] == names[i + 1] for i in range(0, 200, 2))
    frac_a = names.count("a") / len(names)
    assert 0.6 < frac_a < 0.9  # ~0.75 expected
    # determinism across "hosts": same seed -> same task sequence
    ml2 = MetaLoader({"a": (a, 3.0), "b": (b, 1.0)}, accum_steps=2, seed=0)
    it2 = iter(ml2)
    names2 = []
    for _ in range(200):
        t, _ = next(it2)
        names2.append(t)
    assert names == names2


def test_clip_prompt_ensemble():
    from robot3dlotus_tpu.vlm.clip_encoder import get_prompts_from_label
    prompts = get_prompts_from_label("red cube")
    assert len(prompts) == 60
    assert "A point cloud of red cube." in prompts
    assert prompts[0] == "red cube."


def _tiny_loader(seed=0, shuffle_seed=None, process_index=0,
                 process_count=1, num_workers=0, shuffle=True,
                 infinite=True, augment=True):
    from robot3dlotus_tpu.train.datasets.loader import KeystepBatchLoader
    store = SyntheticStore(num_taskvars=3, episodes_per_taskvar=4,
                           points_per_step=400)
    ds = KeystepDataset(store, num_points=128, augment_pc=augment,
                        pos_type="disc", pos_bins=5,
                        rng=np.random.RandomState(seed))
    return KeystepBatchLoader(
        ds, num_clouds=4, num_points=128, shuffle=shuffle,
        seed=seed, shuffle_seed=shuffle_seed, process_index=process_index,
        process_count=process_count, infinite=infinite,
        num_workers=num_workers)


def test_per_host_shards_disjoint_under_shuffle():
    """Hosts pass DIFFERENT per-process seeds (augmentation diversity) but
    the SAME shuffle_seed: per-epoch shards must partition the dataset
    (DistributedSampler parity) — overlapping/missing episodes silently
    skew multihost training."""
    for epoch in range(3):
        shards = [
            _tiny_loader(seed=100 + pi, shuffle_seed=7, process_index=pi,
                         process_count=3)._epoch_ids(epoch)
            for pi in range(3)
        ]
        all_ids = np.concatenate(shards)
        assert len(all_ids) == 12
        assert sorted(all_ids.tolist()) == list(range(12))


def test_worker_pool_is_deterministic():
    """num_workers>0 must not change WHAT is produced run-to-run: each
    episode gets a derived RNG, so augmentation no longer depends on
    thread scheduling."""
    def first_batches(num_workers):
        it = iter(_tiny_loader(seed=3, num_workers=num_workers))
        return [next(it) for _ in range(4)]

    a = first_batches(2)
    b = first_batches(2)
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(np.asarray(ba[k]),
                                          np.asarray(bb[k]), err_msg=k)


def test_empty_host_shard_raises():
    loader = _tiny_loader(process_index=20, process_count=50)
    with pytest.raises(ValueError, match="empty per-host shard"):
        next(iter(loader))


def test_prefetch_exhaustion_and_close():
    """After exhaustion PrefetchToDevice keeps raising StopIteration (no
    deadlock on re-poll); close() releases the producer thread."""
    from robot3dlotus_tpu.train.datasets.loader import PrefetchToDevice

    batches = [{"x": np.ones(3)}, {"x": np.zeros(3)}]
    pf = PrefetchToDevice(iter(batches), mesh=None, depth=2)
    got = list(pf)
    assert len(got) == 2
    for _ in range(3):  # iterator protocol: further next() raises again
        with pytest.raises(StopIteration):
            next(pf)

    pf2 = PrefetchToDevice(iter(_tiny_loader(seed=1)), mesh=None, depth=1)
    next(pf2)
    pf2.close()
    pf2.thread.join(timeout=30)
    assert not pf2.thread.is_alive(), "producer thread leaked after close()"


def test_meta_loader_iterator_recreation_keeps_accum_window():
    """Dropping and re-creating the MetaLoader iterator mid-accum-window
    must keep serving the window's drawn task (shared-RNG determinism
    across hosts depends on it)."""
    from robot3dlotus_tpu.train.datasets.loader import MetaLoader

    def gen(tag):
        i = 0
        while True:
            yield f"{tag}{i}"
            i += 1

    ml = MetaLoader({"a": gen("a"), "b": gen("b")}, accum_steps=4, seed=5)
    it1 = iter(ml)
    first = [next(it1) for _ in range(2)]
    window_task = first[0][0]
    assert all(t == window_task for t, _ in first)
    it2 = iter(ml)  # re-created mid-window
    rest = [next(it2) for _ in range(2)]
    assert all(t == window_task for t, _ in rest), \
        "fresh iterator forgot the accum window's task"
    nxt = next(it2)  # step 4: a fresh draw from the shared RNG
    ml2 = MetaLoader({"a": gen("a"), "b": gen("b")}, accum_steps=4, seed=5)
    seq2 = [next(iter(ml2))[0] for _ in range(5)]
    assert nxt[0] == seq2[4], "re-created iterator desynced the task RNG"

"""End-to-end training tests on the synthetic dataset (CPU, small res)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.pipeline import batch_iterator, host_batch
from instancesegmentation_tpu.models.segment import Segment
from instancesegmentation_tpu.train.checkpoint import (
    BranchBestCheckpoint,
    load_checkpoint,
    read_meta,
    save_checkpoint,
)
from instancesegmentation_tpu.train.config import TrainConfig
from instancesegmentation_tpu.train.loop import Trainer
from instancesegmentation_tpu.train.state import TrainState
from instancesegmentation_tpu.train.steps import make_eval_step, make_train_step
from instancesegmentation_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    make_synthetic_dataset(str(root), num_images=4, objects_per_image=1, seed=7)
    return str(root)


def _small_cfg(synth_dir, tmpdir, **kw):
    defaults = dict(
        train_dataset_dir=synth_dir,
        val_dataset_dir=synth_dir,
        checkpoint_dir=os.path.join(tmpdir, "ckpt"),
        out_dir=os.path.join(tmpdir, "runs"),
        canvas=192,
        out_size=64,
        in_channels=20,
        bfloat16=False,
        batch_size=4,
        learning_rate=3e-3,
        save_iou_gate=0.0,
        log_images=False,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def test_overfit_single_batch(synth_dir, tmp_path):
    """The minimum end-to-end slice (SURVEY.md §7): jitted train step
    overfits a fixed synthetic batch."""
    cfg = _small_cfg(synth_dir, str(tmp_path))
    ds = InstanceCommonDataset(synth_dir, canvas=cfg.canvas)
    batch = host_batch([ds.fetch(i) for i in range(4)])

    model = Segment(in_channels=20, dtype=jnp.float32)
    tx = optax.adam(cfg.learning_rate)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 17)),
    )
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg)
    eval_step = make_eval_step(model, cfg)

    rng = jax.random.PRNGKey(0)
    first_loss = None
    for i in range(60):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))
        if first_loss is None:
            first_loss = float(metrics["loss"])
    last_loss = float(metrics["loss"])
    assert last_loss < first_loss * 0.3, (first_loss, last_loss)

    _, _, _, ious = eval_step(state.variables, batch)
    assert float(ious.mean()) > 0.5, np.asarray(ious)


def test_trainer_loop_and_checkpoint_contract(synth_dir, tmp_path):
    cfg = _small_cfg(synth_dir, str(tmp_path), epochs=2, val_iter=1000, show_iter=1)
    trainer = Trainer(cfg)
    trainer.train()
    # a best checkpoint must exist (gate lowered to 0)
    ckpt = BranchBestCheckpoint(cfg.checkpoint_dir)
    assert ckpt.exists()
    meta = read_meta(ckpt.path)
    assert meta["best"] >= 0.0 and meta["epoch"] >= 1
    assert meta["branch_name"] == ckpt.branch_name

    # resume: a fresh trainer picks the checkpoint up
    trainer2 = Trainer(cfg)
    assert trainer2.start_epoch == meta["epoch"]
    assert trainer2.iou_max == pytest.approx(meta["best"])
    # resumed params equal saved params
    a = jax.tree_util.tree_leaves(trainer2.state.params)
    b = jax.tree_util.tree_leaves(trainer.state.params)
    # note: trainer.state was trained beyond the save point only if more
    # steps ran after the save; just check structure + finiteness
    assert len(a) == len(b)
    assert all(np.isfinite(np.asarray(x)).all() for x in a)


def test_checkpoint_atomic_roundtrip(tmp_path):
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.float32(1.5)}
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, tree, {"best": 0.5, "epoch": 3})
    loaded, meta = load_checkpoint(path, {"w": np.zeros((2, 3), np.float32), "b": np.float32(0)})
    np.testing.assert_array_equal(loaded["w"], tree["w"])
    assert meta == {"best": 0.5, "epoch": 3}
    assert read_meta(path) == meta
    # corrupt file -> read_meta returns None, not an exception
    with open(path, "wb") as f:
        f.write(b"garbage")
    assert read_meta(path) is None


def test_orbax_checkpoint_backend(tmp_path):
    import optax

    from instancesegmentation_tpu.train.checkpoint_orbax import (
        OrbaxBranchBestCheckpoint,
    )

    model = __import__(
        "instancesegmentation_tpu.models.segment", fromlist=["Segment"]
    ).Segment(in_channels=3, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(variables, optax.adam(1e-3))

    ckpt = OrbaxBranchBestCheckpoint(str(tmp_path), branch_name="test")
    assert not ckpt.exists()
    ckpt.save(state, best=0.75, epoch=4)
    assert ckpt.exists()
    assert ckpt.best() == 0.75

    restored, meta = ckpt.load(state)
    assert meta == {"branch_name": "test", "best": 0.75, "epoch": 4}
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    # overwrite (the reference's repeated save-best) must work
    ckpt.save(state, best=0.8, epoch=5)
    assert ckpt.best() == 0.8


def test_regression_reload_bounded(synth_dir, tmp_path):
    """A checkpoint claiming an unreachable best IoU triggers the
    regression reload (ref :471-477) but the restart budget prevents the
    reference's infinite reload loop."""
    cfg = _small_cfg(
        synth_dir, str(tmp_path), epochs=2, val_iter=1, show_iter=100,
        max_restarts=2, continue_train=False,
    )
    # plant a branch-best checkpoint with an unreachably high best IoU
    trainer = Trainer(cfg)
    trainer.ckpt.save(trainer.state, best=0.99, epoch=1)

    trainer = Trainer(cfg)  # reads iou_max=0.99, does not resume params
    assert trainer.iou_max == pytest.approx(0.99)
    trainer.train()  # must terminate (2 restarts + epoch budget)


def test_syn_train_adoption(synth_dir, tmp_path):
    """A better peer checkpoint is adopted when syn_train is on
    (ref :479-489)."""
    cfg = _small_cfg(
        synth_dir, str(tmp_path), epochs=1, val_iter=1, show_iter=100,
        syn_train=True, max_restarts=1, continue_train=False,
        regression_threshold=10.0,  # keep the regression path quiet
    )
    trainer = Trainer(cfg)
    # a "peer process" pushes a better checkpoint with a marker epoch
    peer_state = trainer.state
    trainer.ckpt.save(peer_state, best=0.42, epoch=1)
    trainer.iou_max = 0.1
    trainer.train()
    # adoption must have raised iou_max to the peer's best
    assert trainer.iou_max >= 0.42


def test_trainer_with_orbax_backend(synth_dir, tmp_path):
    cfg = _small_cfg(
        synth_dir, str(tmp_path), epochs=1, val_iter=1000, show_iter=100,
        checkpoint_backend="orbax",
    )
    trainer = Trainer(cfg)
    trainer.train()
    from instancesegmentation_tpu.train.checkpoint_orbax import (
        OrbaxBranchBestCheckpoint,
    )

    ckpt = OrbaxBranchBestCheckpoint(cfg.checkpoint_dir)
    assert ckpt.exists() and ckpt.best() is not None
    # resume path through the orbax backend
    trainer2 = Trainer(cfg)
    assert trainer2.iou_max == pytest.approx(ckpt.best())


def test_validate_counts_every_sample_once(synth_dir, tmp_path):
    """drop_last=False + per-sample dedup: a val set not divisible by
    the batch size is scored exactly once per sample (VERDICT r1 weak#2)."""
    cfg = _small_cfg(synth_dir, str(tmp_path), batch_size=3, log_images=False)
    trainer = Trainer(cfg)
    ds = InstanceCommonDataset(synth_dir, canvas=cfg.canvas)
    assert len(ds) % cfg.batch_size != 0  # 4 samples, batch 3 -> padded tail

    def fake_eval(variables, batch):
        # unique, content-derived "IoU" per sample so double-counted
        # padding would shift the mean
        v = batch["image"].astype(np.float32).mean(axis=(1, 2, 3)) / 255.0
        b = batch["image"].shape[0]
        z = np.zeros((b, 4, 4, 1), np.float32)
        return np.zeros((b, 4, 4, 3), np.float32), z, z, jnp.asarray(v)

    trainer.eval_step = fake_eval
    got = trainer._validate(ds, epoch=0, seed=0)
    expect = float(
        np.mean(
            [ds.fetch(i).image.astype(np.float32).mean() / 255.0 for i in range(len(ds))]
        )
    )
    assert got == pytest.approx(expect, rel=1e-5)


def test_validate_val_set_smaller_than_batch(synth_dir, tmp_path):
    """A val set smaller than the batch still yields one (padded) batch
    and a real IoU instead of 0.0 (which would trip the regression
    guard)."""
    cfg = _small_cfg(synth_dir, str(tmp_path), batch_size=8, log_images=False)
    trainer = Trainer(cfg)
    ds = InstanceCommonDataset(synth_dir, canvas=cfg.canvas)
    assert len(ds) < cfg.batch_size
    seen = []

    def fake_eval(variables, batch):
        b = batch["image"].shape[0]
        seen.append(b)
        z = np.zeros((b, 4, 4, 1), np.float32)
        return (
            np.zeros((b, 4, 4, 3), np.float32),
            z,
            z,
            jnp.full((b,), 0.5, jnp.float32),
        )

    trainer.eval_step = fake_eval
    got = trainer._validate(ds, epoch=0, seed=0)
    assert seen == [8]  # one padded batch, static shape preserved
    assert got == pytest.approx(0.5)


def test_trainer_profile_trace(synth_dir, tmp_path):
    """--profile-steps dumps a jax.profiler trace artifact (VERDICT r1
    next#7)."""
    cfg = _small_cfg(
        synth_dir, str(tmp_path), epochs=1, val_iter=1000, show_iter=100,
        batch_size=2, profile_steps=1, save_iou_gate=2.0,
    )
    Trainer(cfg).train()
    profile_dir = os.path.join(cfg.out_dir, "profile")
    assert os.path.isdir(profile_dir)
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(profile_dir)
        for f in fs
        if f.endswith((".trace.json.gz", ".xplane.pb"))
    ]
    assert found, f"no trace artifact under {profile_dir}"


def test_remat_step_bit_identical():
    """--remat (full-model jax.checkpoint) must not change the math:
    one train step with and without it produces identical loss and
    updated params (measured perf tradeoff lives in ROOFLINE.md)."""
    import optax

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch
    from instancesegmentation_tpu.models.segment import Segment
    from instancesegmentation_tpu.train.state import TrainState
    from instancesegmentation_tpu.train.steps import make_train_step

    size, canvas = 32, 64

    def run(remat):
        cfg = TrainConfig(
            canvas=canvas, out_size=size, in_channels=20, bfloat16=False,
            batch_size=2, remat=remat,
        )
        model = Segment(in_channels=20, dtype=jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, size, size, 17)),
            train=False,
        )
        tx = optax.adam(1e-3)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, cfg)
        batch = {
            k: jnp.asarray(v) for k, v in synthetic_host_batch(2, canvas).items()
        }
        state, m = step(state, batch, jax.random.PRNGKey(1))
        leaves = jax.tree_util.tree_leaves(state.params)
        return float(m["loss"]), np.concatenate(
            [np.asarray(l).ravel() for l in leaves]
        )

    l0, p0 = run(False)
    l1, p1 = run(True)
    assert l0 == l1
    np.testing.assert_array_equal(p0, p1)


def test_fused_head_step_trains_equivalently():
    """--fused-head runs the training forward with the folded section-6
    head re-derived from live params each step (train/steps.make_fwd).
    In f32 the folded forward is exact (tests/test_fused_head.py), so
    one step must produce near-identical loss/params (gradient
    reduction order through the fold differs, so allclose not equal),
    and identical BN stat updates (the head has no BN).  SGD rather
    than Adam so the param delta reflects gradient closeness directly
    (Adam's normalizer amplifies ~1-ulp gradient differences into
    lr-scale param differences at step 1)."""
    import optax

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch
    from instancesegmentation_tpu.models.segment import Segment
    from instancesegmentation_tpu.train.state import TrainState
    from instancesegmentation_tpu.train.steps import make_train_step

    size, canvas = 32, 64

    def run(fused):
        cfg = TrainConfig(
            canvas=canvas, out_size=size, in_channels=20, bfloat16=False,
            batch_size=2, fused_head=fused,
        )
        model = Segment(in_channels=20, dtype=jnp.float32)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, size, size, 17)),
            train=False,
        )
        tx = optax.sgd(1e-3)
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, cfg)
        batch = {
            k: jnp.asarray(v) for k, v in synthetic_host_batch(2, canvas).items()
        }
        state, m = step(state, batch, jax.random.PRNGKey(1))
        leaves = jax.tree_util.tree_leaves(state.params)
        stats = jax.tree_util.tree_leaves(state.batch_stats)
        return (
            float(m["loss"]),
            np.concatenate([np.asarray(l).ravel() for l in leaves]),
            np.concatenate([np.asarray(s).ravel() for s in stats]),
        )

    l0, p0, s0 = run(False)
    l1, p1, s1 = run(True)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    np.testing.assert_allclose(p1, p0, atol=1e-6)
    np.testing.assert_array_equal(s1, s0)

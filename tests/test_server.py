"""Dynamic-batching serving front-end (infer/server.py)."""
import threading
import time

import numpy as np
import pytest

from instancesegmentation_tpu.infer.server import ServingFrontend


class FakeEngine:
    """predict_images stand-in: returns per-image shaped masks, records
    call batch sizes, optionally raises on a marker input."""

    def __init__(self, latency=0.01):
        self.calls = []
        self.latency = latency

    def predict_images(self, images):
        self.calls.append(len(images))
        time.sleep(self.latency)
        out = []
        for im in images:
            if im.shape[0] == 13:  # poison marker
                raise ValueError("poisoned batch")
            out.append(np.full(im.shape[:2], 255, np.uint8))
        return out


def test_batches_concurrent_requests():
    eng = FakeEngine()
    with ServingFrontend(eng, max_batch=8, max_delay_ms=30.0) as srv:
        results = {}

        def client(i):
            img = np.zeros((16 + i % 3, 20, 3), np.uint8)
            results[i] = srv.predict(img, timeout=30)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    assert len(results) == 24
    for i, m in results.items():
        assert m.shape == (16 + i % 3, 20)
        assert m.dtype == np.uint8
    # the collator must have grouped: far fewer dispatches than requests
    assert sum(eng.calls) == 24
    assert len(eng.calls) < 24
    assert max(eng.calls) > 1
    assert srv.dispatches == len(eng.calls)
    assert srv.served == 24


def test_exception_fans_out_to_batch_only():
    eng = FakeEngine(latency=0.0)
    srv = ServingFrontend(eng, max_batch=4, max_delay_ms=1.0)
    try:
        bad = srv.submit(np.zeros((13, 13, 3), np.uint8))
        with pytest.raises(ValueError):
            bad.result(timeout=10)
        # the frontend keeps serving after a poisoned batch
        ok = srv.predict(np.zeros((8, 8, 3), np.uint8), timeout=10)
        assert ok.shape == (8, 8)
    finally:
        srv.close()
    # closed frontend rejects new work
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((8, 8, 3), np.uint8))


def test_drains_pending_on_close():
    eng = FakeEngine(latency=0.02)
    srv = ServingFrontend(eng, max_batch=2, max_delay_ms=0.5)
    futs = [srv.submit(np.zeros((9, 9, 3), np.uint8)) for _ in range(7)]
    srv.close()
    for f in futs:
        assert f.result(timeout=10).shape == (9, 9)


def test_real_engine_integration():
    """End-to-end through the real fixed-shape jitted engine (CPU)."""
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.infer.pipeline import InferenceEngine
    from instancesegmentation_tpu.models.segment import Segment

    size = 32
    model = Segment(in_channels=3, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    eng = InferenceEngine(
        variables, in_channels=3, size=size, dtype=jnp.float32
    )
    rng = np.random.default_rng(0)
    with ServingFrontend(eng, max_batch=4, max_delay_ms=20.0) as srv:
        futs = [
            srv.submit(
                rng.integers(0, 255, (24 + i, 40, 3), dtype=np.uint8)
            )
            for i in range(6)
        ]
        masks = [f.result(timeout=300) for f in futs]
    for i, m in enumerate(masks):
        assert m.shape == (24 + i, 40)
        assert set(np.unique(m)) <= {0, 255}

"""Dynamic-batching serving front-end.

Production serving glue the reference never had (its infer entry point
is an unimplemented stub, reference infer.py:35-37): concurrent callers
submit single images and get futures; a collator thread groups pending
requests into one device dispatch (up to ``max_batch``, waiting at most
``max_delay_ms`` for stragglers), so chip utilization follows the
bucketed batch programs of ``InferenceEngine.predict_images`` instead of
the callers' arrival pattern.

The device work stays in the engine's fixed-shape jitted programs
(power-of-2 buckets -> O(log B) compiles, infer/pipeline.py); this layer
is pure host-side orchestration: stdlib threads + futures, no extra
dependencies, safe to embed in any HTTP/RPC wrapper.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Optional

import numpy as np


class ServingFrontend:
    """Batch single-image requests into engine dispatches.

    ``engine`` needs only a ``predict_images(list[np.ndarray]) ->
    list[np.ndarray]`` method (infer.pipeline.InferenceEngine or
    anything duck-typed to it, e.g. a ParallelInferenceEngine wrapper).
    """

    def __init__(self, engine, max_batch: int = 32, max_delay_ms: float = 3.0):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3
        self._q: queue.Queue = queue.Queue()
        self._closed = threading.Event()
        # serializes submit()'s closed-check+put against close()'s
        # set+sentinel: without it a preempted submit could land its
        # item AFTER the worker's final drain, leaving the future
        # permanently unresolved
        self._submit_lock = threading.Lock()
        self.dispatches = 0          # observability: device calls made
        self.served = 0              # requests completed
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # -- client side ---------------------------------------------------
    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one RGB uint8 image; resolves to the uint8 mask at
        the image's own resolution."""
        fut: Future = Future()
        with self._submit_lock:
            if self._closed.is_set():
                raise RuntimeError("ServingFrontend is closed")
            self._q.put((np.asarray(image), fut))
        return fut

    def predict(self, image: np.ndarray, timeout: Optional[float] = None):
        """Synchronous sugar over ``submit``."""
        return self.submit(image).result(timeout=timeout)

    # -- worker --------------------------------------------------------
    def _collect(self):
        """Block for one request, then gather stragglers until the
        batch is full or ``max_delay`` has passed."""
        import time

        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_delay
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                # re-signal shutdown for after this batch drains
                self._q.put(None)
                break
            batch.append(item)
        return batch

    @staticmethod
    def _resolve(fut: Future, value, is_error: bool) -> None:
        """Complete a future, tolerating a concurrent cancel: the
        cancelled() check alone races with client-side fut.cancel(), and
        an InvalidStateError escaping here would kill the worker thread
        and hang every other request."""
        try:
            if fut.cancelled():
                return
            if is_error:
                fut.set_exception(value)
            else:
                fut.set_result(value)
        except Exception:
            pass  # future was cancelled/completed in the race window

    def _serve(self, batch) -> None:
        images = [im for im, _ in batch]
        futures = [f for _, f in batch]
        try:
            masks = self.engine.predict_images(images)
        except Exception as e:  # fan the failure out to this batch only
            for f in futures:
                self._resolve(f, e, is_error=True)
            return
        self.dispatches += 1
        for f, m in zip(futures, masks):
            self._resolve(f, m, is_error=False)
        self.served += len(futures)

    def _worker(self):
        while True:
            batch = self._collect()
            if batch is None:
                # shutdown sentinel seen: serve requests that raced into
                # the queue behind it (submit() passed the closed check
                # before close() set it) so no future is left unresolved
                leftovers = []
                while True:
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if item is not None:
                        leftovers.append(item)
                for i in range(0, len(leftovers), self.max_batch):
                    self._serve(leftovers[i : i + self.max_batch])
                return
            if not batch:
                if self._closed.is_set() and self._q.empty():
                    return
                continue
            self._serve(batch)

    # -- lifecycle -----------------------------------------------------
    def close(self, timeout: float = 10.0) -> None:
        """Drain pending requests, then stop the worker (idempotent)."""
        with self._submit_lock:
            if not self._closed.is_set():
                self._closed.set()
                self._q.put(None)
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

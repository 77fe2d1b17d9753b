"""Request-level serving front-end: dynamic batching over the pipeline.

``InferencePipeline`` serves fixed host *batches*; production traffic
arrives as single requests. ``BatchingServer`` bridges the two the way TPU
serving stacks do it: requests land on a queue, a batcher thread coalesces
them — dispatch when ``max_batch`` requests are waiting OR the oldest
request has waited ``max_wait_ms`` (the latency/throughput knob) — decodes
the JPEG payloads in one native multithreaded call, pushes ONE device
dispatch through the pipeline (whose fixed-batch padding keeps a single
compiled program for every fill level), and resolves each request's
``Future`` with its own logits row.

Design notes, TPU-first:
- One batcher thread is enough: JPEG decode releases the GIL (C++ decoder)
  and the device dispatch is asynchronous, so decode of the next batch
  overlaps device compute of the previous one — the same overlap the
  streaming loop (``data.classify_jpeg_stream``) exploits.
- Errors are per-request: a corrupt JPEG fails its own future (decode is
  retried per-item to isolate the offender); the server keeps serving.
- No dynamic shapes anywhere: every fill level pads to the pipeline's
  compiled batch, so the server never triggers a recompile.

The reference has no serving story at all (SURVEY.md §5).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Union

import numpy as np

from vit_tpu.data import JpegDecoder


class BatchingServer:
    """Coalesce single classify requests into device batches.

    ``pipeline``: an ``InferencePipeline`` (quantized or float — anything
    with ``__call__(raw_uint8_batch) -> logits``). ``decoder`` turns JPEG
    bytes into the fixed ``[S, S, 3]`` uint8 the pipeline preprocesses;
    requests may also be pre-decoded ``[S, S, 3]`` uint8 arrays.
    """

    def __init__(
        self,
        pipeline,
        *,
        decoder: Optional[JpegDecoder] = None,
        max_batch: Optional[int] = None,
        max_wait_ms: float = 5.0,
    ):
        self.pipeline = pipeline
        self.decoder = decoder or JpegDecoder(size=256)
        self.max_batch = max_batch or getattr(pipeline, "batch_size", 64)
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # serializes submit vs close: guarantees no request is ever enqueued
        # AFTER the shutdown sentinel (which the batcher treats as
        # end-of-stream — a straggler behind it would strand its Future)
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, item: Union[bytes, np.ndarray]) -> Future:
        """Enqueue one request (JPEG bytes or a decoded uint8 image);
        returns a ``Future`` resolving to that request's logits row."""
        f: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._q.put((item, f))
        return f

    def classify(self, item: Union[bytes, np.ndarray], timeout: float = None) -> np.ndarray:
        """Synchronous single-request convenience: submit + wait."""
        return self.submit(item).result(timeout=timeout)

    def close(self, timeout: float = 10.0) -> None:
        """Drain outstanding requests and stop the batcher thread."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # wake the batcher; nothing can follow it
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- batcher ------------------------------------------------------------

    def _collect(self):
        """Block for the first request, then gather until max_batch or the
        first request's deadline. Returns a list of (item, future), or None
        on shutdown with an empty queue."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # shutdown sentinel: flush what we have
                break
            batch.append(nxt)
        return batch

    def _decode(self, items, futures):
        """Decode payloads to one [n, S, S, 3] uint8 array. A failing JPEG
        fails only its own future (decode retried per-item to find it);
        returns (array, futures) for the survivors."""
        jpeg_idx = [i for i, it in enumerate(items) if isinstance(it, (bytes, bytearray))]
        decoded = list(items)
        if jpeg_idx:
            try:
                arrs = self.decoder([items[i] for i in jpeg_idx])
                for j, i in enumerate(jpeg_idx):
                    decoded[i] = arrs[j]
            except Exception:
                for i in jpeg_idx:  # isolate the corrupt item(s)
                    try:
                        decoded[i] = self.decoder([items[i]])[0]
                    except Exception as e:
                        futures[i].set_exception(e)
                        decoded[i] = None
        keep = [i for i, d in enumerate(decoded) if d is not None]
        if not keep:
            return None, []
        return np.stack([decoded[i] for i in keep]), [futures[i] for i in keep]

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                return  # shutdown, queue drained
            items, futures = zip(*batch)
            try:
                raw, live = self._decode(list(items), list(futures))
                if raw is None:
                    continue
                logits = self.pipeline(raw)
                for i, f in enumerate(live):
                    f.set_result(logits[i])
            except Exception as e:  # device-side failure: fail the batch
                for f in futures:
                    if not f.done():
                        f.set_exception(e)
            if self._closed and self._q.empty():
                return

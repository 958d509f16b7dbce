"""Device prefetch: overlap host batch assembly and host->device transfer
with the running train step.

The reference overlaps feature extraction with training via DataLoader worker
processes (data/dataloader.py:83-92) but ships every batch to the device
synchronously inside the step loop. On a tunneled TPU that serializes link
latency plus the batch bytes into every step: the round-4 campaign sustained
78 audio-s/s wall against a ~9,000 audio-s/s device limit, with ~5.8 MB of
f32 waves shipped per ~300 ms step. This prefetcher pulls batches on a
daemon thread, optionally converts waves to an int16 wire format (2x fewer
bytes; exact for 16-bit-PCM-sourced corpora), and ``jax.device_put``s them
``depth`` steps ahead, so the transfer of batch N+1 and the host-side wave
loading/synthesis both ride under the device step of batch N.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np

from tpuasr.data.pipeline import device_view, wire_waves  # noqa: F401 (re-export)

_SENTINEL = object()


def prefetch_to_device(
    batches: Iterable[dict],
    depth: int = 2,
    put: Optional[Callable[[dict], dict]] = None,
    wire_dtype: str = "float32",
    sample_rate: int = 48000,
) -> Iterator[tuple[float, dict]]:
    """Yield ``(audio_seconds, device_batch)`` with up to ``depth`` batches
    in flight on a background thread.

    ``put`` maps a host batch dict to device arrays (default
    ``jax.device_put``); pass e.g. ``lambda b: shard_batch(b, mesh)`` for
    mesh-sharded batches. ``depth <= 0`` degrades to the synchronous path
    (same encode/put, no thread) for debugging.
    """
    if put is None:
        put = jax.device_put

    def encode_and_put(b: dict) -> tuple[float, dict]:
        audio_s = float(np.sum(b["wave_lens"])) / sample_rate
        db = dict(device_view(b))
        # normally a no-op: the pipeline pre-encodes corpora at build/load
        # time (bulk conversion HERE, on the worker thread, serializes
        # against dispatch — measured +120 ms/step at the campaign shape)
        db["waves"] = wire_waves(db["waves"], wire_dtype)
        return audio_s, put(db)

    if depth <= 0:
        for b in batches:
            yield encode_and_put(b)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for b in batches:
                item = encode_and_put(b)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced to the consumer below
            err.append(e)
        finally:
            try:
                q.put_nowait(_SENTINEL)
            except queue.Full:
                pass  # consumer gone; stop flag ends its loop

    t = threading.Thread(target=worker, daemon=True, name="tpuasr-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
    finally:
        # consumer abandoned early (error in the step / break): unblock the
        # worker so the daemon thread exits promptly
        stop.set()
        t.join(timeout=60.0)
    if err:
        raise err[0]

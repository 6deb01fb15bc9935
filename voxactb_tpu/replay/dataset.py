"""Replay -> device feed with background prefetch and double buffering.

Counterpart of ``PyTorchReplayBuffer`` (yarr/replay_buffer/wrappers/pytorch_replay_buffer.py:59-82
— IterableDataset + DataLoader workers + pin_memory). The TPU-native shape of the same
idea: a background thread samples the next host batch while the device computes on the
current one, and ``jax.device_put`` lands it asynchronously (or onto an explicit
sharding for multi-chip runs).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class PrefetchIterator:
    """Infinite iterator of device-resident replay batches."""

    def __init__(
        self,
        sample_fn: Callable[[], Dict[str, np.ndarray]],
        prefetch: int = 2,
        sharding=None,
        augment_fn: Optional[Callable] = None,
    ):
        self._sample_fn = sample_fn
        self._sharding = sharding
        self._augment_fn = augment_fn
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            while not self._stop.is_set():
                batch = self._sample_fn()
                if self._augment_fn is not None:
                    batch = self._augment_fn(batch)
                if self._sharding is not None:
                    batch = {k: jax.device_put(v, self._sharding)
                             for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
            # a silently-dead worker would hang the train loop forever on an
            # un-timed queue.get(); forward the failure to the consumer
            self._error = e
            self._stop.set()

    def __iter__(self) -> Iterator[Dict[str, jax.Array]]:
        return self

    def __next__(self) -> Dict[str, jax.Array]:
        while True:
            if self._error is not None:
                raise RuntimeError("replay prefetch worker failed") \
                    from self._error
            if self._stop.is_set():
                raise StopIteration
            try:
                return self._queue.get(timeout=1.0)
            except queue.Empty:
                continue

    def close(self):
        self._stop.set()
        # drain so the worker can exit its put()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

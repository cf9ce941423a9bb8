"""Host -> device input pipeline.

The reference's throughput device-feeding comes from forked DataLoader
workers (`intrepppid/data/ppi_oma.py:611-620`). The TPU-native equivalent is
a background producer thread (the native tokenizer releases the GIL during
its C++ batch call) plus asynchronous ``jax.device_put`` double-buffering:
batch N+1 is tokenised and transferred to HBM while the TPU executes step N.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

_SENTINEL = object()


def _threaded_iter(
    batches: Iterator,
    size: int,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Run ``batches`` (optionally mapped through ``transform``) in a
    background thread with a bounded hand-off queue.

    Shutdown-safe: if the consumer abandons the generator mid-stream
    (exception in the training loop, partial drain), closing it signals the
    producer via a stop event and drains the queue, so the thread exits
    instead of blocking forever in ``q.put`` holding multi-MB batches.
    Upstream exceptions re-raise in the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    err: list = []
    stop = threading.Event()

    def produce():
        try:
            for item in batches:
                item = transform(item) if transform is not None else item
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # propagate into the consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # unblock a producer waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break


def host_prefetch(batches: Iterator, size: int = 2) -> Iterator:
    """Run a host batch iterator in its own background thread.

    Stacked in FRONT of :func:`prefetch_to_device` this splits the input
    pipeline into two concurrent stages — tokenisation (this thread; the
    C++ engine releases the GIL) and device transfer (the prefetch thread;
    the runtime wire write releases the GIL) — so batch N+2 tokenises
    while batch N+1 streams to HBM and batch N executes. Measured on the
    bench config the single-thread producer serialised those stages
    (~33 ms/batch = ~17 device pipeline + ~16 host). Bounded queue ``size``
    keeps at most that many batches of host RAM in flight.
    """
    return _threaded_iter(batches, size)


def prefetch_to_device(
    batches: Iterator[Dict[str, np.ndarray]],
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Wrap a host batch iterator with a prefetching device-transfer thread.

    :param batches: iterator of numpy batch dicts.
    :param size: prefetch depth (2 = double buffering).
    :param sharding: optional ``jax.sharding.Sharding`` for multi-device
        placement of each array, or a callable ``batch -> Sharding`` (e.g.
        to pick a stacked sharding for (K, B, ...) dispatch groups);
        None = default device placement.
    """
    multihost = jax.process_count() > 1
    sharding_fn = sharding if callable(sharding) else (lambda _b: sharding)

    def put(batch):
        sharding = sharding_fn(batch)
        if sharding is not None:
            if multihost:
                # each process feeds its local rows of the global batch
                return {
                    k: jax.make_array_from_process_local_data(
                        sharding, np.asarray(v)
                    )
                    for k, v in batch.items()
                }
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return jax.device_put(batch)

    def transform(item):
        if isinstance(item, tuple):
            # (batch, aux) pairs: transfer the batch, pass aux through
            return (put(item[0]),) + item[1:]
        return put(item)

    return _threaded_iter(batches, size, transform)

"""Background batch prefetching for the training input pipeline.

The TPU analog of the reference stack's multi-worker DataLoader overlap
(detectron2 build_detection_train_loader): a daemon thread keeps a small
bounded queue of ready host batches so image decode/resize overlaps the
device step instead of serializing with it. Combine with
``train_batches(workers=N)`` for intra-batch decode parallelism.
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_DONE = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Yield from ``it`` through a ``depth``-deep background queue.

    Exceptions in the producer re-raise at the consuming ``next()``.
    The producer thread is a daemon, so abandoning the iterator (e.g.
    breaking out of the training loop) cannot hang interpreter exit.
    An abandoned consumer cannot leave the producer polling for the
    process lifetime either: the producer stops when (a) the consumer's
    ``close()``/``finally`` runs, or (b) the returned generator is
    garbage-collected (weakref.finalize — covers reference cycles the
    moment the cycle collector sees them). There is deliberately NO
    idle timeout: a consumer legitimately stalls for long stretches
    (periodic COCO eval, first-step jit compile), and treating a full
    queue as abandonment turned those stalls into silent mid-run hangs.
    Conversely the consumer polls with a timeout and raises if the
    producer thread died without delivering its sentinel, so producer
    death can never strand the training loop on a bare ``q.get()``.
    """
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not put_or_stop(item):
                    return
            put_or_stop(_DONE)
        except BaseException as e:  # propagate to the consumer
            put_or_stop(e)

    t = threading.Thread(target=run, daemon=True, name="batch-prefetch")

    def gen():
        t.start()
        try:
            while True:
                try:
                    item = q.get(timeout=5.0)
                except queue.Empty:
                    if not t.is_alive() and q.empty():
                        raise RuntimeError(
                            "prefetch producer thread died without a "
                            "sentinel") from None
                    continue
                if item is _DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    g = gen()
    weakref.finalize(g, stop.set)
    return g

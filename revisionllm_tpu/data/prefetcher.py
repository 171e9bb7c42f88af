"""Host->device double-buffered prefetch.

The HBM-feeding half of the input pipeline (BASELINE.json north-star:
"streaming pre-extracted feature sequences from host DRAM to HBM with
double-buffered prefetch"): a background thread stages batch N+1 onto the
device (optionally with a target sharding) while the compiled step consumes
batch N, hiding the PCIe/relay transfer entirely for steady-state steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wraps a host-batch iterator; yields device-resident batches.

    size=2 gives classic double buffering. `sharding` may be a single sharding
    applied to every leaf or a pytree of shardings."""

    def __init__(
        self,
        batches: Iterable[Any],
        size: int = 2,
        sharding: Optional[Any] = None,
    ):
        self._it = iter(batches)
        self._sharding = sharding
        self._q: "queue.Queue" = queue.Queue(maxsize=size)
        self._done = object()
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _put_device(self, batch):
        if self._sharding is None:
            return jax.device_put(batch)
        if isinstance(self._sharding, (jax.sharding.Sharding,)):
            return jax.device_put(batch, self._sharding)
        return jax.device_put(batch, self._sharding)

    def _fill(self):
        try:
            for batch in self._it:
                self._q.put(self._put_device(batch))
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self) -> Iterator[Any]:
        while True:
            item = self._q.get()
            if item is self._done:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_map(
    fn: Callable[[Any], Any], items: Iterable[Any], size: int = 2
) -> Iterator[Any]:
    """Run `fn` (host-side batch assembly) in a background thread, `size`
    batches ahead — the CPU half of the pipeline (dataset getitem + collation
    overlapping device steps)."""

    q: "queue.Queue" = queue.Queue(maxsize=size)
    done = object()
    err: list = []

    def fill():
        try:
            for item in items:
                q.put(fn(item))
        except BaseException as e:
            err.append(e)
        finally:
            q.put(done)

    threading.Thread(target=fill, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            if err:
                raise err[0]
            return
        yield item

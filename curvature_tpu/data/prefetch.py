"""Host-side data pipeline: RAM caching and threaded device prefetch.

TPU-native analogue of the reference's loader machinery — the ``Memory`` /
``Cashed`` RAM-caching wrappers (datasets.py:83-183), the shared-buffer
serialized ImageNet pipeline (imagenet.py:88-140), and DataLoader worker
overlap — built from a decode thread pool plus a double-buffered
host->device transfer queue so the accelerator never waits on input.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator

import numpy as np
import jax


class CachedLoader:
    """Materializes any (x, y) batch iterable into RAM once, then serves
    from memory (the reference's Memory.set_use_cache flow,
    datasets.py:108-127)."""

    def __init__(self, loader: Iterable):
        self._loader = loader
        self._cache = None

    def _fill(self):
        xs, ys = [], []
        for x, y in self._loader:
            xs.append(np.asarray(x))
            ys.append(np.asarray(y))
        self._cache = list(zip(xs, ys))

    def __len__(self):
        if self._cache is None:
            self._fill()
        return len(self._cache)

    def __iter__(self):
        if self._cache is None:
            self._fill()
        return iter(self._cache)


class DevicePrefetcher:
    """Wraps a batch iterable; a background thread stages the next
    ``depth`` batches onto the device while the current one computes.

    The reference overlaps H2D with ``pin_memory`` + ``non_blocking=True``
    copies (datasets.py:104-106, factors.py:51); here jax's async dispatch
    does the copy and the thread hides host-side decode latency.
    """

    def __init__(self, loader: Iterable, depth: int = 2, device=None):
        """``device`` may be a Device or a ``jax.sharding.Sharding`` (mesh
        runs stage batches pre-sharded over the data axis; the compute step
        then starts without a resharding transfer)."""
        self.loader = loader
        self.depth = depth
        self.device = device or jax.devices()[0]

    def __len__(self):
        return len(self.loader)

    def _put(self, a):
        from jax.sharding import NamedSharding
        d = self.device
        if isinstance(d, NamedSharding) and len(d.spec) and d.spec[0]:
            # ragged tail batches can't take the data-axis sharding; leave
            # them on the host — the consumer's fallback program takes them
            if np.asarray(a).shape[0] % d.mesh.shape[d.spec[0]] != 0:
                return np.asarray(a)
        return jax.device_put(a, d)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()

        def producer():
            # a loader failure must propagate to the consumer, not end the
            # epoch early — otherwise factors get silently estimated from a
            # truncated dataset with exit code 0
            try:
                for x, y in self.loader:
                    q.put((self._put(x), self._put(y)))
                q.put(sentinel)
            except BaseException as e:  # re-raised on the consumer side
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


class ParallelDecodeLoader:
    """Decodes image-folder batches with a thread pool ahead of
    consumption — the analogue of DataLoader workers over the serialized
    sample list (imagenet.py:88-140)."""

    def __init__(self, folder_loader, workers: int = 4, lookahead: int = 4):
        self.inner = folder_loader
        self.workers = workers
        self.lookahead = lookahead

    def __len__(self):
        return len(self.inner)

    def _batches(self):
        """Index batches in the inner loader's iteration order."""
        return self.inner.batch_indices()

    def __iter__(self):
        load = self.inner.load_batch
        with ThreadPoolExecutor(self.workers) as pool:
            futures = []
            batches = list(self._batches())
            for sel in batches[:self.lookahead]:
                futures.append(pool.submit(load, sel))
            i = self.lookahead
            for fut_idx in range(len(batches)):
                x, y = futures[fut_idx].result()
                if i < len(batches):
                    futures.append(pool.submit(load, batches[i]))
                    i += 1
                yield x, y

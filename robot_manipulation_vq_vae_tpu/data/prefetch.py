"""Device prefetch: overlapped host->device transfer.

Two tools:

* :func:`device_prefetch` — a simple double-buffered generator (transfer of
  batch N+k initiated when batch N is yielded). Enough when
  ``jax.device_put`` returns before the DMA completes.
* :class:`DevicePrefetcher` — a background-thread pipeline used by the
  training loop (``utils/train_utils.run_epoch`` via ``scripts/train.py``).
  The worker thread does host batch fetch -> per-algo host processing ->
  ``jax.device_put`` -> block-until-transferred, so the host->device copy of
  batch N+1 overlaps the device's step N even when ``device_put`` blocks the
  calling thread (observed on tunneled TPU backends). This is the TPU
  equivalent of the reference's 48-worker DataLoader + pin_memory pipeline
  (``robomimic/utils/train_utils.py:1238-1328`` consuming
  ``train_config.json train.num_data_workers``).
"""

import queue
import threading
import time

import jax


def _put(batch, sharding=None):
    if sharding is not None:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(jax.device_put, batch)


def _tree_nbytes(batch):
    return sum(
        getattr(x, "nbytes", 0) for x in jax.tree_util.tree_leaves(batch)
    )


def device_prefetch(iterator, size=2, sharding=None):
    """Yield device-resident batches from a host iterator, keeping @size
    transfers in flight. @sharding optionally places each leaf (e.g.
    batch-sharded over a dp mesh axis)."""
    import collections

    buf = collections.deque()

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(_put(next(it), sharding))
    except StopIteration:
        pass
    while buf:
        try:
            buf.append(_put(next(it), sharding))
        except StopIteration:
            pass
        yield buf.popleft()


class _Closed(Exception):
    pass


_SENTINEL = object()


class DevicePrefetcher:
    """Background-thread host->device pipeline over a batch loader.

    The worker, per batch: pull from the host iterator, run ``prepare``
    (per-algo host-side numpy work — batch slicing, obs normalization),
    ``jax.device_put`` the prepared pytree, and ``jax.block_until_ready``
    it BEFORE queueing. Blocking in the worker (not the consumer) is what
    creates the overlap, and it also guarantees the loader's reused host
    buffers (``DataLoader(reuse_buffers=True)``'s ring) are never recycled
    while a DMA still reads them, and makes the recorded transfer time
    real.

    One instance should live for a whole training run (created once in
    ``scripts/train.py`` and passed to every ``run_epoch``): batches are
    yielded strictly in iterator order and never dropped, so the sample
    stream is bit-identical to the synchronous path regardless of thread
    timing (exact-resume tests rely on this).

    Attributes:
        stats: dict of per-batch lists — ``host_load_s``, ``host_process_s``,
            ``transfer_s``, ``bytes`` — read by the steady-state harness to
            decompose where epoch time goes (e.g. tunnel-bandwidth ceilings).
    """

    def __init__(self, data_loader, prepare=None, depth=2, sharding=None):
        self._loader = data_loader
        self._prepare = prepare
        self._sharding = sharding
        self._q = queue.Queue(maxsize=max(1, depth))
        self._closed = threading.Event()
        self.stats = {
            "host_load_s": [], "host_process_s": [], "transfer_s": [],
            "bytes": [],
        }
        self._thread = threading.Thread(
            target=self._work, name="device-prefetch", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------ worker
    def _work(self):
        it = iter(self._loader)
        while not self._closed.is_set():
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                it = iter(self._loader)  # same restart policy as run_epoch
                try:
                    batch = next(it)
                except StopIteration:  # empty loader
                    self._q.put(_SENTINEL)
                    return
            except Exception as e:  # surface loader errors in the consumer
                self._q.put(e)
                return
            t1 = time.perf_counter()
            try:
                if self._prepare is not None:
                    batch = self._prepare(batch)
                t2 = time.perf_counter()
                nbytes = _tree_nbytes(batch)
                batch = _put(batch, self._sharding)
                jax.block_until_ready(batch)
                t3 = time.perf_counter()
            except Exception as e:
                self._q.put(e)
                return
            self.stats["host_load_s"].append(t1 - t0)
            self.stats["host_process_s"].append(t2 - t1)
            self.stats["transfer_s"].append(t3 - t2)
            self.stats["bytes"].append(nbytes)
            # blocks when `depth` batches are ready: natural backpressure
            while not self._closed.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    # ---------------------------------------------------------- consumer
    def get(self):
        """Next device-resident batch (blocks while the pipeline fills)."""
        if self._closed.is_set():
            raise _Closed("prefetcher is closed")
        while True:
            try:
                item = self._q.get(timeout=1.0)
                break
            except queue.Empty:
                if not self._thread.is_alive():
                    raise RuntimeError(
                        "device-prefetch worker died without a result"
                    )
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def __iter__(self):
        while True:
            try:
                yield self.get()
            except StopIteration:
                return

    def transfer_summary(self):
        """Totals for the steady-state artifact: seconds + MB/s by stage."""
        s = self.stats
        total_b = float(sum(s["bytes"]))
        total_t = float(sum(s["transfer_s"]))
        return {
            "batches": len(s["bytes"]),
            "host_load_s": round(float(sum(s["host_load_s"])), 3),
            "host_process_s": round(float(sum(s["host_process_s"])), 3),
            "transfer_s": round(total_t, 3),
            "transfer_mbytes": round(total_b / 1e6, 1),
            "transfer_mbytes_per_sec": (
                round(total_b / 1e6 / total_t, 1) if total_t > 0 else 0.0
            ),
        }

    def reset_stats(self):
        for v in self.stats.values():
            del v[:]

    def close(self):
        """Stop the worker and drop any prefetched batches."""
        self._closed.set()
        # unblock a worker stuck in q.put
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        # safety net for callers that error out of a training run without
        # closing: stop the worker so it doesn't keep pulling batches
        try:
            self.close()
        except Exception:
            pass

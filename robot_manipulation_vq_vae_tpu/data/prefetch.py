"""Device prefetch: double-buffered host->device transfer.

Keeps the next batch's transfer in flight while the current step runs, so
the TPU never waits on PCIe/tunnel (the JAX equivalent of the reference's
DataLoader pin_memory + worker pipeline).
"""

import jax


def device_prefetch(iterator, size=2, sharding=None):
    """Yield device-resident batches from a host iterator, keeping @size
    transfers in flight. @sharding optionally places each leaf (e.g.
    batch-sharded over a dp mesh axis)."""
    import collections

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield buf.popleft()

"""DevicePrefetcher: the background pipeline must actually OVERLAP host
work (batch fetch + processing + host->device transfer) with the
consumer's step, preserve exact FIFO order with no drops (exact-resume
depends on it), and surface worker errors in the consumer.

This locks in the round-5 architecture fix: the train loop's host->device
choreography (reference overlaps via 48 DataLoader workers + pin_memory,
robomimic/utils/train_utils.py:1238-1328 + train_config.json
train.num_data_workers).
"""

import time

import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.data.prefetch import DevicePrefetcher


class SlowLoader:
    """Iterable yielding labeled batches, sleeping `delay` per fetch (stands
    in for disk I/O + window gather)."""

    def __init__(self, n, delay, restarts=True):
        self.n = n
        self.delay = delay
        self.restarts = restarts
        self.fetched = 0

    def __iter__(self):
        for i in range(self.n):
            time.sleep(self.delay)
            self.fetched += 1
            yield {"idx": np.full((4,), i, np.int32),
                   "payload": np.zeros((64,), np.float32)}


def test_overlap_wall_time():
    """Pipelined wall time ~ N*max(load, step), not N*(load + step)."""
    n, load, step = 12, 0.04, 0.04
    serial_est = n * (load + step)

    loader = SlowLoader(n, load)
    pf = DevicePrefetcher(loader, depth=2)
    t0 = time.perf_counter()
    seen = []
    for _ in range(n):
        batch = pf.get()
        seen.append(int(np.asarray(batch["idx"])[0]))
        time.sleep(step)  # stands in for the (blocked-on) device step
    wall = time.perf_counter() - t0
    pf.close()

    assert seen == list(range(n))
    # perfect overlap would be ~n*step + load (ramp); allow generous CI
    # noise but demand clearly-better-than-serial
    assert wall < 0.75 * serial_est, (
        f"no overlap: wall={wall:.3f}s vs serial~{serial_est:.3f}s"
    )


def test_order_and_restart_across_epochs():
    """Exactly-once FIFO across the loader's restart boundary: consuming
    1.5 'epochs' worth must yield 0..n-1,0..n/2-1 with nothing skipped
    (the prefetcher restarts the iterator exactly like run_epoch did)."""
    n = 8
    loader = SlowLoader(n, 0.0)
    with DevicePrefetcher(loader, depth=2) as pf:
        got = [int(np.asarray(pf.get()["idx"])[0]) for _ in range(n + n // 2)]
    assert got == list(range(n)) + list(range(n // 2))


def test_prepare_runs_on_worker_and_stats():
    """`prepare` output (per-algo host processing) is what arrives on
    device, and the worker records load/process/transfer stats + bytes."""
    n = 6
    loader = SlowLoader(n, 0.0)

    def prepare(batch):
        return {"doubled": np.asarray(batch["idx"]) * 2}

    with DevicePrefetcher(loader, prepare=prepare, depth=2) as pf:
        out = [np.asarray(pf.get()["doubled"])[0] for _ in range(n)]
        assert out == [2 * i for i in range(n)]
        # give the worker a beat to record the trailing prefetched entries
        time.sleep(0.05)
        s = pf.transfer_summary()
    assert s["batches"] >= n
    assert sum(pf.stats["bytes"]) > 0
    for k in ("host_load_s", "host_process_s", "transfer_s",
              "transfer_mbytes_per_sec"):
        assert k in s


def test_worker_error_surfaces_in_consumer():
    class Boom(Exception):
        pass

    def bad_prepare(batch):
        raise Boom("host processing failed")

    loader = SlowLoader(4, 0.0)
    with DevicePrefetcher(loader, prepare=bad_prepare) as pf:
        with pytest.raises(Boom):
            pf.get()


def test_run_epoch_uses_prefetcher_and_reports_decomposition():
    """run_epoch with a DevicePrefetcher: same losses as the sync path,
    all four buckets present, prefetch/* decomposition attached."""
    from robot_manipulation_vq_vae_tpu.utils import train_utils as TU

    class TinyModel:
        """Minimal Algo-shaped object: records the action sums it saw."""

        def __init__(self):
            self.seen = []

        def set_train(self):
            pass

        def set_eval(self):
            pass

        def process_batch_for_training(self, batch):
            return {"actions": np.asarray(batch["payload"]) + 1.0}

        def postprocess_batch_for_training(self, batch,
                                           obs_normalization_stats=None):
            return batch

        def train_on_batch(self, batch, epoch, validate=False):
            val = float(np.asarray(batch["actions"]).sum())
            self.seen.append(val)
            return {"losses": {"action_loss": val}}

        def log_info(self, info):
            return {"Loss": float(info["losses"]["action_loss"])}

    def make_loader(n):
        return SlowLoader(n, 0.0)

    # sync path
    m_sync = TinyModel()
    out_sync = TU.run_epoch(m_sync, make_loader(6), epoch=1, num_steps=6)

    # prefetched path
    m_pre = TinyModel()
    pf = DevicePrefetcher(
        make_loader(6),
        prepare=TU.make_batch_preparer(m_pre),
        depth=2,
    )
    out_pre = TU.run_epoch(
        m_pre, make_loader(6), epoch=1, num_steps=6, data_loader_iter=pf
    )
    pf.close()

    assert m_sync.seen == m_pre.seen
    assert out_sync["Loss"] == out_pre["Loss"]
    for bucket in ("Time_Data_Loading", "Time_Process_Batch",
                   "Time_Train_Batch", "Time_Log_Info"):
        assert bucket in out_pre
    assert "prefetch/transfer_mbytes_per_sec" in out_pre
    assert out_pre["prefetch/batches"] >= 6

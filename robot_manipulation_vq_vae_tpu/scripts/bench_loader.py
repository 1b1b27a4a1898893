"""Host data-pipeline throughput: SequenceDataset windowing + DataLoader
batching over a synthetic image dataset at the flagship's shapes (3 cameras
128x128 uint8, window 16). The TPU step consumes ~520 samples/s at batch 64
(bf16), i.e. ~1.2 GB/s of raw uint8 window gathers - this script tells you
whether the host side keeps up and how much the native C++ gather and the
in-memory cache matter.

Prints one JSON line per configuration."""

import argparse
import json
import os
import tempfile
import time

import h5py
import numpy as np


def write_synthetic(path, n_demos=8, t=120, img=(128, 128, 3), n_cams=3):
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        grp = f.create_group("data")
        grp.attrs["env_args"] = json.dumps(
            {"env_name": "Synthetic", "type": 2, "env_kwargs": {}}
        )
        total = 0
        for i in range(n_demos):
            ep = grp.create_group(f"demo_{i}")
            for c in range(n_cams):
                ep.create_dataset(
                    f"obs/cam{c}_image",
                    data=rng.randint(0, 255, (t,) + img, dtype=np.uint8),
                )
            ep.create_dataset(
                "obs/proprio", data=rng.randn(t, 9).astype(np.float32)
            )
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (t, 12)).astype(np.float32)
            )
            ep.attrs["num_samples"] = t
            total += t
        grp.attrs["total"] = total
    return path


def bench(path, cache_mode, batch_size=64, seq_length=16, n_batches=30,
          num_workers=2, reuse_buffers=False, results=None):
    from robot_manipulation_vq_vae_tpu.data.dataset import SequenceDataset
    from robot_manipulation_vq_vae_tpu.data.loader import DataLoader

    obs_keys = [f"cam{c}_image" for c in range(3)] + ["proprio"]
    ds = SequenceDataset(
        hdf5_path=path,
        obs_keys=obs_keys,
        action_keys=["actions"],
        dataset_keys=("actions",),
        action_config={},
        seq_length=seq_length,
        frame_stack=1,
        load_next_obs=False,
        hdf5_cache_mode=cache_mode,
    )
    loader = DataLoader(
        ds, batch_size=batch_size, shuffle=True, num_workers=num_workers,
        reuse_buffers=reuse_buffers,
    )
    it = iter(loader)
    # Warm up EVERY buffer-ring slot, not just one batch: with
    # reuse_buffers the ring holds prefetch+2 slots and each slot's first
    # use pays the ~20x fresh-allocation page-fault cost — measuring that
    # (plus file opens / cache fills) once reported 117 samples/s for a
    # steady state of ~2000.
    n_warm = len(loader._buffer_ring) if reuse_buffers else 1
    for _ in range(n_warm):
        next(it)

    def one_pass():
        nonlocal it
        t0 = time.perf_counter()
        n = 0
        for _ in range(n_batches):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            n += batch["actions"].shape[0]
        return n / (time.perf_counter() - t0)

    # median of 3 passes: this box has ONE cpu and background processes
    # (e.g. a jax import) can steal a whole measurement window — observed
    # 85-2193 samples/s rep-to-rep for identical configs. The median
    # tolerates one stolen pass.
    rate = sorted(one_pass() for _ in range(3))[1]
    bytes_per_sample = seq_length * 3 * 128 * 128 * 3
    entry = {
        "metric": "host_loader_throughput",
        "value": round(rate, 1),
        "unit": (
            f"samples/sec (cache={cache_mode}, workers={num_workers}, "
            f"reuse={reuse_buffers}, median_of_3)"
        ),
        "gbytes_per_sec": round(rate * bytes_per_sample / 1e9, 2),
    }
    print(json.dumps(entry))
    if results is not None:
        # flush after EACH configuration so a deadline kill from the bench
        # orchestrator (bench.py loader leg) still captures completed ones
        results.append(entry)
        result_file = os.environ.get("RMVQ_RESULT_FILE")
        if result_file:
            from robot_manipulation_vq_vae_tpu.utils.file_utils import (
                atomic_write_json,
            )

            atomic_write_json(result_file, results)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_workers", type=int, default=2)
    args = parser.parse_args()

    if args.dataset is None:
        tmp = tempfile.mkdtemp()
        path = write_synthetic(os.path.join(tmp, "bench.hdf5"))
    else:
        path = args.dataset
    quick = os.environ.get("RMVQ_LOADER_QUICK", "0") == "1"
    # quick mode (bench.py opportunistic leg): the production path only
    # (in-memory cache + reused buffers), fewer batches, ~30 s total
    configs = (
        (("all", True),) if quick
        else (("all", True), ("all", False), (None, False))
    )
    results = []
    for cache_mode, reuse in configs:
        bench(path, cache_mode, batch_size=args.batch_size,
              num_workers=args.num_workers, reuse_buffers=reuse,
              n_batches=15 if quick else 30, results=results)

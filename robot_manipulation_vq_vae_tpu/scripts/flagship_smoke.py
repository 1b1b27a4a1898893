"""Flagship-scale end-to-end hardware smoke: scripts/train.py on a
synthetic robomimic-layout dataset at the shipped scale (3 cams 128x128 ->
116 crop, FiLM-ResNet18 + SpatialSoftmax, 6L/512d transformer, window
16+16, HVQVAE co-training), bf16, batch 64. Validates the whole pipeline
- HDF5 -> native window gather -> host->device -> jitted train step ->
checkpoint - on the actual accelerator, complementing bench_train.py
(which synthesizes batches on device to isolate the step).

Two modes:

* default: 1 epoch x 3 steps — the quick finiteness/ckpt smoke (~4 min
  with a warm compile cache).
* ``RMVQ_SMOKE_STEADY=1``: 2 epochs x 30 steps. Epoch 1 absorbs the XLA
  compile; epoch 2 is MEASURED steady state with the real disk-backed
  loader feeding the chip, printed as ``flagship_e2e_steps_per_sec``
  together with ALL FOUR run_epoch timing buckets (Data_Loading /
  Process_Batch / Train_Batch / Log_Info — reference hot loop
  robomimic/utils/train_utils.py:1238-1328) AND the DevicePrefetcher
  worker's decomposition (host load / host process / host->device
  transfer seconds + measured MB/s). Set ``RMVQ_EXPECT_STEPS_PER_SEC``
  to also assert within 12% of bench_train's device-synthesized number —
  only meaningful on non-tunneled hardware, see below.

MEASUREMENT CAVEAT (round-4 lesson; round-5 measurement in
docs/harvest_r5/steady.log): over the axon tunnel the host->device link
moves the ~154 MB uint8 flagship batches at a MEASURED 33.3 MB/s, so
even with the transfer fully overlapped (data/prefetch.DevicePrefetcher,
wired in scripts/train.py) the steady state is TRANSFER-bound: measured
0.203 steps/s = 94% of the link's 0.216 steps/s ceiling (the
unoverlapped round-4 loop reached 77% of it, docs/harvest_r4/
steady.log). The printed decomposition exists precisely to make that
attribution explicit: on real (non-tunneled) TPU hosts the same
transfer runs at multi-GB/s and the pipeline is compute-bound at
bench_train's 8.2-8.3 steps/s. Do not assert RMVQ_EXPECT_STEPS_PER_SEC
over the tunnel.

Usage: python -m robot_manipulation_vq_vae_tpu.scripts.flagship_smoke
"""
import json
import os
import tempfile
import time

import h5py
import numpy as np

STEADY = os.environ.get("RMVQ_SMOKE_STEADY", "0") == "1"
STEPS_PER_EPOCH = 30 if STEADY else 3
N_EPOCHS = 2 if STEADY else 1

CAMS = ["robot0_agentview_left_image", "robot0_agentview_right_image",
        "robot0_eye_in_hand_image"]
LOW_DIM = {"robot0_base_to_eef_pos": 3, "robot0_base_to_eef_quat": 4,
           "robot0_base_pos": 3, "robot0_base_quat": 4,
           "robot0_gripper_qpos": 2}
A, T, N_DEMOS = 12, 40, 8

tmp = tempfile.mkdtemp(prefix="rmvq_flagship_e2e_")
data_path = os.path.join(tmp, "demos.hdf5")
rng = np.random.RandomState(0)
with h5py.File(data_path, "w") as f:
    data = f.create_group("data")
    data.attrs["env_args"] = json.dumps(
        {"env_name": "Flagship", "type": 1, "env_kwargs": {}})
    for i in range(N_DEMOS):
        ep = data.create_group(f"demo_{i}")
        ep.attrs["num_samples"] = T
        ep.attrs["ep_meta"] = json.dumps({"lang": "pick the object"})
        obs = ep.create_group("obs")
        for k, d in LOW_DIM.items():
            obs.create_dataset(k, data=rng.randn(T, d).astype(np.float32))
        for c in CAMS:
            obs.create_dataset(
                c, data=rng.randint(0, 255, (T, 128, 128, 3), dtype=np.uint8))
        ep.create_dataset(
            "actions", data=rng.uniform(-1, 1, (T, A)).astype(np.float32))
print("dataset written", flush=True)

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.train import train
from robot_manipulation_vq_vae_tpu.utils.train_utils import enable_compile_cache

enable_compile_cache()

config = config_factory("icl")
with config.values_unlocked():
    config.experiment.name = "flagship_e2e"
    config.experiment.validate = False
    config.experiment.rollout.enabled = False
    config.experiment.logging.terminal_output_to_txt = False
    config.experiment.logging.log_tb = False
    config.experiment.save.enabled = True
    config.experiment.save.every_n_epochs = N_EPOCHS
    config.experiment.epoch_every_n_steps = STEPS_PER_EPOCH
    config.train.data = [{"path": data_path, "do_eval": False}]
    config.train.output_dir = os.path.join(tmp, "out")
    config.train.num_data_workers = 2
    config.train.hdf5_cache_mode = "all"
    config.train.seq_length = 16
    config.train.frame_stack = 16
    config.train.batch_size = 64
    config.train.num_epochs = N_EPOCHS
    config.train.mixed_precision = True
    config.train.max_grad_norm = 100.0
    config.train.action_config = {"actions": {"normalization": "min_max"}}
    config.observation.modalities.obs.low_dim = list(LOW_DIM)
    config.observation.modalities.obs.rgb = list(CAMS)
    config.observation.encoder.rgb.core_class = "VisualCoreLanguageConditioned"
    config.observation.encoder.rgb.core_kwargs = {
        "feature_dimension": 64,
        "backbone_class": "ResNet18ConvFiLM",
        "backbone_kwargs": {"pretrained": False, "input_coord_conv": False},
        "pool_class": "SpatialSoftmax",
        "pool_kwargs": {"num_kp": 32, "learnable_temperature": False,
                        "temperature": 1.0, "noise_std": 0.0},
    }
    config.observation.encoder.rgb.obs_randomizer_class = "CropRandomizer"
    config.observation.encoder.rgb.obs_randomizer_kwargs = {
        "crop_height": 116, "crop_width": 116, "num_crops": 1,
        "pos_enc": False,
    }
    t = config.algo.transformer
    t.enabled = True
    t.context_length = 16
    t.supervise_all_steps = True
    t.pred_future_acs = True
    t.causal = False
config.lock()

t0 = time.perf_counter()
history = train(config)
print(f"train() wall: {time.perf_counter()-t0:.1f}s", flush=True)
import glob

ckpts = glob.glob(os.path.join(tmp, "out", "**", "models", "*.ckpt"),
                  recursive=True)
assert ckpts, "no checkpoint"

if STEADY:
    # epoch 2 = post-compile steady state with the REAL loader feeding
    # the device: one measured end-to-end number (Time_Epoch is minutes)
    last = history[-1]
    assert last["epoch"] == N_EPOCHS, history
    e2e_steps_per_sec = STEPS_PER_EPOCH / (last["Time_Epoch"] * 60.0)
    result = {
        "metric": "flagship_e2e_steps_per_sec",
        "value": round(e2e_steps_per_sec, 3),
        "steps": STEPS_PER_EPOCH,
        # ALL FOUR buckets (minutes over the epoch). With the
        # DevicePrefetcher wired in: Data_Loading = stall waiting for a
        # device-ready batch (the transfer-bound residual shows up HERE),
        # Process_Batch ~ 0 (runs on the prefetch worker), Train_Batch =
        # blocked-on device step, Log_Info = metric fetch.
        "time_data_loading_min": round(last.get("Time_Data_Loading", 0.0), 4),
        "time_process_batch_min": round(
            last.get("Time_Process_Batch", 0.0), 4),
        "time_train_batch_min": round(last.get("Time_Train_Batch", 0.0), 4),
        "time_log_info_min": round(last.get("Time_Log_Info", 0.0), 4),
        # prefetch-worker decomposition (concurrent with the above):
        # measured host->device bandwidth pins transfer-bound steady states
        # on the link, not the framework
        "prefetch_host_load_s": last.get("prefetch/host_load_s"),
        "prefetch_host_process_s": last.get("prefetch/host_process_s"),
        "prefetch_transfer_s": last.get("prefetch/transfer_s"),
        "prefetch_transfer_mbytes": last.get("prefetch/transfer_mbytes"),
        "prefetch_transfer_mbytes_per_sec": last.get(
            "prefetch/transfer_mbytes_per_sec"),
        "epoch1_time_min_incl_compile": round(history[0]["Time_Epoch"], 3),
    }
    expect = os.environ.get("RMVQ_EXPECT_STEPS_PER_SEC")
    if expect:
        ratio = e2e_steps_per_sec / float(expect)
        result["vs_bench_train"] = round(ratio, 3)
        assert ratio > 0.88, (
            f"end-to-end {e2e_steps_per_sec:.2f} steps/s is more than 12% "
            f"below bench_train's device-synthesized {expect} — the host "
            f"data path is not sustaining the device step rate"
        )
    print(json.dumps(result), flush=True)
    path = os.environ.get("RMVQ_RESULT_FILE")
    if path:
        from robot_manipulation_vq_vae_tpu.utils.file_utils import (
            atomic_write_json,
        )

        atomic_write_json(path, result)
print("FLAGSHIP E2E OK:", ckpts[0], flush=True)

"""Flagship-scale end-to-end hardware smoke: scripts/train.py on a
synthetic robomimic-layout dataset at the shipped scale (3 cams 128x128 ->
116 crop, FiLM-ResNet18 + SpatialSoftmax, 6L/512d transformer, window
16+16, HVQVAE co-training), bf16, batch 64, 1 epoch x 3 steps. Validates
the whole pipeline - HDF5 -> native window gather -> host->device ->
jitted train step -> checkpoint - on the actual accelerator, complementing
bench_train.py (which synthesizes batches on device to isolate the step).

Last validated on a v5e chip: finite losses, ckpt written, 239 s wall
(dominated by the one-off XLA compile; steady-state steps match
bench_train's 8.2 steps/s).

Usage: python -m robot_manipulation_vq_vae_tpu.scripts.flagship_smoke
"""
import json
import os
import tempfile
import time

import h5py
import numpy as np

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
    config.experiment.save.every_n_epochs = 1
    config.experiment.epoch_every_n_steps = 3
    config.train.data = [{"path": data_path, "do_eval": False}]
    config.train.output_dir = os.path.join(tmp, "out")
    config.train.num_data_workers = 2
    config.train.hdf5_cache_mode = "all"
    config.train.seq_length = 16
    config.train.frame_stack = 16
    config.train.batch_size = 64
    config.train.num_epochs = 1
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
train(config)
print(f"train() wall: {time.perf_counter()-t0:.1f}s", flush=True)
import glob

ckpts = glob.glob(os.path.join(tmp, "out", "**", "models", "*.ckpt"),
                  recursive=True)
assert ckpts, "no checkpoint"
print("FLAGSHIP E2E OK:", ckpts[0], flush=True)

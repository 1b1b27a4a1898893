"""
WARNING: This script is only for instructive purposes, to point out different
         portions of the config - the preferred way to launch training runs
         is still with external jsons and scripts/train.py.

Example script for training a BC-RNN model end to end by constructing the
full config programmatically, field by field. Mirrors the reference example
(``/root/reference/robomimic/examples/train_bc_rnn.py``); since this build
is zero-egress, the default dataset is a synthesized robomimic-layout HDF5
(pass ``--dataset`` for a real one). Rollouts are disabled because no
simulator ships in this image.
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.train import train

OBS_DIMS = {"robot0_eef_pos": 3, "robot0_eef_quat": 4, "robot0_gripper_qpos": 2}
AC_DIM = 7


def make_synthetic_dataset(path, n_demos=4, T=20, seed=0):
    import h5py

    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Example", "type": 1, "env_kwargs": {}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            obs = ep.create_group("obs")
            for k, d in OBS_DIMS.items():
                obs.create_dataset(k, data=rng.randn(T, d).astype(np.float32))
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (T, AC_DIM)).astype(np.float32)
            )
    return path


def robosuite_hyperparameters(config):
    """Sets robosuite-appropriate hyperparameters in the config, section by
    section (mirrors the reference walkthrough)."""

    ## save config - if and when to save checkpoints ##
    config.experiment.save.enabled = True        # whether model saving should be enabled
    config.experiment.save.every_n_seconds = None  # save on cadence of epochs, not seconds
    config.experiment.save.every_n_epochs = 50   # save every 50 epochs
    config.experiment.save.epochs = []           # (additional) explicit epochs to save on
    config.experiment.save.on_best_validation = False
    config.experiment.save.on_best_rollout_return = False
    config.experiment.save.on_best_rollout_success_rate = True

    # epoch definition - number of gradient steps per epoch
    config.experiment.epoch_every_n_steps = 100
    config.experiment.validation_epoch_every_n_steps = 10

    # terminal logging / tensorboard / wandb
    config.experiment.logging.terminal_output_to_txt = True
    config.experiment.logging.log_tb = True

    ## evaluation rollout config ##
    config.experiment.rollout.enabled = True     # enable evaluation rollouts
    config.experiment.rollout.n = 50             # rollouts per evaluation
    config.experiment.rollout.horizon = 400
    config.experiment.rollout.rate = 50          # do rollouts every 50 epochs
    config.experiment.rollout.warmstart = 0
    config.experiment.rollout.terminate_on_success = True

    ## dataset loader config ##
    # num workers for loading data - set to 0 for low-dim, 2 for image datasets
    config.train.num_data_workers = 0
    # one of ["all", "low_dim", None]: "all" caches the entire hdf5 in memory
    # (fastest); "low_dim" caches all non-image data; None does file i/o per
    # batch sample (almost never what you want)
    config.train.hdf5_cache_mode = "all"
    config.train.hdf5_use_swmr = True            # concurrent-read-safe hdf5 handles
    config.train.hdf5_normalize_obs = False      # global mean/std obs normalization
    config.train.hdf5_filter_key = None          # demo filter key under mask/
    # fetch sequences of length 10 for RNN training
    config.train.seq_length = 10
    # keys from hdf5 to load per demonstration, besides "obs"
    config.train.dataset_keys = ("actions",)
    # one of [None, "last"]: "last" includes goal observations in each batch
    config.train.goal_mode = None

    ## learning config ##
    config.train.cuda = True                     # ignored on TPU: jax picks the backend
    config.train.batch_size = 16
    config.train.num_epochs = 2
    config.train.seed = 1

    ## observation config ##
    config.observation.modalities.obs.low_dim = list(OBS_DIMS)
    config.observation.modalities.obs.rgb = []
    config.observation.modalities.goal.low_dim = []
    config.observation.modalities.goal.rgb = []

    # observation encoder architecture - applies to all networks consuming
    # observation dicts. To use pre-trained visual representations instead,
    # set backbone_class to 'R3MConv' / 'MVPConv' with a converted trunk
    # (see models/base_nets.py R3MConv docstring).
    config.observation.encoder.rgb.core_class = "VisualCore"
    config.observation.encoder.rgb.core_kwargs.feature_dimension = 64
    config.observation.encoder.rgb.core_kwargs.backbone_class = "ResNet18Conv"
    config.observation.encoder.rgb.core_kwargs.pool_class = "SpatialSoftmax"
    config.observation.encoder.rgb.core_kwargs.pool_kwargs = {"num_kp": 32}
    # 'CropRandomizer' enables crop randomization (None disables)
    config.observation.encoder.rgb.obs_randomizer_class = None

    ## algo config ##
    # optimization parameters
    config.algo.optim_params.policy.learning_rate.initial = 1e-4
    config.algo.optim_params.policy.learning_rate.decay_factor = 0.1
    config.algo.optim_params.policy.learning_rate.epoch_schedule = []
    config.algo.optim_params.policy.regularization.L2 = 0.0

    # loss weights
    config.algo.loss.l2_weight = 1.0
    config.algo.loss.l1_weight = 0.0
    config.algo.loss.cos_weight = 0.0

    # MLP network architecture (after observation encoder and RNN)
    config.algo.actor_layer_dims = (300, 400)

    # stochastic GMM policy
    config.algo.gmm.enabled = True
    config.algo.gmm.num_modes = 5
    config.algo.gmm.min_std = 0.0001
    config.algo.gmm.std_activation = "softplus"
    config.algo.gmm.low_noise_eval = True

    # rnn policy config
    config.algo.rnn.enabled = True
    config.algo.rnn.horizon = 10                 # must match train.seq_length
    config.algo.rnn.hidden_dim = 400
    config.algo.rnn.rnn_type = "LSTM"
    config.algo.rnn.num_layers = 2

    return config


def get_config(dataset_path=None, output_dir=None, debug=False):
    """Construct a BC-RNN config for training."""
    config = config_factory(algo_name="bc")
    with config.values_unlocked():
        config = robosuite_hyperparameters(config)
        config.experiment.name = "bc_rnn_example"
        config.train.data = [{"path": dataset_path, "do_eval": False}]
        config.train.output_dir = output_dir
        config.train.action_config = {"actions": {"normalization": None}}
        # no simulator in this image
        config.experiment.rollout.enabled = False

        if debug:
            # tiny run: 2 epochs x 3 gradient steps
            config.experiment.epoch_every_n_steps = 3
            config.experiment.validation_epoch_every_n_steps = 3
            config.train.num_epochs = 2
            config.experiment.save.every_n_epochs = 1
    return config


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    dataset_path = args.dataset
    if dataset_path is None:
        tmp = tempfile.mkdtemp(prefix="rmvq_bc_rnn_")
        dataset_path = make_synthetic_dataset(os.path.join(tmp, "demo.hdf5"))
        print(f"using synthetic dataset at {dataset_path}")
    output_dir = args.output or tempfile.mkdtemp(prefix="rmvq_bc_rnn_out_")

    config = get_config(dataset_path, output_dir, debug=args.debug)
    config.lock()
    train(config)

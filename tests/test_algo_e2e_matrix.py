"""Every registered algorithm gets an end-to-end train -> checkpoint ->
rollout smoke test through scripts/train.py, mirroring the reference's own
test strategy (robomimic/tests/test_{bc,bcq,cql,iql,hbc,iris}.py +
utils/test_utils.py:104-153: every algo variant is rewritten to ~3 gradient
steps, 1 epoch, 1 rollout of horizon 10). The reference uses a downloaded
tiny real dataset + robosuite; this image is zero-egress and sim-less, so a
synthetic dataset + the registered FakeEnv (tests/fake_env.py) stand in -
the rollout still exercises the full RolloutPolicy/ICLRolloutPolicy ->
EnvBase protocol round trip."""

import contextlib
import glob
import io
import json
import os

import h5py
import numpy as np
import pytest

import fake_env  # registers FakeEnv for env type 77
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.train import train

A = fake_env.A
OBS_DIMS = fake_env.OBS_KEYS


def write_dataset(path, n_demos=4, T=14, seed=0, ac_dim=A):
    """Synthetic robomimic-layout dataset with obs/next_obs/rewards/dones
    (the RL algos consume all of them)."""
    rng = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "FakeEnv", "type": fake_env.FAKE_ENV_TYPE,
             "env_kwargs": {"ac_dim": ac_dim}}
        )
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            obs = ep.create_group("obs")
            next_obs = ep.create_group("next_obs")
            for k, d in OBS_DIMS.items():
                arr = rng.randn(T + 1, d).astype(np.float32)
                obs.create_dataset(k, data=arr[:-1])
                next_obs.create_dataset(k, data=arr[1:])
            ep.create_dataset(
                "actions",
                data=rng.uniform(-1, 1, (T, ac_dim)).astype(np.float32),
            )
            rew = np.zeros(T, np.float64)
            rew[-1] = 1.0
            ep.create_dataset("rewards", data=rew)
            done = np.zeros(T, np.int64)
            done[-1] = 1
            ep.create_dataset("dones", data=done)
    return path


def shrink_config(config, data_path, output_dir):
    """The reference's get_base_config treatment: tiny epochs, one rollout
    of horizon 10, save every epoch (test_utils.py:104-153)."""
    with config.values_unlocked():
        config.experiment.name = f"e2e_{config.algo_name}"
        config.experiment.validate = False
        config.experiment.logging.terminal_output_to_txt = False
        config.experiment.logging.log_tb = False
        config.experiment.logging.log_wandb = False
        config.experiment.save.enabled = True
        config.experiment.save.every_n_epochs = 1
        config.experiment.epoch_every_n_steps = 3
        config.experiment.validation_epoch_every_n_steps = 3
        config.experiment.rollout.enabled = True
        config.experiment.rollout.n = 1
        config.experiment.rollout.horizon = 10
        config.experiment.rollout.rate = 1
        config.experiment.rollout.warmstart = 0
        config.experiment.rollout.terminate_on_success = True
        config.experiment.render_video = False

        config.train.data = [{"path": data_path}]
        config.train.output_dir = output_dir
        config.train.num_data_workers = 0
        config.train.hdf5_cache_mode = "all"
        config.train.batch_size = 4
        config.train.num_epochs = 1
        config.train.seed = 3
        config.train.action_config = {
            "actions": {"normalization": "min_max"}
        }

        # hierarchical algos carry per-subpolicy observation configs
        # (reference base_config.py hbc/iris observation sections)
        if config.algo_name == "hbc":
            mod_blocks = [
                config.observation.actor.modalities.obs,
                config.observation.planner.modalities.obs,
                config.observation.planner.modalities.subgoal,
            ]
        elif config.algo_name == "iris":
            mod_blocks = [
                config.observation.actor.modalities.obs,
                config.observation.value_planner.planner.modalities.obs,
                config.observation.value_planner.planner.modalities.subgoal,
                config.observation.value_planner.value.modalities.obs,
            ]
        else:
            mod_blocks = [config.observation.modalities.obs]
        for blk in mod_blocks:
            blk.low_dim = list(OBS_DIMS)
            blk.rgb = []
    return config


def run_e2e(algo_name, tmp_path, modifier=None, ac_dim=A):
    data_path = write_dataset(str(tmp_path / "demo.hdf5"), ac_dim=ac_dim)
    config = config_factory(algo_name)
    config = shrink_config(config, data_path, str(tmp_path / "out"))
    if modifier is not None:
        with config.values_unlocked():
            modifier(config)
    config.lock()

    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        train(config)
    stdout = out.getvalue()

    # a checkpoint was written and a rollout ran (success-rate stats
    # printed, exactly like the reference's per-epoch rollout JSON dump)
    ckpts = glob.glob(
        str(tmp_path / "out" / "**" / "models" / "*.ckpt"), recursive=True
    )
    assert ckpts, "no checkpoint written"
    assert "Success_Rate" in stdout, f"no rollout stats in output:\n{stdout[-2000:]}"
    assert "Env: FakeEnv" in stdout


def _small_rnn(config):
    config.algo.rnn.hidden_dim = 32
    config.algo.rnn.num_layers = 1
    if "horizon" in config.algo.rnn:
        config.train.seq_length = config.algo.rnn.horizon


def _small_transformer(config):
    t = config.algo.transformer
    # the shipped flagship combination (train_config.json): sequence
    # supervision with future-action prediction
    t.enabled = True
    t.supervise_all_steps = True
    t.pred_future_acs = True
    t.causal = False
    t.embed_dim = 32
    t.num_layers = 1
    t.num_heads = 4
    t.context_length = 4
    config.train.seq_length = 4
    config.train.frame_stack = 4


@pytest.mark.slow
@pytest.mark.parametrize("algo_name", ["bc", "bcq", "cql", "iql", "td3_bc"])
def test_e2e_low_dim_algos(algo_name, tmp_path):
    run_e2e(algo_name, tmp_path)


@pytest.mark.slow
def test_e2e_bc_rnn_gmm(tmp_path):
    def mod(config):
        config.algo.rnn.enabled = True
        config.algo.gmm.enabled = True
        _small_rnn(config)

    run_e2e("bc", tmp_path, mod)


@pytest.mark.slow
@pytest.mark.parametrize("algo_name", ["hbc", "iris"])
def test_e2e_hierarchical_algos(algo_name, tmp_path):
    def mod(config):
        config.algo.actor.rnn.hidden_dim = 32
        config.train.seq_length = config.algo.actor.rnn.horizon

    run_e2e(algo_name, tmp_path, mod)


@pytest.mark.slow
def test_e2e_diffusion_policy(tmp_path):
    def mod(config):
        config.train.seq_length = config.algo.horizon.prediction_horizon
        # rollout obs must arrive frame-stacked to observation_horizon
        config.train.frame_stack = config.algo.horizon.observation_horizon

    run_e2e("diffusion_policy", tmp_path, mod)


@pytest.mark.slow
def test_e2e_act(tmp_path):
    def mod(config):
        config.algo.act.hidden_dim = 32
        config.algo.act.dim_feedforward = 64
        config.algo.act.enc_layers = 1
        config.algo.act.dec_layers = 1
        config.algo.act.nheads = 4
        # act chunk size == train.seq_length (algo/act.py:181)
        config.train.seq_length = 4

    run_e2e("act", tmp_path, mod)


@pytest.mark.slow
@pytest.mark.parametrize("algo_name", ["icl", "icl_hvqvae", "icl_mamba"])
def test_e2e_icl_algos(algo_name, tmp_path):
    def mod(config):
        if "mamba" in config.algo and config.algo.mamba.get("enabled", False):
            m = config.algo.mamba
            m.context_length = 4
            m.embed_dim = 32
            m.num_layers = 1
            config.train.seq_length = 4
            config.train.frame_stack = 4
            return
        _small_transformer(config)
        if "vqvae" in config.algo.transformer:
            vq = config.algo.transformer.vqvae
            if "num_subclusters" in vq:
                vq.num_subclusters = 16
                vq.num_clusters = 8
                vq.embed_dim = 32
                vq.num_stages = 1
                vq.num_layers_per_stage = 2

    run_e2e(algo_name, tmp_path, mod)


@pytest.mark.slow
def test_e2e_icl_gmm_paper(tmp_path):
    """The paper's LipVQ GMM transformer path, end to end via its own
    registered config (icl_gmm_paper); actions are 12-dim to match the
    reference's hardcoded action_input_shape (obs_nets.py:2413)."""

    def mod(config):
        _small_transformer(config)
        config.train.batch_size = 8  # GMM path splits batch halves

    run_e2e("icl_gmm_paper", tmp_path, mod, ac_dim=12)


@pytest.mark.slow
@pytest.mark.parametrize("gmm", [False, True])
def test_e2e_bc_transformer(gmm, tmp_path):
    """BC_Transformer / BC_Transformer_GMM (reference bc.py transformer
    variants) end to end."""

    def mod(config):
        _small_transformer(config)
        config.algo.gmm.enabled = gmm

    run_e2e("bc", tmp_path, mod)

"""End-to-end smoke test: synthetic robomimic-format HDF5 -> train CLI in
--debug mode -> checkpoint -> policy_from_checkpoint -> action.

This is the framework-level equivalent of the reference's
``robomimic/tests`` strategy (SURVEY.md section 4): tiny real data through
the full train->checkpoint->deploy path (env rollouts excluded here since
the sim stack is host-only).
"""

import glob
import json
import os

import h5py
import numpy as np
import pytest

A = 7  # 3 pos + 3 rot + 1 gripper


def write_robomimic_hdf5(path, n_demos=3, T=12, img=16, seed=0):
    rng = np.random.RandomState(seed)
    env_args = {
        "env_name": "TestKitchenEnv",
        "type": 1,
        "env_kwargs": {"robots": "PandaMobile"},
    }
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(env_args)
        for i in range(n_demos):
            ep = data.create_group(f"demo_{i}")
            ep.attrs["num_samples"] = T
            ep.attrs["ep_meta"] = json.dumps({"lang": "pick the object"})
            obs = ep.create_group("obs")
            obs.create_dataset(
                "robot0_eef_pos",
                data=rng.randn(T, 3).astype(np.float32),
            )
            obs.create_dataset(
                "robot0_gripper_qpos",
                data=rng.randn(T, 2).astype(np.float32),
            )
            obs.create_dataset(
                "robot0_eye_in_hand_image",
                data=rng.randint(0, 255, (T, img, img, 3), dtype=np.uint8),
            )
            ep.create_dataset(
                "actions", data=rng.uniform(-1, 1, (T, A)).astype(np.float32)
            )
        mask = f.create_group("mask")
        mask.create_dataset(
            "valid", data=np.array([b"demo_0", b"demo_1", b"demo_2"])
        )
    return path


def make_config_json(tmp_path, data_path):
    cfg = {
        "algo_name": "icl",
        "experiment": {
            "name": "smoke",
            "validate": False,
            "logging": {"terminal_output_to_txt": False, "log_tb": False,
                        "log_wandb": False},
            "save": {"enabled": True, "every_n_epochs": 1},
            "epoch_every_n_steps": 2,
            "rollout": {"enabled": False},
        },
        "train": {
            "data": [{"path": data_path, "do_eval": False}],
            "output_dir": str(tmp_path / "out"),
            "num_data_workers": 2,
            "hdf5_cache_mode": None,
            "hdf5_load_next_obs": False,
            "seq_length": 4,
            "frame_stack": 4,
            "dataset_keys": ["actions"],
            "batch_size": 4,
            "num_epochs": 1,
            "max_grad_norm": 100.0,
            "seed": 123,
            "action_config": {"actions": {"normalization": "min_max"}},
        },
        "algo": {
            "transformer": {
                "enabled": True,
                "context_length": 4,
                "embed_dim": 32,
                "num_layers": 1,
                "num_heads": 4,
                "supervise_all_steps": True,
                "pred_future_acs": True,
                "causal": False,
                "vq_vae_enabled": True,
                "ln_act_enabled": False,
                "vqvae": {
                    "num_subclusters": 16,
                    "num_clusters": 8,
                    "embed_dim": 32,
                    "num_stages": 1,
                    "num_layers_per_stage": 2,
                    "lambda_rec": 1.0,
                },
            },
        },
        "observation": {
            "modalities": {
                "obs": {
                    "low_dim": ["robot0_eef_pos", "robot0_gripper_qpos"],
                    "rgb": ["robot0_eye_in_hand_image"],
                    "depth": [],
                    "scan": [],
                }
            },
            "encoder": {
                "rgb": {
                    "core_class": "VisualCore",
                    "core_kwargs": {
                        "feature_dimension": 16,
                        "backbone_class": "ResNet18Conv",
                        "pool_class": "SpatialSoftmax",
                        "pool_kwargs": {"num_kp": 4},
                    },
                    "obs_randomizer_class": "CropRandomizer",
                    "obs_randomizer_kwargs": {
                        "crop_height": 12, "crop_width": 12, "num_crops": 1,
                    },
                },
            },
        },
    }
    p = tmp_path / "config.json"
    with open(p, "w") as f:
        json.dump(cfg, f)
    return str(p)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    data_path = write_robomimic_hdf5(str(tmp_path / "demos.hdf5"))
    cfg_path = make_config_json(tmp_path, data_path)

    import argparse

    from robot_manipulation_vq_vae_tpu.scripts.train import main

    args = argparse.Namespace(
        config=cfg_path, algo=None, name=None, dataset=None,
        output_dir=None, debug=True, eval_only=False,
    )
    main(args)

    ckpts = glob.glob(str(tmp_path / "out" / "smoke" / "*" / "models" / "*.ckpt"))
    assert ckpts, "no checkpoint written"
    return ckpts[0]


def test_train_writes_checkpoint(trained_ckpt):
    assert os.path.getsize(trained_ckpt) > 1000


def test_policy_from_checkpoint(trained_ckpt):
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    policy, ckpt_dict = FileUtils.policy_from_checkpoint(
        ckpt_path=trained_ckpt
    )
    assert ckpt_dict["algo_name"] == "icl"
    assert ckpt_dict["shape_metadata"]["ac_dim"] == A

    rng = np.random.RandomState(0)
    H = 4
    ob = {
        "robot0_eef_pos": rng.randn(H, 3).astype(np.float32),
        "robot0_gripper_qpos": rng.randn(H, 2).astype(np.float32),
        "robot0_eye_in_hand_image": rng.rand(H, 16, 16, 3).astype(np.float32),
    }
    ctx = {"actions": rng.uniform(-1, 1, (1, H, A)).astype(np.float32)}
    policy.start_episode(lang="pick the object")
    ac = policy(ob, context_batch=ctx)
    assert ac.shape == (A,)
    assert np.all(np.isfinite(ac))


@pytest.mark.slow
def test_orbax_checkpoint_roundtrip(trained_ckpt, tmp_path):
    """Orbax-directory checkpoint format: save/load parity with the pickle
    format, including policy_from_checkpoint."""
    import jax

    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    ckpt_dict = FileUtils.maybe_dict_from_checkpoint(ckpt_path=trained_ckpt)
    orbax_path = str(tmp_path / "model_epoch_1.orbax")
    FileUtils.save_checkpoint(ckpt_dict, orbax_path)
    assert os.path.isdir(orbax_path)

    restored = FileUtils.maybe_dict_from_checkpoint(ckpt_path=orbax_path)
    assert restored["algo_name"] == ckpt_dict["algo_name"]
    orig_leaves = jax.tree_util.tree_leaves(ckpt_dict["model"])
    rest_leaves = jax.tree_util.tree_leaves(restored["model"])
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    policy, _ = FileUtils.policy_from_checkpoint(ckpt_path=orbax_path)
    rng = np.random.RandomState(0)
    H = 4
    ob = {
        "robot0_eef_pos": rng.randn(H, 3).astype(np.float32),
        "robot0_gripper_qpos": rng.randn(H, 2).astype(np.float32),
        "robot0_eye_in_hand_image": rng.rand(H, 16, 16, 3).astype(np.float32),
    }
    ctx = {"actions": rng.uniform(-1, 1, (1, H, A)).astype(np.float32)}
    policy.start_episode(lang="pick the object")
    ac = policy(ob, context_batch=ctx)
    assert np.all(np.isfinite(ac))


def test_eval_ckpt_generators(trained_ckpt, tmp_path):
    """eval_ckpt / eval_icl_ckpt / eval_zr_ckpt emit loadable eval configs
    and the fix_ckpt script round-trips."""
    import argparse
    import json

    from robot_manipulation_vq_vae_tpu.scripts.config_gen import (
        eval_ckpt,
        eval_icl_ckpt,
        eval_zr_ckpt,
    )
    from robot_manipulation_vq_vae_tpu.scripts.fix_ckpt import fix_checkpoint

    args = argparse.Namespace(
        ckpt=trained_ckpt, n_rollouts=2, env_name=None,
        config_dir=str(tmp_path), run=False,
    )
    out = eval_ckpt.main(args)
    cfg = json.load(open(out))
    assert cfg["experiment"]["ckpt_path"] == trained_ckpt
    assert cfg["experiment"]["rollout"]["enabled"]

    args = argparse.Namespace(
        ckpt=trained_ckpt, dataset=None, n_rollouts=2, num_batch_envs=3,
        env_name=None, config_dir=str(tmp_path), run=False,
    )
    out = eval_icl_ckpt.main(args)
    cfg = json.load(open(out))
    assert cfg["experiment"]["rollout"]["batched"]
    assert cfg["experiment"]["rollout"]["num_batch_envs"] == 3

    args = argparse.Namespace(
        ckpt=trained_ckpt, env_name="SomeOtherTask", dataset=None,
        n_rollouts=2, config_dir=str(tmp_path), run=False,
    )
    out = eval_zr_ckpt.main(args)
    cfg = json.load(open(out))
    assert cfg["experiment"]["env"] == "SomeOtherTask"
    assert cfg["experiment"]["name"].endswith("_zr_eval")

    # fix_ckpt: clean checkpoint is reported clean (returns original path)
    assert fix_checkpoint(trained_ckpt) == trained_ckpt


@pytest.mark.slow
def test_train_multi_dataset(tmp_path):
    """Two weighted datasets -> MetaDataset + weighted sampler + batched
    loader fast path through the real train CLI (the flagship's multi-task
    configuration)."""
    import argparse

    from robot_manipulation_vq_vae_tpu.scripts.train import main

    d1 = write_robomimic_hdf5(str(tmp_path / "a.hdf5"), seed=0)
    d2 = write_robomimic_hdf5(str(tmp_path / "b.hdf5"), n_demos=2, seed=1)
    cfg_path = make_config_json(tmp_path, d1)
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["train"]["data"] = [
        {"path": d1, "do_eval": False, "weight": 1.0},
        {"path": d2, "do_eval": False, "weight": 2.0},
    ]
    cfg["train"]["hdf5_cache_mode"] = "low_dim"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    args = argparse.Namespace(
        config=cfg_path, algo=None, name=None, dataset=None,
        output_dir=None, debug=True, eval_only=False,
    )
    main(args)
    ckpts = glob.glob(
        str(tmp_path / "out" / "smoke" / "*" / "models" / "*.ckpt")
    )
    assert ckpts, "no checkpoint written from multi-dataset training"


def test_optimizer_state_resume(tmp_path):
    """include_optimizer checkpoints restore opt states + step + rng - a
    true resume produces the same next step as uninterrupted training."""
    import jax
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["flat"]
        config.observation.modalities.obs.rgb = []
        config.train.seed = 7
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    def make():
        return AlgoReg.algo_factory(
            "bc", config, obs_key_shapes={"flat": (5,)}, ac_dim=3
        )

    rng = np.random.RandomState(0)
    batches = [
        {
            "obs": {"flat": rng.randn(4, 1, 5).astype(np.float32)},
            "actions": rng.uniform(-1, 1, (4, 1, 3)).astype(np.float32),
        }
        for _ in range(4)
    ]

    # uninterrupted: 4 steps
    a1 = make()
    for b in batches:
        a1.train_on_batch(a1.process_batch_for_training(dict(b)), epoch=0)

    # interrupted: 2 steps -> serialize with optimizer -> resume -> 2 steps
    a2 = make()
    for b in batches[:2]:
        a2.train_on_batch(a2.process_batch_for_training(dict(b)), epoch=0)
    ckpt = a2.serialize(include_optimizer=True)
    assert "opt_states" in ckpt and ckpt["step"] == 2

    a3 = make()
    # state not yet initialized - deserialize builds it from the checkpoint
    a3.deserialize(ckpt)
    assert int(a3.state.step) == 2
    for b in batches[2:]:
        a3.train_on_batch(a3.process_batch_for_training(dict(b)), epoch=0)

    for x, y in zip(
        jax.tree_util.tree_leaves(a1.state.params),
        jax.tree_util.tree_leaves(a3.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-6,
            err_msg="resumed training diverged from uninterrupted",
        )


@pytest.mark.slow
def test_auto_resume(tmp_path):
    """--auto_resume finds the newest checkpoint of the experiment and
    continues from its epoch."""
    import argparse

    from robot_manipulation_vq_vae_tpu.scripts.train import main

    data_path = write_robomimic_hdf5(str(tmp_path / "demos.hdf5"))
    cfg_path = make_config_json(tmp_path, data_path)
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["experiment"]["save"]["include_optimizer"] = True
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    base = argparse.Namespace(
        config=cfg_path, algo=None, name=None, dataset=None,
        output_dir=None, debug=True, eval_only=False, auto_resume=False,
    )
    main(base)
    first = glob.glob(
        str(tmp_path / "out" / "smoke" / "*" / "models" / "*.ckpt")
    )
    assert first

    # resumed run: should find the newest checkpoint and continue past it
    # (debug mode trains 2 epochs; raise the budget so there is work left)
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg["train"]["num_epochs"] = 4
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    base.auto_resume = True
    base.debug = False  # debug clamps num_epochs; config keeps tiny steps
    main(base)
    all_ckpts = glob.glob(
        str(tmp_path / "out" / "smoke" / "*" / "models" / "*.ckpt")
    )
    assert len(all_ckpts) > len(first)

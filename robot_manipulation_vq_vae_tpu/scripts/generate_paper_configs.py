"""
Helper script to generate jsons for reproducing the robomimic (CoRL 2021)
paper experiments (reference ``robomimic/scripts/generate_paper_configs.py``).

Generates the full config matrix - core / subopt / dataset_size /
obs_ablation / hyper_ablation / d4rl - from this framework's config classes,
plus one shell script of train commands per experiment set.

Args:
    config_dir (str): Directory where generated configs will be placed.
        Defaults to 'paper' subfolder in exps folder of repository.

    dataset_dir (str): Base dataset directory where released datasets can be
        found on disk. Defaults to datasets folder in repository.

    output_dir (str): Base output directory for all training runs that will
        be written to generated configs.

Example usage:
    python -m robot_manipulation_vq_vae_tpu.scripts.generate_paper_configs \
        --config_dir /tmp/configs --dataset_dir /tmp/datasets \
        --output_dir /tmp/experiment_results
"""

import argparse
import os

import robot_manipulation_vq_vae_tpu
from robot_manipulation_vq_vae_tpu import DATASET_REGISTRY
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.config.config import Config

LOW_DIM_TYPES = ("low_dim", "low_dim_sparse", "low_dim_dense")


def modify_config_for_default_low_dim_exp(config):
    """Experiment/training/observation settings shared by all low-dim paper
    experiments (reference generate_paper_configs.py:28-94)."""
    with config.experiment.values_unlocked():
        # save + evaluate every 50 epochs; 100-step epochs
        config.experiment.save.enabled = True
        config.experiment.save.every_n_epochs = 50
        config.experiment.epoch_every_n_steps = 100
        config.experiment.validation_epoch_every_n_steps = 10
        config.experiment.rollout.enabled = True
        config.experiment.rollout.n = 50
        config.experiment.rollout.horizon = 400
        config.experiment.rollout.rate = 50
        config.experiment.rollout.warmstart = 0
        config.experiment.rollout.terminate_on_success = True

    with config.train.values_unlocked():
        # entire dataset fits in memory
        config.train.num_data_workers = 0
        config.train.hdf5_cache_mode = "all"
        config.train.batch_size = 100
        config.train.num_epochs = 2000

    with config.observation.values_unlocked():
        default_low_dim_obs = [
            "robot0_eef_pos",
            "robot0_eef_quat",
            "robot0_gripper_qpos",
            "object",
        ]
        for cfg in _obs_modality_configs(config):
            cfg.low_dim = list(default_low_dim_obs)
            cfg.rgb = []
    return config


def _obs_modality_configs(config):
    """The modality sub-configs to set, handling hierarchical algos
    (reference generate_paper_configs.py:73-86)."""
    if config.algo_name == "hbc":
        return [
            config.observation.actor.modalities.obs,
            config.observation.planner.modalities.obs,
            config.observation.planner.modalities.subgoal,
        ]
    if config.algo_name == "iris":
        return [
            config.observation.actor.modalities.obs,
            config.observation.value_planner.planner.modalities.obs,
            config.observation.value_planner.planner.modalities.subgoal,
            config.observation.value_planner.value.modalities.obs,
        ]
    return [config.observation.modalities.obs]


def modify_config_for_default_image_exp(config):
    """Experiment/training/observation settings shared by all image paper
    experiments (reference generate_paper_configs.py:97-171)."""
    assert config.algo_name not in ["hbc", "iris"], \
        "no image training for HBC and IRIS"

    with config.experiment.values_unlocked():
        # save + evaluate every 20 epochs; 500-step epochs
        config.experiment.save.enabled = True
        config.experiment.save.every_n_epochs = 20
        config.experiment.epoch_every_n_steps = 500
        config.experiment.validation_epoch_every_n_steps = 50
        config.experiment.rollout.enabled = True
        config.experiment.rollout.n = 50
        config.experiment.rollout.horizon = 400
        config.experiment.rollout.rate = 20
        config.experiment.rollout.warmstart = 0
        config.experiment.rollout.terminate_on_success = True

    with config.train.values_unlocked():
        # cache low-dim only; workers fetch image obs
        config.train.num_data_workers = 2
        config.train.hdf5_cache_mode = "low_dim"
        config.train.batch_size = 16
        config.train.num_epochs = 600

    with config.observation.values_unlocked():
        config.observation.modalities.obs.low_dim = [
            "robot0_eef_pos",
            "robot0_eef_quat",
            "robot0_gripper_qpos",
        ]
        config.observation.modalities.obs.rgb = [
            "agentview_image",
            "robot0_eye_in_hand_image",
        ]
        config.observation.modalities.goal.low_dim = []
        config.observation.modalities.goal.rgb = []

        # ResNet18 + spatial softmax encoder, crop randomization
        enc = config.observation.encoder.rgb
        enc.core_class = "VisualCore"
        enc.core_kwargs.feature_dimension = 64
        enc.core_kwargs.backbone_class = "ResNet18Conv"
        enc.core_kwargs.backbone_kwargs.pretrained = False
        enc.core_kwargs.backbone_kwargs.input_coord_conv = False
        enc.core_kwargs.pool_class = "SpatialSoftmax"
        enc.core_kwargs.pool_kwargs.num_kp = 32
        enc.core_kwargs.pool_kwargs.learnable_temperature = False
        enc.core_kwargs.pool_kwargs.temperature = 1.0
        enc.core_kwargs.pool_kwargs.noise_std = 0.0
        enc.obs_randomizer_class = "CropRandomizer"
        enc.obs_randomizer_kwargs.crop_height = 76
        enc.obs_randomizer_kwargs.crop_width = 76
        enc.obs_randomizer_kwargs.num_crops = 1
        enc.obs_randomizer_kwargs.pos_enc = False
    return config


def modify_config_for_dataset(config, task_name, dataset_type, hdf5_type,
                              base_dataset_dir, filter_key=None):
    """Set dataset path, rollout horizon, validation, and per-task obs keys
    (reference generate_paper_configs.py:174-338)."""
    assert task_name in DATASET_REGISTRY, \
        f"task {task_name} not found in dataset registry!"
    assert dataset_type in DATASET_REGISTRY[task_name], \
        f"dataset type {dataset_type} not found for task {task_name}!"
    assert hdf5_type in DATASET_REGISTRY[task_name][dataset_type], (
        f"hdf5 type {hdf5_type} not found for dataset type {dataset_type} "
        f"and task {task_name}!"
    )

    is_real_dataset = "real" in task_name
    if is_real_dataset:
        assert config.algo_name == "bc", "we only ran BC-RNN on real robot"
    else:
        assert hdf5_type != "raw", "cannot train on raw demonstrations"

    with config.experiment.values_unlocked():
        config.experiment.rollout.horizon = \
            DATASET_REGISTRY[task_name][dataset_type][hdf5_type]["horizon"]
        # machine-generated datasets did not use validation
        config.experiment.validate = dataset_type != "mg"
        if is_real_dataset:
            config.experiment.rollout.enabled = False

    with config.train.values_unlocked():
        url = DATASET_REGISTRY[task_name][dataset_type][hdf5_type]["url"]
        if url is None:
            if task_name in ["lift", "can", "square", "tool_hang", "transport"]:
                file_name = f"{hdf5_type}_v141.hdf5"
            elif task_name in ["lift_real", "can_real", "tool_hang_real"]:
                file_name = f"{hdf5_type}.hdf5"
            else:
                raise ValueError("Unknown dataset type")
        else:
            file_name = url.split("/")[-1]
        config.train.data = os.path.join(
            base_dataset_dir, task_name, dataset_type, file_name
        )
        config.train.hdf5_filter_key = filter_key
        config.train.hdf5_validation_filter_key = None
        if config.experiment.validate:
            config.train.hdf5_filter_key = (
                "train" if filter_key is None else f"{filter_key}_train"
            )
            config.train.hdf5_validation_filter_key = (
                "valid" if filter_key is None else f"{filter_key}_valid"
            )

    with config.observation.values_unlocked():
        if is_real_dataset:
            config.observation.modalities.obs.low_dim = [
                "ee_pose", "gripper_position",
            ]
            rand_kwargs = config.observation.encoder.rgb.obs_randomizer_kwargs
            if task_name == "tool_hang_real":
                config.observation.modalities.obs.rgb = [
                    "image_side", "image_wrist",
                ]
                rand_kwargs.crop_height = 216  # 240x240 images
                rand_kwargs.crop_width = 216
            else:
                config.observation.modalities.obs.rgb = [
                    "image", "image_wrist",
                ]
                rand_kwargs.crop_height = 108  # 120x120 images
                rand_kwargs.crop_width = 108
        elif hdf5_type in ["image", "image_sparse", "image_dense"]:
            if task_name == "transport":
                config.observation.modalities.obs.low_dim = [
                    "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                    "robot1_eef_pos", "robot1_eef_quat", "robot1_gripper_qpos",
                ]
                config.observation.modalities.obs.rgb = [
                    "shouldercamera0_image",
                    "robot0_eye_in_hand_image",
                    "shouldercamera1_image",
                    "robot1_eye_in_hand_image",
                ]
            elif task_name == "tool_hang":
                config.observation.modalities.obs.rgb = [
                    "sideview_image", "robot0_eye_in_hand_image",
                ]
                # 240x240 images -> 216x216 crops
                rand_kwargs = (
                    config.observation.encoder.rgb.obs_randomizer_kwargs
                )
                rand_kwargs.crop_height = 216
                rand_kwargs.crop_width = 216
        elif hdf5_type in LOW_DIM_TYPES:
            if task_name == "transport":
                default_low_dim_obs = [
                    "robot0_eef_pos", "robot0_eef_quat", "robot0_gripper_qpos",
                    "robot1_eef_pos", "robot1_eef_quat", "robot1_gripper_qpos",
                    "object",
                ]
                for cfg in _obs_modality_configs(config):
                    cfg.low_dim = list(default_low_dim_obs)
                    cfg.rgb = []
    return config


def modify_bc_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """BC paper hyperparameters (reference :341-377)."""
    assert config.algo_name == "bc"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    with config.algo.values_unlocked():
        config.algo.optim_params.policy.learning_rate.initial = 1e-4
        config.algo.actor_layer_dims = (1024, 1024)
        config.algo.gmm.enabled = True
        if dataset_type == "mg":
            # machine-generated datasets don't use GMM
            config.algo.gmm.enabled = False
            if hdf5_type in LOW_DIM_TYPES:
                config.algo.optim_params.policy.learning_rate.initial = 1e-3
    return config


def modify_bc_rnn_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """BC-RNN paper hyperparameters (reference :380-430)."""
    assert config.algo_name == "bc"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    with config.train.values_unlocked():
        config.train.seq_length = 10
    with config.algo.values_unlocked():
        config.algo.rnn.enabled = True
        config.algo.rnn.horizon = 10
        config.algo.optim_params.policy.learning_rate.initial = 1e-4
        config.algo.actor_layer_dims = ()  # no MLP between rnn and output
        config.algo.gmm.enabled = True
        config.algo.rnn.hidden_dim = 400
        if dataset_type == "mg":
            config.algo.gmm.enabled = False
        # image datasets use RNN dim 1000 for every dataset type
        if hdf5_type not in LOW_DIM_TYPES:
            config.algo.rnn.hidden_dim = 1000
    return config


def modify_bcq_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """BCQ paper hyperparameters (reference :433-516)."""
    assert config.algo_name == "bcq"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    assert "real" not in task_name, "we only ran BC-RNN on real robot"
    with config.algo.values_unlocked():
        config.algo.optim_params.critic.learning_rate.initial = 1e-4
        config.algo.optim_params.action_sampler.learning_rate.initial = 1e-4
        config.algo.optim_params.actor.learning_rate.initial = 1e-3
        config.algo.actor.enabled = False
        config.algo.action_sampler.vae.enabled = True
        config.algo.action_sampler.gmm.enabled = False
        config.algo.action_sampler.vae.kl_weight = 0.05
        config.algo.action_sampler.vae.latent_dim = 14
        config.algo.action_sampler.vae.prior.learn = False
        config.algo.critic.layer_dims = (300, 400)
        config.algo.action_sampler.vae.encoder_layer_dims = (300, 400)
        config.algo.action_sampler.vae.decoder_layer_dims = (300, 400)
        config.algo.actor.layer_dims = (300, 400)
        config.algo.target_tau = 5e-4
        config.algo.discount = 0.99
        config.algo.critic.num_action_samples = 10
        config.algo.critic.num_action_samples_rollout = 100

        if dataset_type == "mg":
            config.algo.optim_params.critic.learning_rate.initial = 1e-3
            config.algo.optim_params.action_sampler.learning_rate.initial = 1e-3
            config.algo.optim_params.actor.learning_rate.initial = 1e-3
            config.algo.action_sampler.vae.kl_weight = 0.5
            config.algo.target_tau = 5e-3
            if hdf5_type in LOW_DIM_TYPES:
                config.algo.actor.enabled = True  # actor only on low-dim mg
        else:
            if hdf5_type in LOW_DIM_TYPES:
                if dataset_type in ["mh", "paired"]:
                    # low-dim MH: bigger nets, learned GMM prior
                    config.algo.critic.layer_dims = (1024, 1024)
                    vae = config.algo.action_sampler.vae
                    vae.encoder_layer_dims = (1024, 1024)
                    vae.decoder_layer_dims = (1024, 1024)
                    vae.prior_layer_dims = (1024, 1024)
                    vae.kl_weight = 0.5
                    vae.prior.learn = True
                    vae.prior.is_conditioned = True
                    vae.prior.use_gmm = True
                    vae.prior.gmm_learn_weights = True
            else:
                if dataset_type == "ph":
                    config.algo.optim_params.critic.learning_rate.initial = 1e-3
                vae = config.algo.action_sampler.vae
                vae.encoder_layer_dims = (1024, 1024)
                vae.decoder_layer_dims = (1024, 1024)
                if dataset_type in ["mh", "paired"]:
                    config.algo.critic.layer_dims = (1024, 1024)
    return config


def modify_cql_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """CQL paper hyperparameters (reference :519-567)."""
    assert config.algo_name == "cql"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    assert "real" not in task_name, "we only ran BC-RNN on real robot"
    with config.train.values_unlocked():
        # batch size 1024 low-dim / 8 image
        config.train.batch_size = 1024 if hdf5_type in LOW_DIM_TYPES else 8
    with config.algo.values_unlocked():
        config.algo.optim_params.critic.learning_rate.initial = 1e-3
        config.algo.optim_params.actor.learning_rate.initial = 3e-4
        config.algo.actor.target_entropy = "default"
        config.algo.critic.deterministic_backup = True
        config.algo.critic.target_q_gap = 5.0  # Lagrange threshold 5.0
        config.algo.critic.min_q_weight = 1.0
        config.algo.target_tau = 5e-3
        config.algo.discount = 0.99
        config.algo.critic.layer_dims = (300, 400)
        config.algo.actor.layer_dims = (300, 400)
        if hdf5_type not in LOW_DIM_TYPES:
            config.algo.optim_params.actor.learning_rate.initial = 1e-4
    return config


def modify_hbc_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """HBC paper hyperparameters (reference :570-618)."""
    assert config.algo_name == "hbc"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    assert hdf5_type in LOW_DIM_TYPES, "HBC only runs on low-dim"
    assert "real" not in task_name
    with config.algo.values_unlocked():
        config.algo.actor.optim_params.policy.learning_rate.initial = 1e-3
        config.algo.planner.optim_params.goal_network.learning_rate.initial = 1e-3
        vae = config.algo.planner.vae
        vae.enabled = True
        vae.kl_weight = 5e-4
        vae.latent_dim = 16
        vae.prior.learn = True
        vae.prior.is_conditioned = True
        vae.prior.use_gmm = True
        vae.prior.gmm_learn_weights = True
        vae.prior.gmm_num_modes = 10
        vae.encoder_layer_dims = (1024, 1024)
        vae.decoder_layer_dims = (1024, 1024)
        vae.prior_layer_dims = (1024, 1024)
        config.algo.actor.rnn.hidden_dim = 400
        config.algo.actor.actor_layer_dims = ()
        if dataset_type == "mg":
            config.algo.actor.rnn.hidden_dim = 100
            config.algo.actor.actor_layer_dims = (1024, 1024)
    return config


def modify_iris_config_for_dataset(config, task_name, dataset_type, hdf5_type):
    """IRIS paper hyperparameters (reference :621-682)."""
    assert config.algo_name == "iris"
    assert dataset_type in ["ph", "mh", "mg", "paired"]
    assert hdf5_type in LOW_DIM_TYPES, "IRIS only runs on low-dim"
    assert "real" not in task_name
    with config.algo.values_unlocked():
        config.algo.actor.optim_params.policy.learning_rate.initial = 1e-3
        vp = config.algo.value_planner
        vp.planner.optim_params.goal_network.learning_rate.initial = 1e-3
        vp.value.optim_params.critic.learning_rate.initial = 1e-3
        vp.value.optim_params.action_sampler.learning_rate.initial = 1e-4

        vae = vp.planner.vae
        vae.enabled = True
        vae.kl_weight = 5e-4
        vae.latent_dim = 14
        vae.prior.learn = True
        vae.prior.is_conditioned = True
        vae.prior.use_gmm = True
        vae.prior.gmm_learn_weights = True
        vae.prior.gmm_num_modes = 10
        vae.encoder_layer_dims = (1024, 1024)
        vae.decoder_layer_dims = (1024, 1024)
        vae.prior_layer_dims = (1024, 1024)

        vp.value.target_tau = 5e-4
        vp.value.action_sampler.vae.kl_weight = 0.5
        vp.value.action_sampler.vae.latent_dim = 16
        vp.value.action_sampler.actor_layer_dims = (300, 400)

        config.algo.actor.rnn.hidden_dim = 400
        config.algo.actor.actor_layer_dims = ()

        if dataset_type in ["mh", "paired"]:
            vp.value.optim_params.critic.learning_rate.initial = 1e-4
            vp.value.action_sampler.vae.kl_weight = 0.05
        if dataset_type == "mg":
            vp.value.actor.enabled = True
            vp.value.optim_params.actor.learning_rate.initial = 1e-3
            vp.value.target_tau = 5e-3
    return config


def generate_experiment_config(
    base_exp_name,
    base_config_dir,
    base_dataset_dir,
    base_output_dir,
    algo_name,
    algo_config_modifier,
    task_name,
    dataset_type,
    hdf5_type,
    filter_key=None,
    additional_name=None,
    additional_config_modifier=None,
):
    """Generate one experiment config json (reference :685-789)."""
    if "real" not in task_name:
        assert hdf5_type != "raw", "cannot train on raw demonstrations"

    modifier_for_obs = modify_config_for_default_image_exp
    if hdf5_type in LOW_DIM_TYPES:
        modifier_for_obs = modify_config_for_default_low_dim_exp

    algo_config_name = "bc" if algo_name == "bc_rnn" else algo_name
    config = config_factory(algo_name=algo_config_name)
    config = modifier_for_obs(config)
    config = modify_config_for_dataset(
        config=config,
        task_name=task_name,
        dataset_type=dataset_type,
        hdf5_type=hdf5_type,
        base_dataset_dir=base_dataset_dir,
        filter_key=filter_key,
    )
    config = algo_config_modifier(
        config=config,
        task_name=task_name,
        dataset_type=dataset_type,
        hdf5_type=hdf5_type,
    )
    if additional_config_modifier is not None:
        config = additional_config_modifier(config)

    filter_key_str = f"_{filter_key}" if filter_key is not None else ""
    dataset_type_dir = (
        f"{dataset_type}/{filter_key}" if filter_key is not None
        else dataset_type
    )
    additional_name_str = (
        f"_{additional_name}" if additional_name is not None else ""
    )
    json_name = f"{algo_name}{additional_name_str}"

    with config.experiment.values_unlocked():
        config.experiment.name = (
            f"{base_exp_name}_{algo_name}_{task_name}_{dataset_type}"
            f"{filter_key_str}_{hdf5_type}{additional_name_str}"
        )
    with config.train.values_unlocked():
        if base_output_dir is None:
            base_output_dir = config.train.output_dir
        config.train.output_dir = os.path.join(
            base_output_dir, base_exp_name, algo_name, task_name,
            dataset_type_dir, hdf5_type, "trained_models",
        )

    dir_to_save = os.path.join(
        base_config_dir, base_exp_name, task_name, dataset_type_dir, hdf5_type
    )
    os.makedirs(dir_to_save, exist_ok=True)
    json_path = os.path.join(dir_to_save, f"{json_name}.json")
    config.dump(filename=json_path)
    return config, json_path


def generate_core_configs(base_config_dir, base_dataset_dir, base_output_dir,
                          algo_to_config_modifier):
    """Core experiment set: every (task, dataset_type, hdf5_type) x algos
    (reference :793-851)."""
    core_json_paths = Config()
    for task in DATASET_REGISTRY:
        for dataset_type in DATASET_REGISTRY[task]:
            for hdf5_type in DATASET_REGISTRY[task][dataset_type]:
                is_real_dataset = "real" in task
                if not is_real_dataset and hdf5_type == "raw":
                    continue
                algos_to_generate = ["bc", "bc_rnn", "bcq", "cql", "hbc", "iris"]
                if hdf5_type not in LOW_DIM_TYPES:
                    algos_to_generate = algos_to_generate[:-2]  # no hbc/iris
                if is_real_dataset:
                    algos_to_generate = ["bc_rnn"]
                for algo_name in algos_to_generate:
                    _, json_path = generate_experiment_config(
                        base_exp_name="core",
                        base_config_dir=base_config_dir,
                        base_dataset_dir=base_dataset_dir,
                        base_output_dir=base_output_dir,
                        algo_name=algo_name,
                        algo_config_modifier=algo_to_config_modifier[algo_name],
                        task_name=task,
                        dataset_type=dataset_type,
                        hdf5_type=hdf5_type,
                    )
                    core_json_paths[task][dataset_type][hdf5_type][algo_name] \
                        = json_path
    return core_json_paths


def generate_subopt_configs(base_config_dir, base_dataset_dir,
                            base_output_dir, algo_to_config_modifier):
    """Suboptimal-human subsets of the multi-human datasets (reference
    :854-913)."""
    subopt_json_paths = Config()
    for task in ["lift", "can", "square", "transport"]:
        for dataset_type in ["mh"]:
            for hdf5_type in ["low_dim", "image"]:
                algos_to_generate = ["bc", "bc_rnn", "bcq", "cql", "hbc", "iris"]
                if hdf5_type == "image":
                    algos_to_generate = algos_to_generate[:-2]
                for algo_name in algos_to_generate:
                    for fk in ["worse", "okay", "better", "worse_okay",
                               "worse_better", "okay_better"]:
                        _, json_path = generate_experiment_config(
                            base_exp_name="subopt",
                            base_config_dir=base_config_dir,
                            base_dataset_dir=base_dataset_dir,
                            base_output_dir=base_output_dir,
                            algo_name=algo_name,
                            algo_config_modifier=algo_to_config_modifier[algo_name],
                            task_name=task,
                            dataset_type=dataset_type,
                            hdf5_type=hdf5_type,
                            filter_key=fk,
                        )
                        dataset_type_dir = f"{dataset_type}/{fk}"
                        subopt_json_paths[task][dataset_type_dir][hdf5_type][
                            algo_name
                        ] = json_path
    return subopt_json_paths


def generate_dataset_size_configs(base_config_dir, base_dataset_dir,
                                  base_output_dir, algo_to_config_modifier):
    """BC-RNN on 20% / 50% dataset sizes (reference :916-966)."""
    size_ablation_json_paths = Config()
    for task in ["lift", "can", "square", "transport"]:
        for dataset_type in ["ph", "mh"]:
            for hdf5_type in ["low_dim", "image"]:
                algo_name = "bc_rnn"
                for fk in ["20_percent", "50_percent"]:
                    _, json_path = generate_experiment_config(
                        base_exp_name="dataset_size",
                        base_config_dir=base_config_dir,
                        base_dataset_dir=base_dataset_dir,
                        base_output_dir=base_output_dir,
                        algo_name=algo_name,
                        algo_config_modifier=algo_to_config_modifier[algo_name],
                        task_name=task,
                        dataset_type=dataset_type,
                        hdf5_type=hdf5_type,
                        filter_key=fk,
                    )
                    dataset_type_dir = f"{dataset_type}/{fk}"
                    size_ablation_json_paths[task][dataset_type_dir][
                        hdf5_type
                    ][algo_name] = json_path
    return size_ablation_json_paths


def generate_obs_ablation_configs(base_config_dir, base_dataset_dir,
                                  base_output_dir, algo_to_config_modifier):
    """Observation ablations for BC / BC-RNN (reference :969-1057)."""

    def add_eef_vel(config):
        with config.observation.values_unlocked():
            mods = list(config.observation.modalities.obs.low_dim)
            mods.extend([
                "robot0_eef_vel_lin", "robot0_eef_vel_ang",
                "robot0_gripper_qvel",
            ])
            if "robot1_eef_pos" in mods:
                mods.extend([
                    "robot1_eef_vel_lin", "robot1_eef_vel_ang",
                    "robot1_gripper_qvel",
                ])
            config.observation.modalities.obs.low_dim = mods
        return config

    def add_proprio(config):
        with config.observation.values_unlocked():
            mods = list(config.observation.modalities.obs.low_dim)
            mods.extend([
                "robot0_joint_pos_cos", "robot0_joint_pos_sin",
                "robot0_joint_vel",
            ])
            if "robot1_eef_pos" in mods:
                mods.extend([
                    "robot1_joint_pos_cos", "robot1_joint_pos_sin",
                    "robot1_joint_vel",
                ])
            config.observation.modalities.obs.low_dim = mods
        return config

    def remove_wrist(config):
        with config.observation.values_unlocked():
            old = list(config.observation.modalities.obs.rgb)
            config.observation.modalities.obs.rgb = [
                m for m in old if "eye_in_hand" not in m
            ]
        return config

    def remove_rand(config):
        with config.observation.values_unlocked():
            config.observation.encoder.rgb.obs_randomizer_class = None
        return config

    obs_ablation_json_paths = Config()
    for task in ["square", "transport"]:
        for dataset_type in ["ph", "mh"]:
            for hdf5_type in ["low_dim", "image"]:
                if hdf5_type == "low_dim":
                    obs_modifiers = [add_eef_vel, add_proprio]
                else:
                    obs_modifiers = [
                        add_eef_vel, add_proprio, remove_wrist, remove_rand,
                    ]
                for algo_name in ["bc", "bc_rnn"]:
                    for obs_modifier in obs_modifiers:
                        _, json_path = generate_experiment_config(
                            base_exp_name="obs_ablation",
                            base_config_dir=base_config_dir,
                            base_dataset_dir=base_dataset_dir,
                            base_output_dir=base_output_dir,
                            algo_name=algo_name,
                            algo_config_modifier=algo_to_config_modifier[algo_name],
                            task_name=task,
                            dataset_type=dataset_type,
                            hdf5_type=hdf5_type,
                            additional_name=obs_modifier.__name__,
                            additional_config_modifier=obs_modifier,
                        )
                        algo_name_str = f"{algo_name}_{obs_modifier.__name__}"
                        obs_ablation_json_paths[task][dataset_type][
                            hdf5_type
                        ][algo_name_str] = json_path
    return obs_ablation_json_paths


def generate_hyper_ablation_configs(base_config_dir, base_dataset_dir,
                                    base_output_dir, algo_to_config_modifier):
    """Hyperparameter-sensitivity ablations for BC-RNN (reference
    :1060-1149)."""

    def change_lr(config):
        with config.algo.values_unlocked():
            config.algo.optim_params.policy.learning_rate.initial = 1e-3
        return config

    def change_gmm(config):
        with config.algo.values_unlocked():
            config.algo.gmm.enabled = False
        return config

    def change_mlp(config):
        with config.algo.values_unlocked():
            config.algo.actor_layer_dims = (1024, 1024)
        return config

    def change_conv(config):
        with config.observation.values_unlocked():
            config.observation.encoder.rgb.core_class = "VisualCore"
            config.observation.encoder.rgb.core_kwargs = Config(
                backbone_class="ShallowConv",
                feature_dimension=64,
                pool_class="SpatialSoftmax",
                pool_kwargs={"num_kp": 32},
            )
        return config

    def change_rnnd_low_dim(config):
        with config.algo.values_unlocked():
            config.algo.rnn.hidden_dim = 100
        return config

    def change_rnnd_image(config):
        with config.algo.values_unlocked():
            config.algo.rnn.hidden_dim = 400
        return config

    hyper_ablation_json_paths = Config()
    for task in ["square", "transport"]:
        for dataset_type in ["ph", "mh"]:
            for hdf5_type in ["low_dim", "image"]:
                if hdf5_type == "low_dim":
                    hyper_modifiers = [
                        change_lr, change_gmm, change_mlp, change_rnnd_low_dim,
                    ]
                else:
                    hyper_modifiers = [
                        change_lr, change_gmm, change_conv, change_rnnd_image,
                    ]
                algo_name = "bc_rnn"
                for hyper_modifier in hyper_modifiers:
                    _, json_path = generate_experiment_config(
                        base_exp_name="hyper_ablation",
                        base_config_dir=base_config_dir,
                        base_dataset_dir=base_dataset_dir,
                        base_output_dir=base_output_dir,
                        algo_name=algo_name,
                        algo_config_modifier=algo_to_config_modifier[algo_name],
                        task_name=task,
                        dataset_type=dataset_type,
                        hdf5_type=hdf5_type,
                        additional_name=hyper_modifier.__name__,
                        additional_config_modifier=hyper_modifier,
                    )
                    algo_name_str = f"{algo_name}_{hyper_modifier.__name__}"
                    hyper_ablation_json_paths[task][dataset_type][
                        hdf5_type
                    ][algo_name_str] = json_path
    return hyper_ablation_json_paths


def generate_d4rl_configs(base_config_dir, base_dataset_dir, base_output_dir,
                          algo_to_config_modifier):
    """BCQ / CQL / TD3-BC / IQL on D4RL locomotion (reference :1152-1274)."""

    def bcq_algo_config_modifier(config):
        with config.algo.values_unlocked():
            config.algo.optim_params.critic.learning_rate.initial = 1e-3
            config.algo.optim_params.action_sampler.learning_rate.initial = 1e-3
            config.algo.optim_params.actor.learning_rate.initial = 1e-3
            config.algo.actor.enabled = True
            config.algo.action_sampler.vae.kl_weight = 0.5
        return config

    def cql_algo_config_modifier(config):
        with config.algo.values_unlocked():
            config.algo.optim_params.critic.learning_rate.initial = 3e-4
            config.algo.optim_params.actor.learning_rate.initial = 3e-5
            config.algo.actor.bc_start_steps = 40000
            config.algo.critic.target_q_gap = None  # fixed weight of 10.0
            config.algo.critic.cql_weight = 10.0
            config.algo.critic.min_q_weight = 1.0
            config.algo.critic.deterministic_backup = True
            config.algo.actor.layer_dims = (256, 256, 256)
            config.algo.critic.layer_dims = (256, 256, 256)
        return config

    def iql_algo_config_modifier(config):
        with config.algo.values_unlocked():
            config.algo.target_tau = 0.005
            config.algo.vf_quantile = 0.7
            config.algo.adv.beta = 3.0
            config.algo.optim_params.critic.learning_rate.initial = 3e-4
            config.algo.optim_params.vf.learning_rate.initial = 3e-4
            config.algo.optim_params.actor.learning_rate.initial = 3e-4
            config.algo.actor.layer_dims = (256, 256, 256)
            config.algo.critic.layer_dims = (256, 256, 256)
        return config

    d4rl_tasks = [
        "halfcheetah-medium-v2",
        "hopper-medium-v2",
        "walker2d-medium-v2",
        "halfcheetah-expert-v2",
        "hopper-expert-v2",
        "walker2d-expert-v2",
        "halfcheetah-medium-expert-v2",
        "hopper-medium-expert-v2",
        "walker2d-medium-expert-v2",
    ]
    d4rl_json_paths = Config()
    for task_name in d4rl_tasks:
        for algo_name in ["bcq", "cql", "td3_bc", "iql"]:
            config = config_factory(algo_name=algo_name)

            # copy experiment/train/observation sections from td3-bc, which
            # carries the D4RL training defaults
            if algo_name != "td3_bc":
                ref_config = config_factory(algo_name="td3_bc")
                with config.values_unlocked():
                    config.experiment = ref_config.experiment
                    config.train = ref_config.train
                    config.observation = ref_config.observation
                    # only TD3-BC uses observation normalization
                    config.train.hdf5_normalize_obs = False

            if algo_name == "bcq":
                config = bcq_algo_config_modifier(config)
            elif algo_name == "cql":
                config = cql_algo_config_modifier(config)
            elif algo_name == "iql":
                config = iql_algo_config_modifier(config)

            with config.experiment.values_unlocked():
                config.experiment.name = f"d4rl_{algo_name}_{task_name}"
            with config.train.values_unlocked():
                if base_output_dir is None:
                    base_output_dir_for_algo = f"../{algo_name}_trained_models"
                else:
                    base_output_dir_for_algo = base_output_dir
                config.train.output_dir = os.path.join(
                    base_output_dir_for_algo, "d4rl", algo_name, task_name,
                    "trained_models",
                )
                config.train.data = os.path.join(
                    base_dataset_dir, "d4rl", "converted",
                    "{}.hdf5".format(task_name.replace("-", "_")),
                )

            dir_to_save = os.path.join(base_config_dir, "d4rl", task_name)
            os.makedirs(dir_to_save, exist_ok=True)
            json_path = os.path.join(dir_to_save, f"{algo_name}.json")
            config.dump(filename=json_path)
            d4rl_json_paths[task_name][""][""][algo_name] = json_path
    return d4rl_json_paths


ALGO_TO_MODIFIER = dict(
    bc=modify_bc_config_for_dataset,
    bc_rnn=modify_bc_rnn_config_for_dataset,
    bcq=modify_bcq_config_for_dataset,
    cql=modify_cql_config_for_dataset,
    hbc=modify_hbc_config_for_dataset,
    iris=modify_iris_config_for_dataset,
)

EXP_NAME_TO_GENERATOR = dict(
    core=generate_core_configs,
    subopt=generate_subopt_configs,
    dataset_size=generate_dataset_size_configs,
    obs_ablation=generate_obs_ablation_configs,
    hyper_ablation=generate_hyper_ablation_configs,
    d4rl=generate_d4rl_configs,
)


def main(args):
    generated_configs_base_dir = args.config_dir
    if generated_configs_base_dir is None:
        generated_configs_base_dir = os.path.join(
            robot_manipulation_vq_vae_tpu.__path__[0], "exps/paper"
        )
    datasets_base_dir = args.dataset_dir
    if datasets_base_dir is None:
        datasets_base_dir = os.path.join(
            robot_manipulation_vq_vae_tpu.__path__[0], "../datasets"
        )
    output_base_dir = args.output_dir

    exp_names = args.exps or list(EXP_NAME_TO_GENERATOR)
    config_json_paths = Config()
    for exp_name in exp_names:
        config_json_paths[exp_name] = EXP_NAME_TO_GENERATOR[exp_name](
            base_config_dir=generated_configs_base_dir,
            base_dataset_dir=datasets_base_dir,
            base_output_dir=output_base_dir,
            algo_to_config_modifier=ALGO_TO_MODIFIER,
        )

    # write one shell script of train commands per experiment set
    for exp_name in config_json_paths:
        shell_path = os.path.join(
            generated_configs_base_dir, f"{exp_name}.sh"
        )
        with open(shell_path, "w") as f:
            f.write("#!/bin/bash\n\n")
            f.write("# " + "=" * 10 + exp_name + "=" * 10 + "\n")
            for task in config_json_paths[exp_name]:
                for dataset_type in config_json_paths[exp_name][task]:
                    for hdf5_type in config_json_paths[exp_name][task][dataset_type]:
                        f.write("\n")
                        f.write(f"#  task: {task}\n")
                        if len(dataset_type) > 0:
                            f.write(f"#    dataset type: {dataset_type}\n")
                        if len(hdf5_type) > 0:
                            f.write(f"#      hdf5 type: {hdf5_type}\n")
                        algo_map = config_json_paths[exp_name][task][
                            dataset_type
                        ][hdf5_type]
                        for algo_name in algo_map:
                            f.write(
                                "python -m robot_manipulation_vq_vae_tpu."
                                "scripts.train --config "
                                f"{algo_map[algo_name]}\n"
                            )
            f.write("\n")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config_dir", type=str, default=None,
        help="Directory where generated configs will be placed. Defaults to "
             "'paper' subfolder in exps folder of repository",
    )
    parser.add_argument(
        "--dataset_dir", type=str, default=None,
        help="Base dataset directory for released datasets. Defaults to "
             "datasets folder in repository.",
    )
    parser.add_argument(
        "--output_dir", type=str, default=None,
        help="Base output directory for all training runs that will be "
             "written to generated configs.",
    )
    parser.add_argument(
        "--exps", type=str, nargs="+", default=None,
        help="subset of experiment sets to generate "
             f"(default: all of {list(EXP_NAME_TO_GENERATOR)})",
    )
    main(parser.parse_args())

"""Config-generation helpers for RoboCasa experiments (reference
``robomimic/utils/config_gen_utils.py:43-429``): the shipped RoboCasa
action_config, language-conditioned visual-encoder defaults, dataset-name
resolution, and debug-mode shrinking."""

from robot_manipulation_vq_vae_tpu.utils.dataset_registry import get_ds_path


def get_robocasa_action_config():
    """The action normalization block every RoboCasa experiment uses
    (reference config_gen_utils.py:43-100; matches train_config.json)."""
    return {
        "actions": {"normalization": None},
        "actions_abs": {"normalization": "min_max"},
        "action_dict/abs_pos": {"normalization": "min_max"},
        "action_dict/abs_rot_axis_angle": {
            "normalization": "min_max",
            "format": "rot_axis_angle",
        },
        "action_dict/abs_rot_6d": {"normalization": None, "format": "rot_6d"},
        "action_dict/rel_pos": {"normalization": None},
        "action_dict/rel_rot_axis_angle": {
            "normalization": None,
            "format": "rot_axis_angle",
        },
        "action_dict/rel_rot_6d": {"normalization": None, "format": "rot_6d"},
        "action_dict/gripper": {"normalization": None},
        "action_dict/base_mode": {"normalization": None},
    }


def get_robocasa_rgb_encoder_config(lang_conditioned=True, crop=116):
    """FiLM ResNet18 + SpatialSoftmax + CropRandomizer defaults
    (reference config_gen_utils.py:100-205)."""
    return {
        "core_class": (
            "VisualCoreLanguageConditioned" if lang_conditioned else "VisualCore"
        ),
        "core_kwargs": {
            "feature_dimension": 64,
            "backbone_class": (
                "ResNet18ConvFiLM" if lang_conditioned else "ResNet18Conv"
            ),
            "backbone_kwargs": {"pretrained": False, "input_coord_conv": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {
                "num_kp": 32,
                "learnable_temperature": False,
                "temperature": 1.0,
                "noise_std": 0.0,
            },
        },
        "obs_randomizer_class": "CropRandomizer",
        "obs_randomizer_kwargs": {
            "crop_height": crop, "crop_width": crop,
            "num_crops": 1, "pos_enc": False,
        },
    }


def get_robocasa_ds(tasks, src="mg", filter_key=None, eval_only_tasks=None):
    """Map task names -> dataset entries (reference
    config_gen_utils.py:429-...)."""
    entries = []
    eval_only_tasks = set(eval_only_tasks or [])
    for task in tasks:
        path, horizon = get_ds_path(task, ds_type=f"{src}_im", return_info=True)
        entries.append(
            {
                "path": path,
                "horizon": horizon,
                "do_eval": task in eval_only_tasks or not eval_only_tasks,
                "filter_key": filter_key,
            }
        )
    return entries


def set_debug_mode(config_dict):
    """Shrink a config for a fast smoke run (reference
    config_gen_utils.py:269-...)."""
    config_dict["experiment"]["epoch_every_n_steps"] = 3
    config_dict["experiment"]["validation_epoch_every_n_steps"] = 3
    config_dict["train"]["num_epochs"] = 2
    config_dict["experiment"]["rollout"] = dict(
        config_dict["experiment"].get("rollout", {}),
        rate=1, n=2, horizon=10,
    )
    config_dict["experiment"]["save"] = dict(
        config_dict["experiment"].get("save", {}), every_n_epochs=1
    )
    config_dict["train"]["num_data_workers"] = 2
    return config_dict

"""Shared plumbing for the per-algorithm experiment-config generators
(reference ``robomimic/scripts/config_gen/config_gen_utils.py`` — the
get_generator/make_generator half; the robocasa defaults half lives in
``utils/config_gen_utils.py``)."""

import argparse
import json
import os
import tempfile

from robot_manipulation_vq_vae_tpu.utils.config_gen_utils import (
    get_robocasa_action_config,
    get_robocasa_ds,
    get_robocasa_rgb_encoder_config,
    set_debug_mode,
)
from robot_manipulation_vq_vae_tpu.utils.hyperparam_utils import ConfigGenerator

# the reference's default task sets
SINGLE_STAGE_TASKS = [
    "PnPCabToCounter", "PnPCounterToSink", "PnPSinkToCounter",
    "PnPCounterToMicrowave", "PnPMicrowaveToCounter", "PnPCounterToStove",
    "PnPStoveToCounter",
]
COMPOSITE_TASKS = [
    "ArrangeVegetables", "MicrowaveThawing", "RestockPantry", "PreSoakPan",
    "PrepareCoffee",
]

# named dataset presets used across the reference's *_gen / *_mg_data /
# *_zr_data variants
DATASET_PRESETS = {
    "human-50": dict(src="human", filter_key="50_demos"),
    "mg-3000": dict(src="mg", filter_key="3000_demos"),
}


def standard_argparser(default_name):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, default=default_name)
    parser.add_argument("--tasks", nargs="+", default=SINGLE_STAGE_TASKS)
    parser.add_argument("--dataset_preset", type=str, default="human-50",
                        choices=sorted(DATASET_PRESETS))
    parser.add_argument("--seeds", nargs="+", type=int, default=[123])
    parser.add_argument("--output_dir", type=str, default="expdata/robocasa")
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--wandb_proj_name", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    return parser


def apply_robocasa_defaults(config, args, lang_conditioned=True):
    """Dataset list, action config, observation modalities/encoder — the
    robocasa experiment boilerplate shared by every generator."""
    preset = DATASET_PRESETS[args.dataset_preset]
    config.train.data = get_robocasa_ds(args.tasks, **preset)
    config.train.output_dir = args.output_dir
    config.train.action_config = get_robocasa_action_config()
    config.experiment.name = args.name
    config.observation.modalities.obs.low_dim = [
        "robot0_base_to_eef_pos", "robot0_base_to_eef_quat",
        "robot0_base_pos", "robot0_base_quat", "robot0_gripper_qpos",
    ]
    config.observation.modalities.obs.rgb = [
        "robot0_agentview_left_image", "robot0_agentview_right_image",
        "robot0_eye_in_hand_image",
    ]
    config.observation.encoder.rgb = get_robocasa_rgb_encoder_config(
        lang_conditioned=lang_conditioned
    )
    return config


def emit(config, args, extra_params=None):
    """Dump the base json and fan out the sweep (seeds + any extras)."""
    cfg_dict = json.loads(config.dump())
    if args.debug:
        cfg_dict = set_debug_mode(cfg_dict)
    os.makedirs(args.config_dir, exist_ok=True)
    base_path = os.path.join(args.config_dir, f"{args.name}_base.json")
    with open(base_path, "w") as f:
        json.dump(cfg_dict, f, indent=4)

    gen = ConfigGenerator(
        base_config_file=base_path,
        script_file=os.path.join(args.config_dir, f"{args.name}_run.sh"),
        wandb_proj_name=args.wandb_proj_name,
        generated_config_dir=args.config_dir,
    )
    gen.add_param("train.seed", "seed", 0, args.seeds)
    for key, name, group, values in (extra_params or []):
        gen.add_param(key, name, group, values)
    paths = gen.generate()
    print("generated configs:")
    for p in paths:
        print("  " + p)
    print(f"launcher: {gen.script_file}")
    return paths

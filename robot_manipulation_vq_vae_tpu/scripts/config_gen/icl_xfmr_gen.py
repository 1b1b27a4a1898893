"""Generate ICL transformer (HVQVAE / LipVQ) experiment configs
(reference ``robomimic/scripts/config_gen/icl_xfmr_gen.py``).

Usage:
    python -m robot_manipulation_vq_vae_tpu.scripts.config_gen.icl_xfmr_gen \
        --name my_exp --tasks PnPCabToCounter PnPCounterToSink [--debug]
"""

import argparse
import json
import os
import tempfile

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils.config_gen_utils import (
    get_robocasa_action_config,
    get_robocasa_ds,
    get_robocasa_rgb_encoder_config,
    set_debug_mode,
)
from robot_manipulation_vq_vae_tpu.utils.hyperparam_utils import ConfigGenerator

DEFAULT_TASKS = [
    "PnPCabToCounter", "PnPCounterToSink", "PnPSinkToCounter",
    "PnPCounterToMicrowave", "PnPMicrowaveToCounter", "PnPCounterToStove",
    "PnPStoveToCounter",
]


def make_base_config(args):
    """The shipped ICL-HVQVAE experiment template (matches the reference
    train_config.json layout)."""
    config = config_factory("icl")
    with config.unlocked():
        config.experiment.name = args.name
        config.experiment.epoch_every_n_steps = 500
        config.experiment.rollout.n = 50
        config.experiment.rollout.rate = 100
        config.experiment.rollout.horizon = 500

        config.train.data = get_robocasa_ds(
            args.tasks, src="mg", filter_key=f"{args.ndemos}_demos"
        )
        config.train.output_dir = args.output_dir
        config.train.num_data_workers = 16
        config.train.seq_length = 16
        config.train.frame_stack = 16
        config.train.dataset_keys = ["actions"]
        config.train.batch_size = 64
        config.train.num_epochs = 1000
        config.train.max_grad_norm = 100.0
        config.train.action_config = get_robocasa_action_config()

        config.algo.transformer.enabled = True
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = True
        config.algo.transformer.ln_act_enabled = True

        config.observation.modalities.obs.low_dim = [
            "robot0_base_to_eef_pos", "robot0_base_to_eef_quat",
            "robot0_base_pos", "robot0_base_quat", "robot0_gripper_qpos",
        ]
        config.observation.modalities.obs.rgb = [
            "robot0_agentview_left_image", "robot0_agentview_right_image",
            "robot0_eye_in_hand_image",
        ]
        config.observation.encoder.rgb = get_robocasa_rgb_encoder_config()
    return config


def main(args):
    config = make_base_config(args)
    cfg_dict = json.loads(config.dump())
    if args.debug:
        cfg_dict = set_debug_mode(cfg_dict)
    base_path = os.path.join(args.config_dir, f"{args.name}_base.json")
    os.makedirs(args.config_dir, exist_ok=True)
    with open(base_path, "w") as f:
        json.dump(cfg_dict, f, indent=4)

    gen = ConfigGenerator(
        base_config_file=base_path,
        script_file=os.path.join(args.config_dir, f"{args.name}_run.sh"),
        wandb_proj_name=args.wandb_proj_name,
        generated_config_dir=args.config_dir,
    )
    gen.add_param("train.seed", "seed", 0, args.seeds)
    paths = gen.generate()
    print("generated configs:")
    for p in paths:
        print("  " + p)
    print(f"launcher: {gen.script_file}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, default="icl_hvqvae")
    parser.add_argument("--tasks", nargs="+", default=DEFAULT_TASKS)
    parser.add_argument("--ndemos", type=int, default=50)
    parser.add_argument("--seeds", nargs="+", type=int, default=[123])
    parser.add_argument("--output_dir", type=str, default="expdata/robocasa")
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--wandb_proj_name", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    main(parser.parse_args())

"""ICL transformer zero-shot-rollout configs: train with one task held out,
evaluate in-context on it (reference
``robomimic/scripts/config_gen/icl_xfmr_gen_zr_data.py``)."""

from robot_manipulation_vq_vae_tpu.scripts.config_gen.icl_xfmr_gen import (
    DEFAULT_TASKS,
    make_base_config,
)

if __name__ == "__main__":
    import argparse
    import json
    import os
    import tempfile

    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, default="icl_hvqvae_zr")
    parser.add_argument("--tasks", nargs="+", default=DEFAULT_TASKS)
    parser.add_argument("--holdout", type=str, default=DEFAULT_TASKS[0])
    parser.add_argument("--ndemos", type=int, default=50)
    parser.add_argument("--seeds", nargs="+", type=int, default=[123])
    parser.add_argument("--output_dir", type=str, default="expdata/robocasa")
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--wandb_proj_name", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()
    args.tasks = [t for t in args.tasks if t != args.holdout]
    config = make_base_config(args)
    with config.unlocked():
        config.experiment.additional_envs = [args.holdout]
    # reuse the emit half of icl_xfmr_gen.main
    cfg_dict = json.loads(config.dump())
    os.makedirs(args.config_dir, exist_ok=True)
    base_path = os.path.join(args.config_dir, f"{args.name}_base.json")
    with open(base_path, "w") as f:
        json.dump(cfg_dict, f, indent=4)
    from robot_manipulation_vq_vae_tpu.utils.hyperparam_utils import (
        ConfigGenerator,
    )

    gen = ConfigGenerator(
        base_config_file=base_path,
        script_file=os.path.join(args.config_dir, f"{args.name}_run.sh"),
        wandb_proj_name=args.wandb_proj_name,
        generated_config_dir=args.config_dir,
    )
    gen.add_param("train.seed", "seed", 0, args.seeds)
    for p in gen.generate():
        print("  " + p)

"""Zero-shot-rollout eval for a trained checkpoint (reference
``robomimic/scripts/config_gen/eval_zr_ckpt.py``): evaluate on an env the
policy was NOT trained on (passed via --env_name), with ICL context drawn
from --dataset."""

import argparse
import json

from robot_manipulation_vq_vae_tpu.scripts.config_gen import eval_ckpt
from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils


def main(args):
    ckpt_dict = FileUtils.maybe_dict_from_checkpoint(ckpt_path=args.ckpt)
    cfg = json.loads(ckpt_dict["config"])
    assert args.env_name is not None, "zero-shot eval needs --env_name"
    if args.dataset is not None:
        cfg["train"]["data"] = args.dataset
    cfg["experiment"]["name"] = cfg["experiment"]["name"] + "_zr"
    ckpt_dict["config"] = json.dumps(cfg)
    return eval_ckpt.run_from_ckpt_dict(ckpt_dict, args)


if __name__ == "__main__":
    import os
    import tempfile

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--env_name", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--n_rollouts", type=int, default=50)
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--run", action="store_true")
    main(parser.parse_args())

"""Eval-only run for a trained ICL checkpoint (reference
``robomimic/scripts/config_gen/eval_icl_ckpt.py``): same as eval_ckpt but
forces batched ICL rollouts and lets the caller swap the eval dataset (the
context demos come from the dataset)."""

import argparse
import json

from robot_manipulation_vq_vae_tpu.scripts.config_gen import eval_ckpt
from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils


def main(args):
    ckpt_dict = FileUtils.maybe_dict_from_checkpoint(ckpt_path=args.ckpt)
    cfg = json.loads(ckpt_dict["config"])
    if args.dataset is not None:
        cfg["train"]["data"] = args.dataset
    cfg["experiment"]["rollout"]["batched"] = True
    cfg["experiment"]["rollout"]["num_batch_envs"] = args.num_batch_envs
    ckpt_dict["config"] = json.dumps(cfg)
    args.env_name = getattr(args, "env_name", None)
    return eval_ckpt.run_from_ckpt_dict(ckpt_dict, args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--n_rollouts", type=int, default=50)
    parser.add_argument("--num_batch_envs", type=int, default=5)
    parser.add_argument("--env_name", type=str, default=None)
    parser.add_argument(
        "--config_dir", type=str,
        default=None,
    )
    parser.add_argument("--run", action="store_true")
    args = parser.parse_args()
    if args.config_dir is None:
        import os
        import tempfile

        args.config_dir = os.path.join(tempfile.gettempdir(), "rmvq_configs")
    main(args)

"""Generate an eval-only run for a trained checkpoint
(reference ``robomimic/scripts/config_gen/eval_ckpt.py:4-104``): loads the
config stored in the checkpoint, points ``experiment.ckpt_path`` at it,
enables rollouts, and emits the train command with ``--eval_only``.
"""

import argparse
import json
import os
import tempfile

from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils


def run_from_ckpt_dict(ckpt_dict, args):
    """Write the eval config + emit/launch the train --eval_only command.
    Shared with eval_icl_ckpt.py."""
    cfg = json.loads(ckpt_dict["config"])

    cfg["experiment"]["ckpt_path"] = args.ckpt
    cfg["experiment"]["rollout"]["enabled"] = True
    cfg["experiment"]["rollout"]["n"] = args.n_rollouts
    cfg["experiment"]["rollout"]["rate"] = 200
    cfg["experiment"]["name"] = cfg["experiment"]["name"] + "_eval"
    if args.env_name is not None:
        cfg["experiment"]["env"] = args.env_name

    os.makedirs(args.config_dir, exist_ok=True)
    out_path = os.path.join(
        args.config_dir, cfg["experiment"]["name"] + ".json"
    )
    with open(out_path, "w") as f:
        json.dump(cfg, f, indent=4)

    cmd = (
        "python -m robot_manipulation_vq_vae_tpu.scripts.train "
        f"--config {out_path} --eval_only"
    )
    print(cmd)
    if args.run:
        os.system(cmd)
    return out_path


def main(args):
    ckpt_dict = FileUtils.maybe_dict_from_checkpoint(ckpt_path=args.ckpt)
    return run_from_ckpt_dict(ckpt_dict, args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--n_rollouts", type=int, default=50)
    parser.add_argument("--env_name", type=str, default=None)
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--run", action="store_true")
    main(parser.parse_args())

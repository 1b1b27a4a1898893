"""BC-Transformer configs for zero-shot-rollout (held-out task) experiments
(reference ``robomimic/scripts/config_gen/bc_xfmr_gen_zr_data.py``): train
on all-but-one task, roll out on the held-out one via
``experiment.additional_envs``."""

from robot_manipulation_vq_vae_tpu.scripts.config_gen.bc_xfmr_gen import (
    make_config,
)
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    SINGLE_STAGE_TASKS,
    emit,
    standard_argparser,
)

if __name__ == "__main__":
    parser = standard_argparser("bc_xfmr_zr")
    parser.add_argument("--holdout", type=str, default=SINGLE_STAGE_TASKS[0])
    args = parser.parse_args()
    args.tasks = [t for t in args.tasks if t != args.holdout]
    config = make_config(args)
    with config.unlocked():
        config.experiment.additional_envs = [args.holdout]
    emit(config, args)

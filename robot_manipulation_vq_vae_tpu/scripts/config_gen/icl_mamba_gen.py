"""ICL-Mamba experiment configs (reference
``robomimic/scripts/config_gen/icl_mamba_gen.py``)."""

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    apply_robocasa_defaults,
    emit,
    standard_argparser,
)


def make_config(args):
    config = config_factory("icl_mamba")
    with config.unlocked():
        config.algo.transformer.enabled = True
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = True
        config.train.seq_length = 16
        config.train.frame_stack = 16
        config.train.batch_size = 64
        config.train.num_epochs = 1000
        config.train.max_grad_norm = 100.0
        apply_robocasa_defaults(config, args)
    return config


if __name__ == "__main__":
    args = standard_argparser("icl_mamba").parse_args()
    emit(make_config(args), args)

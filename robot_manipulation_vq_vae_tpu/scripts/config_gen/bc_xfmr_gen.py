"""BC-Transformer experiment configs over robocasa datasets (reference
``robomimic/scripts/config_gen/bc_xfmr_gen.py``)."""

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    apply_robocasa_defaults,
    emit,
    standard_argparser,
)


def make_config(args):
    config = config_factory("bc")
    with config.unlocked():
        config.algo.transformer.enabled = True
        config.algo.gmm.enabled = True
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.train.seq_length = 10
        config.train.frame_stack = 10
        config.train.batch_size = 64
        config.train.num_epochs = 1000
        config.train.max_grad_norm = 100.0
        apply_robocasa_defaults(config, args)
    return config


if __name__ == "__main__":
    args = standard_argparser("bc_xfmr").parse_args()
    emit(make_config(args), args)

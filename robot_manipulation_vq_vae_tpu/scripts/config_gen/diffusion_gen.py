"""Diffusion-policy experiment configs (reference
``robomimic/scripts/config_gen/diffusion_gen.py``)."""

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    apply_robocasa_defaults,
    emit,
    standard_argparser,
)


def make_config(args):
    config = config_factory("diffusion_policy")
    with config.unlocked():
        config.train.seq_length = 16
        config.train.frame_stack = 2
        config.train.batch_size = 256
        config.train.num_epochs = 1000
        apply_robocasa_defaults(config, args)
    return config


if __name__ == "__main__":
    args = standard_argparser("diffusion").parse_args()
    emit(make_config(args), args)

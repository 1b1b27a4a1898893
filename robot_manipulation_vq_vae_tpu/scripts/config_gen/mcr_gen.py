"""MCR (warm-started ResNet-50 BC) experiment configs (reference
``robomimic/scripts/config_gen/mcr_gen.py``)."""

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    apply_robocasa_defaults,
    emit,
    standard_argparser,
)


def make_config(args):
    config = config_factory("mcr")
    with config.unlocked():
        config.algo.transformer.enabled = True
        config.algo.gmm.enabled = True
        config.train.seq_length = 10
        config.train.frame_stack = 10
        config.train.batch_size = 64
        config.train.num_epochs = 1000
        apply_robocasa_defaults(config, args)
        # MCR trunks are ResNet-50 (encoder.rgb is a plain dict here)
        config.observation.encoder.rgb["core_kwargs"]["backbone_class"] = (
            "ResNet50ConvFiLM"
        )
    return config


if __name__ == "__main__":
    args = standard_argparser("mcr").parse_args()
    emit(make_config(args), args)

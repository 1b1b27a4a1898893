"""BC-RNN experiment configs (reference
``robomimic/scripts/config_gen/bc_rnn_gen.py``)."""

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.scripts.config_gen.gen_common import (
    apply_robocasa_defaults,
    emit,
    standard_argparser,
)


def make_config(args):
    config = config_factory("bc")
    with config.unlocked():
        config.algo.rnn.enabled = True
        config.algo.gmm.enabled = True
        config.algo.rnn.horizon = 10
        config.train.seq_length = 10
        config.train.batch_size = 100
        config.train.num_epochs = 1000
        apply_robocasa_defaults(config, args)
    return config


if __name__ == "__main__":
    args = standard_argparser("bc_rnn").parse_args()
    emit(make_config(args), args)

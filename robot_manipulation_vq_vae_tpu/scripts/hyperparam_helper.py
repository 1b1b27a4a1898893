"""Template script for hyperparameter scans (reference
``robomimic/scripts/hyperparam_helper.py:1-141``).

Start from a base config json, declare swept parameters in
:func:`make_generator` (same-group params sweep together; different groups
take the cartesian product), then run:

    python -m robot_manipulation_vq_vae_tpu.scripts.hyperparam_helper \
        --config /tmp/gen_configs/base.json --script /tmp/gen_configs/out.sh

The experiment jsons land next to the base json; the shell script contains
one train command per generated config.
"""

import argparse

from robot_manipulation_vq_vae_tpu.utils import hyperparam_utils as HyperparamUtils


def make_generator(config_file, script_file):
    """Edit this to set up your own scan (the reference ships this exact
    RNN example sweep: LR x GMM x (RNN dim + MLP dims))."""
    import os

    # reference behavior: generated jsons land next to the base json
    generator = HyperparamUtils.ConfigGenerator(
        base_config_file=config_file, script_file=script_file,
        generated_config_dir=os.path.dirname(os.path.abspath(config_file)),
    )

    # use RNN with horizon 10
    generator.add_param(
        key="algo.rnn.enabled", name="", group=0, values=[True]
    )
    generator.add_param(
        key="train.seq_length", name="", group=0, values=[10]
    )
    generator.add_param(
        key="algo.rnn.horizon", name="", group=0, values=[10]
    )

    # LR - 1e-3, 1e-4
    generator.add_param(
        key="algo.optim_params.policy.learning_rate.initial",
        name="plr", group=1, values=[1e-3, 1e-4],
    )

    # GMM on / off
    generator.add_param(
        key="algo.gmm.enabled", name="gmm", group=2,
        values=[True, False], value_names=["t", "f"],
    )

    # RNN dim 400 + MLP (1024, 1024) vs RNN dim 1000 + no MLP
    generator.add_param(
        key="algo.rnn.hidden_dim", name="rnnd", group=3, values=[400, 1000]
    )
    generator.add_param(
        key="algo.actor_layer_dims", name="mlp", group=3,
        values=[[1024, 1024], []], value_names=["1024", "0"],
    )
    return generator


def main(args):
    generator = make_generator(
        config_file=args.config, script_file=args.script
    )
    generator.generate()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--config", type=str, required=True,
        help="base config json; generated jsons land in its directory",
    )
    parser.add_argument(
        "--script", type=str, required=True,
        help="output shell script with one train command per config",
    )
    main(parser.parse_args())

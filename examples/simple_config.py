"""
An example for creating and using the locking Config object.

Mirrors the reference example (``/root/reference/robomimic/examples/
simple_config.py``): build a config, lock it, show that locked configs
reject new keys, mutate values inside ``values_unlocked``, add keys
inside ``unlocked``, and update from an external dict.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from robot_manipulation_vq_vae_tpu.config.config import Config

if __name__ == "__main__":

    # create config
    config = Config()

    config.train.batch_size = 100
    config.train.learning_rate = 1e-3
    config.algo.actor_network_size = [1000, 1000]
    config.lock()  # prevent accidental changes

    # access config
    print("batch_size={}".format(config.train.batch_size))

    # the config is locked --- cannot add new keys or modify existing keys
    try:
        config.train.optimizer = "Adam"
    except RuntimeError as e:
        print(e)

    # values_unlocked scope allows modifying values of existing keys,
    # but not adding keys
    with config.values_unlocked():
        config.train.batch_size = 200
    print("batch_size={}".format(config.train.batch_size))

    # allow adding new keys to the config
    with config.unlocked():
        config.test.num_eval = 10

    assert config.is_locked
    assert config.test.is_locked

    # read external config from a dict
    ext_config = {
        "train": {"learning_rate": 1e-3},
        "algo": {"actor_network_size": [1000, 1000]},
    }
    with config.values_unlocked():
        config.update(ext_config)

    print(config)

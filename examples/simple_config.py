"""Instructive example: the three ways to build a config (reference
``robomimic/examples/simple_config.py``) — factory defaults, external JSON
override, and programmatic unlocked edits."""

import json

from robot_manipulation_vq_vae_tpu.config import config_factory


def main():
    # 1) factory defaults for an algorithm
    config = config_factory("bc")
    print("default bc batch size:", config.train.batch_size)

    # 2) override from an external JSON (unknown keys raise)
    ext = {"train": {"batch_size": 16}, "algo": {"gmm": {"enabled": True}}}
    config = config_factory("bc", dic=json.loads(json.dumps(
        {"algo_name": "bc", **ext}
    )))
    print("json-overridden batch size:", config.train.batch_size)

    # 3) programmatic edits require unlocking; typos raise afterwards
    # (a dic-built config carries only the external keys, as the reference's
    # config_factory does)
    with config.values_unlocked():
        config.train.batch_size = 32
    config.lock()
    try:
        config.train.batchsize = 1  # typo -> error
    except RuntimeError as e:
        print("locked config caught the typo:", e)


if __name__ == "__main__":
    main()

"""Teleoperated demonstration collection (reference
``robocasa/scripts/collect_demos.py:1-528``): drive a robosuite/RoboCasa env
with a keyboard or spacemouse device and record state/action trajectories to
HDF5. Host-side, sim-bound (requires robosuite with its device support)."""

import argparse
import datetime
import json
import os
import time

import h5py
import numpy as np


def collect_trajectory(env, device, mirror_actions=True, max_fr=30):
    """Run one teleop episode; returns (states, actions, success)."""
    env.reset()
    device.start_control()
    states, actions = [], []
    success = False
    while True:
        start = time.time()
        input_ac_dict = device.input2action(mirror_actions=mirror_actions)
        if input_ac_dict is None:  # reset requested
            break
        ac = np.asarray(input_ac_dict)
        state = env.get_state()["states"]
        env.step(ac)
        states.append(state)
        actions.append(ac)
        if env.is_success()["task"]:
            success = True
            break
        if max_fr is not None:
            elapsed = time.time() - start
            if elapsed < 1.0 / max_fr:
                time.sleep(1.0 / max_fr - elapsed)
    return np.asarray(states), np.asarray(actions), success


def main(args):
    try:
        from robosuite.devices import Keyboard, SpaceMouse
    except ImportError as e:
        raise ImportError(
            "collect_demos requires robosuite (with device support) on the "
            "host machine"
        ) from e

    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType

    env = EnvUtils.create_env(
        env_type=EnvType.ROBOSUITE_TYPE,
        env_name=args.env,
        render=True,
        robots=args.robots,
    )
    if args.device == "keyboard":
        device = Keyboard(env=env.env)
    else:
        device = SpaceMouse(env=env.env)

    time_str = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    out_path = os.path.join(args.directory, time_str, "demo.hdf5")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    with h5py.File(out_path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(env.serialize())
        count = 0
        while count < args.num_demos:
            states, acts, success = collect_trajectory(env, device)
            if not success or len(acts) == 0:
                print("episode discarded")
                continue
            ep = data.create_group(f"demo_{count}")
            ep.attrs["num_samples"] = len(acts)
            ep.create_dataset("states", data=states)
            ep.create_dataset("actions", data=acts)
            count += 1
            print(f"saved demo_{count - 1} ({len(acts)} steps)")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="PnPCounterToCab")
    parser.add_argument("--robots", type=str, default="PandaMobile")
    parser.add_argument("--device", choices=["keyboard", "spacemouse"],
                        default="keyboard")
    parser.add_argument("--directory", type=str, default="demo_data")
    parser.add_argument("--num_demos", type=int, default=10)
    main(parser.parse_args())

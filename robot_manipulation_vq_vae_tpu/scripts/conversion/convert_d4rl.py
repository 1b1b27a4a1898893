"""Convert a D4RL dataset into this framework's hdf5 layout
(reference ``robomimic/scripts/conversion/convert_d4rl.py``): the flat
(obs, action, reward, terminal, timeout) arrays are cut into per-trajectory
``demo_N`` groups with ``obs/flat`` / ``next_obs/flat`` keys, and env
metadata is stamped on the data group.

The d4rl/gym download path is host-gated; the splitting core is a pure
function over arrays so it is testable without d4rl installed."""

import argparse
import json
import os

import h5py
import numpy as np


def split_d4rl_trajectories(ds):
    """Cut flat D4RL arrays into trajectories at done/timeout boundaries
    (reference convert_d4rl.py:82-135). Trailing transitions with no
    terminal truncation are dropped, as in the reference.

    Args:
        ds: dict with 'observations' [N, D], 'actions' [N, A],
            'rewards' [N], 'terminals' [N], 'timeouts' [N].
    Returns:
        list of dicts with obs/next_obs/actions/rewards/dones arrays.
    """
    all_obs = np.asarray(ds["observations"])
    all_act = np.asarray(ds["actions"])
    n = all_obs.shape[0]
    obs = all_obs[: n - 1]
    actions = all_act[: n - 1]
    next_obs = all_obs[1:]
    rewards = np.squeeze(np.asarray(ds["rewards"])[: n - 1])
    dones = np.squeeze(np.asarray(ds["terminals"])[: n - 1]).astype(np.int32)
    timeouts = np.asarray(ds["timeouts"])

    trajs = []
    start = 0
    for idx in range(obs.shape[0]):
        if timeouts[idx] or dones[idx]:
            sl = slice(start, idx + 1)
            traj = dict(
                obs=obs[sl].copy(),
                next_obs=next_obs[sl].copy(),
                actions=actions[sl].copy(),
                rewards=rewards[sl].copy(),
                dones=dones[sl].copy(),
            )
            # final step: next_obs = current obs, done forced true (:114-116)
            traj["next_obs"][-1] = obs[idx]
            traj["dones"][-1] = 1
            trajs.append(traj)
            start = idx + 1
    return trajs


def write_d4rl_hdf5(trajs, output_path, env_args_json):
    """Write split trajectories in the framework's demo layout."""
    total = 0
    with h5py.File(output_path, "w") as f:
        grp = f.create_group("data")
        for i, traj in enumerate(trajs):
            ep = grp.create_group(f"demo_{i}")
            ep.create_dataset("obs/flat", data=traj["obs"])
            ep.create_dataset("next_obs/flat", data=traj["next_obs"])
            ep.create_dataset("actions", data=traj["actions"])
            ep.create_dataset("rewards", data=traj["rewards"])
            ep.create_dataset("dones", data=traj["dones"])
            ep.attrs["num_samples"] = len(traj["actions"])
            total += len(traj["actions"])
        grp.attrs["total"] = total
        grp.attrs["env_args"] = env_args_json
    return total


def main(args):
    try:
        import d4rl  # noqa: F401
        import gym
    except ImportError as e:  # host-side dependency
        raise ImportError(
            "convert_d4rl requires the host packages `gym` and `d4rl`"
        ) from e

    from robot_manipulation_vq_vae_tpu.envs.env_gym import EnvGym

    base_folder = args.folder or os.path.join(os.getcwd(), "datasets")
    base_folder = os.path.join(base_folder, "d4rl")
    d4rl.set_dataset_path(base_folder)
    env = gym.make(args.env)
    ds = env.env.get_dataset()
    env.close()

    env_meta = EnvGym(args.env)
    write_folder = os.path.join(base_folder, "converted")
    os.makedirs(write_folder, exist_ok=True)
    output_path = os.path.join(
        write_folder, "{}.hdf5".format(args.env.replace("-", "_"))
    )
    trajs = split_d4rl_trajectories(ds)
    total = write_d4rl_hdf5(
        trajs, output_path, json.dumps(env_meta.serialize(), indent=4)
    )
    print(f"wrote {len(trajs)} trajectories ({total} samples) to {output_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, required=True)
    parser.add_argument("--folder", type=str, default=None)
    main(parser.parse_args())

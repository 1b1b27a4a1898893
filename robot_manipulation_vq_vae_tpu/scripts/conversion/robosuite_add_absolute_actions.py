"""Add absolute (goal-pose) actions alongside the stored delta actions in a
robosuite dataset (reference
``robomimic/scripts/conversion/robosuite_add_absolute_actions.py``, itself
adapted from diffusion_policy's robomimic_util).

For every step: reset the sim to the stored state, feed the delta action
through the robot controller's goal generator, and read back the resulting
goal pos/ori in the robot's base frame as the absolute action; the gripper
(and any remaining) dims are carried over unchanged. Results land in a new
``actions_abs`` dataset per demo, feeding ``extract_action_dict.py``.

Host-side, sim-bound workflow (requires robosuite + scipy); demos are
processed by a worker pool like the reference."""

import argparse
import multiprocessing
import pathlib

import h5py
import numpy as np


class RobosuiteAbsoluteActionConverter:
    """Owns one env instance; converts one demo's delta actions at a time."""

    def __init__(self, dataset_path, algo_name="bc"):
        from robot_manipulation_vq_vae_tpu.config import config_factory
        from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
        from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
        from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

        config = config_factory(algo_name=algo_name)
        ObsUtils.initialize_obs_utils_with_config(config)
        env_meta = FileUtils.get_env_metadata_from_dataset(dataset_path)
        self.env = EnvUtils.create_env_from_metadata(
            env_meta=env_meta, render=False, render_offscreen=False,
            use_image_obs=False,
        )
        self.file = h5py.File(dataset_path, "r")

    def get_demo_keys(self):
        return list(self.file["data"].keys())

    def convert_actions(self, states, actions, initial_state):
        """Delta action sequence -> absolute goal-pose actions
        (reference :60-113)."""
        from scipy.spatial.transform import Rotation

        import robosuite.utils.transform_utils as T

        env = self.env
        d_a = len(env.env.robots[0].action_limits[0])
        # multi-robot datasets stack per-robot actions on the last axis
        stacked = actions.reshape(*actions.shape[:-1], -1, d_a)
        goal_pos = np.zeros(stacked.shape[:-1] + (3,), dtype=stacked.dtype)
        goal_ori = np.zeros(stacked.shape[:-1] + (3,), dtype=stacked.dtype)
        remainder = stacked[..., 6:]

        for i in range(len(states)):
            if i == 0:
                env.reset_to(initial_state)
            else:
                env.reset_to({"states": states[i]})
            for idx, robot in enumerate(env.env.robots):
                robot.control(stacked[i, idx], policy_step=True)
                controller = robot.controller
                base_pos, base_ori = robot.get_base_pose()
                ac_pos, ac_ori = T.compute_rel_transform(
                    base_pos, base_ori, controller.goal_pos,
                    controller.goal_ori,
                )
                goal_pos[i, idx] = ac_pos
                goal_ori[i, idx] = Rotation.from_matrix(ac_ori).as_rotvec()

        stacked_abs = np.concatenate([goal_pos, goal_ori, remainder], axis=-1)
        return stacked_abs.reshape(actions.shape)

    def convert_demo(self, demo_key):
        demo = self.file[f"data/{demo_key}"]
        states = demo["states"][:]
        actions = demo["actions"][:]
        initial_state = dict(states=states[0])
        initial_state["model"] = demo.attrs["model_file"]
        if "ep_meta" in demo.attrs:
            initial_state["ep_meta"] = demo.attrs["ep_meta"]
        return self.convert_actions(states, actions, initial_state)


def _worker(job):
    path, demo_key = job
    converter = RobosuiteAbsoluteActionConverter(path)
    return converter.convert_demo(demo_key)


def add_absolute_actions_to_dataset(dataset, num_workers=10):
    dataset = pathlib.Path(dataset).expanduser()
    assert dataset.is_file()

    converter = RobosuiteAbsoluteActionConverter(dataset)
    demo_keys = converter.get_demo_keys()
    del converter

    with multiprocessing.Pool(num_workers) as pool:
        results = pool.map(_worker, [(dataset, k) for k in demo_keys])

    with h5py.File(dataset, "r+") as f:
        for demo_key, abs_actions in zip(demo_keys, results):
            demo = f[f"data/{demo_key}"]
            if "actions_abs" not in demo:
                demo.create_dataset("actions_abs", data=np.array(abs_actions))
            else:
                demo["actions_abs"][:] = abs_actions


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--num_workers", type=int, default=10)
    args = parser.parse_args()
    add_absolute_actions_to_dataset(args.dataset, args.num_workers)

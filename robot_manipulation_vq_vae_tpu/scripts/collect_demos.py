"""Teleoperated demonstration collection (reference
``robocasa/scripts/collect_demos.py:1-528``): drive a robosuite/RoboCasa env
with a keyboard or spacemouse device and record state/action trajectories to
a ``demo.hdf5``.

Reference behaviors reproduced:
  * per-episode language instruction printing from ``get_ep_meta()``
  * empty-input skipping until the first nonzero action (spacemouse idle)
  * success latch: break only after the task stays successful for 10
    consecutive steps (``task_completion_hold_count`` state machine)
  * reset-from-device discards the episode; ``--num_demos`` successful
    episodes are kept
  * frame-rate limiting (``--max_fr``)
  * per-episode ``model_file`` / ``ep_meta`` attrs + ``env_args`` in the
    output HDF5 (the reference's npz-then-gather two-phase flow collapsed
    into a single streaming writer)

Host-side, sim-bound for real use (robosuite devices); the device/env/
assembler seams are injectable so the episode state machine is testable
sim-free."""

import argparse
import datetime
import json
import os
import time

import h5py
import numpy as np


def is_empty_input(action_dict):
    """Spacemouse idle-frame detection (reference :34-41)."""
    return (
        np.all(np.asarray(action_dict.get("right_delta", 0)) == 0)
        and action_dict.get("base_mode", -1) == -1
        and np.all(np.asarray(action_dict.get("base", 0)) == 0)
    )


def default_action_assembler(env, device, input_ac_dict):
    """robosuite arm/gripper action assembly (reference :125-151): route
    delta/absolute arm commands per the active robot's controller and
    maintain gripper state vectors for the inactive robots."""
    from copy import deepcopy

    robots = env.env.robots
    active_robot = robots[device.active_robot]
    action_dict = deepcopy(input_ac_dict)
    for arm in active_robot.arms:
        input_type = active_robot.part_controllers[arm].input_type
        if input_type == "delta":
            action_dict[arm] = input_ac_dict[f"{arm}_delta"]
        elif input_type == "absolute":
            action_dict[arm] = input_ac_dict[f"{arm}_abs"]
        else:
            raise ValueError(input_type)
    env_action = [
        robot.create_action_vector(
            {
                f"{arm}_gripper": np.zeros(robot.gripper[arm].dof)
                for arm in robot.arms
                if robot.gripper[arm].dof > 0
            }
        )
        for robot in robots
    ]
    env_action[device.active_robot] = active_robot.create_action_vector(
        action_dict
    )
    return np.concatenate(env_action)


def collect_trajectory(env, device, mirror_actions=True, max_fr=30,
                       action_assembler=None, success_hold=10,
                       print_info=True):
    """One teleop episode (reference ``collect_human_trajectory`` :44-190).

    Returns (states [T, D], actions [T, A], ep_meta dict, discarded bool).
    discarded=True when the device requested a reset before success.
    """
    env.reset()
    ep_meta = env.get_ep_meta() if hasattr(env, "get_ep_meta") else {}
    lang = ep_meta.get("lang")
    if print_info and lang is not None:
        print(f"Instruction: {lang}")

    device.start_control()
    assembler = action_assembler or (
        lambda e, d, ac: np.asarray(ac["actions"] if "actions" in ac else ac)
    )

    states, actions = [], []
    nonzero_ac_seen = False
    hold = -1  # success latch counter (reference :84,:160-168)
    discarded = False
    while True:
        start = time.time()
        input_ac_dict = device.input2action(mirror_actions=mirror_actions)
        if input_ac_dict is None:  # device reset
            discarded = True
            break
        if is_empty_input(input_ac_dict) and not nonzero_ac_seen:
            continue  # skip idle frames before the first real input
        nonzero_ac_seen = True

        ac = assembler(env, device, input_ac_dict)
        states.append(env.get_state()["states"])
        env.step(ac)
        actions.append(np.asarray(ac))

        if hold == 0:
            break
        if env.is_success()["task"]:
            hold = hold - 1 if hold > 0 else success_hold
        else:
            hold = -1

        if max_fr is not None:
            diff = 1.0 / max_fr - (time.time() - start)
            if diff > 0:
                time.sleep(diff)

    return (np.asarray(states), np.asarray(actions), ep_meta, discarded)


def write_demo(data_grp, index, states, actions, ep_meta, model_xml=None):
    ep = data_grp.create_group(f"demo_{index}")
    ep.attrs["num_samples"] = len(actions)
    if model_xml is not None:
        ep.attrs["model_file"] = model_xml
    if ep_meta:
        ep.attrs["ep_meta"] = json.dumps(ep_meta)
    ep.create_dataset("states", data=states)
    ep.create_dataset("actions", data=actions)
    return len(actions)


def collect_demos(env, device, out_path, num_demos=10, mirror_actions=True,
                  max_fr=30, action_assembler=None, keep_failed=False):
    """Collect @num_demos episodes into @out_path. Returns demo count."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with h5py.File(out_path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(env.serialize())
        count, total = 0, 0
        while count < num_demos:
            states, acts, ep_meta, discarded = collect_trajectory(
                env, device, mirror_actions=mirror_actions, max_fr=max_fr,
                action_assembler=action_assembler,
            )
            if (discarded and not keep_failed) or len(acts) == 0:
                print("episode discarded")
                continue
            model_xml = None
            if hasattr(env, "get_state"):
                model_xml = env.get_state().get("model")
            total += write_demo(data, count, states, acts, ep_meta, model_xml)
            count += 1
            print(f"saved demo_{count - 1} ({len(acts)} steps)")
        data.attrs["total"] = total
    print(f"wrote {out_path}")
    return count


def main(args):
    try:
        from robosuite.devices import Keyboard, SpaceMouse
    except ImportError as e:
        raise ImportError(
            "collect_demos requires robosuite (with device support) on the "
            "host machine"
        ) from e

    from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils

    env_kwargs = dict(robots=args.robots)
    if args.layout is not None:
        env_kwargs["layout_ids"] = args.layout
    if args.style is not None:
        env_kwargs["style_ids"] = args.style
    if args.generative_textures:
        env_kwargs["generative_textures"] = "100p"
    if args.randomize_cameras:
        env_kwargs["randomize_cameras"] = True
    env = EnvUtils.create_env(
        env_type=EnvType.ROBOSUITE_TYPE,
        env_name=args.environment,
        render=True,
        **env_kwargs,
    )
    if args.device == "keyboard":
        device = Keyboard(env=env.env,
                          pos_sensitivity=args.pos_sensitivity,
                          rot_sensitivity=args.rot_sensitivity)
    else:
        device = SpaceMouse(env=env.env,
                            pos_sensitivity=args.pos_sensitivity,
                            rot_sensitivity=args.rot_sensitivity)

    time_str = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    out_path = os.path.join(args.directory, time_str, "demo.hdf5")
    collect_demos(
        env, device, out_path, num_demos=args.num_demos,
        mirror_actions=args.mirror_actions, max_fr=args.max_fr,
        action_assembler=default_action_assembler,
    )


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--environment", "--env", dest="environment",
                        type=str, default="Kitchen")
    parser.add_argument("--robots", type=str, default="PandaMobile")
    parser.add_argument("--device", choices=["keyboard", "spacemouse"],
                        default="keyboard")
    parser.add_argument("--directory", type=str, default="demo_data")
    parser.add_argument("--num_demos", type=int, default=10)
    parser.add_argument("--pos_sensitivity", type=float, default=4.0)
    parser.add_argument("--rot_sensitivity", type=float, default=4.0)
    parser.add_argument("--max_fr", type=int, default=30,
                        help="teleop frame-rate cap")
    parser.add_argument("--mirror_actions",
                        action=argparse.BooleanOptionalAction, default=True,
                        help="mirror actions for camera-facing teleop "
                             "(--no-mirror_actions to disable)")
    parser.add_argument("--layout", type=int, nargs="+", default=None)
    parser.add_argument("--style", type=int, nargs="+", default=None)
    parser.add_argument("--generative_textures", action="store_true")
    parser.add_argument("--randomize_cameras", action="store_true")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())

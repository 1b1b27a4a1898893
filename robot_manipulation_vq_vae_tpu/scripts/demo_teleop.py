"""Interactive teleop demo - drive a kitchen task with keyboard/spacemouse
without recording (reference ``robocasa/demos/demo_teleop.py:1-164``).

Host-side, sim-bound: requires robosuite (with device support) + robocasa."""

import argparse

from robot_manipulation_vq_vae_tpu.scripts.collect_demos import (
    collect_trajectory,
    default_action_assembler,
)
from robot_manipulation_vq_vae_tpu.scripts.demo_kitchen_scenes import (
    choose_option,
)


def main(args):
    try:
        from robosuite.devices import Keyboard, SpaceMouse
    except ImportError as e:
        raise ImportError("demo_teleop requires robosuite on the host") from e

    import robosuite

    from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils

    task = args.task or choose_option(
        sorted(robosuite.ALL_ENVIRONMENTS), "task", default="PnPCounterToCab"
    )
    env = EnvUtils.create_env(
        env_type=EnvType.ROBOSUITE_TYPE,
        env_name=task,
        render=True,
        robots=args.robot,
    )
    device_cls = Keyboard if args.device == "keyboard" else SpaceMouse
    device = device_cls(
        env=env.env,
        pos_sensitivity=args.pos_sensitivity,
        rot_sensitivity=args.rot_sensitivity,
    )

    episode = 0
    while args.episodes is None or episode < args.episodes:
        states, actions, ep_meta, discarded = collect_trajectory(
            env, device, max_fr=args.max_fr,
            action_assembler=default_action_assembler,
        )
        episode += 1
        outcome = "reset" if discarded else "success"
        print(f"episode {episode}: {len(actions)} steps ({outcome})")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default=None)
    parser.add_argument("--robot", type=str, default="PandaMobile")
    parser.add_argument("--device", choices=["keyboard", "spacemouse"],
                        default="keyboard")
    parser.add_argument("--pos_sensitivity", type=float, default=4.0)
    parser.add_argument("--rot_sensitivity", type=float, default=4.0)
    parser.add_argument("--max_fr", type=int, default=30)
    parser.add_argument("--episodes", type=int, default=None,
                        help="stop after N episodes (default: loop forever)")
    main(parser.parse_args())

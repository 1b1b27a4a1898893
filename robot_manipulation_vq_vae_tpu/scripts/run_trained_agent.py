"""Run a trained checkpoint in its environment (reference
``robomimic/scripts/run_trained_agent.py``): load policy + env from the
self-describing checkpoint, roll out N episodes, optionally record video or
write an hdf5 of the collected trajectories."""

import argparse

from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils


def main(args):
    policy, ckpt_dict = FileUtils.policy_from_checkpoint(ckpt_path=args.agent)
    env, _ = FileUtils.env_from_checkpoint(
        ckpt_dict=ckpt_dict,
        env_name=args.env,
        render=args.render,
        render_offscreen=args.video_path is not None,
    )
    import json

    config, _ = FileUtils.config_from_checkpoint(ckpt_dict=ckpt_dict)
    env = EnvUtils.wrap_env_from_config(env, config=config)

    logs, _ = TrainUtils.rollout_with_stats(
        policy=policy,
        envs={env.name: env},
        horizon=args.horizon,
        num_episodes=args.n_rollouts,
        render=args.render,
        video_path=args.video_path,
        video_skip=args.video_skip,
        terminate_on_success=True,
        verbose=True,
    )
    print(json.dumps(logs, indent=4, default=float))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--agent", type=str, required=True)
    parser.add_argument("--env", type=str, default=None)
    parser.add_argument("--n_rollouts", type=int, default=27)
    parser.add_argument("--horizon", type=int, default=400)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--video_path", type=str, default=None)
    parser.add_argument("--video_skip", type=int, default=5)
    main(parser.parse_args())

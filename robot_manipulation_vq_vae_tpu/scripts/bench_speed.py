"""Environment throughput benchmark (reference
``robocasa/scripts/bench_speed.py:20-190``): env fps + reset time over N
episodes of random actions. Requires the host sim stack."""

import argparse
import time

import numpy as np


def main(args):
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType

    env = EnvUtils.create_env(
        env_type=EnvType.ROBOSUITE_TYPE,
        env_name=args.env,
        render=False,
        render_offscreen=args.render,
        use_image_obs=args.render,
        robots=args.robots,
    )
    fps_list, reset_times = [], []
    for ep in range(args.episodes):
        t0 = time.time()
        env.reset()
        reset_times.append(time.time() - t0)
        t0 = time.time()
        for _ in range(args.steps):
            ac = np.random.uniform(-1, 1, env.action_dimension)
            env.step(ac)
        fps_list.append(args.steps / (time.time() - t0))
        print(f"episode {ep}: fps={fps_list[-1]:.1f} reset={reset_times[-1]:.2f}s")
    print(f"fps: {np.mean(fps_list):.2f}")
    print(f"reset time: {np.mean(reset_times):.2f}s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="PnPCounterToCab")
    parser.add_argument("--robots", type=str, default="PandaMobile")
    parser.add_argument("--episodes", type=int, default=10)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--render", action="store_true")
    main(parser.parse_args())

"""Environment throughput benchmark (reference
``robocasa/scripts/bench_speed.py:20-190``): reset time + env fps over N
episodes of random actions, single env or a batched ``SubprocVectorEnv``
pool (``--num_envs``). The sim stack (robosuite/robocasa) must be on the
host; tests drive the harness with fake envs via ``env_factory``.
"""

import argparse
import time

import numpy as np


def run_rollout(env, num_steps=100, batched=False, rng=None):
    """One benchmark episode: returns (reset_time_sec, steps_per_sec)
    (reference bench_speed.py:20-73)."""
    rng = rng or np.random
    t0 = time.time()
    env.reset()
    reset_time = time.time() - t0

    if batched:
        ac_shape = (len(env), env.get_env_attr("action_dimension")[0])
    else:
        ac_shape = (env.action_dimension,)

    t0 = time.time()
    for _ in range(num_steps):
        env.step(rng.normal(size=ac_shape))
    return reset_time, num_steps / (time.time() - t0)


def default_env_factory(args):
    from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils

    return EnvUtils.create_env(
        env_type=EnvType.ROBOSUITE_TYPE,
        env_name=args.env,
        render=False,
        render_offscreen=not args.no_render,
        use_image_obs=not args.no_render,
        camera_names=["robot0_agentview_left", "robot0_agentview_right",
                      "robot0_eye_in_hand"],
        camera_height=84,
        camera_width=84,
        robots=args.robots,
    )


def bench(args, env_factory=default_env_factory):
    """Returns (mean_reset_time, mean_fps); fps counts env-steps across the
    whole pool when batched."""
    batched = args.num_envs > 1
    if batched:
        from robot_manipulation_vq_vae_tpu.envs.vector_env import (
            SubprocVectorEnv,
        )

        env = SubprocVectorEnv(
            [lambda: env_factory(args) for _ in range(args.num_envs)]
        )
    else:
        env = env_factory(args)

    reset_times, fps_list = [], []
    try:
        for ep in range(args.episodes):
            reset_time, steps_per_sec = run_rollout(
                env, num_steps=args.steps, batched=batched
            )
            if batched:
                steps_per_sec *= args.num_envs  # pool-wide env steps
            print(f"ep #{ep + 1}")
            print(f"   {reset_time:.2f}s reset time")
            print(f"   {steps_per_sec:.2f} fps")
            reset_times.append(reset_time)
            fps_list.append(steps_per_sec)
    finally:
        if batched:
            env.close()
    mean_reset, mean_fps = float(np.mean(reset_times)), float(np.mean(fps_list))
    print(f"reset time: {mean_reset:.2f}s")
    print(f"fps: {mean_fps:.2f}")
    return mean_reset, mean_fps


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", type=str, default="PnPCounterToCab")
    parser.add_argument("--robots", type=str, default="PandaMobile")
    parser.add_argument("--num_envs", type=int, default=1,
                        help=">1 benchmarks a SubprocVectorEnv pool")
    parser.add_argument("--episodes", type=int, default=10)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--no_render", action="store_true",
                        help="disable offscreen rendering / image obs")
    return parser


if __name__ == "__main__":
    bench(build_parser().parse_args())

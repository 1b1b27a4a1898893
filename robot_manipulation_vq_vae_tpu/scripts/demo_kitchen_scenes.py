"""Interactively browse procedurally-generated kitchen scenes (reference
``robocasa/demos/demo_kitchen_scenes.py``): pick a task / layout / style,
spawn the env, and roll random or teleop actions.

Host-side, sim-bound (requires robosuite + robocasa on the machine)."""

import argparse

import numpy as np


def choose_option(options, option_name, default=None):
    """Print numbered options and read a selection (reference :16-56)."""
    options = list(options)
    if default is None:
        default = options[0]
    print(f"{option_name.capitalize()}s:")
    for i, v in enumerate(options):
        print(f"[{i}] {v}")
    try:
        s = input(
            f"Choose 0 to {len(options) - 1} "
            f"(any other key for default {default}): "
        )
        return options[min(max(int(s), 0), len(options) - 1)]
    except (ValueError, EOFError):
        return default


def main(args):
    import robocasa  # noqa: F401  (host sim dependency)
    import robosuite
    from robocasa.models.scenes.scene_registry import LayoutType, StyleType

    tasks = sorted(robosuite.ALL_ENVIRONMENTS)
    task = args.task or choose_option(tasks, "task", default="PnPCounterToCab")
    layout = args.layout if args.layout is not None else choose_option(
        [l.name for l in LayoutType], "layout"
    )
    style = args.style if args.style is not None else choose_option(
        [s.name for s in StyleType], "style"
    )

    env = robosuite.make(
        task,
        robots=args.robot,
        layout_ids=[LayoutType[layout]] if isinstance(layout, str) else layout,
        style_ids=[StyleType[style]] if isinstance(style, str) else style,
        has_renderer=args.render,
        has_offscreen_renderer=not args.render,
        use_camera_obs=False,
        ignore_done=True,
    )
    env.reset()
    print("episode meta:", env.get_ep_meta() if hasattr(env, "get_ep_meta")
          else "n/a")
    low, high = env.action_spec
    for _ in range(args.steps):
        env.step(np.random.uniform(low, high))
        if args.render:
            env.render()
    env.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default=None)
    parser.add_argument("--layout", type=str, default=None)
    parser.add_argument("--style", type=str, default=None)
    parser.add_argument("--robot", type=str, default="PandaMobile")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--render", action="store_true")
    main(parser.parse_args())

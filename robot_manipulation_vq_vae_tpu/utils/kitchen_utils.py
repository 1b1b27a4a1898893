"""RoboCasa kitchen-side helper surface: camera constants, controller-config
migration, env factories, and the random-rollout eval loop.

Ports the sim-adjacent parts of the reference's ``robocasa/utils/`` that a
user drives directly (reference files cited per function):

- ``robocasa/utils/camera_utils.py:1-117`` — per-layout free-camera tables
  and per-robot camera rigs (pure constants + merge logic).
- ``robocasa/utils/config_utils.py:8-63`` — robosuite <=1.4.1 controller
  config detection/refactor (pure dict logic; robosuite lookups
  injectable so the logic tests simulation-free).
- ``robocasa/utils/env_utils.py:16-67`` + ``eval_utils.py:16-60`` — env
  factories (sim-gated: they call ``robosuite.make`` which is not
  installable in this image, but kwargs assembly is pure and tested).
- ``robocasa/utils/env_utils.py:70-101`` / ``eval_utils.py:62-93`` —
  ``run_random_rollouts``: random-action rollouts counting successes,
  optional video; works against any env exposing the small protocol the
  reference relies on (reset/step/action_spec/_check_success).

The scene-generation internals (``texture_swap.py``,
``placement_samplers.py``, ``object_utils.py``,
``postprocess_xml_utils.py``) stay with the kitchen asset layer —
see COMPONENTS.md for the exclusion rationale.
"""

import copy

import numpy as np

from robot_manipulation_vq_vae_tpu.utils.script_utils import deep_update

# ---------------------------------------------------------------------------
# camera constants (reference camera_utils.py:7-45)

LAYOUT_CAMS = {
    0: dict(
        lookat=[2.26593463, -1.00037131, 1.38769295],
        distance=3.0505089839567323,
        azimuth=90.71563812375285,
        elevation=-12.63948837207208,
    ),
    1: dict(
        lookat=[2.66147999, -1.00162429, 1.2425155],
        distance=3.7958766287746255,
        azimuth=89.75784013699234,
        elevation=-15.177406642875091,
    ),
    2: dict(
        lookat=[3.02344359, -1.48874618, 1.2412914],
        distance=3.6684844368165512,
        azimuth=51.67880851867874,
        elevation=-13.302619131542388,
    ),
    4: dict(
        lookat=[1.6, -1.0, 1.0],
        distance=5,
        azimuth=89.70301806083651,
        elevation=-18.02177994296577,
    ),
}

DEFAULT_LAYOUT_CAM = {
    "lookat": [2.25, -1, 1.05312667],
    "distance": 5,
    "azimuth": 89.70301806083651,
    "elevation": -18.02177994296577,
}


def get_layout_cam(layout_id):
    """Free-camera preset for a kitchen layout, falling back to the default
    (the reference indexes LAYOUT_CAMS directly and keeps a default dict)."""
    return copy.deepcopy(LAYOUT_CAMS.get(layout_id, DEFAULT_LAYOUT_CAM))


# per-robot camera rigs (reference camera_utils.py:47-96); robot-specific
# entries deep-merge over DEFAULT
CAM_CONFIGS = dict(
    DEFAULT=dict(
        robot0_agentview_center=dict(
            pos=[-0.6, 0.0, 1.15],
            quat=[
                0.636945903301239,
                0.3325185477733612,
                -0.3199238181114197,
                -0.6175596117973328,
            ],
            parent_body="mobilebase0_support",
        ),
        robot0_agentview_left=dict(
            pos=[-0.5, 0.35, 1.05],
            quat=[0.55623853, 0.29935253, -0.37678665, -0.6775092],
            camera_attribs=dict(fovy="60"),
            parent_body="mobilebase0_support",
        ),
        robot0_agentview_right=dict(
            pos=[-0.5, -0.35, 1.05],
            quat=[
                0.6775091886520386,
                0.3767866790294647,
                -0.2993525564670563,
                -0.55623859167099,
            ],
            camera_attribs=dict(fovy="60"),
            parent_body="mobilebase0_support",
        ),
        robot0_frontview=dict(
            pos=[-0.50, 0, 0.95],
            quat=[
                0.6088936924934387,
                0.3814677894115448,
                -0.3673907518386841,
                -0.5905545353889465,
            ],
            camera_attribs=dict(fovy="60"),
            parent_body="mobilebase0_support",
        ),
        robot0_eye_in_hand=dict(
            pos=[0.05, 0, 0],
            quat=[0, 0.707107, 0.707107, 0],
            parent_body="robot0_right_hand",
        ),
    ),
    PandaMobile=dict(),
    GR1FixedLowerBody=dict(),
)


def get_robot_cam_configs(robot):
    """Camera rig for @robot: the DEFAULT rig deep-merged with any
    robot-specific overrides (reference camera_utils.py:111-117)."""
    default_configs = copy.deepcopy(CAM_CONFIGS["DEFAULT"])
    robot_specific = copy.deepcopy(CAM_CONFIGS.get(robot, {}))
    return deep_update(default_configs, robot_specific)


# ---------------------------------------------------------------------------
# controller-config migration (reference config_utils.py:8-63)

_OLD_CONTROLLER_TYPES = (
    "JOINT_VELOCITY",
    "JOINT_TORQUE",
    "JOINT_POSITION",
    "OSC_POSITION",
    "OSC_POSE",
    "IK_POSE",
)


def is_stale_controller_config(config):
    """True when @config is in the robosuite <=1.4.1 flat format (a bare
    old-style ``type`` without the full composite section pair) — format
    check only, not validity (reference config_utils.py:8-30; note the
    reference ORs the two key-absence checks, so a config missing EITHER
    composite section is probed by type)."""
    if (
        "body_parts" not in config
        or "body_parts_controller_configs" not in config
    ) and "type" in config:
        return config["type"] in _OLD_CONTROLLER_TYPES
    return False


def refactor_composite_controller_config(
    controller_config, robot_type, arms,
    default_config_loader=None, robot_has_default=None,
):
    """Upgrade a robosuite <=1.4.1 controller config to the >=1.5
    composite format: per-robot default config (when one exists) with each
    arm overridden by the old flat config, gripper defaulting to GRIP
    (reference config_utils.py:33-63).

    The two robosuite lookups are injectable so the migration logic runs
    (and tests) without a robosuite install:
    - @default_config_loader(robot_name) -> composite config dict
    - @robot_has_default(robot_name) -> bool
    When left None, robosuite is imported (sim-gated path).
    """
    if not is_stale_controller_config(controller_config):
        return controller_config

    name = robot_type.lower()
    if default_config_loader is None or robot_has_default is None:
        import os
        import pathlib

        import robosuite
        from robosuite.controllers import load_composite_controller_config

        config_dir = (
            pathlib.Path(robosuite.__file__).parent
            / "controllers/config/robots/"
        )
        configs = os.listdir(config_dir)
        robot_has_default = lambda n: f"default_{n}.json" in configs  # noqa: E731
        default_config_loader = (
            lambda n: load_composite_controller_config(robot=n)  # noqa: E731
        )

    if robot_has_default(name):
        new_config = default_config_loader(name)
    else:
        new_config = {"type": "BASIC", "body_parts": {}}

    for arm in arms:
        arm_config = copy.deepcopy(controller_config)
        if "gripper" not in arm_config:
            arm_config["gripper"] = {"type": "GRIP"}
        new_config["body_parts"][arm] = arm_config
    return new_config


# ---------------------------------------------------------------------------
# env factories (reference env_utils.py:16-67, eval_utils.py:16-60)

_EVAL_CAMERAS = [
    "robot0_agentview_left",
    "robot0_agentview_right",
    "robot0_eye_in_hand",
]


def make_env_kwargs(
    env_name, robots, controller_configs, camera_names,
    camera_widths=128, camera_heights=128, seed=None,
    render_onscreen=False, obj_instance_split=None,
    generative_textures=None, randomize_cameras=False,
    layout_and_style_ids=None, layout_ids=None, style_ids=None,
):
    """The exact robosuite.make kwargs the reference assembles
    (env_utils.py:41-64) — pure, so the surface is testable sim-free."""
    return dict(
        env_name=env_name,
        robots=robots,
        controller_configs=controller_configs,
        camera_names=camera_names,
        camera_widths=camera_widths,
        camera_heights=camera_heights,
        has_renderer=render_onscreen,
        has_offscreen_renderer=(not render_onscreen),
        ignore_done=True,
        use_object_obs=True,
        use_camera_obs=(not render_onscreen),
        camera_depths=False,
        seed=seed,
        obj_instance_split=obj_instance_split,
        generative_textures=generative_textures,
        randomize_cameras=randomize_cameras,
        layout_and_style_ids=layout_and_style_ids,
        layout_ids=layout_ids,
        style_ids=style_ids,
        translucent_robot=False,
    )


def create_env(env_name, robots="PandaOmron", camera_names=None,
               camera_widths=128, camera_heights=128, seed=None,
               render_onscreen=False, **kitchen_kwargs):
    """Build a kitchen env via robosuite.make (reference env_utils.py:16-67).
    Sim-gated: requires robosuite (not installable in this image)."""
    import robosuite
    from robosuite.controllers import load_composite_controller_config

    controller_config = load_composite_controller_config(
        controller=None,
        robot=robots if isinstance(robots, str) else robots[0],
    )
    return robosuite.make(**make_env_kwargs(
        env_name=env_name, robots=robots,
        controller_configs=controller_config,
        camera_names=camera_names or list(_EVAL_CAMERAS),
        camera_widths=camera_widths, camera_heights=camera_heights,
        seed=seed, render_onscreen=render_onscreen, **kitchen_kwargs,
    ))


def create_eval_env(
    env_name, robots="PandaMobile", controllers="OSC_POSE",
    camera_names=None, camera_widths=128, camera_heights=128, seed=None,
    obj_instance_split="B", generative_textures=None,
    randomize_cameras=False,
    layout_and_style_ids=((1, 1), (2, 2), (4, 4), (6, 9), (7, 10)),
):
    """Eval-env factory with the reference's fixed layout/style matrix
    (reference eval_utils.py:16-60). Sim-gated: requires robosuite."""
    import robosuite
    from robosuite import load_controller_config

    controller_configs = load_controller_config(
        default_controller=controllers
    )
    return robosuite.make(**make_env_kwargs(
        env_name=env_name, robots=robots,
        controller_configs=controller_configs,
        camera_names=camera_names or list(_EVAL_CAMERAS),
        camera_widths=camera_widths, camera_heights=camera_heights,
        seed=seed, obj_instance_split=obj_instance_split,
        generative_textures=generative_textures,
        randomize_cameras=randomize_cameras,
        layout_and_style_ids=layout_and_style_ids,
    ))


# ---------------------------------------------------------------------------
# random-rollout eval loop (reference env_utils.py:70-101)


def run_random_rollouts(env, num_rollouts, num_steps, video_path=None,
                        rng=None, video_writer_factory=None,
                        render_camera="robot0_agentview_center"):
    """Roll @env with uniform-random actions, counting rollouts that reach
    ``env._check_success()`` (the rollout breaks on first success, matching
    the reference), optionally recording ``env.sim.render`` frames to
    @video_path (reference env_utils.py:70-101).

    @rng and @video_writer_factory are injectable (np.random / imageio by
    default) so the loop tests against a fake env without media deps.
    """
    if rng is None:
        rng = np.random
    video_writer = None
    if video_path is not None:
        if video_writer_factory is None:
            import imageio

            video_writer_factory = (
                lambda p: imageio.get_writer(p, fps=20)  # noqa: E731
            )
        video_writer = video_writer_factory(video_path)

    low, high = env.action_spec
    num_success_rollouts = 0
    for _ in range(num_rollouts):
        env.reset()
        for _ in range(num_steps):
            action = rng.uniform(low=low, high=high)
            env.step(action)
            if video_writer is not None:
                frame = env.sim.render(
                    height=512, width=768, camera_name=render_camera
                )[::-1]
                video_writer.append_data(frame)
            if env._check_success():
                num_success_rollouts += 1
                break

    if video_writer is not None:
        video_writer.close()
        print(f"Saved video of rollouts to {video_path}")

    return {"num_success_rollouts": num_success_rollouts}

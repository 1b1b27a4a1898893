"""kitchen_utils — the portable robocasa/utils surface (reference
camera_utils.py / config_utils.py / env_utils.py / eval_utils.py), tested
simulation-free via the module's injectable seams."""

import numpy as np

from robot_manipulation_vq_vae_tpu.utils.kitchen_utils import (
    CAM_CONFIGS,
    DEFAULT_LAYOUT_CAM,
    LAYOUT_CAMS,
    create_eval_env,
    get_layout_cam,
    get_robot_cam_configs,
    is_stale_controller_config,
    make_env_kwargs,
    refactor_composite_controller_config,
    run_random_rollouts,
)


def test_layout_cam_lookup_and_default():
    assert get_layout_cam(1)["distance"] == LAYOUT_CAMS[1]["distance"]
    # layout 3 is commented out in the reference table -> default
    assert get_layout_cam(3) == DEFAULT_LAYOUT_CAM
    # lookups return copies, not aliases into the table
    cam = get_layout_cam(0)
    cam["lookat"][0] = -999.0
    assert LAYOUT_CAMS[0]["lookat"][0] != -999.0


def test_robot_cam_configs_merge():
    rig = get_robot_cam_configs("PandaMobile")
    # robot with empty overrides == full DEFAULT rig (5 cameras)
    assert set(rig) == set(CAM_CONFIGS["DEFAULT"])
    assert rig["robot0_eye_in_hand"]["parent_body"] == "robot0_right_hand"
    # unknown robot also falls back to DEFAULT
    assert set(get_robot_cam_configs("NotARobot")) == set(
        CAM_CONFIGS["DEFAULT"]
    )


def test_stale_controller_config_detection():
    # old flat format (robosuite <= 1.4.1)
    assert is_stale_controller_config({"type": "OSC_POSE"})
    assert is_stale_controller_config(
        {"type": "JOINT_POSITION", "kp": 150}
    )
    # new composite format
    assert not is_stale_controller_config(
        {
            "type": "BASIC",
            "body_parts": {},
            "body_parts_controller_configs": {},
        }
    )
    # unknown type / no type at all
    assert not is_stale_controller_config({"type": "WHOLE_BODY_IK"})
    assert not is_stale_controller_config({"kp": 150})


def test_refactor_composite_controller_config():
    old = {"type": "OSC_POSE", "kp": 150}

    # robot WITHOUT a default composite config -> BASIC skeleton
    out = refactor_composite_controller_config(
        old, "PandaOmron", arms=["right"],
        default_config_loader=lambda n: {"should": "not be called"},
        robot_has_default=lambda n: False,
    )
    assert out["type"] == "BASIC"
    assert out["body_parts"]["right"]["type"] == "OSC_POSE"
    assert out["body_parts"]["right"]["kp"] == 150
    # gripper defaulted, original dict not mutated
    assert out["body_parts"]["right"]["gripper"] == {"type": "GRIP"}
    assert "gripper" not in old

    # robot WITH a default composite config -> arms overridden onto it
    default = {"type": "BASIC", "body_parts": {"head": {"type": "PAN"}}}
    out = refactor_composite_controller_config(
        old, "GR1", arms=["right", "left"],
        default_config_loader=lambda n: dict(default, body_parts=dict(
            default["body_parts"]
        )),
        robot_has_default=lambda n: n == "gr1",  # lowercased robot name
    )
    assert out["body_parts"]["head"] == {"type": "PAN"}
    assert set(out["body_parts"]) == {"head", "right", "left"}

    # already-composite config passes through untouched
    comp = {
        "type": "BASIC",
        "body_parts": {},
        "body_parts_controller_configs": {},
    }
    assert refactor_composite_controller_config(
        comp, "PandaOmron", arms=["right"],
        default_config_loader=lambda n: {},
        robot_has_default=lambda n: True,
    ) is comp


def test_make_env_kwargs_reference_surface():
    kw = make_env_kwargs(
        "PnPCounterToCab", robots="PandaMobile",
        controller_configs={"type": "BASIC"},
        camera_names=["robot0_eye_in_hand"], seed=3,
    )
    # the exact robosuite.make surface the reference assembles
    # (env_utils.py:41-64)
    assert set(kw) == {
        "env_name", "robots", "controller_configs", "camera_names",
        "camera_widths", "camera_heights", "has_renderer",
        "has_offscreen_renderer", "ignore_done", "use_object_obs",
        "use_camera_obs", "camera_depths", "seed", "obj_instance_split",
        "generative_textures", "randomize_cameras",
        "layout_and_style_ids", "layout_ids", "style_ids",
        "translucent_robot",
    }
    assert kw["ignore_done"] is True
    assert kw["camera_depths"] is False
    assert kw["translucent_robot"] is False
    # offscreen rendering flips with render_onscreen
    kw_on = make_env_kwargs(
        "PnPCounterToCab", robots="PandaMobile",
        controller_configs={}, camera_names=[], render_onscreen=True,
    )
    assert kw_on["has_renderer"] is True
    assert kw_on["has_offscreen_renderer"] is False
    assert kw_on["use_camera_obs"] is False


def test_create_eval_env_is_sim_gated():
    # robosuite is not installed in this image; the factory must fail at
    # the import boundary, not before (kwargs assembly is the tested part)
    try:
        create_eval_env("PnPCounterToCab")
    except ImportError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected ImportError without robosuite")


class _FakeRolloutEnv:
    """Minimal surface run_random_rollouts touches: action_spec, reset,
    step, _check_success, and sim.render for the video path."""

    def __init__(self, success_on_step=None):
        self.success_on_step = success_on_step
        self.steps = 0
        self.resets = 0

        class _Sim:
            @staticmethod
            def render(height, width, camera_name):
                return np.zeros((height, width, 3), np.uint8)

        self.sim = _Sim()

    @property
    def action_spec(self):
        return -np.ones(3, np.float32), np.ones(3, np.float32)

    def reset(self):
        self.resets += 1
        self.steps = 0
        return {}

    def step(self, action):
        assert action.shape == (3,)
        assert np.all(action >= -1.0) and np.all(action <= 1.0)
        self.steps += 1
        return {}, 0.0, False, {}

    def _check_success(self):
        return (
            self.success_on_step is not None
            and self.steps >= self.success_on_step
        )


class _FakeWriter:
    def __init__(self):
        self.frames = 0
        self.closed = False

    def append_data(self, frame):
        self.frames += 1

    def close(self):
        self.closed = True


def test_run_random_rollouts_counts_success_and_breaks():
    env = _FakeRolloutEnv(success_on_step=4)
    info = run_random_rollouts(env, num_rollouts=3, num_steps=10)
    assert info == {"num_success_rollouts": 3}
    assert env.resets == 3
    assert env.steps == 4  # broke at first success, not num_steps

    env = _FakeRolloutEnv(success_on_step=None)
    info = run_random_rollouts(env, num_rollouts=2, num_steps=5)
    assert info == {"num_success_rollouts": 0}
    assert env.steps == 5


def test_run_random_rollouts_video_path():
    env = _FakeRolloutEnv(success_on_step=None)
    writer = _FakeWriter()
    run_random_rollouts(
        env, num_rollouts=1, num_steps=3, video_path="/tmp/unused.mp4",
        video_writer_factory=lambda p: writer,
    )
    assert writer.frames == 3
    assert writer.closed

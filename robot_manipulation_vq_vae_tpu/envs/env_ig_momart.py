"""iGibson MOMART environment wrapper (reference
``robomimic/envs/env_ig_momart.py:29-395``).

Wraps the iGibson-based environments used by the MOMART datasets behind the
EnvBase protocol. Like the other sim wrappers, the simulator (iGibson /
pybullet) stays a host-CPU dependency and is imported lazily, so this module
imports cleanly on machines without the sim stack and datasets with
``env_type == EnvType.IG_MOMART_TYPE`` metadata reach the factory instead of
failing at the import boundary.

Observation extraction (reference ``get_observation`` :209-272) fuses the
raw iGibson sensor dict into the MOMART observation layout:

* image-like keys are routed by substring — ``rgb`` (passthrough),
  ``depth`` (clip to [0, 1], add channel dim), ``seg`` (add channel dim) —
  each resized to the configured obs resolution and, when
  ``postprocess_visual_obs``, run through the modality processor;
* ``scan`` keys are transposed to (beams, sweeps);
* ``proprio`` = [head_joint_pos, grasped, eef_pos, eef_quat];
* ``proprio_nav`` = [|base_lin_vel_xy|, base_ang_vel_z];
* ``object`` = task_obs["object-state"];
* ``gt_nav`` = [base_pos_xy, sin(yaw), cos(yaw)].
"""

import json
from copy import deepcopy

import numpy as np

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvBase, EnvType
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils


def _require_gibson():
    try:
        import gibson2  # noqa: F401
        from gibson2.envs.semantic_organize_and_fetch import (
            SemanticOrganizeAndFetch,
        )
        import gibson2.external.pybullet_tools.utils as PBU
    except ImportError as e:
        raise ImportError(
            "EnvIGMomart requires the iGibson (gibson2) package; install it "
            "on the rollout host to use MOMART datasets."
        ) from e
    # env-name -> class registry (reference ENV_MAPPING :24-26); iGibson has
    # no robosuite-style global registry, so the supported tasks are listed
    # explicitly.
    return {"SemanticOrganizeAndFetch": SemanticOrganizeAndFetch}, PBU


def _resize_frame(frame, width, height):
    """Resize an HWC frame to (height, width) with cv2 bicubic (the
    reference's interpolation, :203-207); cv2 is only needed when the
    source and target resolutions differ."""
    if frame.shape[0] == height and frame.shape[1] == width:
        return frame
    import cv2

    return cv2.resize(frame, dsize=(width, height),
                      interpolation=cv2.INTER_CUBIC)


class EnvIGMomart(EnvBase):
    """EnvBase wrapper over iGibson MOMART tasks (reference
    ``EnvGibsonMOMART``, env_ig_momart.py:29)."""

    def __init__(self, env_name, ig_config, postprocess_visual_obs=True,
                 render=False, render_offscreen=False, use_image_obs=False,
                 use_depth_obs=False, image_height=None, image_width=None,
                 physics_timestep=1.0 / 240.0, action_timestep=1.0 / 20.0,
                 **kwargs):
        env_mapping, self._pbu = _require_gibson()
        self._env_name = env_name
        self.ig_config = deepcopy(ig_config)
        self.postprocess_visual_obs = postprocess_visual_obs
        self._init_kwargs = dict(kwargs)

        # iGibson renders through its own viewer; onscreen rendering selects
        # the interactive GUI, everything else runs headless (reference :82-90
        # — iG always instantiates a renderer, so render_offscreen is moot)
        self.render_mode = "iggui" if render else "headless"
        self.render_onscreen = bool(render)

        # rgb must always be among the sensor outputs (reference :86)
        self.ig_config["output"] = sorted(
            set(self.ig_config.get("output", [])) | {"rgb"}
        )

        # extra kwargs overwrite existing ig-config entries only (:93-95)
        for k, v in kwargs.items():
            if k not in self.ig_config:
                raise ValueError(f"unknown ig configuration key {k!r}")
            self.ig_config[k] = v

        self.obs_img_height = (
            image_height if image_height is not None
            else self.ig_config.get("obs_image_height", 120)
        )
        self.obs_img_width = (
            image_width if image_width is not None
            else self.ig_config.get("obs_image_width", 120)
        )

        env_class = env_mapping.get(env_name)
        if env_class is None:
            raise ValueError(
                f"no iGibson MOMART environment named {env_name!r}; "
                f"available: {sorted(env_mapping)}"
            )

        # EGL device probe for offscreen rendering (reference :110-114);
        # fall back to device 0 when egl_probe is unavailable
        device_idx = 0
        try:
            import egl_probe

            valid = egl_probe.get_available_devices()
            if valid:
                device_idx = valid[0]
        except ImportError:
            pass

        self.env = env_class(
            config_file=deepcopy(self.ig_config),
            mode=self.render_mode,
            physics_timestep=physics_timestep,
            action_timestep=action_timestep,
            device_idx=device_idx,
        )

        # viewer constraint markers must not be captured in saved states
        # (reference :126-129)
        self.exclude_body_ids = []
        viewer = getattr(self.env.simulator, "viewer", None)
        if viewer is not None:
            self.exclude_body_ids.append(viewer.constraint_marker.body_id)
            self.exclude_body_ids.append(viewer.constraint_marker2.body_id)

    def step(self, action):
        obs, r, done, info = self.env.step(action)
        return self.get_observation(obs), r, self.is_done(), info

    def reset(self):
        return self.get_observation(self.env.reset())

    def reset_to(self, state):
        """Reset to a flattened pybullet world state (and optional goal);
        reference :153-170."""
        if "states" in state:
            self.env.reset_to(state["states"], exclude=self.exclude_body_ids)
        if "goal" in state:
            self.set_goal(**state["goal"])
        return self.get_observation()

    def render(self, mode="human", camera_name="rgb", height=None,
               width=None):
        if camera_name not in ("rgb", "rgb_wrist"):
            raise ValueError(
                f"only rgb / rgb_wrist cameras supported, got {camera_name!r}"
            )
        if mode == "human":
            if not self.render_onscreen:
                raise RuntimeError("onscreen rendering was not enabled")
            self.env.simulator.sync()
            return None
        if self.env.simulator.renderer is None:
            raise RuntimeError("no renderer enabled for this env")
        frame = self.env.sensors["vision"].get_obs(self.env)[camera_name]
        if height is not None and width is not None:
            frame = _resize_frame(frame, width=width, height=height)
        return frame

    def get_observation(self, di=None):
        if di is None:
            di = self.env.get_state()
        ret = {}
        for k, v in di.items():
            if "rgb" in k:
                frame = _resize_frame(
                    v, self.obs_img_width, self.obs_img_height
                ) if self.postprocess_visual_obs else v
                ret[k] = (
                    ObsUtils.process_obs(frame, obs_key=k)
                    if self.postprocess_visual_obs else frame
                )
            elif "depth" in k:
                # renderer depth can be corrupted outside [0, 1] (:225-226)
                frame = np.clip(v, 0.0, 1.0)
                if self.postprocess_visual_obs:
                    frame = _resize_frame(
                        frame, self.obs_img_width, self.obs_img_height
                    )[..., None]
                    frame = ObsUtils.process_obs(frame, obs_key=k)
                ret[k] = frame
            elif "seg" in k:
                frame = v[..., None]
                if self.postprocess_visual_obs:
                    frame = _resize_frame(
                        frame, self.obs_img_width, self.obs_img_height
                    )
                    frame = ObsUtils.process_obs(frame, obs_key=k)
                ret[k] = frame
            elif "scan" in k:
                ret[k] = np.transpose(np.asarray(v), (1, 0))

        proprio = di["proprio"]
        ret["proprio"] = np.concatenate([
            proprio["head_joint_pos"],
            proprio["grasped"],
            proprio["eef_pos"],
            proprio["eef_quat"],
        ])
        ret["proprio_nav"] = np.array([
            np.linalg.norm(proprio["base_lin_vel"][:2]),
            proprio["base_ang_vel"][2],
        ])
        ret["object"] = np.asarray(di["task_obs"]["object-state"])
        yaw = proprio["base_rpy"][2]
        ret["gt_nav"] = np.concatenate([
            proprio["base_pos"][:2], [np.sin(yaw)], [np.cos(yaw)]
        ])
        return ret

    def sync_task(self):
        """Synchronize iG task internals after a direct state reset
        (reference :274-280)."""
        self.env.task.update_target_object_init_pos()
        self.env.task.update_location_info()

    def set_task_conditions(self, task_conditions):
        """Override task conditions (e.g. target object) for playback
        (reference :282-290)."""
        self.env.set_task_conditions(task_conditions)

    def get_state(self):
        return {
            "states": self._pbu.WorldSaver(
                exclude_body_ids=self.exclude_body_ids
            ).serialize()
        }

    def get_reward(self):
        return self.env.task.get_reward(self.env)[0]

    def get_goal(self):
        raise NotImplementedError  # no iG support (reference :300-303)

    def set_goal(self, **kwargs):
        raise NotImplementedError  # no iG support (reference :305-308)

    def is_done(self):
        return False

    def is_success(self):
        succ = self.env.check_success()
        if isinstance(succ, dict):
            assert "task" in succ
            return succ
        return {"task": bool(succ)}

    @property
    def action_dimension(self):
        return self.env.robots[0].action_dim

    @property
    def name(self):
        return self._env_name

    @property
    def type(self):
        return EnvType.IG_MOMART_TYPE

    def serialize(self):
        return dict(
            env_name=self.name,
            type=self.type,
            ig_config=self.ig_config,
            env_kwargs=deepcopy(self._init_kwargs),
        )

    @classmethod
    def deserialize(cls, info, postprocess_visual_obs=True):
        return cls(
            env_name=info["env_name"],
            ig_config=info["ig_config"],
            postprocess_visual_obs=postprocess_visual_obs,
            **info["env_kwargs"],
        )

    @classmethod
    def create_for_data_processing(cls, env_name, camera_names, camera_height,
                                   camera_width, reward_shaping, **kwargs):
        """Dataset-extraction construction: raw (unprocessed) visual obs at
        the requested resolution (reference :326-360)."""
        has_camera = len(camera_names) > 0
        return cls(
            env_name=env_name,
            render=False,
            render_offscreen=has_camera,
            use_image_obs=has_camera,
            postprocess_visual_obs=False,
            image_height=camera_height,
            image_width=camera_width,
            **kwargs,
        )

    @property
    def rollout_exceptions(self):
        return (RuntimeError,)

    def __repr__(self):
        return (
            self.name + "\n"
            + json.dumps(self._init_kwargs, sort_keys=True, indent=4)
            + "\niGibson Config: \n"
            + json.dumps(self.ig_config, sort_keys=True, indent=4)
        )

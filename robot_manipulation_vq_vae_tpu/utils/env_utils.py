"""Env factory + helpers (reference ``robomimic/utils/env_utils.py``)."""

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType

# custom env-type registry: maps an env type id (int) -> EnvBase subclass.
# The reference's extension story is "add a constant to EnvType and a branch
# to get_env_class"; here external code registers without editing the
# framework (used by tests to run real rollouts sim-free, and by users
# embedding their own simulators).
CUSTOM_ENV_CLASSES = {}


def register_env_class(env_type, env_class):
    """Register an EnvBase subclass for @env_type (an int not colliding with
    EnvType.ROBOSUITE_TYPE/GYM_TYPE)."""
    CUSTOM_ENV_CLASSES[env_type] = env_class
    return env_class


def get_env_class(env_meta=None, env_type=None, env=None):
    env_type = get_env_type(env_meta=env_meta, env_type=env_type, env=env)
    if env_type in CUSTOM_ENV_CLASSES:
        return CUSTOM_ENV_CLASSES[env_type]
    if env_type == EnvType.ROBOSUITE_TYPE:
        from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

        return EnvRobosuite
    if env_type == EnvType.GYM_TYPE:
        from robot_manipulation_vq_vae_tpu.envs.env_gym import EnvGym

        return EnvGym
    if env_type == EnvType.IG_MOMART_TYPE:
        from robot_manipulation_vq_vae_tpu.envs.env_ig_momart import (
            EnvIGMomart,
        )

        return EnvIGMomart
    raise ValueError(f"unknown env type {env_type}")


def get_env_type(env_meta=None, env_type=None, env=None):
    checks = sum(x is not None for x in (env_meta, env_type, env))
    assert checks == 1, "pass exactly one of env_meta / env_type / env"
    if env_meta is not None:
        return env_meta["type"]
    if env is not None:
        return env.type
    return env_type


def is_robosuite_env(env_meta=None, env_type=None, env=None):
    return get_env_type(env_meta=env_meta, env_type=env_type, env=env) == (
        EnvType.ROBOSUITE_TYPE
    )


def create_env(env_type, env_name, render=False, render_offscreen=False,
               use_image_obs=False, use_depth_obs=False, **kwargs):
    env_class = get_env_class(env_type=env_type)
    return env_class(
        env_name=env_name,
        render=render,
        render_offscreen=render_offscreen,
        use_image_obs=use_image_obs,
        use_depth_obs=use_depth_obs,
        **kwargs,
    )


def create_env_from_metadata(env_meta, env_name=None, render=False,
                             render_offscreen=False, use_image_obs=False,
                             use_depth_obs=False):
    """Factory from dataset/checkpoint env metadata
    (reference env_utils.py:186-305)."""
    if env_name is None:
        env_name = env_meta["env_name"]
    env_type = get_env_type(env_meta=env_meta)
    env_kwargs = dict(env_meta.get("env_kwargs", {}))
    env_lang = env_meta.get("env_lang", None)
    if env_lang is not None:
        env_kwargs["env_lang"] = env_lang
    # MOMART metadata stores ig_config at the top level of env_meta
    # (EnvIGMomart.serialize); thread it through so momart datasets reach
    # the constructor via this factory (the reference factory drops it and
    # only works when ig_config is duplicated into env_kwargs)
    if "ig_config" in env_meta and "ig_config" not in env_kwargs:
        env_kwargs["ig_config"] = env_meta["ig_config"]
    return create_env(
        env_type=env_type,
        env_name=env_name,
        render=render,
        render_offscreen=render_offscreen,
        use_image_obs=use_image_obs,
        use_depth_obs=use_depth_obs,
        **env_kwargs,
    )


def wrap_env_from_config(env, config):
    """Apply config-specified wrappers (reference env_utils.py:296-305:
    frame-stack whenever ``train.frame_stack > 1`` - transformer/diffusion
    configs set it to their context/observation horizon)."""
    from robot_manipulation_vq_vae_tpu.envs.wrappers import FrameStackWrapper

    if config.train.frame_stack > 1:
        env = FrameStackWrapper(env, num_frames=config.train.frame_stack)
    return env

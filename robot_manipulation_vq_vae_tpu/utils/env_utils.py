"""Env factory + helpers (reference ``robomimic/utils/env_utils.py``)."""

from robot_manipulation_vq_vae_tpu.envs.env_base import EnvType


def get_env_class(env_meta=None, env_type=None, env=None):
    env_type = get_env_type(env_meta=env_meta, env_type=env_type, env=env)
    if env_type == EnvType.ROBOSUITE_TYPE:
        from robot_manipulation_vq_vae_tpu.envs.env_robosuite import EnvRobosuite

        return EnvRobosuite
    if env_type == EnvType.GYM_TYPE:
        from robot_manipulation_vq_vae_tpu.envs.env_gym import EnvGym

        return EnvGym
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
    """Apply config-specified wrappers (frame stacking for transformer
    policies; reference env_utils.py:260-290)."""
    from robot_manipulation_vq_vae_tpu.envs.wrappers import FrameStackWrapper

    if (
        "transformer" in config.algo
        and config.algo.transformer.get("enabled", False)
    ):
        env = FrameStackWrapper(
            env, num_frames=config.algo.transformer.context_length
        )
    return env

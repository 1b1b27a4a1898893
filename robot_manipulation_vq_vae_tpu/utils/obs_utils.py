"""Observation-modality registry and processing.

Fresh implementation of the reference obs layer
(``robomimic/utils/obs_utils.py:48-1001``): global registries mapping
observation keys -> modalities, modality -> processing, and encoder
core/randomizer class names -> classes, plus normalization helpers.

Deliberate divergence from the reference: processed images are
**channels-last float32 in [0, 1]** (the reference converts HWC->CHW for
torch; TPU convs want NHWC, so we keep HWC throughout - see
``models/base_nets.py`` module docstring).
"""

from copy import deepcopy

import numpy as np

# ---------------------------------------------------------------------------
# global registries
# ---------------------------------------------------------------------------

# obs key (e.g. "robot0_eye_in_hand_image") -> modality name (e.g. "rgb")
OBS_KEYS_TO_MODALITIES = None
# modality name -> Modality class
OBS_MODALITY_CLASSES = {}
# encoder core / randomizer class registries (name -> class)
OBS_ENCODER_CORES = {}
OBS_RANDOMIZERS = {}
# default per-modality encoder kwargs (set from config)
DEFAULT_ENCODER_KWARGS = None

LANG_EMB_KEY = "lang_emb"


def register_obs_key(cls):
    assert cls.name not in OBS_MODALITY_CLASSES, f"duplicate modality {cls.name}"
    OBS_MODALITY_CLASSES[cls.name] = cls
    return cls


def register_encoder_core(cls):
    assert cls.__name__ not in OBS_ENCODER_CORES
    OBS_ENCODER_CORES[cls.__name__] = cls
    return cls


def register_randomizer(cls):
    assert cls.__name__ not in OBS_RANDOMIZERS
    OBS_RANDOMIZERS[cls.__name__] = cls
    return cls


# ---------------------------------------------------------------------------
# initialization from config
# ---------------------------------------------------------------------------

def initialize_obs_modality_mapping_from_dict(modality_mapping):
    """modality_mapping: {modality: [obs keys]}."""
    global OBS_KEYS_TO_MODALITIES
    OBS_KEYS_TO_MODALITIES = {}
    for modality, keys in modality_mapping.items():
        for k in keys:
            OBS_KEYS_TO_MODALITIES[k] = modality


def initialize_obs_utils_with_obs_specs(obs_modality_specs):
    """obs_modality_specs: (list of) dict of dicts
    {group: {modality: [keys]}} (reference obs_utils.py:149-228)."""
    global OBS_KEYS_TO_MODALITIES
    OBS_KEYS_TO_MODALITIES = {}
    if isinstance(obs_modality_specs, dict):
        obs_modality_specs = [obs_modality_specs]
    for spec in obs_modality_specs:
        for group, modalities in spec.items():
            for modality, keys in modalities.items():
                for k in keys:
                    prev = OBS_KEYS_TO_MODALITIES.get(k)
                    assert prev is None or prev == modality, (
                        f"obs key {k} registered with conflicting modalities "
                        f"{prev} vs {modality}"
                    )
                    OBS_KEYS_TO_MODALITIES[k] = modality


def initialize_default_obs_encoder(obs_encoder_config):
    """Store per-modality encoder kwargs from ``config.observation.encoder``."""
    global DEFAULT_ENCODER_KWARGS
    DEFAULT_ENCODER_KWARGS = {}
    for modality, cfg in obs_encoder_config.items():
        DEFAULT_ENCODER_KWARGS[modality] = deepcopy(
            cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
        )


def initialize_obs_utils_with_config(config):
    """Parse a full config (reference obs_utils.py:229-255)."""
    if config.algo_name == "hbc":
        specs = [
            config.observation.planner.modalities.to_dict(),
            config.observation.actor.modalities.to_dict(),
        ]
        enc = config.observation.actor.encoder
    elif config.algo_name == "iris":
        specs = [
            config.observation.value_planner.planner.modalities.to_dict(),
            config.observation.value_planner.value.modalities.to_dict(),
            config.observation.actor.modalities.to_dict(),
        ]
        enc = config.observation.actor.encoder
    else:
        specs = [config.observation.modalities.to_dict()]
        enc = config.observation.encoder
    initialize_obs_utils_with_obs_specs(specs)
    initialize_default_obs_encoder(enc)


def obs_encoder_kwargs_from_config(obs_encoder_config):
    """Flatten the observation.encoder config into plain dicts."""
    return deepcopy(
        obs_encoder_config.to_dict()
        if hasattr(obs_encoder_config, "to_dict")
        else dict(obs_encoder_config)
    )


def key_is_obs_modality(key, obs_modality):
    assert OBS_KEYS_TO_MODALITIES is not None, (
        "must call initialize_obs_utils_with_config first"
    )
    return OBS_KEYS_TO_MODALITIES[key] == obs_modality


# ---------------------------------------------------------------------------
# frame / modality processing (numpy host-side; device side stays fused in jit)
# ---------------------------------------------------------------------------

def process_frame(frame, channel_dim, scale):
    """uint8 [0, scale] HWC -> float32 [0, 1] HWC (channels-LAST, unlike the
    reference's CHW - see module docstring)."""
    assert frame.shape[-1] == channel_dim, (
        f"expected {channel_dim} channels, got {frame.shape}"
    )
    frame = np.asarray(frame, dtype=np.float32) / scale
    return np.clip(frame, 0.0, 1.0)


def unprocess_frame(frame, channel_dim, scale):
    assert frame.shape[-1] == channel_dim
    return frame * scale


class Modality:
    """Base modality: subclasses define process/unprocess (reference
    obs_utils.py:743-1001). Custom processors can be injected at runtime
    via ``set_obs_processor`` / ``set_obs_unprocessor`` (the reference's
    extension API, obs_utils.py:766-800), overriding the class defaults."""

    name = None
    # runtime-injected overrides (None -> use the class default)
    _custom_obs_processor = None
    _custom_obs_unprocessor = None

    @classmethod
    def set_obs_processor(cls, processor=None):
        """Override how raw observations of this modality are processed.
        Pass None to restore the class default."""
        cls._custom_obs_processor = processor

    @classmethod
    def set_obs_unprocessor(cls, unprocessor=None):
        cls._custom_obs_unprocessor = unprocessor

    @classmethod
    def _default_obs_processor(cls, obs):
        return np.asarray(obs, dtype=np.float32)

    @classmethod
    def _default_obs_unprocessor(cls, obs):
        return obs

    @classmethod
    def process_obs(cls, obs):
        if cls._custom_obs_processor is not None:
            return cls._custom_obs_processor(obs)
        return cls._default_obs_processor(obs)

    @classmethod
    def unprocess_obs(cls, obs):
        if cls._custom_obs_unprocessor is not None:
            return cls._custom_obs_unprocessor(obs)
        return cls._default_obs_unprocessor(obs)


@register_obs_key
class ImageModality(Modality):
    name = "rgb"

    @classmethod
    def _default_obs_processor(cls, obs):
        return process_frame(obs, channel_dim=3, scale=255.0)

    @classmethod
    def _default_obs_unprocessor(cls, obs):
        return unprocess_frame(obs, channel_dim=3, scale=255.0)


@register_obs_key
class DepthModality(Modality):
    name = "depth"

    @classmethod
    def _default_obs_processor(cls, obs):
        return process_frame(obs, channel_dim=1, scale=1.0)

    @classmethod
    def _default_obs_unprocessor(cls, obs):
        return unprocess_frame(obs, channel_dim=1, scale=1.0)


@register_obs_key
class ScanModality(Modality):
    name = "scan"


@register_obs_key
class LowDimModality(Modality):
    name = "low_dim"


def process_obs(obs, obs_modality=None, obs_key=None):
    assert (obs_modality is not None) or (obs_key is not None)
    if obs_key is not None:
        obs_modality = OBS_KEYS_TO_MODALITIES[obs_key]
    return OBS_MODALITY_CLASSES[obs_modality].process_obs(obs)


def process_obs_dict(obs_dict):
    return {k: process_obs(obs, obs_key=k) for k, obs in obs_dict.items()}


def unprocess_obs(obs, obs_modality=None, obs_key=None):
    assert (obs_modality is not None) or (obs_key is not None)
    if obs_key is not None:
        obs_modality = OBS_KEYS_TO_MODALITIES[obs_key]
    return OBS_MODALITY_CLASSES[obs_modality].unprocess_obs(obs)


def get_processed_shape(obs_modality, input_shape):
    """Shape after processing: HWC images keep their shape (channels-last)."""
    return list(input_shape)


# ---------------------------------------------------------------------------
# normalization (reference obs_utils.py:464-560)
# ---------------------------------------------------------------------------

def normalize_dict(dict_to_norm, normalization_stats):
    """x -> (x - offset) / scale per key. Stats arrays broadcast from shape
    [1, ...] against values [B, ...]."""
    out = {}
    for k, v in dict_to_norm.items():
        if k in normalization_stats:
            offset = np.asarray(normalization_stats[k]["offset"])[0]
            scale = np.asarray(normalization_stats[k]["scale"])[0]
            out[k] = (v - offset) / scale
        else:
            out[k] = v
    return out


def unnormalize_dict(dict_to_unnorm, normalization_stats):
    out = {}
    for k, v in dict_to_unnorm.items():
        if k in normalization_stats:
            offset = np.asarray(normalization_stats[k]["offset"])[0]
            scale = np.asarray(normalization_stats[k]["scale"])[0]
            out[k] = v * scale + offset
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# cropping (host-side numpy variants; jitted variants live in models/obs_core)
# ---------------------------------------------------------------------------

def center_crop(im, t_h, t_w):
    """Center crop [..., H, W, C] (reference obs_utils.py:360-380)."""
    assert im.shape[-3] >= t_h and im.shape[-2] >= t_w
    ch = int((im.shape[-3] - t_h) / 2)
    cw = int((im.shape[-2] - t_w) / 2)
    return im[..., ch : ch + t_h, cw : cw + t_w, :]

"""
A simple example showing how to construct an ObservationEncoder for
processing multiple input modalities, plus an ObservationDecoder.

Mirrors the reference example (``/root/reference/robomimic/examples/
simple_obs_nets.py``) with one deliberate architectural difference: the
reference builds the encoder imperatively (``register_obs_key`` calls on a
torch module); Flax modules are declarative, so here each key's core and
randomizer are described by a per-modality ``encoder_kwargs`` spec and the
network is materialized at ``init``/``apply`` time. Images are channels-LAST
(H, W, C) throughout - the TPU-native layout.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationDecoder,
    obs_encoder_factory,
)
import robot_manipulation_vq_vae_tpu.utils.obs_utils as ObsUtils


def simple_obs_example():
    # Assume we are processing two camera images (channels-last) and a
    # low-dim proprioception vector.
    camera1_shape = (64, 64, 3)
    camera2_shape = (60, 80, 3)
    proprio_shape = (12,)

    # Tell the registry which modality each observation key belongs to.
    ObsUtils.initialize_obs_modality_mapping_from_dict(
        {"rgb": ["camera1", "camera2"], "low_dim": ["proprio"]}
    )

    # Each modality gets an encoder-core spec. VisualCore is the
    # reconfigurable image backbone (ResNet18 + SpatialSoftmax keypoint
    # pooling here); a CropRandomizer perturbs the image before the core
    # (random crops in training, center crop in eval) - the same classes
    # the reference registers imperatively.
    encoder_kwargs = {
        "rgb": {
            "core_class": "VisualCore",
            "core_kwargs": {
                "backbone_class": "ResNet18Conv",
                "pool_class": "SpatialSoftmax",
                "pool_kwargs": {"num_kp": 32},
                "feature_dimension": 64,
            },
            "obs_randomizer_class": "CropRandomizer",
            "obs_randomizer_kwargs": {
                "crop_height": 56,
                "crop_width": 56,
                "num_crops": 1,
            },
        },
        # low_dim keys pass through flat (no core)
        "low_dim": {},
    }

    obs_shapes = (
        ("camera1", camera1_shape),
        ("camera2", camera2_shape),
        ("proprio", proprio_shape),
    )
    obs_encoder = obs_encoder_factory(
        obs_shapes, feature_activation="relu", encoder_kwargs=encoder_kwargs
    )

    # Pretty-print the flat output dimension the encoder will produce.
    print("obs encoder output dim:", obs_encoder.output_shape())

    # Construct fake inputs (batch of 4) and run the encoder.
    rng = jax.random.PRNGKey(0)
    batch = {
        "camera1": jnp.zeros((4,) + camera1_shape),
        "camera2": jnp.zeros((4,) + camera2_shape),
        "proprio": jnp.zeros((4,) + proprio_shape),
    }
    params = obs_encoder.init(
        {"params": rng, "randomizer": rng}, batch, train=False
    )
    feats = obs_encoder.apply(params, batch, train=False)
    print("encoder feature shape:", feats.shape)

    # An ObservationDecoder reconstructs per-key outputs from the flat
    # feature with one linear head per key.
    decoder = ObservationDecoder(
        decode_shapes=(("action", (7,)),),
    )
    dec_params = decoder.init(rng, feats)
    out = decoder.apply(dec_params, feats)
    print("decoded action shape:", out["action"].shape)
    return feats, out


if __name__ == "__main__":
    simple_obs_example()

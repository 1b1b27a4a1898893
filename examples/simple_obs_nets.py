"""Instructive example: building an ObservationEncoder over mixed
modalities by hand (reference ``robomimic/examples/simple_obs_nets.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationEncoder,
    encoder_output_dim,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils


def main():
    # register which keys belong to which modality
    ObsUtils.initialize_obs_utils_with_obs_specs(
        obs_modality_specs={
            "obs": {"low_dim": ["proprio"], "rgb": ["camera"]},
        }
    )

    obs_shapes = {"camera": (32, 32, 3), "proprio": (9,)}  # NHWC images
    encoder_kwargs = {
        "rgb": {
            "core_class": "VisualCore",
            "core_kwargs": {
                "feature_dimension": 64,
                "backbone_class": "ResNet18Conv",
                "backbone_kwargs": {"pretrained": False},
                "pool_class": "SpatialSoftmax",
                "pool_kwargs": {"num_kp": 16},
            },
            "obs_randomizer_class": None,
            "obs_randomizer_kwargs": {},
        },
        "low_dim": {
            "core_class": None, "core_kwargs": {},
            "obs_randomizer_class": None, "obs_randomizer_kwargs": {},
        },
    }

    enc = ObservationEncoder(
        obs_shapes=tuple(obs_shapes.items()),
        encoder_kwargs=encoder_kwargs,
    )
    rng = np.random.RandomState(0)
    obs = {
        "camera": jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
        "proprio": jnp.asarray(rng.randn(2, 9), jnp.float32),
    }
    variables = enc.init(
        {"params": jax.random.PRNGKey(0)}, obs, train=False
    )
    feat = enc.apply(variables, obs, train=False)
    print("encoder output:", feat.shape,
          "expected dim:", encoder_output_dim(obs_shapes, encoder_kwargs))


if __name__ == "__main__":
    main()

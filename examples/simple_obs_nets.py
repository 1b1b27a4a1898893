"""Build and run the observation encoder stack programmatically (analogue of
the reference ``examples/simple_obs_nets.py``)."""

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
    from robot_manipulation_vq_vae_tpu.models.obs_nets import obs_encoder_factory
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["proprio"], "rgb": ["image"]}}
    )
    obs_shapes = {"proprio": (9,), "image": (32, 32, 3)}
    encoder_kwargs = {
        "low_dim": {"core_class": None, "core_kwargs": {},
                    "obs_randomizer_class": None, "obs_randomizer_kwargs": {}},
        "rgb": {
            "core_class": "VisualCore",
            "core_kwargs": {
                "feature_dimension": 32,
                "backbone_class": "ResNet18Conv",
                "pool_class": "SpatialSoftmax",
                "pool_kwargs": {"num_kp": 16},
            },
            "obs_randomizer_class": "CropRandomizer",
            "obs_randomizer_kwargs": {"crop_height": 28, "crop_width": 28},
        },
    }
    enc = obs_encoder_factory(obs_shapes, encoder_kwargs=encoder_kwargs)
    rng = np.random.RandomState(0)
    obs = {
        "proprio": jnp.asarray(rng.randn(4, 9).astype(np.float32)),
        "image": jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32)),
    }
    variables = enc.init(jax.random.PRNGKey(0), obs)
    feats = enc.apply(variables, obs)
    print("encoded features:", feats.shape, "->", enc.output_shape())


if __name__ == "__main__":
    main()

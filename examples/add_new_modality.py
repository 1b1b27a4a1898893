"""
A simple example showing how to add custom observation modalities, custom
encoder cores, and custom observation randomizers, and how to reference the
custom classes directly from a config.

Mirrors the reference example (``/root/reference/robomimic/examples/
add_new_modality.py``), JAX-native: encoder cores are Flax modules, images
are channels-last (H, W, C), and randomizer noise is drawn from an explicit
PRNG key instead of a global RNG. Unlike the reference (which only prints
the config), this example also runs a real forward pass through the
resulting encoder.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

import robot_manipulation_vq_vae_tpu.utils.obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.config.bc_config import BCConfig
from robot_manipulation_vq_vae_tpu.models.obs_core import Randomizer
from robot_manipulation_vq_vae_tpu.models.obs_nets import obs_encoder_factory
from robot_manipulation_vq_vae_tpu.utils.obs_utils import Modality, ScanModality


# Let's create a new modality interpreted as single-frame grayscale images
# with raw shape (H, W) in range [0, 255].
@ObsUtils.register_obs_key
class CustomImageModality(Modality):
    # the class string name used to reference this modality
    name = "custom_image"

    # A processor maps raw observations into a form suitable for learning,
    # and the unprocessor inverts it.
    @classmethod
    def _default_obs_processor(cls, obs):
        # normalize to [-1, 1]
        return (np.asarray(obs, dtype=np.float32) / 255.0 - 0.5) * 2

    @classmethod
    def _default_obs_unprocessor(cls, obs):
        return (obs / 2 + 0.5) * 255.0


# Pre-existing modalities can be modified as well: say your scan data pads
# the ends with a 0 - override the default processor/unprocessor at runtime.
def custom_scan_processor(obs):
    return obs[1:-1]  # trim the padded ends


def custom_scan_unprocessor(obs):
    return np.concatenate([np.zeros(1), obs, np.zeros(1)])


ScanModality.set_obs_processor(processor=custom_scan_processor)
ScanModality.set_obs_unprocessor(unprocessor=custom_scan_unprocessor)


# A custom encoder core for the new modality: any Flax module with an
# ``input_shape`` field and an ``output_shape`` method, registered by name.
@ObsUtils.register_encoder_core
class CustomImageEncoderCore(nn.Module):
    input_shape: tuple  # inferred automatically at construction time
    # any custom args below, of any json-able type
    hidden_dim: int = 32

    @nn.compact
    def __call__(self, x, train=False):
        b = x.shape[0]
        return nn.Dense(self.hidden_dim)(x.reshape(b, -1))

    def output_shape(self, input_shape=None):
        return [self.hidden_dim]


# A custom randomizer: make @num_rand noisy copies of each image (expanding
# the batch B -> B*N before the core) and average the core's outputs back.
class CustomImageRandomizer(Randomizer):
    def __init__(self, input_shape, num_rand=1, noise_scale=0.01):
        self.input_shape = tuple(input_shape)
        self.num_rand = num_rand
        self.noise_scale = noise_scale

    # only the batch dimension changes in either direction
    def output_shape_in(self, input_shape=None):
        return list(input_shape)

    def output_shape_out(self, input_shape=None):
        return list(input_shape)

    def forward_in(self, x, rng=None, train=False):
        if not train:
            return x
        b = x.shape[0]
        out = jnp.repeat(x[:, None], self.num_rand, axis=1)  # [B, N, ...]
        noise = self.noise_scale * (
            2.0 * jax.random.uniform(rng, out.shape) - 1.0
        )
        return (out + noise).reshape((b * self.num_rand,) + x.shape[1:])

    def forward_out(self, x):
        if x.shape[0] % self.num_rand == 0 and self.num_rand > 1:
            b = x.shape[0] // self.num_rand
            return x.reshape((b, self.num_rand) + x.shape[1:]).mean(axis=1)
        return x

    def __repr__(self):
        return (
            f"CustomImageRandomizer(input_shape={self.input_shape}, "
            f"num_rand={self.num_rand}, noise_scale={self.noise_scale})"
        )


ObsUtils.register_randomizer(CustomImageRandomizer)


if __name__ == "__main__":
    # Now we can directly reference the classes in a config!
    config = BCConfig()
    with config.unlocked():
        enc = config.observation.encoder.custom_image
        enc.core_class = "CustomImageEncoderCore"
        enc.core_kwargs.hidden_dim = 24
        enc.obs_randomizer_class = "CustomImageRandomizer"
        enc.obs_randomizer_kwargs.num_rand = 3
        enc.obs_randomizer_kwargs.noise_scale = 0.05

        # associate observation keys with the new modality
        config.observation.modalities.obs.custom_image = ["my_image1"]

    ObsUtils.initialize_obs_utils_with_config(config)

    # build an encoder over the custom modality and run it
    shape = (8, 8)
    encoder = obs_encoder_factory(
        (("my_image1", shape),),
        encoder_kwargs=ObsUtils.DEFAULT_ENCODER_KWARGS,
    )
    print("encoder output dim:", encoder.output_shape())

    raw = np.random.randint(0, 255, (4,) + shape).astype(np.float32)
    processed = ObsUtils.process_obs(raw, obs_key="my_image1")
    assert processed.min() >= -1.0 and processed.max() <= 1.0

    rng = jax.random.PRNGKey(0)
    variables = encoder.init(
        {"params": rng, "randomizer": rng}, {"my_image1": processed}, train=True
    )
    feats = encoder.apply(
        variables, {"my_image1": processed}, train=True,
        rngs={"randomizer": rng},
    )
    print("encoded feature shape:", feats.shape)

    # the scan processor override is active too
    scan = np.arange(6, dtype=np.float32)
    trimmed = ObsUtils.OBS_MODALITY_CLASSES["scan"].process_obs(scan)
    assert trimmed.shape == (4,)
    roundtrip = ObsUtils.OBS_MODALITY_CLASSES["scan"].unprocess_obs(trimmed)
    assert roundtrip.shape == (6,)
    print("custom scan processor round-trip OK")

from robot_manipulation_vq_vae_tpu.models.tokenizers.lipvq import (
    LipVQVAE,
    LLFQVAE_V4,
    LipschitzDense,
    LFQQuantizer,
)

from robot_manipulation_vq_vae_tpu.models.tokenizers.lipvq import (
    LipVQVAE,
    LLFQVAE_V4,
    LipschitzDense,
    LFQQuantizer,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
    HierarchicalVQVAE,
    compute_vqvae_loss,
    get_codebook_usage,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.bin_action import (
    AdaptiveBinActionEmbedding,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.ln_act import (
    LNActEncoder,
    MambaBlock,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.default_encoder import (
    DefaultActionEncoder,
    SNDense,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.vqvae import (
    VQVAE,
    LFQVAE,
    LSTMVQVAE,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.hq_vae import (
    LFQQuantizerEMA,
    LFQQuantizerEMA_KMeans,
    HierarchicalLFQHVQVAE,
)

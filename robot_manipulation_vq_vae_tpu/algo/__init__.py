from robot_manipulation_vq_vae_tpu.algo.algo import (
    Algo,
    AlgoState,
    PolicyAlgo,
    ValueAlgo,
    PlannerAlgo,
    HierarchicalAlgo,
    RolloutPolicy,
    ICLRolloutPolicy,
    register_algo_factory_func,
    algo_factory,
    algo_name_to_factory_func,
    REGISTERED_ALGOS,
)

# importing algorithm modules registers their factory functions
from robot_manipulation_vq_vae_tpu.algo import icl  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.icl import (  # noqa: F401
    ICL,
    ICLGaussian,
    ICLGMM,
    ICLRNN,
    ICLRNN_GMM,
    ICLTransformer,
    ICLVAE,
    ICLTransformerHVQVAE,
    ICLTransformer_GMM,
)

from robot_manipulation_vq_vae_tpu.algo import bc  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.bc import (  # noqa: F401
    BC,
    BC_Gaussian,
    BC_GMM,
    BC_VAE,
    BC_RNN,
    BC_RNN_GMM,
    BC_Transformer,
    BC_Transformer_GMM,
)

from robot_manipulation_vq_vae_tpu.algo import iql, td3_bc, bcq, cql  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.iql import IQL  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.td3_bc import TD3_BC  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.bcq import (  # noqa: F401
    BCQ,
    BCQ_GMM,
    BCQ_Distributional,
)
from robot_manipulation_vq_vae_tpu.algo.cql import CQL  # noqa: F401

from robot_manipulation_vq_vae_tpu.algo import gl, hbc, iris  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.gl import GL, GL_VAE, ValuePlanner  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.hbc import HBC  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.iris import IRIS  # noqa: F401

from robot_manipulation_vq_vae_tpu.algo import diffusion_policy, act  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.diffusion_policy import DiffusionPolicyUNet  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.act import ACT  # noqa: F401

from robot_manipulation_vq_vae_tpu.algo import icl_mamba  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.icl_mamba import ICLMambaHVQVAE, ICLMamba_GMM  # noqa: F401

from robot_manipulation_vq_vae_tpu.algo import mcr  # noqa: F401
from robot_manipulation_vq_vae_tpu.algo.mcr import MCR  # noqa: F401

"""ICL with a Mamba (selective SSM) backbone (reference
``robomimic/algo/icl_mamba.py:718-989`` + ``ICL_MIMO_Mamba``
obs_nets.py:2637).

The class hierarchy mirrors the transformer ICL family; the only
architectural difference is the sequence mixer (Mamba_Backbone instead of
GPT_Backbone) and the config section (``algo.mamba`` instead of
``algo.transformer``).
"""

from robot_manipulation_vq_vae_tpu.algo.algo import register_algo_factory_func
from robot_manipulation_vq_vae_tpu.algo.icl import (
    ICLTransformerHVQVAE,
    ICLTransformer_GMM,
    _encoder_kwargs,
)
from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models import policy_nets as PolicyNets
from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
    HierarchicalVQVAE,
)


@register_algo_factory_func("icl_mamba")
def algo_config_to_class(algo_config):
    """Reference icl_mamba.py:22-76 (same routing shape as icl)."""
    gmm_enabled = "gmm" in algo_config and algo_config.gmm.enabled
    if gmm_enabled and algo_config.mamba.enabled:
        return ICLMamba_GMM, {}
    return ICLMambaHVQVAE, {}


class _MambaSectionMixin:
    """Reads network hyper-parameters from ``algo.mamba``."""

    def _tx_cfg(self):
        return self.algo_config.mamba

    def _policy_transformer_args(self):
        args = BaseNets.transformer_args_from_config(self._tx_cfg())
        for k in (
            "transformer_fast_enabled", "transformer_bin_enabled",
            "transformer_vq_vae_enabled", "transformer_ln_act_enabled",
        ):
            args.pop(k, None)
        return args

    def _set_params_from_config(self):
        tc = self._tx_cfg()
        self.context_length = tc.context_length
        self.supervise_all_steps = tc.supervise_all_steps
        self.pred_future_acs = tc.pred_future_acs
        self.fast_enabled = tc.fast_enabled
        self.bin_enabled = tc.bin_enabled
        self.vq_vae_enabled = tc.get("vq_vae_enabled", False)
        self.ln_act_enabled = tc.ln_act_enabled
        if self.pred_future_acs:
            assert self.supervise_all_steps is True


class ICLMambaHVQVAE(_MambaSectionMixin, ICLTransformerHVQVAE):
    """HVQVAE co-training with a Mamba policy backbone. NOTE the policy is a
    plain (non-ICL) actor in the reference HVQVAE path, so the backbone swap
    only affects the ICL GMM variant; we keep the transformer actor here and
    read hyper-parameters from algo.mamba for config parity."""

    def _create_networks(self):
        assert self.algo_config.mamba.enabled
        self.nets["policy"] = PolicyNets.TransformerActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            **self._policy_transformer_args(),
        )
        self._set_params_from_config()
        if self.vq_vae_enabled:
            vq_cfg = self._tx_cfg().vqvae
            self.nets["vqvae"] = HierarchicalVQVAE(
                action_dim=self.ac_dim,
                num_subclusters=vq_cfg.get("num_subclusters", 128),
                num_clusters=vq_cfg.get("num_clusters", 32),
                embed_dim=vq_cfg.get("embed_dim", self._tx_cfg().embed_dim),
                num_stages=vq_cfg.get("num_stages", 2),
                num_layers_per_stage=vq_cfg.get("num_layers_per_stage", 10),
                beta=vq_cfg.get("beta_ema", 0.8),
                dropout=vq_cfg.get("dropout", 0.1),
                kmeans_init=True,
            )
            self.vqvae_lambda_rec = vq_cfg.get("lambda_rec", 1.0)
            self.vqvae_pretrain_epochs = vq_cfg.get("pretrain_epochs", 0)


class ICLMamba_GMM(_MambaSectionMixin, ICLTransformer_GMM):
    """The paper's ICL GMM path with an ICL_MIMO_Mamba backbone
    (reference icl_mamba.py:855-989)."""

    def _create_networks(self):
        assert self.algo_config.gmm.enabled
        assert self.algo_config.mamba.enabled
        self.nets["policy"] = PolicyNets.ICLTransformerGMMActorNetwork(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            num_modes=self.algo_config.gmm.num_modes,
            min_std=self.algo_config.gmm.min_std,
            std_activation=self.algo_config.gmm.std_activation,
            low_noise_eval=self.algo_config.gmm.low_noise_eval,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
            action_input_shape=self.ac_dim,
            backbone_type="mamba",
            **BaseNets.transformer_args_from_config(self._tx_cfg()),
        )
        self._set_params_from_config()

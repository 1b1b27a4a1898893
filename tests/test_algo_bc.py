"""BC family matrix test: every routed variant takes two gradient steps on a
low-dim synthetic batch and produces a rollout action - the JAX analogue of
the reference's ``robomimic/tests/test_bc.py`` variant matrix."""

import numpy as np
import pytest

import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, H, A = 4, 3, 7
OBS_KEYS = {"robot0_eef_pos": (5,)}

VARIANTS = {
    "bc": {},
    "bc_gaussian": {"gaussian.enabled": True},
    "bc_gmm": {"gmm.enabled": True},
    "bc_vae": {"vae.enabled": True},
    "bc_vae_gmm_prior": {
        "vae.enabled": True, "vae.prior.learn": True,
        "vae.prior.is_conditioned": True, "vae.prior.use_gmm": True,
        "vae.prior.gmm_learn_weights": True,
    },
    "bc_vae_categorical": {
        "vae.enabled": True, "vae.prior.use_categorical": True,
    },
    "bc_rnn": {"rnn.enabled": True, "rnn.hidden_dim": 32, "rnn.num_layers": 1},
    "bc_rnn_gmm": {
        "rnn.enabled": True, "gmm.enabled": True,
        "rnn.hidden_dim": 32, "rnn.num_layers": 1,
    },
    "bc_transformer": {
        "transformer.enabled": True, "transformer.context_length": H,
        "transformer.embed_dim": 32, "transformer.num_layers": 1,
        "transformer.num_heads": 4,
    },
    "bc_transformer_gmm": {
        "transformer.enabled": True, "gmm.enabled": True,
        "transformer.context_length": H, "transformer.embed_dim": 32,
        "transformer.num_layers": 1, "transformer.num_heads": 4,
    },
}

EXPECTED_CLASS = {
    "bc": AlgoReg.BC,
    "bc_gaussian": AlgoReg.BC_Gaussian,
    "bc_gmm": AlgoReg.BC_GMM,
    "bc_vae": AlgoReg.BC_VAE,
    "bc_vae_gmm_prior": AlgoReg.BC_VAE,
    "bc_vae_categorical": AlgoReg.BC_VAE,
    "bc_rnn": AlgoReg.BC_RNN,
    "bc_rnn_gmm": AlgoReg.BC_RNN_GMM,
    "bc_transformer": AlgoReg.BC_Transformer,
    "bc_transformer_gmm": AlgoReg.BC_Transformer_GMM,
}


def set_nested(config, dotted, value):
    node = config.algo
    parts = dotted.split(".")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


def make_algo(mods):
    config = config_factory("bc")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.algo.actor_layer_dims = (32, 32)
        config.algo.vae.encoder_layer_dims = (32,)
        config.algo.vae.decoder_layer_dims = (32,)
        config.algo.vae.prior_layer_dims = (32,)
        for k, v in mods.items():
            set_nested(config, k, v)
        config.train.max_grad_norm = 100.0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return AlgoReg.algo_factory(
        "bc", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )


def make_batch(rng, seq=False):
    window = 2 * H - 1
    return {
        "obs": {
            k: rng.randn(B, window, *s).astype(np.float32)
            for k, s in OBS_KEYS.items()
        },
        "actions": rng.uniform(-1, 1, (B, window, A)).astype(np.float32),
    }


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_bc_variant(variant):
    algo = make_algo(VARIANTS[variant])
    assert isinstance(algo, EXPECTED_CLASS[variant]), type(algo)
    rng = np.random.RandomState(0)
    for _ in range(2):
        batch = algo.process_batch_for_training(make_batch(rng))
        info = algo.train_on_batch(batch, epoch=1)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"]), (variant, log)

    if isinstance(algo, AlgoReg.ICLTransformer):
        obs = {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    else:
        # RNN policies step one obs at a time, carrying hidden state
        # (reference bc.py:543-574)
        obs = {k: rng.randn(1, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ac = np.asarray(algo.get_action(obs))
    assert np.all(np.isfinite(ac))
    if isinstance(algo, AlgoReg.ICLRNN):
        # second step reuses the carried rnn state; reset clears it
        assert algo._rnn_hidden_state is not None
        ac2 = np.asarray(algo.get_action(obs))
        assert np.all(np.isfinite(ac2))
        algo.reset()
        assert algo._rnn_hidden_state is None and algo._rnn_counter == 0

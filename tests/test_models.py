"""Model-stack integration tests: obs encoders, MIMO transformer, and the
ICL assemblies on tiny shapes (shipped-config topology: FiLM ResNet +
SpatialSoftmax + CropRandomizer, vq_vae tokenizer modality, 3T interleave).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.models import obs_core  # registers cores
from robot_manipulation_vq_vae_tpu.models.policy_nets import (
    ICLTransformerGMMActorNetwork,
    TransformerActorNetwork,
    ActorNetwork,
    GMMActorNetwork,
)

B, T = 2, 4
IMG = (24, 24, 3)  # HWC
LOW_DIM = 5
LANG = 16
AC_DIM = 12

OBS_SHAPES = {
    "robot0_eef_pos": (LOW_DIM,),
    "agentview_image": IMG,
    "lang_emb": (LANG,),
}

ENCODER_KWARGS = {
    "low_dim": {
        "core_class": None,
        "core_kwargs": {},
        "obs_randomizer_class": None,
        "obs_randomizer_kwargs": {},
    },
    "rgb": {
        "core_class": "VisualCoreLanguageConditioned",
        "core_kwargs": {
            "feature_dimension": 16,
            "backbone_class": "ResNet18ConvFiLM",
            "backbone_kwargs": {"pretrained": False, "lang_emb_dim": LANG},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 8},
        },
        "obs_randomizer_class": "CropRandomizer",
        "obs_randomizer_kwargs": {
            "crop_height": 20, "crop_width": 20, "num_crops": 1,
        },
    },
}


@pytest.fixture(scope="module", autouse=True)
def register_modalities():
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {
            "obs": {
                "low_dim": ["robot0_eef_pos", "lang_emb"],
                "rgb": ["agentview_image"],
            }
        }
    )


def make_obs(rng, b, t):
    return {
        "robot0_eef_pos": jnp.asarray(rng.randn(b, t, LOW_DIM), jnp.float32),
        "agentview_image": jnp.asarray(
            rng.rand(b, t, *IMG), jnp.float32
        ),
        "lang_emb": jnp.asarray(rng.randn(b, t, LANG), jnp.float32),
    }


@pytest.mark.slow
def test_observation_encoder_shapes():
    from robot_manipulation_vq_vae_tpu.models.obs_nets import obs_encoder_factory

    enc = obs_encoder_factory(
        OBS_SHAPES, feature_activation=None, encoder_kwargs=ENCODER_KWARGS
    )
    rng = np.random.RandomState(0)
    obs = {k: v[:, 0] for k, v in make_obs(rng, B, T).items()}
    variables = enc.init(jax.random.PRNGKey(0), obs, train=False)
    out = enc.apply(variables, obs, train=False)
    # feat dim: low_dim 5 + image 16 + lang 16
    assert out.shape == (B, LOW_DIM + 16 + LANG)
    assert enc.output_shape() == [LOW_DIM + 16 + LANG]

    # train mode with crop randomizer needs randomizer rng + batch_stats
    out2, _ = enc.apply(
        variables, obs, train=True,
        rngs={"randomizer": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out2.shape == out.shape


@pytest.mark.slow
def test_transformer_actor_forward():
    model = TransformerActorNetwork(
        obs_shapes=tuple(OBS_SHAPES.items()),
        ac_dim=AC_DIM,
        transformer_embed_dim=32,
        transformer_num_layers=2,
        transformer_num_heads=4,
        transformer_context_length=T,
        transformer_causal=False,
        encoder_kwargs=ENCODER_KWARGS,
    )
    rng = np.random.RandomState(1)
    obs = make_obs(rng, B, T)
    variables = model.init(jax.random.PRNGKey(0), obs, train=False)
    acts = model.apply(variables, obs, train=False)
    assert acts.shape == (B, T, AC_DIM)
    assert float(jnp.max(jnp.abs(acts))) <= 1.0


@pytest.mark.slow
def test_icl_gmm_actor_with_lipvq():
    model = ICLTransformerGMMActorNetwork(
        obs_shapes=tuple(OBS_SHAPES.items()),
        ac_dim=AC_DIM,
        transformer_embed_dim=32,
        transformer_num_layers=2,
        transformer_num_heads=4,
        transformer_context_length=T,
        transformer_causal=False,
        transformer_vq_vae_enabled=True,
        action_input_shape=AC_DIM,
        num_modes=3,
        encoder_kwargs=ENCODER_KWARGS,
    )
    rng = np.random.RandomState(2)
    obs = make_obs(rng, B, T)
    ctx_obs = make_obs(rng, B, T)
    ctx_act = jnp.asarray(rng.randn(B, T, AC_DIM), jnp.float32)

    variables = model.init(
        jax.random.PRNGKey(0), obs, ctx_obs, ctx_act,
        train=False, method=model.forward_train,
    )
    dist, vq_loss = model.apply(
        variables, obs, ctx_obs, ctx_act, train=False,
        method=model.forward_train,
    )
    assert dist.means.shape == (B, T, 3, AC_DIM)
    assert dist.logits.shape == (B, T, 3)
    assert vq_loss is not None and float(vq_loss) > 0
    # low-noise eval
    np.testing.assert_allclose(np.asarray(dist.scales), 1e-4)

    lp = dist.log_prob(ctx_act)
    assert lp.shape == (B, T)

    # jit + grad through the whole stack
    def loss_fn(params):
        d, vq = model.apply(
            {**variables, "params": params}, obs, ctx_obs, ctx_act,
            train=False, method=model.forward_train,
        )
        return -jnp.mean(d.log_prob(ctx_act)) + 0.1 * vq

    g = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_gmm_log_prob_matches_torch_mixture():
    """GMM log_prob must equal torch's MixtureSameFamily computation."""
    torch = pytest.importorskip("torch")
    import torch.distributions as D

    from robot_manipulation_vq_vae_tpu.models.distributions import (
        GMMActionDistribution,
    )

    rng = np.random.RandomState(3)
    means = rng.randn(B, T, 3, AC_DIM).astype(np.float32)
    scales = np.abs(rng.randn(B, T, 3, AC_DIM)).astype(np.float32) + 0.1
    logits = rng.randn(B, T, 3).astype(np.float32)
    actions = rng.randn(B, T, AC_DIM).astype(np.float32)

    comp = D.Independent(
        D.Normal(torch.from_numpy(means), torch.from_numpy(scales)), 1
    )
    mix = D.Categorical(logits=torch.from_numpy(logits))
    ref_lp = D.MixtureSameFamily(mix, comp).log_prob(torch.from_numpy(actions))

    dist = GMMActionDistribution(
        means=jnp.asarray(means), scales=jnp.asarray(scales),
        logits=jnp.asarray(logits),
    )
    lp = dist.log_prob(jnp.asarray(actions))
    np.testing.assert_allclose(np.asarray(lp), ref_lp.numpy(), atol=1e-4, rtol=1e-4)


def test_mlp_actors():
    shapes = {"robot0_eef_pos": (LOW_DIM,)}
    ObsUtils.initialize_obs_utils_with_obs_specs(
        {"obs": {"low_dim": ["robot0_eef_pos", "lang_emb"],
                 "rgb": ["agentview_image"]}}
    )
    rng = np.random.RandomState(4)
    obs = {"robot0_eef_pos": jnp.asarray(rng.randn(B, LOW_DIM), jnp.float32)}

    actor = ActorNetwork(
        obs_shapes=tuple(shapes.items()), ac_dim=AC_DIM,
        mlp_layer_dims=(32, 32),
        encoder_kwargs={"low_dim": ENCODER_KWARGS["low_dim"]},
    )
    v = actor.init(jax.random.PRNGKey(0), obs)
    a = actor.apply(v, obs)
    assert a.shape == (B, AC_DIM)

    gmm = GMMActorNetwork(
        obs_shapes=tuple(shapes.items()), ac_dim=AC_DIM,
        mlp_layer_dims=(32, 32), num_modes=5,
        encoder_kwargs={"low_dim": ENCODER_KWARGS["low_dim"]},
    )
    v = gmm.init(jax.random.PRNGKey(0), obs)
    dist = gmm.apply(v, obs)
    assert dist.means.shape == (B, 5, AC_DIM)

"""Conditional VAE actor (reference ``robomimic/models/vae_nets.py:747``).

Supports the reference's prior zoo (``vae_nets.py:237-528``): standard
N(0, I), learned (optionally observation-conditioned) Gaussian, GMM prior,
and categorical prior with Gumbel-softmax sampling. The forward_train
contract matches the reference: returns decoder outputs, KL loss,
reconstruction loss, encoder z and encoder params.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationGroupEncoder,
    group_shapes_spec,
)
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


def vae_args_from_config(vae_config):
    """Map config.algo.vae.* to kwargs (reference vae_nets.py:32-77)."""
    return dict(
        encoder_layer_dims=tuple(vae_config.encoder_layer_dims),
        decoder_layer_dims=tuple(vae_config.decoder_layer_dims),
        latent_dim=vae_config.latent_dim,
        latent_clip=vae_config.latent_clip,
        decoder_is_conditioned=vae_config.decoder.is_conditioned,
        decoder_reconstruction_sum_across_elements=(
            vae_config.decoder.reconstruction_sum_across_elements
        ),
        prior_learn=vae_config.prior.learn,
        prior_is_conditioned=vae_config.prior.is_conditioned,
        prior_layer_dims=tuple(vae_config.prior_layer_dims),
        prior_use_gmm=vae_config.prior.use_gmm,
        prior_gmm_num_modes=vae_config.prior.gmm_num_modes,
        prior_gmm_learn_weights=vae_config.prior.gmm_learn_weights,
        prior_use_categorical=vae_config.prior.use_categorical,
        prior_categorical_dim=vae_config.prior.categorical_dim,
        prior_categorical_gumbel_softmax_hard=(
            vae_config.prior.categorical_gumbel_softmax_hard
        ),
    )


class VAEActor(nn.Module):
    """CVAE over actions conditioned on observations."""

    obs_shapes: Any
    ac_dim: int
    encoder_layer_dims: Tuple[int, ...] = (300, 400)
    decoder_layer_dims: Tuple[int, ...] = (300, 400)
    latent_dim: int = 14
    latent_clip: Optional[float] = None
    decoder_is_conditioned: bool = True
    decoder_reconstruction_sum_across_elements: bool = False
    prior_learn: bool = False
    prior_is_conditioned: bool = False
    prior_layer_dims: Tuple[int, ...] = (300, 400)
    prior_use_gmm: bool = False
    prior_gmm_num_modes: int = 10
    prior_gmm_learn_weights: bool = False
    prior_use_categorical: bool = False
    prior_categorical_dim: int = 10
    prior_categorical_gumbel_softmax_hard: bool = False
    goal_shapes: Any = None
    encoder_kwargs: Any = None

    def setup(self):
        groups = {"obs": self.obs_shapes}
        if self.goal_shapes:
            groups["goal"] = self.goal_shapes
        self._group_spec = group_shapes_spec(
            {k: dict(v) for k, v in groups.items()}
        )
        self.obs_encoder = ObservationGroupEncoder(
            observation_group_shapes=self._group_spec,
            encoder_kwargs=self.encoder_kwargs,
        )
        z_dim = (
            self.latent_dim * self.prior_categorical_dim
            if self.prior_use_categorical
            else self.latent_dim
        )
        enc_out = 2 * self.latent_dim if not self.prior_use_categorical else z_dim
        self.q_net = BaseNets.MLP(
            output_dim=enc_out, layer_dims=self.encoder_layer_dims, name="q_net"
        )
        self.decoder_net = BaseNets.MLP(
            output_dim=self.ac_dim, layer_dims=self.decoder_layer_dims,
            name="decoder_net",
        )
        if self.prior_learn and not self.prior_use_categorical:
            m = self.prior_gmm_num_modes if self.prior_use_gmm else 1
            out = 2 * self.latent_dim * m + (
                m if (self.prior_use_gmm and self.prior_gmm_learn_weights) else 0
            )
            self.prior_net = BaseNets.MLP(
                output_dim=out, layer_dims=self.prior_layer_dims, name="prior_net"
            )

    def _obs_feat(self, obs_dict, goal_dict, train):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        return self.obs_encoder(train=train, **kwargs)

    def encode(self, actions, obs_feat):
        h = jnp.concatenate([obs_feat, actions], axis=-1)
        out = self.q_net(h)
        if self.prior_use_categorical:
            logits = out.reshape(
                out.shape[:-1] + (self.latent_dim, self.prior_categorical_dim)
            )
            return {"logits": logits}
        mu, logvar = jnp.split(out, 2, axis=-1)
        return {"mean": mu, "logvar": logvar}

    def reparametrize(self, params, rng, temperature=1.0, eps=None):
        """``eps`` optionally injects the standard-normal draw (Gaussian
        priors only) — the determinism seam the BCQ parity harness uses to
        feed both frameworks identical noise (tests/test_bcq_parity.py)."""
        if self.prior_use_categorical:
            g = -jnp.log(
                -jnp.log(jax.random.uniform(rng, params["logits"].shape) + 1e-20)
                + 1e-20
            )
            y = jax.nn.softmax((params["logits"] + g) / temperature, axis=-1)
            if self.prior_categorical_gumbel_softmax_hard:
                idx = jnp.argmax(y, axis=-1)
                hard = jax.nn.one_hot(idx, self.prior_categorical_dim)
                y = hard + y - jax.lax.stop_gradient(y)
            return y.reshape(y.shape[:-2] + (-1,))
        if eps is None:
            eps = jax.random.normal(rng, params["mean"].shape)
        z = params["mean"] + jnp.exp(0.5 * params["logvar"]) * eps
        if self.latent_clip is not None:
            z = jnp.clip(z, -self.latent_clip, self.latent_clip)
        return z

    def decode(self, z, obs_feat):
        h = (
            jnp.concatenate([obs_feat, z], axis=-1)
            if self.decoder_is_conditioned
            else z
        )
        # the reference VAEActor squashes action reconstructions into
        # [-1, 1] (policy_nets.py output_squash=["action"], scale 1.0,
        # applied in vae_nets.py VAE.decode)
        return jnp.tanh(self.decoder_net(h))

    def _prior_params(self, obs_feat):
        batch = obs_feat.shape[0]
        if self.prior_learn:
            if self.prior_is_conditioned:
                raw = self.prior_net(obs_feat)
            else:
                raw = self.prior_net(jnp.zeros_like(obs_feat[:, :1]) + 0.0)
                raw = jnp.broadcast_to(raw, (batch,) + raw.shape[1:])
            m = self.prior_gmm_num_modes if self.prior_use_gmm else 1
            means = raw[..., : self.latent_dim * m].reshape(batch, m, self.latent_dim)
            logvars = raw[
                ..., self.latent_dim * m : 2 * self.latent_dim * m
            ].reshape(batch, m, self.latent_dim)
            if self.prior_use_gmm and self.prior_gmm_learn_weights:
                logw = jax.nn.log_softmax(raw[..., -m:], axis=-1)
            else:
                logw = jnp.full((batch, m), -np.log(m))
            return means, logvars, logw
        return None

    def kl(self, enc_params, z, obs_feat, temperature=1.0):
        if self.prior_use_categorical:
            logits = enc_params["logits"]
            q = jax.nn.softmax(logits, axis=-1)
            log_q = jax.nn.log_softmax(logits, axis=-1)
            kl = jnp.sum(
                q * (log_q + jnp.log(float(self.prior_categorical_dim))),
                axis=(-2, -1),
            )
            return jnp.mean(kl)
        prior = self._prior_params(obs_feat)
        if prior is None:
            return LossUtils.kld_0_1_loss(enc_params["mean"], enc_params["logvar"])
        means, logvars, logw = prior
        if not self.prior_use_gmm:
            return LossUtils.kld_gaussian_loss(
                enc_params["mean"], enc_params["logvar"],
                means[:, 0], logvars[:, 0],
            )
        # GMM prior: MC estimate E_q[log q(z) - log p(z)] with one sample
        log_qz = LossUtils.log_normal(
            z, enc_params["mean"], jnp.exp(enc_params["logvar"])
        )
        log_pz = LossUtils.log_normal_mixture(
            z, means, jnp.exp(logvars), log_w=logw
        )
        return jnp.mean(log_qz - log_pz)

    def forward_train(self, actions, obs_dict, goal_dict=None, train=False,
                      temperature=1.0, eps=None):
        """Returns the reference output dict (vae_nets.py forward)."""
        rng = self.make_rng("latent")
        obs_feat = self._obs_feat(obs_dict, goal_dict, train)
        enc_params = self.encode(actions, obs_feat)
        z = self.reparametrize(enc_params, rng, temperature=temperature, eps=eps)
        recons = self.decode(z, obs_feat)
        if self.decoder_reconstruction_sum_across_elements:
            recon_loss = jnp.mean(jnp.sum((recons - actions) ** 2, axis=-1))
        else:
            recon_loss = jnp.mean((recons - actions) ** 2)
        kl_loss = self.kl(enc_params, z, obs_feat, temperature)
        return {
            "decoder_outputs": recons,
            "kl_loss": kl_loss,
            "reconstruction_loss": recon_loss,
            "encoder_z": z,
            "encoder_params": enc_params,
        }

    def __call__(self, obs_dict, goal_dict=None, train=False, z=None):
        """Sample an action by decoding a prior sample (eval path).

        An injected ``z`` is a stand-in for the prior draw (the BCQ parity
        seam), so ``latent_clip`` applies to it exactly as the reference's
        ``VAE.sample`` clamps every prior sample (vae_nets.py:421-422)."""
        obs_feat = self._obs_feat(obs_dict, goal_dict, train)
        if z is None:
            rng = self.make_rng("latent")
            batch = obs_feat.shape[0]
            if self.prior_use_categorical:
                idx = jax.random.randint(
                    rng, (batch, self.latent_dim), 0, self.prior_categorical_dim
                )
                z = jax.nn.one_hot(idx, self.prior_categorical_dim).reshape(
                    batch, -1
                )
                return self.decode(z, obs_feat)
            prior = self._prior_params(obs_feat)
            if prior is None:
                z = jax.random.normal(rng, (batch, self.latent_dim))
            else:
                means, logvars, logw = prior
                r1, r2 = jax.random.split(rng)
                mode = jax.random.categorical(r1, logw, axis=-1)
                mean = jnp.take_along_axis(
                    means, mode[:, None, None], axis=1
                ).squeeze(1)
                logvar = jnp.take_along_axis(
                    logvars, mode[:, None, None], axis=1
                ).squeeze(1)
                z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    r2, mean.shape
                )
        if self.latent_clip is not None:
            z = jnp.clip(z, -self.latent_clip, self.latent_clip)
        return self.decode(z, obs_feat)

"""Conditional 1-D UNet denoiser + DDPM/DDIM schedules for diffusion policy
(reference ``robomimic/algo/diffusion_policy.py`` which wraps the
``diffusers`` DDPM/DDIM schedulers and a ConditionalUnet1D).

Everything here is jit-native: the noise schedule is precomputed as arrays,
sampling is a ``lax.fori_loop`` over denoising steps (fixed trip count), and
the UNet is channels-last ([B, T, C]) for TPU convs.
"""

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def cosine_beta_schedule(num_steps, s=0.008, max_beta=0.999):
    """squaredcos_cap_v2 schedule (diffusers default for diffusion policy)."""
    t = np.arange(num_steps + 1) / num_steps
    f = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2
    alphas_bar = f / f[0]
    betas = 1 - alphas_bar[1:] / alphas_bar[:-1]
    return np.clip(betas, 0, max_beta).astype(np.float32)


class DiffusionSchedule:
    """Precomputed DDPM quantities + DDIM stepping."""

    def __init__(self, num_train_timesteps=100, beta_schedule="squaredcos_cap_v2"):
        assert beta_schedule == "squaredcos_cap_v2"
        self.num_train_timesteps = num_train_timesteps
        betas = cosine_beta_schedule(num_train_timesteps)
        alphas = 1.0 - betas
        alphas_bar = np.cumprod(alphas)
        self.betas = jnp.asarray(betas)
        self.alphas = jnp.asarray(alphas)
        self.alphas_bar = jnp.asarray(alphas_bar)
        self.sqrt_ab = jnp.sqrt(self.alphas_bar)
        self.sqrt_1mab = jnp.sqrt(1.0 - self.alphas_bar)

    def add_noise(self, x0, noise, t):
        """q(x_t | x_0): t int array [B]."""
        a = self.sqrt_ab[t][:, None, None]
        b = self.sqrt_1mab[t][:, None, None]
        return a * x0 + b * noise

    def ddpm_step(self, rng, x_t, eps_pred, t):
        """One reverse DDPM step at integer timestep t (scalar)."""
        beta = self.betas[t]
        alpha = self.alphas[t]
        ab = self.alphas_bar[t]
        coef = beta / jnp.sqrt(1.0 - ab)
        mean = (x_t - coef * eps_pred) / jnp.sqrt(alpha)
        noise = jax.random.normal(rng, x_t.shape)
        sigma = jnp.sqrt(beta)
        return mean + jnp.where(t > 0, sigma, 0.0) * noise

    def ddim_step(self, x_t, eps_pred, t, t_prev, eta=0.0):
        ab_t = self.alphas_bar[t]
        ab_prev = jnp.where(t_prev >= 0, self.alphas_bar[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x_t - jnp.sqrt(1 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
        x0 = jnp.clip(x0, -1.0, 1.0)
        dir_xt = jnp.sqrt(1 - ab_prev) * eps_pred
        return jnp.sqrt(ab_prev) * x0 + dir_xt


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = jnp.exp(jnp.arange(half) * -emb)
        emb = t[:, None] * emb[None]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish (channels-last)."""

    features: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (self.kernel_size,),
            padding=self.kernel_size // 2, name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.n_groups, name="gn")(x)
        return mish(x)


class ConditionalResBlock1d(nn.Module):
    """Two conv blocks with FiLM conditioning + residual."""

    features: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, cond):
        h = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                        name="block1")(x)
        film = nn.Dense(2 * self.features, name="cond_proj")(mish(cond))
        scale, bias = jnp.split(film[:, None, :], 2, axis=-1)
        h = h * (1.0 + scale) + bias
        h = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                        name="block2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), name="res_conv")(x)
        return h + x


class ConditionalUnet1D(nn.Module):
    """UNet over the action-sequence time axis, FiLM-conditioned on
    (diffusion timestep embedding, obs features)."""

    action_dim: int
    down_dims: Tuple[int, ...] = (256, 512, 1024)
    diffusion_step_embed_dim: int = 256
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, t, global_cond):
        """x [B, T, A]; t [B] int; global_cond [B, D] -> eps [B, T, A]."""
        temb = SinusoidalPosEmb(self.diffusion_step_embed_dim, name="pos_emb")(
            t.astype(jnp.float32)
        )
        temb = nn.Dense(4 * self.diffusion_step_embed_dim, name="temb1")(temb)
        temb = mish(temb)
        temb = nn.Dense(self.diffusion_step_embed_dim, name="temb2")(temb)
        cond = jnp.concatenate([temb, global_cond], axis=-1)

        skips = []
        h = x
        for i, feat in enumerate(self.down_dims):
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"down{i}_r1"
            )(h, cond)
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"down{i}_r2"
            )(h, cond)
            skips.append(h)
            if i < len(self.down_dims) - 1:
                h = nn.Conv(
                    feat, (3,), strides=(2,), padding=1, name=f"down{i}_pool"
                )(h)

        h = ConditionalResBlock1d(
            self.down_dims[-1], self.kernel_size, self.n_groups, name="mid1"
        )(h, cond)
        h = ConditionalResBlock1d(
            self.down_dims[-1], self.kernel_size, self.n_groups, name="mid2"
        )(h, cond)

        for i, feat in reversed(list(enumerate(self.down_dims))):
            skip = skips[i]
            if h.shape[1] != skip.shape[1]:
                # nearest-neighbor upsample to the skip's length
                h = jax.image.resize(
                    h, (h.shape[0], skip.shape[1], h.shape[2]), "nearest"
                )
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"up{i}_r1"
            )(h, cond)
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"up{i}_r2"
            )(h, cond)

        h = Conv1dBlock(self.down_dims[0], self.kernel_size, self.n_groups,
                        name="final_block")(h)
        return nn.Conv(self.action_dim, (1,), name="final_conv")(h)

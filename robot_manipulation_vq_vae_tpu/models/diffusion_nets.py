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
    """Precomputed DDPM/DDIM schedule with ``diffusers`` stepping semantics.

    The reference wraps ``diffusers`` ``DDPMScheduler``/``DDIMScheduler``
    (diffusion_policy.py:88-106) with ``prediction_type='epsilon'``; this
    reimplements the exact math of those schedulers' ``set_timesteps`` and
    ``step``:

    - strided inference timesteps ``(arange(n_inf) * (n_train // n_inf))``
      reversed (+ ``steps_offset`` for DDIM),
    - ``prev_t = t - n_train // n_inf`` in every step,
    - DDPM posterior with the "fixed_small" variance
      ``(1-ab_prev)/(1-ab_t) * beta_t`` clamped to >= 1e-20 (the diffusers
      default ``variance_type``),
    - optional ``clip_sample`` of the predicted x0 to [-1, 1],
    - DDIM with ``eta=0``, ``set_alpha_to_one`` for the final step's
      ``ab_prev``, and the *unclipped* eps reused for the direction term
      (diffusers uses ``model_output`` there even when x0 was clipped).
    """

    def __init__(self, num_train_timesteps=100, beta_schedule="squaredcos_cap_v2",
                 clip_sample=True, set_alpha_to_one=True, steps_offset=0):
        assert beta_schedule == "squaredcos_cap_v2"
        self.num_train_timesteps = num_train_timesteps
        self.clip_sample = clip_sample
        self.set_alpha_to_one = set_alpha_to_one
        self.steps_offset = steps_offset
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

    def inference_timesteps(self, num_inference_steps, ddim=False):
        """The diffusers ``set_timesteps`` grid (descending numpy int array)."""
        n = min(num_inference_steps, self.num_train_timesteps)
        step_ratio = self.num_train_timesteps // n
        ts = (np.arange(0, n) * step_ratio).round()[::-1].astype(np.int64)
        if ddim:
            ts = ts + self.steps_offset
        return ts

    def _ab_prev(self, t_prev, ddim):
        """alphas_bar at the previous grid timestep; past the end of the
        chain DDPM uses 1.0 and DDIM uses ``final_alpha_cumprod``."""
        final = 1.0 if (not ddim or self.set_alpha_to_one) else self.alphas_bar[0]
        return jnp.where(
            t_prev >= 0, self.alphas_bar[jnp.maximum(t_prev, 0)], final
        )

    def _pred_x0(self, x_t, eps_pred, ab_t):
        x0 = (x_t - jnp.sqrt(1.0 - ab_t) * eps_pred) / jnp.sqrt(ab_t)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    def ddpm_step(self, rng, x_t, eps_pred, t, t_prev=None):
        """One reverse DDPM step at integer timestep t (scalar); ``t_prev``
        defaults to ``t - 1`` (full-chain sampling)."""
        if t_prev is None:
            t_prev = t - 1
        ab_t = self.alphas_bar[t]
        ab_prev = self._ab_prev(t_prev, ddim=False)
        beta_t = 1.0 - ab_t / ab_prev  # current_beta_t over the grid stride
        x0 = self._pred_x0(x_t, eps_pred, ab_t)
        # posterior mean coefficients (diffusers scheduling_ddpm.step)
        coef_x0 = jnp.sqrt(ab_prev) * beta_t / (1.0 - ab_t)
        coef_xt = jnp.sqrt(ab_t / ab_prev) * (1.0 - ab_prev) / (1.0 - ab_t)
        mean = coef_x0 * x0 + coef_xt * x_t
        # "fixed_small" variance, clamped like diffusers' _get_variance
        var = jnp.maximum((1.0 - ab_prev) / (1.0 - ab_t) * beta_t, 1e-20)
        noise = jax.random.normal(rng, x_t.shape)
        return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise

    def ddim_step(self, x_t, eps_pred, t, t_prev, eta=0.0):
        assert eta == 0.0  # the reference never passes eta
        ab_t = self.alphas_bar[t]
        ab_prev = self._ab_prev(t_prev, ddim=True)
        x0 = self._pred_x0(x_t, eps_pred, ab_t)
        dir_xt = jnp.sqrt(1.0 - ab_prev) * eps_pred
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
        # epsilon matches torch.nn.GroupNorm's 1e-5 (flax defaults to 1e-6)
        x = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, name="gn")(x)
        return mish(x)


class ConditionalResBlock1d(nn.Module):
    """Two conv blocks with FiLM conditioning + residual (reference
    ``ConditionalResidualBlock1D``, diffusion_policy.py:520-565: FiLM is
    ``scale * h + bias`` with scale/bias the first/second half of the
    cond projection, and the residual 1x1 conv appears only on a channel
    change)."""

    features: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, cond):
        h = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                        name="block1")(x)
        film = nn.Dense(2 * self.features, name="cond_proj")(mish(cond))
        scale, bias = jnp.split(film[:, None, :], 2, axis=-1)
        h = scale * h + bias
        h = Conv1dBlock(self.features, self.kernel_size, self.n_groups,
                        name="block2")(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,), name="res_conv")(x)
        return h + x


class ConditionalUnet1D(nn.Module):
    """UNet over the action-sequence time axis, FiLM-conditioned on
    (diffusion timestep embedding, obs features).

    Structurally weight-for-weight with the reference ``ConditionalUnet1D``
    (diffusion_policy.py:567-742, the original diffusion-policy denoiser):
    per-level strided-conv downsamples, learned ConvTranspose1d(4,2,1)
    upsamples, and an up path of ``len(down_dims) - 1`` levels — the
    SHALLOWEST skip is computed and then discarded, a quirk of the
    original implementation (``reversed(in_out[1:])``) reproduced here so
    parameters and activations correspond 1:1 (forward + optimizer
    trajectory parity in ``tests/test_diffusion_parity.py``). The
    sequence length must be divisible by ``2 ** (len(down_dims) - 1)``
    (same implicit constraint as the reference)."""

    action_dim: int
    down_dims: Tuple[int, ...] = (256, 512, 1024)
    diffusion_step_embed_dim: int = 256
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, t, global_cond):
        """x [B, T, A]; t [B] int; global_cond [B, D] -> eps [B, T, A]."""
        assert x.shape[1] % (2 ** (len(self.down_dims) - 1)) == 0, (
            f"sequence length {x.shape[1]} must be divisible by "
            f"2**{len(self.down_dims) - 1} for the UNet skip alignment"
        )
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

        # up path: levels mirror reversed(in_out[1:]) — each consumes the
        # same-resolution skip and ends with a LEARNED 4/2/1 transposed
        # conv; skips[0] is deliberately left unused (reference quirk)
        for j, i in enumerate(range(len(self.down_dims) - 1, 0, -1)):
            feat = self.down_dims[i - 1]
            h = jnp.concatenate([h, skips[i]], axis=-1)
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"up{j}_r1"
            )(h, cond)
            h = ConditionalResBlock1d(
                feat, self.kernel_size, self.n_groups, name=f"up{j}_r2"
            )(h, cond)
            h = nn.ConvTranspose(
                feat, (4,), strides=(2,), padding=((2, 2),),
                transpose_kernel=True, name=f"up{j}_up",
            )(h)

        # reference quirk: final_conv's Conv1dBlock is built WITHOUT passing
        # n_groups (diffusion_policy.py:674-677), so it always group-norms
        # with the default 8 groups regardless of the configured n_groups
        h = Conv1dBlock(self.down_dims[0], self.kernel_size, n_groups=8,
                        name="final_block")(h)
        return nn.Conv(self.action_dim, (1,), name="final_conv")(h)

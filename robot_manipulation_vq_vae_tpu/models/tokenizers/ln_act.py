"""LN-Act action tokenizer (``ln_act_enabled`` modality): a Mamba selective
state-space block over the prompt action sequence, then an MLP projection
(reference construction at ``robomimic/models/obs_nets.py:1230-1244``).

The reference depends on the fused-CUDA ``mamba_ssm`` package; here the
selective scan is expressed TPU-natively with ``jax.lax.associative_scan``
over the time axis (the recurrence h_t = a_t * h_{t-1} + b_t is associative,
so it parallelizes across T on the VPU). Hyper-parameters match the
reference call: d_state=8, d_conv=4, expand=2.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.utils.initializers import (
    torch_linear_kernel_init,
)


def _selective_scan(u, dt, A, B, C, D):
    """Mamba selective scan.

    u:  [Bt, T, Di]   input sequence
    dt: [Bt, T, Di]   softplus'd timestep
    A:  [Di, N]       state matrix (negative)
    B:  [Bt, T, N]    input->state projection (input-dependent)
    C:  [Bt, T, N]    state->output projection (input-dependent)
    D:  [Di]          skip connection
    returns y: [Bt, T, Di]
    """
    # discretize: dA = exp(dt A), dBu = dt * B * u  (ZOH approximation)
    dA = jnp.exp(dt[..., None] * A[None, None])                 # [Bt,T,Di,N]
    dBu = dt[..., None] * B[:, :, None, :] * u[..., None]       # [Bt,T,Di,N]

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, h = jax.lax.associative_scan(combine, (dA, dBu), axis=1)
    y = jnp.einsum("btdn,btn->btd", h, C)                        # [Bt,T,Di]
    return y + u * D[None, None]


class MambaBlock(nn.Module):
    """Single Mamba block (selective SSM + gating), matching the public
    mamba_ssm.Mamba layer's architecture."""

    d_model: int
    d_state: int = 8
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)

        xz = nn.Dense(
            2 * d_inner, use_bias=False,
            kernel_init=torch_linear_kernel_init, name="in_proj",
        )(x)
        u, z = jnp.split(xz, 2, axis=-1)                         # [B,T,Di] each

        # depthwise causal conv along T (left-pad k-1)
        u = nn.Conv(
            d_inner, (self.d_conv,), padding=[(self.d_conv - 1, 0)],
            feature_group_count=d_inner, name="conv1d",
        )(u)
        u = jax.nn.silu(u)

        x_dbl = nn.Dense(
            dt_rank + 2 * self.d_state, use_bias=False,
            kernel_init=torch_linear_kernel_init, name="x_proj",
        )(u)
        dt_raw, B_mat, C_mat = jnp.split(
            x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1
        )
        dt = nn.Dense(
            d_inner, kernel_init=torch_linear_kernel_init, name="dt_proj"
        )(dt_raw)
        dt = jax.nn.softplus(dt)

        A_log = self.param(
            "A_log",
            lambda rng: jnp.log(
                jnp.broadcast_to(
                    jnp.arange(1, self.d_state + 1, dtype=jnp.float32),
                    (d_inner, self.d_state),
                )
            ),
        )
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d_inner,))

        y = _selective_scan(u, dt, A, B_mat, C_mat, D)
        y = y * jax.nn.silu(z)
        return nn.Dense(
            self.d_model, use_bias=False,
            kernel_init=torch_linear_kernel_init, name="out_proj",
        )(y)


class LNActEncoder(nn.Module):
    """Mamba block over [B, T, action_dim] + MLP projection to feature dim
    (reference ``obs_nets.py:1230-1244,1340-1344``)."""

    action_dim: int
    output_dim: int
    d_state: int = 8
    d_conv: int = 4
    expand: int = 2

    @nn.compact
    def __call__(self, actions_btd):
        h = MambaBlock(
            d_model=self.action_dim, d_state=self.d_state,
            d_conv=self.d_conv, expand=self.expand, name="mamba",
        )(actions_btd)
        b, t, d = h.shape
        h = h.reshape(b * t, d)
        h = nn.Dense(64, kernel_init=torch_linear_kernel_init, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(128, kernel_init=torch_linear_kernel_init, name="fc2")(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(
            self.output_dim, kernel_init=torch_linear_kernel_init, name="fc3"
        )(h)

"""Weight initializers matching the reference framework's PyTorch defaults.

Function parity is established by loading exact weights in tests; these
initializers exist so *training from scratch* has the same variance profile
as the reference (torch ``nn.Linear`` / ``kaiming_uniform_`` defaults).
"""

import math

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Flax Dense kernels are [in, out]; fan_in = shape[0].
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch ``nn.init.kaiming_uniform_`` defaults (a=0, fan_in, leaky_relu):
    U(-sqrt(6/fan_in), sqrt(6/fan_in)). For 2-D [rows, cols], fan_in = cols
    (torch convention for [out, in] matrices)."""
    fan_in = shape[-1]
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal_init(std=1.0):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def gpt_init(key, shape, dtype=jnp.float32):
    """GPT backbone init: N(0, 0.02) (reference ``transformers.py:408-418``)."""
    return 0.02 * jax.random.normal(key, shape, dtype)

"""Probability distribution helpers (GMM over actions, tanh wrapping).

Replaces the torch.distributions usage in the reference
(``MixtureSameFamily(Categorical, Independent(Normal))`` in
``policy_nets.py:2545-2575`` and ``TanhWrappedDistribution`` in
``robomimic/models/distributions.py:11``) with explicit jnp math - no
distribution-library dependency, everything jit/grad friendly.
"""

import math

import flax.struct
import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


@flax.struct.dataclass
class GMMActionDistribution:
    """Mixture of diagonal Gaussians over actions.

    means:  [..., M, A]
    scales: [..., M, A]
    logits: [..., M]
    batch shape is [...] (e.g. [B, T]); event shape is [A].
    """

    means: jnp.ndarray
    scales: jnp.ndarray
    logits: jnp.ndarray

    def log_prob(self, actions):
        """actions [..., A] -> log prob [...]. Matches
        MixtureSameFamily(Categorical(logits), Independent(Normal, 1))."""
        x = actions[..., None, :]  # [..., 1, A]
        var = self.scales**2
        comp_lp = -0.5 * (
            ((x - self.means) ** 2) / var + 2.0 * jnp.log(self.scales) + _LOG_2PI
        )
        comp_lp = jnp.sum(comp_lp, axis=-1)  # [..., M]
        mix_lp = jax.nn.log_softmax(self.logits, axis=-1)
        return jax.scipy.special.logsumexp(comp_lp + mix_lp, axis=-1)

    def sample(self, rng, mode=None, eps=None):
        """``mode``/``eps`` optionally inject the categorical pick and the
        standard-normal draw — the determinism seam the BCQ_GMM parity
        harness uses (tests/test_bcq_parity.py)."""
        rng_mode, rng_eps = jax.random.split(rng)
        if mode is None:
            mode = jax.random.categorical(rng_mode, self.logits, axis=-1)
        mean = jnp.take_along_axis(
            self.means, mode[..., None, None], axis=-2
        ).squeeze(-2)
        scale = jnp.take_along_axis(
            self.scales, mode[..., None, None], axis=-2
        ).squeeze(-2)
        if eps is None:
            eps = jax.random.normal(rng_eps, mean.shape)
        return mean + scale * eps

    def mode_mean(self):
        """Mean of the highest-weight mode (greedy action)."""
        mode = jnp.argmax(self.logits, axis=-1)
        return jnp.take_along_axis(
            self.means, mode[..., None, None], axis=-2
        ).squeeze(-2)

    def index_time(self, t):
        """dists[:, t] (the reference rebuilds the distribution for the final
        timestep, icl.py:1483-1497)."""
        return GMMActionDistribution(
            means=self.means[:, t], scales=self.scales[:, t],
            logits=self.logits[:, t],
        )


@flax.struct.dataclass
class TanhWrappedGMM:
    """Tanh-squashed GMM (reference ``TanhWrappedDistribution``
    distributions.py:11-85): y = tanh(x) * scale with log-det correction."""

    base: GMMActionDistribution
    scale: float = 1.0
    tanh_epsilon: float = 1e-6

    def log_prob(self, value):
        value = value / self.scale
        one_plus = jnp.clip(1.0 + value, self.tanh_epsilon, None)
        one_minus = jnp.clip(1.0 - value, self.tanh_epsilon, None)
        pre_tanh = 0.5 * (jnp.log(one_plus) - jnp.log(one_minus))
        # log|d tanh(x)/dx| with the reference's ADDED epsilon
        # (distributions.py:42: log(1 - v*v + eps))
        correction = jnp.sum(
            jnp.log(1.0 - value**2 + self.tanh_epsilon), axis=-1
        )
        return self.base.log_prob(pre_tanh) - correction - (
            value.shape[-1] * jnp.log(jnp.asarray(self.scale))
        )

    def sample(self, rng):
        return jnp.tanh(self.base.sample(rng)) * self.scale


@flax.struct.dataclass
class TanhWrappedGaussian:
    """Tanh-squashed diagonal Gaussian (reference
    ``TanhWrappedDistribution`` over an Independent Normal,
    distributions.py:11-85): y = tanh(x) * scale. ``log_prob`` follows the
    reference exactly: atanh recovered via clamped (1±v) when no pre-tanh
    value is given, and the squash correction is ``log(1 - v^2 + eps)``
    (epsilon ADDED, the rlkit/CQL convention, distributions.py:42)."""

    base: "DiagGaussian"
    scale: float = 1.0
    tanh_epsilon: float = 1e-6

    def log_prob(self, value, pre_tanh_value=None):
        value = value / self.scale
        if pre_tanh_value is None:
            one_plus = jnp.clip(1.0 + value, self.tanh_epsilon, None)
            one_minus = jnp.clip(1.0 - value, self.tanh_epsilon, None)
            pre_tanh_value = 0.5 * jnp.log(one_plus / one_minus)
        lp = self.base.log_prob(pre_tanh_value)
        correction = jnp.sum(
            jnp.log(1.0 - value**2 + self.tanh_epsilon), axis=-1
        )
        # the reference's base dist sums log-probs (Independent), so the
        # x/scale jacobian term folds into a constant the reference drops
        # for scale=1; keep its exact form
        if self.scale != 1.0:
            correction = correction + value.shape[-1] * jnp.log(
                jnp.asarray(self.scale)
            )
        return lp - correction

    def sample(self, rng):
        return jnp.tanh(self.base.sample(rng)) * self.scale

    def rsample_with_pretanh(self, rng, sample_shape=(), eps=None):
        """Reparameterized sample + its pre-tanh value (reference
        ``rsample(..., return_pretanh_value=True)``).

        ``eps`` optionally injects the standard-normal draw (shape
        ``sample_shape + mean.shape``) — the determinism seam the CQL/BCQ
        parity harnesses use to feed both frameworks identical noise."""
        shape = tuple(sample_shape) + self.base.mean.shape
        if eps is None:
            eps = jax.random.normal(rng, shape)
        z = self.base.mean + self.base.scale * eps
        return jnp.tanh(z) * self.scale, z

    @property
    def mean(self):
        return self.base.mean


@flax.struct.dataclass
class DiagGaussian:
    """Independent Normal over actions (Gaussian policy heads)."""

    mean: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, actions):
        var = self.scale**2
        lp = -0.5 * (
            ((actions - self.mean) ** 2) / var + 2.0 * jnp.log(self.scale) + _LOG_2PI
        )
        return jnp.sum(lp, axis=-1)

    def sample(self, rng):
        return self.mean + self.scale * jax.random.normal(rng, self.mean.shape)

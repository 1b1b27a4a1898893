"""Loss helpers (reference ``robomimic/utils/loss_utils.py``)."""

import jax
import jax.numpy as jnp


def cosine_loss(preds, labels, eps=1e-8):
    """-mean(cos_sim - 1) over the last axis (reference loss_utils.py:11-23).

    torch CosineSimilarity clamps each norm at eps."""
    dot = jnp.sum(preds * labels, axis=-1)
    np_ = jnp.maximum(jnp.linalg.norm(preds, axis=-1), eps)
    nl = jnp.maximum(jnp.linalg.norm(labels, axis=-1), eps)
    sim = dot / (np_ * nl)
    return -jnp.mean(sim - 1.0)


def smooth_l1_loss(pred, target, beta=1.0):
    """torch.nn.SmoothL1Loss (mean reduction)."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def kld_0_1_loss(mu, logvar):
    """D_KL(N(mu, sigma) || N(0, 1)): mean over batch, sum over dims
    (reference loss_utils.py:26-41)."""
    return -0.5 * jnp.mean(
        jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    )


def kld_gaussian_loss(mu_1, logvar_1, mu_2, logvar_2):
    """D_KL(N1 || N2), mean over batch, sum over dims (reference :42-62)."""
    term = (
        logvar_2
        - logvar_1
        + (jnp.exp(logvar_1) + (mu_1 - mu_2) ** 2) / jnp.exp(logvar_2)
        - 1.0
    )
    return 0.5 * jnp.mean(jnp.sum(term, axis=-1))


def log_normal(x, m, v):
    """Elementwise log N(x; m, v), summed over the last dim (reference :63-82)."""
    import math

    lp = -0.5 * (jnp.log(2.0 * math.pi) + jnp.log(v) + (x - m) ** 2 / v)
    return jnp.sum(lp, axis=-1)


def project_values_onto_atoms(values, probabilities, atoms):
    """Categorical (C51) projection of a target distribution onto a fixed
    atom grid (reference loss_utils.py:154-200).

    values [B, N], probabilities [B, N], atoms [A] -> projected probs [B, A].
    """
    vmin, vmax = atoms[0], atoms[-1]
    d = atoms[1] - atoms[0]
    clipped = jnp.clip(values, vmin, vmax)           # [B, N]
    b = (clipped - vmin) / d                         # fractional atom index
    lower = jnp.floor(b).astype(jnp.int32)
    upper = jnp.ceil(b).astype(jnp.int32)
    # handle exact-atom hits (lower == upper)
    eq = (upper == lower).astype(probabilities.dtype)
    ml = probabilities * (jnp.ceil(b) - b + eq)
    mu = probabilities * (b - jnp.floor(b))
    num_atoms = atoms.shape[0]

    def scatter(idx, weights):
        onehot = jax.nn.one_hot(idx, num_atoms, dtype=weights.dtype)
        return jnp.einsum("bn,bna->ba", weights, onehot)

    return scatter(lower, ml) + scatter(upper, mu)


def log_normal_mixture(x, m, v, w=None, log_w=None):
    """Log prob under a mixture of Gaussians (reference :83-121)."""
    comp = log_normal(x[..., None, :], m, v)  # [..., M]
    if log_w is None:
        log_w = jnp.log(w) if w is not None else -jnp.log(comp.shape[-1])
    return jax.scipy.special.logsumexp(comp + log_w, axis=-1)

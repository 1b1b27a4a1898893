"""Loss-utility parity vs torch (reference ``robomimic/utils/loss_utils.py``
uses torch primitives; these check the JAX reimplementations against them)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils


def test_smooth_l1_matches_torch():
    rng = np.random.RandomState(0)
    a = rng.randn(32, 7).astype(np.float32)
    b = rng.randn(32, 7).astype(np.float32)
    ours = float(LossUtils.smooth_l1_loss(a, b))
    theirs = float(
        torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(a), torch.from_numpy(b)
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_cosine_loss_matches_torch():
    rng = np.random.RandomState(1)
    a = rng.randn(16, 9).astype(np.float32)
    b = rng.randn(16, 9).astype(np.float32)
    ours = float(LossUtils.cosine_loss(a, b))
    sim = torch.nn.CosineSimilarity(dim=-1)(
        torch.from_numpy(a), torch.from_numpy(b)
    )
    theirs = float(-(sim - 1.0).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_kld_0_1_matches_torch_distributions():
    rng = np.random.RandomState(2)
    mu = rng.randn(8, 4).astype(np.float32)
    logvar = rng.randn(8, 4).astype(np.float32)
    ours = float(LossUtils.kld_0_1_loss(mu, logvar))
    p = torch.distributions.Normal(
        torch.from_numpy(mu), torch.from_numpy(np.exp(0.5 * logvar))
    )
    q = torch.distributions.Normal(
        torch.zeros_like(p.loc), torch.ones_like(p.scale)
    )
    theirs = float(
        torch.distributions.kl_divergence(p, q).sum(-1).mean()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_kld_gaussian_matches_torch_distributions():
    rng = np.random.RandomState(3)
    mu1, lv1 = rng.randn(8, 4).astype(np.float32), rng.randn(8, 4).astype(np.float32)
    mu2, lv2 = rng.randn(8, 4).astype(np.float32), rng.randn(8, 4).astype(np.float32)
    ours = float(LossUtils.kld_gaussian_loss(mu1, lv1, mu2, lv2))
    p = torch.distributions.Normal(
        torch.from_numpy(mu1), torch.from_numpy(np.exp(0.5 * lv1))
    )
    q = torch.distributions.Normal(
        torch.from_numpy(mu2), torch.from_numpy(np.exp(0.5 * lv2))
    )
    theirs = float(torch.distributions.kl_divergence(p, q).sum(-1).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_log_normal_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(8, 4).astype(np.float32)
    m = rng.randn(8, 4).astype(np.float32)
    v = np.exp(rng.randn(8, 4).astype(np.float32))
    ours = np.asarray(LossUtils.log_normal(x, m, v))
    dist = torch.distributions.Normal(
        torch.from_numpy(m), torch.from_numpy(np.sqrt(v))
    )
    theirs = dist.log_prob(torch.from_numpy(x)).sum(-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)

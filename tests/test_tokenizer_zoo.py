"""Tokenizer-zoo tests: plain VQVAE parity vs the reference torch module,
LFQ/LSTM/EMA variants, bin-tokenizer parity, PRISE BPE roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import load_module, load_bin_reference

F_DIM, L_DIM, K = 12, 16, 32


@pytest.mark.slow
def test_plain_vqvae_parity():
    """Forward parity of the plain VQ-VAE against the reference torch module
    (reference robomimic/models/vq_vae/backbone.py)."""
    ref = load_module(
        "/root/reference/robomimic/models/vq_vae/backbone.py", "ref_vqvae_backbone"
    )
    torch.manual_seed(0)
    tm = ref.VQVAE(F_DIM, L_DIM, num_embeddings=K)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from robot_manipulation_vq_vae_tpu.models.tokenizers import VQVAE

    model = VQVAE(feature_dim=F_DIM, latent_dim=L_DIM, num_embeddings=K)
    params = {
        "enc1": {"kernel": sd["encoder.0.weight"].T, "bias": sd["encoder.0.bias"]},
        "enc2": {"kernel": sd["encoder.2.weight"].T, "bias": sd["encoder.2.bias"]},
        "enc3": {"kernel": sd["encoder.4.weight"].T, "bias": sd["encoder.4.bias"]},
        "dec1": {"kernel": sd["decoder.0.weight"].T, "bias": sd["decoder.0.bias"]},
        "dec2": {"kernel": sd["decoder.2.weight"].T, "bias": sd["decoder.2.bias"]},
        "dec3": {"kernel": sd["decoder.4.weight"].T, "bias": sd["decoder.4.bias"]},
        "codebook": sd["embedding.weight"],
    }
    variables = jax.tree_util.tree_map(jnp.asarray, {"params": params})

    x = np.random.RandomState(0).randn(40, F_DIM).astype(np.float32)
    with torch.no_grad():
        z_t, loss_t = tm(torch.from_numpy(x))
    z_j, loss_j = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-5, rtol=1e-4)


def test_bin_tokenizer_parity():
    """Bucketize + running-stats parity vs the reference
    AdaptiveBinActionEmbedding (robomimic/models/bin_action/backbone.py)."""
    ref = load_bin_reference()
    torch.manual_seed(0)
    tm = ref.AdaptiveBinActionEmbedding(
        action_dim=4, output_dim=8, num_bins=5, embedding_dim=6
    )
    tm.eval()

    from robot_manipulation_vq_vae_tpu.models.tokenizers import (
        AdaptiveBinActionEmbedding,
    )

    model = AdaptiveBinActionEmbedding(
        action_dim=4, output_dim=8, num_bins=5, embedding_dim=6
    )
    rng = np.random.RandomState(1)
    x1 = rng.randn(16, 4).astype(np.float32)
    x2 = rng.randn(16, 4).astype(np.float32)

    # run torch twice (stats update across calls)
    with torch.no_grad():
        tm(torch.from_numpy(x1))
        tm(torch.from_numpy(x2))

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    _, mut = model.apply(
        variables, jnp.asarray(x1), update_stats=True, mutable=["bin_stats"]
    )
    variables = {**variables, "bin_stats": mut["bin_stats"]}
    _, mut = model.apply(
        variables, jnp.asarray(x2), update_stats=True, mutable=["bin_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(mut["bin_stats"]["running_min"]),
        tm.running_min.numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mut["bin_stats"]["running_max"]),
        tm.running_max.numpy(), atol=1e-6,
    )

    # discretization parity on the final stats
    with torch.no_grad():
        idx_t = tm.discretize(torch.from_numpy(x2)).numpy()
    lo = np.asarray(mut["bin_stats"]["running_min"])
    hi = np.asarray(mut["bin_stats"]["running_max"])
    boundaries = lo[:, None] + (hi - lo)[:, None] * np.linspace(0, 1, 6)[None]
    idx_j = np.stack(
        [
            np.clip(np.searchsorted(boundaries[i], x2[:, i], side="left") - 1, 0, 4)
            for i in range(4)
        ],
        axis=1,
    )
    np.testing.assert_array_equal(idx_j, idx_t)


@pytest.mark.slow
def test_lfqvae_and_lstm_forward():
    from robot_manipulation_vq_vae_tpu.models.tokenizers import LFQVAE, LSTMVQVAE

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(10, F_DIM).astype(np.float32))
    m = LFQVAE(feature_dim=F_DIM, latent_dim=L_DIM)
    v = m.init(jax.random.PRNGKey(0), x)
    z, loss = m.apply(v, x)
    assert z.shape == (10, L_DIM)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(z, axis=-1)), 1.0, atol=1e-5
    )

    xs = jnp.asarray(rng.randn(2, 5, F_DIM).astype(np.float32))
    m2 = LSTMVQVAE(feature_dim=F_DIM, latent_dim=L_DIM, num_embeddings=8)
    v2 = m2.init(jax.random.PRNGKey(0), xs)
    z2, loss2 = m2.apply(v2, xs)
    assert z2.shape == (10, L_DIM)
    assert np.isfinite(float(loss2))


def test_ema_kmeans_quantizer():
    from robot_manipulation_vq_vae_tpu.models.tokenizers import (
        LFQQuantizerEMA_KMeans,
    )

    m = LFQQuantizerEMA_KMeans(num_codes=8, code_dim=4, dead_threshold=0.1)
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(64, 4).astype(np.float32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        z, training=False,
    )
    (z_q, idx), mut = m.apply(
        variables, z, training=True, mutable=["vq"],
        rngs={"vq": jax.random.PRNGKey(2)},
    )
    vq = mut["vq"]
    assert bool(vq["initialized"])
    assert float(jnp.sum(vq["usage_counts"])) == 64
    assert float(vq["entropy_ma"]) > 0
    assert z_q.shape == z.shape


@pytest.mark.slow
def test_hierarchical_lfq():
    from robot_manipulation_vq_vae_tpu.models.tokenizers import (
        HierarchicalLFQHVQVAE,
    )

    m = HierarchicalLFQHVQVAE(
        feature_dim=F_DIM, z_dim=8, q_dim=8, num_z_codes=16, num_q_codes=8,
        hidden_dim=16,
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(32, F_DIM).astype(np.float32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        x, training=False,
    )
    (q_q, loss), mut = m.apply(
        variables, x, training=True, mutable=["vq"],
        rngs={"vq": jax.random.PRNGKey(2)},
    )
    assert q_q.shape == (32, 8)
    assert np.isfinite(float(loss))


def test_prise_bpe_roundtrip():
    pytest.importorskip("tokenizers")
    from robot_manipulation_vq_vae_tpu.models.tokenizers.prise import (
        PriseActionTokenizer,
    )

    tok = PriseActionTokenizer(algo="bpe", vocab_size=50)
    rng = np.random.RandomState(5)
    corpus = [list(rng.randint(0, 10, size=20)) for _ in range(30)]
    corpus = [[int(x) for x in seq] for seq in corpus]
    tok.train(corpus, min_frequency=1, max_token_length=8)
    seq = corpus[0]
    ids = tok.encode(seq)
    decoded = tok.decode(ids)
    assert decoded == seq
    assert len(ids) <= len(seq)  # compression

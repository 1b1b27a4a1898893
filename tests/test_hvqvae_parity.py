"""Parity of the hierarchical VQ-VAE (MSTCN) against the reference torch
module: eval-mode forward (conv stacks, cosine assignments, STE values,
reconstruction, losses) and the EMA update math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import load_hvqvae_reference
from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
    HierarchicalVQVAE,
    compute_vqvae_loss,
    get_codebook_usage,
)

A_DIM = 12
E_DIM = 32
KZ = 16
KQ = 8
STAGES = 1
LAYERS = 3


@pytest.fixture(scope="module")
def ref():
    return load_hvqvae_reference()


@pytest.fixture(scope="module")
def torch_model(ref):
    torch.manual_seed(0)
    m = ref.HierarchicalVQVAE(
        action_dim=A_DIM,
        embed_dim=E_DIM,
        num_subclusters=KZ,
        num_clusters=KQ,
        num_stages=STAGES,
        num_layers_per_stage=LAYERS,
        dropout=0.0,
        kmeans_init=False,
    )
    # mark codebooks as initialized with random normalized prototypes
    with torch.no_grad():
        m.codebook_z.copy_(
            torch.nn.functional.normalize(torch.randn(KZ, E_DIM), dim=-1)
        )
        m.codebook_q.copy_(
            torch.nn.functional.normalize(torch.randn(KQ, E_DIM), dim=-1)
        )
        m.codebooks_initialized.fill_(True)
    m.eval()
    return m


def _mstcn_params(prefix, sd, num_stages, num_layers):
    stages = {}
    for s in range(num_stages):
        layers = {}
        for i in range(num_layers):
            conv_w = sd[f"{prefix}.stages.{s}.layers.{i}.conv.weight"]  # [out,in,k]
            layers[f"layer{i}"] = {
                "conv": {
                    "kernel": np.transpose(conv_w, (2, 1, 0)),
                    "bias": sd[f"{prefix}.stages.{s}.layers.{i}.conv.bias"],
                }
            }
        stages[f"stage{s}"] = layers
    return stages


def torch_to_flax(m):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    enc = {
        "input_projection": {
            "kernel": sd["encoder.input_projection.weight"].T,
            "bias": sd["encoder.input_projection.bias"],
        },
        "ln": {"scale": sd["encoder.ln.weight"], "bias": sd["encoder.ln.bias"]},
    }
    enc.update(_mstcn_params("encoder", sd, STAGES, LAYERS))
    dec = {
        "output_projection": {
            "kernel": sd["decoder.output_projection.weight"].T,
            "bias": sd["decoder.output_projection.bias"],
        }
    }
    dec.update(_mstcn_params("decoder", sd, STAGES, LAYERS))
    params = {"encoder": enc, "decoder": dec}
    vq = {
        "codebook_z": sd["codebook_z"],
        "codebook_q": sd["codebook_q"],
        "cluster_size_z": sd["cluster_size_z"],
        "embed_avg_z": sd["embed_avg_z"],
        "cluster_size_q": sd["cluster_size_q"],
        "embed_avg_q": sd["embed_avg_q"],
        "initialized": np.asarray(True),
    }
    return jax.tree_util.tree_map(jnp.asarray, {"params": params, "vq": vq})


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    model = HierarchicalVQVAE(
        action_dim=A_DIM,
        embed_dim=E_DIM,
        num_subclusters=KZ,
        num_clusters=KQ,
        num_stages=STAGES,
        num_layers_per_stage=LAYERS,
        dropout=0.0,
        kmeans_init=False,
    )
    return model, torch_to_flax(torch_model)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1)
    return rng.randn(4, 10, A_DIM).astype(np.float32)


def test_eval_forward_parity(torch_model, flax_setup, batch):
    model, variables = flax_setup
    with torch.no_grad():
        out_t = torch_model(torch.from_numpy(batch), training=False)
    out_j = model.apply(variables, jnp.asarray(batch), training=False)

    np.testing.assert_allclose(
        np.asarray(out_j["embeddings"]),
        out_t["embeddings"].numpy(),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(out_j["z_indices"]), out_t["z_indices"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(out_j["q_indices"]), out_t["q_indices"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out_j["quantized_q"]),
        out_t["quantized_q"].numpy(),
        atol=1e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out_j["reconstructed_actions"]),
        out_t["reconstructed_actions"].numpy(),
        atol=5e-4, rtol=1e-2,
    )


def test_loss_parity(torch_model, flax_setup, batch):
    model, variables = flax_setup
    x_t = torch.from_numpy(batch)
    with torch.no_grad():
        out_t = torch_model(x_t, training=False)
        losses_t = torch_model.compute_vqvae_loss(out_t, x_t, lambda_rec=1.0)
    out_j = model.apply(variables, jnp.asarray(batch), training=False)
    losses_j = compute_vqvae_loss(
        out_j, jnp.asarray(batch), commitment_cost=1.0, lambda_rec=1.0
    )
    for k in ("vqvae_loss", "L_rec", "L_commit_z", "L_commit_q"):
        np.testing.assert_allclose(
            float(losses_j[k]), float(losses_t[k]), atol=1e-5, rtol=1e-4
        )


def test_ema_update_math_parity(ref, torch_model):
    """EMA counts/sums/prototype math must match reference _ema_update."""
    from robot_manipulation_vq_vae_tpu.ops import quantize as Q

    rng = np.random.RandomState(5)
    flat = rng.randn(64, E_DIM).astype(np.float32)
    idx = rng.randint(0, KZ, size=(64,))

    size_t = torch.rand(KZ)
    avg_t = torch.randn(KZ, E_DIM)
    cb_t = torch.randn(KZ, E_DIM)
    size0, avg0 = size_t.numpy().copy(), avg_t.numpy().copy()

    torch_model._ema_update(
        torch.from_numpy(flat), torch.from_numpy(idx), avg_t, size_t, cb_t
    )
    new_size, new_avg, new_cb = Q.ema_update(
        jnp.asarray(flat), jnp.asarray(idx),
        jnp.asarray(size0), jnp.asarray(avg0),
        decay=torch_model.ema_decay, eps=torch_model.eps, normalize=True,
    )
    np.testing.assert_allclose(np.asarray(new_size), size_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_avg), avg_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_cb), cb_t.numpy(), atol=1e-4)


def test_training_step_updates_state(flax_setup, batch):
    """Training forward under mutable=['vq'] updates EMA stats and flips
    the initialized flag; shapes stay static (jit-compatible)."""
    model, variables = flax_setup
    fresh_vq = dict(variables["vq"])
    fresh_vq["initialized"] = jnp.zeros((), jnp.bool_)
    fresh_vq["cluster_size_z"] = jnp.zeros((KZ,))
    fresh_vq["cluster_size_q"] = jnp.zeros((KQ,))
    vars2 = {"params": variables["params"], "vq": fresh_vq}

    @jax.jit
    def step(v, x, rng):
        out, mutated = model.apply(
            v, x, training=True,
            mutable=["vq"],
            rngs={"dropout": jax.random.fold_in(rng, 0),
                  "vq": jax.random.fold_in(rng, 1)},
        )
        return out, mutated

    out, mutated = step(vars2, jnp.asarray(batch), jax.random.PRNGKey(0))
    vq = mutated["vq"]
    assert bool(vq["initialized"])
    assert float(jnp.sum(vq["cluster_size_z"])) > 0
    usage = get_codebook_usage(vq)
    assert usage["z_used"] > 0 and usage["q_used"] > 0
    # k-means init + dead-code replacement should leave no dead Z codes
    assert out["reconstructed_actions"].shape == batch.shape


def test_tokenize_detokenize_roundtrip(flax_setup, batch):
    model, variables = flax_setup
    z_idx, q_idx = model.apply(
        variables, jnp.asarray(batch), method=model.encode_indices
    )
    assert z_idx.shape == batch.shape[:2]
    recon = model.apply(variables, q_idx, method=model.decode_q_indices)
    assert recon.shape == batch.shape
    # must equal full forward reconstruction (eval mode)
    out = model.apply(variables, jnp.asarray(batch), training=False)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(out["reconstructed_actions"]), atol=1e-5
    )


def test_jitted_kmeans_quality():
    """In-graph kmeans should produce near-complete batch coverage and
    materially lower inertia than random assignment."""
    from robot_manipulation_vq_vae_tpu.ops import quantize as Q

    rng = np.random.RandomState(0)
    centers_true = rng.randn(8, 16).astype(np.float32) * 5
    data = np.concatenate(
        [centers_true[i] + 0.1 * rng.randn(50, 16).astype(np.float32) for i in range(8)]
    )
    centers, assign = Q.kmeans(jax.random.PRNGKey(0), jnp.asarray(data), 8, 50)
    d = np.asarray(Q.l2_distance_sq(jnp.asarray(data), centers))
    inertia = d[np.arange(len(data)), np.asarray(assign)].mean()
    assert inertia < 1.0  # clusters are tight; random init would be >> 1
    assert len(np.unique(np.asarray(assign))) >= 7


@pytest.mark.slow
def test_gradient_topology_parity(torch_model, flax_setup, batch):
    """STE gradient routing: grads of the full VQ-VAE loss w.r.t. encoder
    input-projection and decoder output-projection weights must match torch
    (eval-mode forward: no EMA mutation, no dropout)."""
    x_t = torch.from_numpy(batch)
    torch_model.zero_grad()
    out_t = torch_model(x_t, training=False)
    losses_t = torch_model.compute_vqvae_loss(out_t, x_t, lambda_rec=1.0)
    losses_t["vqvae_loss"].backward()
    g_enc_t = torch_model.encoder.input_projection.weight.grad.numpy()
    g_dec_t = torch_model.decoder.output_projection.weight.grad.numpy()

    model, variables = flax_setup

    def loss_fn(params):
        out = model.apply(
            {"params": params, "vq": variables["vq"]},
            jnp.asarray(batch), training=False,
        )
        losses = compute_vqvae_loss(
            out, jnp.asarray(batch), commitment_cost=1.0, lambda_rec=1.0
        )
        return losses["vqvae_loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        np.asarray(grads["encoder"]["input_projection"]["kernel"]).T,
        g_enc_t, atol=5e-4, rtol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(grads["decoder"]["output_projection"]["kernel"]).T,
        g_dec_t, atol=5e-4, rtol=1e-2,
    )

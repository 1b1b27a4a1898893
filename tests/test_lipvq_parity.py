"""Bit-level parity of the LipVQ-VAE tokenizer against the reference torch
module (loaded directly from the read-only reference mount).

Checks: code assignments identical, reconstruction/loss allclose, gradient
topology identical (encoder learns only via commitment; codebook via
codebook-loss and decoder path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_loader import load_lipvq_reference
from robot_manipulation_vq_vae_tpu.models.tokenizers import LipVQVAE

FEATURE_DIM = 12
LATENT_DIM = 208
NUM_CODES = 128
HIDDEN = 128


@pytest.fixture(scope="module")
def ref():
    return load_lipvq_reference()


@pytest.fixture(scope="module")
def torch_model(ref):
    torch.manual_seed(0)
    m = ref.LLFQVAE_V4(FEATURE_DIM, LATENT_DIM, NUM_CODES, hidden_dim=HIDDEN)
    m.eval()
    return m


def torch_params_to_flax(m):
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return {
        "params": {
            "enc1": {"kernel": sd["encoder.0.weight"].T, "bias": sd["encoder.0.bias"]},
            "enc2": {"kernel": sd["encoder.2.weight"].T, "bias": sd["encoder.2.bias"]},
            "to_latent": {
                "W": sd["to_latent.W"],
                "b": sd["to_latent.b"],
                "ci": sd["to_latent.ci"],
            },
            "quantizer": {"codebook": sd["quantizer.codebook"]},
            "dec1": {"kernel": sd["decoder.0.weight"].T, "bias": sd["decoder.0.bias"]},
            "dec2": {"kernel": sd["decoder.2.weight"].T, "bias": sd["decoder.2.bias"]},
            "to_output": {
                "kernel": sd["to_output.weight"].T,
                "bias": sd["to_output.bias"],
            },
        }
    }


@pytest.fixture(scope="module")
def flax_setup(torch_model):
    model = LipVQVAE(
        feature_dim=FEATURE_DIM,
        latent_dim=LATENT_DIM,
        num_codes=NUM_CODES,
        hidden_dim=HIDDEN,
        use_pallas=False,
    )
    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_params_to_flax(torch_model)
    )
    return model, variables


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(42)
    return rng.randn(80, FEATURE_DIM).astype(np.float32)


def test_forward_parity(torch_model, flax_setup, batch):
    model, variables = flax_setup
    with torch.no_grad():
        z_t, loss_t = torch_model(torch.from_numpy(batch))
    z_j, loss_j = model.apply(variables, jnp.asarray(batch))
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-5, rtol=1e-5)


def test_assignment_parity(torch_model, flax_setup, batch):
    model, variables = flax_setup
    x_t = torch.from_numpy(batch)
    with torch.no_grad():
        h = torch_model.encoder(x_t)
        z_e = torch_model.to_latent(h)
        _, idx_t = torch_model.quantizer(z_e)
    _, idx_j = model.apply(variables, jnp.asarray(batch), method=model.encode)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())


def test_roundtrip_recon_parity(torch_model, flax_setup, batch):
    model, variables = flax_setup
    x_t = torch.from_numpy(batch)
    with torch.no_grad():
        h = torch_model.encoder(x_t)
        z_e = torch_model.to_latent(h)
        z_q, idx_t = torch_model.quantizer(z_e)
        recon_t = torch_model.to_output(torch_model.decoder(z_q))
    recon_j, idx_j = model.apply(variables, jnp.asarray(batch), method=model.roundtrip)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())
    np.testing.assert_allclose(np.asarray(recon_j), recon_t.numpy(), atol=5e-4, rtol=1e-2)

    # detokenize-from-indices must reproduce the same reconstruction
    recon_d = model.apply(variables, idx_j, method=model.decode_codes)
    np.testing.assert_allclose(np.asarray(recon_d), np.asarray(recon_j), atol=1e-6)


@pytest.mark.slow
def test_gradient_topology_parity(torch_model, flax_setup, batch):
    """The reference has NO straight-through on the decoder path: encoder
    gradients flow only through the commitment loss. Verify our gradients
    match torch's end to end."""
    model, variables = flax_setup

    x_t = torch.from_numpy(batch)
    torch_model.zero_grad()
    _, loss_t = torch_model(x_t)
    loss_t.backward()
    g_enc_t = torch_model.encoder[0].weight.grad.numpy()
    g_cb_t = torch_model.quantizer.codebook.grad.numpy()
    g_dec_t = torch_model.decoder[0].weight.grad.numpy()

    def loss_fn(params):
        _, loss = model.apply({"params": params}, jnp.asarray(batch))
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    np.testing.assert_allclose(
        np.asarray(grads["enc1"]["kernel"]).T, g_enc_t, atol=2e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(grads["quantizer"]["codebook"]), g_cb_t, atol=2e-5, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(grads["dec1"]["kernel"]).T, g_dec_t, atol=2e-5, rtol=1e-3
    )


def test_pallas_kernel_interpret_matches_xla(flax_setup, batch):
    """Pallas fused assign kernel (interpreter mode on CPU) == XLA path."""
    from robot_manipulation_vq_vae_tpu.ops.pallas.lipvq_kernel import (
        l2_nearest_pallas,
    )
    from robot_manipulation_vq_vae_tpu.ops import quantize as Q

    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(100, 64).astype(np.float32))
    cb = jnp.asarray(rng.randn(128, 64).astype(np.float32))
    idx_x, zq_x = Q.l2_nearest(z, cb)
    idx_p, zq_p = l2_nearest_pallas(z, cb, 64, True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(zq_p), np.asarray(zq_x), atol=1e-6)


def test_pallas_kernel_gradient():
    """Custom VJP: codebook grad is the scatter-add of output cotangents."""
    from robot_manipulation_vq_vae_tpu.ops.pallas.lipvq_kernel import (
        l2_nearest_pallas,
    )

    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    cb = jnp.asarray(rng.randn(8, 16).astype(np.float32))

    def f_pallas(cb):
        _, zq = l2_nearest_pallas(z, cb, 32, True)
        return jnp.sum(zq**2)

    def f_xla(cb):
        idx = jnp.argmin(
            jnp.sum((z[:, None, :] - cb[None, :, :]) ** 2, axis=-1), axis=-1
        )
        zq = jnp.take(cb, idx, axis=0)
        return jnp.sum(zq**2)

    g_p = jax.grad(f_pallas)(cb)
    g_x = jax.grad(f_xla)(cb)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-5)


def test_fused_roundtrip_kernel_matches_standard(flax_setup, batch):
    """The fused Pallas megakernel (interpret mode on CPU) must reproduce the
    standard roundtrip: identical assignments (away from code boundaries) and
    reconstructions within the tanh-GELU approximation tolerance."""
    from robot_manipulation_vq_vae_tpu.ops.pallas import lipvq_kernel as K

    model, variables = flax_setup
    x = jnp.asarray(batch)
    recon_std, idx_std = model.apply(variables, x, method=model.roundtrip)

    p = variables["params"]
    W = p["to_latent"]["W"]
    ci = p["to_latent"]["ci"]
    absrowsum = jnp.sum(jnp.abs(W), axis=1, keepdims=True)
    scale = jnp.minimum(1.0, jax.nn.softplus(ci)[:, None] / absrowsum)
    wl = (W * scale).T
    recon_f, idx_f = K.lipvq_roundtrip_pallas(
        x,
        enc_w=((p["enc1"]["kernel"], p["enc1"]["bias"]),
               (p["enc2"]["kernel"], p["enc2"]["bias"])),
        lip_w=(wl, p["to_latent"]["b"]),
        codebook=p["quantizer"]["codebook"],
        dec_w=((p["dec1"]["kernel"], p["dec1"]["bias"]),
               (p["dec2"]["kernel"], p["dec2"]["bias"]),
               (p["to_output"]["kernel"], p["to_output"]["bias"])),
        block_n=64,
        interpret=True,
    )
    match = np.mean(np.asarray(idx_f) == np.asarray(idx_std))
    assert match > 0.95, match  # tanh-GELU may flip boundary assignments
    same = np.asarray(idx_f) == np.asarray(idx_std)
    np.testing.assert_allclose(
        np.asarray(recon_f)[same], np.asarray(recon_std)[same],
        atol=5e-3, rtol=5e-2,
    )

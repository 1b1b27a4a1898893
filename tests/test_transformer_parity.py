"""GPT backbone parity vs the reference torch implementation, and
checkpoint-converter coverage (the reference's base_nets imports torchvision,
which is absent here - stubbed since the GPT path never touches it)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_transformers():
    # stub torchvision via the shared helper (only ResNet classes use it;
    # GPT path does not). The shared stub carries a real __spec__ so a
    # later `import transformers` elsewhere in the suite doesn't choke on
    # a spec-less module (order-dependent failure otherwise).
    from tests.reference_loader import ensure_torchvision_stub

    ensure_torchvision_stub()
    # minimal package context so reference-relative imports resolve
    sys.path.insert(0, "/root/reference")
    import importlib

    mod = importlib.import_module("robomimic.models.transformers")
    return mod


EMBED, HEADS, LAYERS, T, B = 32, 4, 2, 6, 3


@pytest.fixture(scope="module")
def models(ref_transformers):
    torch.manual_seed(0)
    tm = ref_transformers.GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=False,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=LAYERS, num_heads=HEADS,
    )
    tm.eval()

    from robot_manipulation_vq_vae_tpu.models.transformers import GPT_Backbone
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_gpt_backbone,
    )

    jm = GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=False,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=LAYERS, num_heads=HEADS,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_gpt_backbone(sd, prefix="", num_layers=LAYERS)
    variables = jax.tree_util.tree_map(jnp.asarray, {"params": params})
    return tm, jm, variables


def test_gpt_backbone_parity(models):
    tm, jm, variables = models
    x = np.random.RandomState(0).randn(B, T, EMBED).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x))
    out_j = jm.apply(variables, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=2e-5, rtol=1e-3
    )


def test_gpt_backbone_causal_parity(ref_transformers):
    torch.manual_seed(1)
    tm = ref_transformers.GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=True,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=1, num_heads=HEADS,
    )
    tm.eval()
    from robot_manipulation_vq_vae_tpu.models.transformers import GPT_Backbone
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_gpt_backbone,
    )

    jm = GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=True,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=1, num_heads=HEADS,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_gpt_backbone(sd, prefix="", num_layers=1)
    variables = jax.tree_util.tree_map(jnp.asarray, {"params": params})
    x = np.random.RandomState(2).randn(B, T, EMBED).astype(np.float32)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x))
    out_j = jm.apply(variables, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), atol=2e-5, rtol=1e-3
    )
    # causality: perturbing a late token must not change earlier outputs
    x2 = x.copy()
    x2[:, -1] += 1.0
    out_j2 = jm.apply(variables, jnp.asarray(x2), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_j[:, :-1]), np.asarray(out_j2[:, :-1]), atol=1e-6
    )

"""MVPConv / VisionTransformer: converted MAE-ViT trunk parity against a
step-by-step torch re-execution (reference ``robomimic/models/base_nets.py``
:1187-1272 wraps ``mvp.load`` - a timm/MAE ViT returning the CLS feature)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models.base_nets import (
    MVPConv,
    VisionTransformer,
)
from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import convert_mvp_vit

D, DEPTH, HEADS, P, IMG = 32, 2, 4, 8, 24  # tiny ViT for the numerics


def make_vit_sd(dim=D, depth=DEPTH, img=IMG, patch=P, seed=0, scale=0.05):
    rng = np.random.RandomState(seed)
    n = (img // patch) ** 2
    sd = {
        "patch_embed.proj.weight":
            rng.randn(dim, 3, patch, patch).astype(np.float32) * scale,
        "patch_embed.proj.bias": rng.randn(dim).astype(np.float32) * scale,
        "cls_token": rng.randn(1, 1, dim).astype(np.float32) * scale,
        "pos_embed": rng.randn(1, n + 1, dim).astype(np.float32) * scale,
        "norm.weight": 1.0 + rng.randn(dim).astype(np.float32) * scale,
        "norm.bias": rng.randn(dim).astype(np.float32) * scale,
    }

    def lin(prefix, dout, din):
        sd[f"{prefix}.weight"] = rng.randn(dout, din).astype(np.float32) * scale
        sd[f"{prefix}.bias"] = rng.randn(dout).astype(np.float32) * scale

    for i in range(depth):
        b = f"blocks.{i}"
        for nrm in ("norm1", "norm2"):
            sd[f"{b}.{nrm}.weight"] = (
                1.0 + rng.randn(dim).astype(np.float32) * scale
            )
            sd[f"{b}.{nrm}.bias"] = rng.randn(dim).astype(np.float32) * scale
        lin(f"{b}.attn.qkv", 3 * dim, dim)
        lin(f"{b}.attn.proj", dim, dim)
        lin(f"{b}.mlp.fc1", 4 * dim, dim)
        lin(f"{b}.mlp.fc2", dim, 4 * dim)
    return sd


def torch_vit_forward(sd, x_nchw, dim=D, depth=DEPTH, heads=HEADS, patch=P):
    """Timm/MAE ViT encoder forward -> normed CLS feature."""
    t = lambda k: torch.from_numpy(sd[k])
    x = torch.from_numpy(x_nchw)
    b = x.shape[0]
    x = F.conv2d(x, t("patch_embed.proj.weight"),
                 t("patch_embed.proj.bias"), stride=patch)
    x = x.flatten(2).transpose(1, 2)  # [B, N, D]
    cls = t("cls_token").expand(b, -1, -1)
    x = torch.cat([cls, x], dim=1) + t("pos_embed")
    hd = dim // heads
    for i in range(depth):
        pre = f"blocks.{i}"
        h = F.layer_norm(x, (dim,), t(f"{pre}.norm1.weight"),
                         t(f"{pre}.norm1.bias"), eps=1e-6)
        qkv = F.linear(h, t(f"{pre}.attn.qkv.weight"),
                       t(f"{pre}.attn.qkv.bias"))
        n = qkv.shape[1]
        qkv = qkv.reshape(b, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.softmax(q @ k.transpose(-2, -1) / np.sqrt(hd), dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, n, dim)
        x = x + F.linear(out, t(f"{pre}.attn.proj.weight"),
                         t(f"{pre}.attn.proj.bias"))
        h = F.layer_norm(x, (dim,), t(f"{pre}.norm2.weight"),
                         t(f"{pre}.norm2.bias"), eps=1e-6)
        h = F.gelu(F.linear(h, t(f"{pre}.mlp.fc1.weight"),
                            t(f"{pre}.mlp.fc1.bias")))
        x = x + F.linear(h, t(f"{pre}.mlp.fc2.weight"),
                         t(f"{pre}.mlp.fc2.bias"))
    x = F.layer_norm(x, (dim,), t("norm.weight"), t("norm.bias"),
                     eps=1e-6)  # timm/MAE ViT uses eps=1e-6
    return x[:, 0].numpy()


@pytest.mark.slow
def test_vit_trunk_parity():
    sd = make_vit_sd()
    variables = convert_mvp_vit(sd, depth=DEPTH)
    vit = VisionTransformer(
        embed_dim=D, depth=DEPTH, num_heads=HEADS, patch_size=P, img_size=IMG
    )
    rng = np.random.RandomState(1)
    x = rng.rand(2, IMG, IMG, 3).astype(np.float32)

    init_vars = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert jax.tree_util.tree_structure(init_vars["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray,
                                   variables["params"]["trunk"])
        )
    )

    with torch.no_grad():
        theirs = torch_vit_forward(sd, np.transpose(x, (0, 3, 1, 2)).copy())
    mine = np.asarray(
        vit.apply({"params": variables["params"]["trunk"]}, jnp.asarray(x))
    )
    np.testing.assert_allclose(mine, theirs, atol=2e-5, rtol=1e-3)


@pytest.mark.slow
def test_mvp_wrapper_prefix_strip_and_freeze():
    sd = {f"module.{k}": v for k, v in make_vit_sd().items()}
    variables = convert_mvp_vit(sd, depth=DEPTH)
    assert "patch_embed" in variables["params"]["trunk"]

    # frozen trunk -> zero grads through MVPConv (tiny variant injected)
    import robot_manipulation_vq_vae_tpu.models.base_nets as BaseNets

    BaseNets._MVP_VARIANTS["test-tiny"] = (D, DEPTH, HEADS, IMG, P)
    try:
        model = MVPConv(mvp_model_class="test-tiny")
        x = jnp.asarray(
            np.random.RandomState(2).rand(1, IMG, IMG, 3), jnp.float32
        )

        def loss(params):
            return jnp.sum(model.apply({"params": params}, x) ** 2)

        grads = jax.grad(loss)(
            jax.tree_util.tree_map(jnp.asarray, variables["params"])
        )
        assert max(
            float(jnp.max(jnp.abs(g)))
            for g in jax.tree_util.tree_leaves(grads)
        ) == 0.0
        assert model.output_shape() == [D]
    finally:
        del BaseNets._MVP_VARIANTS["test-tiny"]


def test_mvp_resizes_input():
    import robot_manipulation_vq_vae_tpu.models.base_nets as BaseNets

    BaseNets._MVP_VARIANTS["test-tiny"] = (D, DEPTH, HEADS, IMG, P)
    try:
        model = MVPConv(mvp_model_class="test-tiny")
        x = jnp.asarray(
            np.random.RandomState(3).rand(2, 16, 16, 3), jnp.float32
        )
        variables = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(variables, x)
        assert out.shape == (2, D)
        assert np.all(np.isfinite(np.asarray(out)))
    finally:
        del BaseNets._MVP_VARIANTS["test-tiny"]


def test_real_variant_table():
    assert MVPConv(mvp_model_class="vitb-mae-egosoup").output_shape() == [768]
    assert MVPConv(
        mvp_model_class="vitl-256-mae-egosoup"
    ).output_shape() == [1024]
    assert MVPConv(mvp_model_class="vits-mae-hoi").output_shape() == [384]

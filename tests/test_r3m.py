"""R3MConv: converted-trunk load path + numerical parity of the frozen
pipeline (R3M preprocess -> ResNet18 trunk -> global avgpool) against a
step-by-step torch re-execution of the reference semantics
(``robomimic/models/base_nets.py:1091-1152``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.models.base_nets import (
    R3MConv,
    load_r3m_variables,
    r3m_preprocess,
)
from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
    convert_r3m_trunk,
    flatten_variables,
    unflatten_npz,
)

_LAYERS = [
    ("layer1.0", 64, 1, False), ("layer1.1", 64, 1, False),
    ("layer2.0", 128, 2, True), ("layer2.1", 128, 1, False),
    ("layer3.0", 256, 2, True), ("layer3.1", 256, 1, False),
    ("layer4.0", 512, 2, True), ("layer4.1", 512, 1, False),
]


def make_torch_resnet18_sd(seed=0, scale=0.1):
    """Synthetic torchvision-resnet18-named state dict (random weights)."""
    rng = np.random.RandomState(seed)
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32) * scale + 1.0
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32) * scale
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32) * scale
        sd[f"{prefix}.running_var"] = (
            np.abs(rng.randn(c)).astype(np.float32) * scale + 0.5
        )

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32) * scale
    bn("bn1", 64)
    in_c = 64
    for name, c, stride, down in _LAYERS:
        sd[f"{name}.conv1.weight"] = (
            rng.randn(c, in_c, 3, 3).astype(np.float32) * scale
        )
        bn(f"{name}.bn1", c)
        sd[f"{name}.conv2.weight"] = (
            rng.randn(c, c, 3, 3).astype(np.float32) * scale
        )
        bn(f"{name}.bn2", c)
        if down:
            sd[f"{name}.downsample.0.weight"] = (
                rng.randn(c, in_c, 1, 1).astype(np.float32) * scale
            )
            bn(f"{name}.downsample.1", c)
        in_c = c
    return sd


def torch_r3m_forward(sd, x_nchw):
    """Reference pipeline in torch: Resize(256) -> CenterCrop(224) ->
    ImageNet normalize -> resnet18 trunk (eval BN) -> avgpool."""
    t = lambda k: torch.from_numpy(sd[k])

    def bn(h, prefix):
        return F.batch_norm(
            h, t(f"{prefix}.running_mean"), t(f"{prefix}.running_var"),
            t(f"{prefix}.weight"), t(f"{prefix}.bias"), training=False,
        )

    x = torch.from_numpy(x_nchw)
    _, _, h0, w0 = x.shape
    if h0 <= w0:
        size = (256, int(256 * w0 / h0))
    else:
        size = (int(256 * h0 / w0), 256)
    x = F.interpolate(x, size=size, mode="bilinear", align_corners=False)
    top = int(round((size[0] - 224) / 2.0))
    left = int(round((size[1] - 224) / 2.0))
    x = x[:, :, top:top + 224, left:left + 224]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (x - mean) / std

    h = F.conv2d(x, t("conv1.weight"), stride=2, padding=3)
    h = F.relu(bn(h, "bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    for name, _, stride, down in _LAYERS:
        ident = h
        y = F.conv2d(h, t(f"{name}.conv1.weight"), stride=stride, padding=1)
        y = F.relu(bn(y, f"{name}.bn1"))
        y = F.conv2d(y, t(f"{name}.conv2.weight"), padding=1)
        y = bn(y, f"{name}.bn2")
        if down:
            ident = bn(
                F.conv2d(h, t(f"{name}.downsample.0.weight"), stride=stride),
                f"{name}.downsample.1",
            )
        h = F.relu(y + ident)
    return F.adaptive_avg_pool2d(h, 1).numpy()  # [B, 512, 1, 1]


@pytest.fixture(scope="module")
def trunk_sd():
    return make_torch_resnet18_sd()


def test_converted_trunk_parity(trunk_sd):
    """convert_r3m_trunk -> R3MConv output == reference torch pipeline."""
    # R3M ships DDP-wrapped "module.convnet." keys; test the prefix strip
    wrapped = {f"module.convnet.{k}": v for k, v in trunk_sd.items()}
    variables = convert_r3m_trunk(wrapped)

    model = R3MConv(r3m_model_class="resnet18")
    rng = np.random.RandomState(1)
    x = rng.rand(2, 128, 128, 3).astype(np.float32)  # NHWC in [0,1]

    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # converted tree must line up leaf-for-leaf with the module's init tree
    chex = jax.tree_util.tree_structure
    assert chex(init_vars["params"]) == chex(
        jax.tree_util.tree_map(jnp.asarray, variables["params"])
    )

    with torch.no_grad():
        theirs = torch_r3m_forward(trunk_sd, np.transpose(x, (0, 3, 1, 2)))

    mine = np.asarray(
        model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(x),
        )
    )  # [B, 1, 1, 512]
    np.testing.assert_allclose(
        mine[:, 0, 0, :], theirs[:, :, 0, 0], atol=2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_frozen_trunk_zero_grads(trunk_sd):
    variables = convert_r3m_trunk(trunk_sd)
    model = R3MConv()
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x
        )
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(
        jax.tree_util.tree_map(jnp.asarray, variables["params"])
    )
    assert max(
        float(jnp.max(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    ) == 0.0


def test_r3m_preprocess_shapes():
    x = jnp.zeros((2, 100, 150, 3))
    out = r3m_preprocess(x)
    assert out.shape == (2, 224, 224, 3)
    # shortest-side resize keeps aspect: 100->256 means W -> int(256*1.5)=384
    x2 = jnp.ones((1, 300, 256, 3))
    assert r3m_preprocess(x2).shape == (1, 224, 224, 3)


def test_npz_roundtrip_and_env_loader(trunk_sd, tmp_path, monkeypatch):
    variables = convert_r3m_trunk(trunk_sd)
    flat = flatten_variables(variables)
    path = tmp_path / "r3m_trunk.npz"
    np.savez(path, **flat)

    # explicit path
    loaded = load_r3m_variables(str(path))
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded),
        jax.tree_util.tree_leaves(variables),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # env-var path
    monkeypatch.setenv("RMVQ_R3M_FEATURES", str(path))
    loaded2 = load_r3m_variables()
    assert jax.tree_util.tree_structure(loaded2) == jax.tree_util.tree_structure(
        variables
    )

    monkeypatch.delenv("RMVQ_R3M_FEATURES")
    with pytest.raises(RuntimeError, match="RMVQ_R3M_FEATURES"):
        load_r3m_variables()


def test_unflatten_inverts_flatten(trunk_sd):
    variables = convert_r3m_trunk(trunk_sd)
    rt = unflatten_npz(flatten_variables(variables))
    assert jax.tree_util.tree_structure(rt) == jax.tree_util.tree_structure(
        variables
    )


def test_visualcore_with_r3m_backbone(trunk_sd):
    """R3MConv works as a VisualCore backbone (the reference exposes it via
    obs encoder configs, base_nets.py:1091)."""
    from robot_manipulation_vq_vae_tpu.models.obs_core import VisualCore

    core = VisualCore(
        input_shape=(64, 64, 3), backbone_class="R3MConv",
        pool_class=None, flatten=True, feature_dimension=8,
    )
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3), jnp.float32)
    variables = core.init(jax.random.PRNGKey(0), x)
    out = core.apply(variables, x)
    assert out.shape == (2, 8)
    assert core.output_shape() == [8]

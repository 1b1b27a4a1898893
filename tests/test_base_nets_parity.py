"""SpatialSoftmax keypoint-pooling parity vs the reference
(``robomimic/models/base_nets.py:1510-1640``) - the pooling layer used by
the shipped train_config."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_loader import load_base_nets_reference
from robot_manipulation_vq_vae_tpu.models.base_nets import SpatialSoftmax

B, H, W, C, K = 3, 6, 5, 4, 8


@pytest.fixture(scope="module")
def ref_base_nets():
    return load_base_nets_reference()


def _build_pair(ref_base_nets, output_variance=False):
    torch.manual_seed(0)
    ref = ref_base_nets.SpatialSoftmax(
        input_shape=(C, H, W), num_kp=K, temperature=0.7,
        output_variance=output_variance,
    )
    ref.eval()

    ours = SpatialSoftmax(
        input_shape=(H, W, C), num_kp=K, temperature=0.7,
        output_variance=output_variance,
    )
    rng = np.random.RandomState(1)
    x_nhwc = rng.randn(B, H, W, C).astype(np.float32)
    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_nhwc)
    )
    # transplant the 1x1 keypoint conv: torch [K, C, 1, 1] -> flax [1, 1, C, K]
    w = ref.nets.weight.detach().numpy()
    params = {
        "kp_conv": {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(ref.nets.bias.detach().numpy()),
        }
    }
    return ref, ours, {"params": params}, x_nhwc


def test_keypoints_match(ref_base_nets):
    ref, ours, variables, x = _build_pair(ref_base_nets)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    mine = np.asarray(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(mine, theirs, atol=1e-5)


def test_keypoint_variance_matches(ref_base_nets):
    ref, ours, variables, x = _build_pair(ref_base_nets, output_variance=True)
    with torch.no_grad():
        kp_t, cov_t = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    kp, cov = ours.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(kp), kp_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), cov_t.numpy(), atol=1e-5)


def test_crop_parity_vs_reference():
    """Fixed-index crops + center crop match the reference obs_utils crop
    math (obs_utils.py:269-286, 583-670)."""
    import sys

    from reference_loader import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    ref_obs_utils = importlib.import_module("robomimic.utils.obs_utils")

    from robot_manipulation_vq_vae_tpu.models.obs_core import (
        CropRandomizer,
        random_crop_hwc,
    )
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    rng = np.random.RandomState(0)
    Bc, Hc, Wc, Cc = 2, 10, 12, 3
    th, tw = 6, 7
    x_hwc = rng.rand(Bc, Hc, Wc, Cc).astype(np.float32)

    # center crop (the eval path of CropRandomizer)
    mine = ObsUtils.center_crop(x_hwc, th, tw)
    theirs = ref_obs_utils.center_crop(torch.from_numpy(x_hwc), th, tw)
    np.testing.assert_array_equal(mine, theirs.numpy())
    r = CropRandomizer((Hc, Wc, Cc), crop_height=th, crop_width=tw)
    np.testing.assert_array_equal(
        np.asarray(r.forward_in(jnp.asarray(x_hwc), train=False)),
        theirs.numpy(),
    )

    # fixed-index crops: drive both implementations with the same offsets
    inds = np.stack(
        [rng.randint(0, Hc - th, (Bc,)), rng.randint(0, Wc - tw, (Bc,))],
        axis=-1,
    )
    x_chw = torch.from_numpy(np.transpose(x_hwc, (0, 3, 1, 2)))
    ref_crops = ref_obs_utils.crop_image_from_indices(
        x_chw, torch.from_numpy(inds), th, tw
    ).numpy()  # [B, C, th, tw]

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (th, tw, Cc))

    mine = jax.vmap(crop_one)(
        jnp.asarray(x_hwc), jnp.asarray(inds[:, 0]), jnp.asarray(inds[:, 1])
    )
    np.testing.assert_array_equal(
        np.transpose(np.asarray(mine), (0, 3, 1, 2)), ref_crops
    )

    # random_crop_hwc output shape + values are actual subwindows
    crops = np.asarray(
        random_crop_hwc(jax.random.PRNGKey(0), jnp.asarray(x_hwc), th, tw, 2)
    )
    assert crops.shape == (Bc, 2, th, tw, Cc)


def test_shallow_conv_parity(ref_base_nets):
    """ShallowConv (DSAE encoder, reference base_nets.py:1376-1411):
    transplanted torch weights -> identical NHWC activations."""
    from robot_manipulation_vq_vae_tpu.models.base_nets import ShallowConv

    torch.manual_seed(0)
    ref = ref_base_nets.ShallowConv(input_channel=3, output_channel=32)
    ref.eval()

    ours = ShallowConv(input_channel=3, output_channel=32)
    rng = np.random.RandomState(2)
    x_nhwc = rng.randn(2, 16, 16, 3).astype(np.float32)
    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x_nhwc)
    )

    # transplant the 4 convs: torch [O, I, kh, kw] -> flax [kh, kw, I, O]
    params = {}
    conv_layers = [m for m in ref.nets if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(conv_layers):
        w = conv.weight.detach().numpy()
        params[f"Conv_{i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        }

    with torch.no_grad():
        theirs = ref(
            torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
        ).numpy()  # [B, 32, 8, 8]
    mine = np.asarray(ours.apply({"params": params}, jnp.asarray(x_nhwc)))
    np.testing.assert_allclose(
        np.transpose(mine, (0, 3, 1, 2)), theirs, atol=1e-5
    )
    assert ours.output_shape((16, 16, 3)) == [8, 8, 32]

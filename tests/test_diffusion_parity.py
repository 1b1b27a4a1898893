"""ConditionalUnet1D parity vs the reference diffusion-policy denoiser
(reference ``robomimic/algo/diffusion_policy.py:467-742``): forward parity
from transplanted weights, the discarded-shallowest-skip quirk, and Adam
optimizer-trajectory parity on the noise-prediction loss (the training
dynamics claim forward parity alone does not establish)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from reference_flagship import load_reference_robomimic
from test_training_trajectory_parity import assert_mostly_close
from robot_manipulation_vq_vae_tpu.models.diffusion_nets import (
    ConditionalUnet1D,
)


@pytest.fixture(scope="module")
def ref_diffusion():
    load_reference_robomimic()
    import importlib

    return importlib.import_module("robomimic.algo.diffusion_policy")


def _linear(sd, prefix):
    return {
        "kernel": sd[prefix + ".weight"].T.copy(),
        "bias": sd[prefix + ".bias"].copy(),
    }


def _conv1d(sd, prefix):
    # torch Conv1d [out, in, k] -> flax [k, in, out]
    return {
        "kernel": sd[prefix + ".weight"].transpose(2, 1, 0).copy(),
        "bias": sd[prefix + ".bias"].copy(),
    }


def _convtranspose1d(sd, prefix):
    # torch ConvTranspose1d [in, out, k] -> flax transpose_kernel=True
    # layout [k, out, in] (correspondence verified against torch for the
    # 4/2/1 upsample this UNet uses)
    return {
        "kernel": sd[prefix + ".weight"].transpose(2, 1, 0).copy(),
        "bias": sd[prefix + ".bias"].copy(),
    }


def _groupnorm(sd, prefix):
    return {
        "scale": sd[prefix + ".weight"].copy(),
        "bias": sd[prefix + ".bias"].copy(),
    }


def _resblock(sd, prefix):
    out = {
        "block1": {
            "conv": _conv1d(sd, prefix + ".blocks.0.block.0"),
            "gn": _groupnorm(sd, prefix + ".blocks.0.block.1"),
        },
        "block2": {
            "conv": _conv1d(sd, prefix + ".blocks.1.block.0"),
            "gn": _groupnorm(sd, prefix + ".blocks.1.block.1"),
        },
        "cond_proj": _linear(sd, prefix + ".cond_encoder.1"),
    }
    if prefix + ".residual_conv.weight" in sd:  # Identity when in==out
        out["res_conv"] = _conv1d(sd, prefix + ".residual_conv")
    return out


def torch_unet_to_flax(tm, down_dims):
    """Map the reference ConditionalUnet1D state_dict onto our flax tree
    (module layout documented in models/diffusion_nets.py)."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {
        "temb1": _linear(sd, "diffusion_step_encoder.1"),
        "temb2": _linear(sd, "diffusion_step_encoder.3"),
        "mid1": _resblock(sd, "mid_modules.0"),
        "mid2": _resblock(sd, "mid_modules.1"),
        "final_block": {
            "conv": _conv1d(sd, "final_conv.0.block.0"),
            "gn": _groupnorm(sd, "final_conv.0.block.1"),
        },
        "final_conv": _conv1d(sd, "final_conv.1"),
    }
    for i in range(len(down_dims)):
        params[f"down{i}_r1"] = _resblock(sd, f"down_modules.{i}.0")
        params[f"down{i}_r2"] = _resblock(sd, f"down_modules.{i}.1")
        if i < len(down_dims) - 1:
            params[f"down{i}_pool"] = _conv1d(sd, f"down_modules.{i}.2.conv")
    for j in range(len(down_dims) - 1):
        params[f"up{j}_r1"] = _resblock(sd, f"up_modules.{j}.0")
        params[f"up{j}_r2"] = _resblock(sd, f"up_modules.{j}.1")
        params[f"up{j}_up"] = _convtranspose1d(sd, f"up_modules.{j}.2.conv")
    return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)


A, D, B, T = 5, 7, 3, 8


def _build_pair(ref_mod, down_dims, dsed=16, n_groups=4, seed=0):
    torch.manual_seed(seed)
    tm = ref_mod.ConditionalUnet1D(
        input_dim=A, global_cond_dim=D, diffusion_step_embed_dim=dsed,
        down_dims=list(down_dims), kernel_size=5, n_groups=n_groups,
    )
    tm.eval()
    jm = ConditionalUnet1D(
        action_dim=A, down_dims=tuple(down_dims),
        diffusion_step_embed_dim=dsed, kernel_size=5, n_groups=n_groups,
    )
    return tm, jm, torch_unet_to_flax(tm, down_dims)


def _data(seed=1):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, A).astype(np.float32)
    t = rng.randint(0, 100, (B,)).astype(np.int64)
    cond = rng.randn(B, D).astype(np.float32)
    return x, t, cond


@pytest.mark.slow
@pytest.mark.parametrize("down_dims", [(16, 32), (8, 16, 32)])
def test_unet_forward_parity(ref_diffusion, down_dims):
    """Transplanted weights -> identical noise prediction, including the
    3-level case that exercises the discarded-shallowest-skip quirk."""
    tm, jm, params = _build_pair(ref_diffusion, down_dims)
    x, t, cond = _data()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 global_cond=torch.from_numpy(cond)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(t), jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_unet_shallow_skip_is_unused(ref_diffusion):
    """A wider 3-level configuration on fresh seeds: the up path has only
    two levels, so the level-0 skip must be computed-but-unused on both
    sides (the reference's ``reversed(in_out[1:])`` quirk) — transplanted
    forward equality would break if either side consumed it."""
    tm, jm, params = _build_pair(ref_diffusion, (16, 32, 64), seed=3)
    x, t, cond = _data(seed=4)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(t),
                 global_cond=torch.from_numpy(cond)).numpy()
    out = np.asarray(jm.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(t), jnp.asarray(cond)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_unet_adam_trajectory_parity(ref_diffusion):
    """20 Adam steps on the DDPM noise-prediction MSE: optax.adam must
    track torch.optim.Adam from transplanted-identical init on identical
    (noisy-action, timestep, cond, target-noise) data — the reference
    trains the UNet exactly this way (diffusion_policy.py train_on_batch:
    F.mse_loss(noise_pred, noise) under the policy Adam optimizer)."""
    N_STEPS, LR = 20, 1e-3
    down_dims = (16, 32)
    tm, jm, params = _build_pair(ref_diffusion, down_dims, seed=5)
    tm.train()

    rng = np.random.RandomState(7)
    xs = rng.randn(N_STEPS, B, T, A).astype(np.float32)
    ts = rng.randint(0, 100, (N_STEPS, B)).astype(np.int64)
    conds = rng.randn(N_STEPS, B, D).astype(np.float32)
    noises = rng.randn(N_STEPS, B, T, A).astype(np.float32)

    topt = torch.optim.Adam(tm.parameters(), lr=LR)
    for i in range(N_STEPS):
        topt.zero_grad()
        pred = tm(torch.from_numpy(xs[i]), torch.from_numpy(ts[i]),
                  global_cond=torch.from_numpy(conds[i]))
        loss = torch.nn.functional.mse_loss(pred, torch.from_numpy(noises[i]))
        loss.backward()
        topt.step()

    jopt = optax.adam(LR)
    opt_state = jopt.init(params)

    @jax.jit
    def step(params, opt_state, x, t, cond, noise):
        def loss_fn(p):
            pred = jm.apply({"params": p}, x, t, cond)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = jopt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(N_STEPS):
        params, opt_state, _ = step(
            params, opt_state, jnp.asarray(xs[i]), jnp.asarray(ts[i]),
            jnp.asarray(conds[i]), jnp.asarray(noises[i]),
        )

    final = torch_unet_to_flax(tm, down_dims)
    flat_j = jax.tree_util.tree_leaves_with_path(params)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(final))
    assert len(flat_j) == len(flat_t)
    for path, leaf in flat_j:
        assert_mostly_close(
            leaf, flat_t[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after {N_STEPS} Adam steps: {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_gn_trunk_parity_vs_torch():
    """Our ResNet stem+BasicBlock with norm='group' matches a torch module
    built exactly the way the reference's replace_bn_with_gn leaves a
    torchvision trunk: BatchNorm2d swapped for GroupNorm(C//16), weights
    transplanted (validates group count, eps=1e-5, and channel grouping
    across the NCHW->NHWC layout change)."""
    import torch.nn as tnn
    from robot_manipulation_vq_vae_tpu.models.base_nets import (
        BasicBlock, _ResNet18Stem,
    )

    class TorchStemBlock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.gn1 = tnn.GroupNorm(64 // 16, 64)
            self.pool = tnn.MaxPool2d(3, 2, 1)
            # one stride-2 BasicBlock 64 -> 128 with downsample
            self.b_conv1 = tnn.Conv2d(64, 128, 3, 2, 1, bias=False)
            self.b_gn1 = tnn.GroupNorm(128 // 16, 128)
            self.b_conv2 = tnn.Conv2d(128, 128, 3, 1, 1, bias=False)
            self.b_gn2 = tnn.GroupNorm(128 // 16, 128)
            self.d_conv = tnn.Conv2d(64, 128, 1, 2, bias=False)
            self.d_gn = tnn.GroupNorm(128 // 16, 128)

        def forward(self, x):
            x = torch.relu(self.gn1(self.conv1(x)))
            x = self.pool(x)
            h = torch.relu(self.b_gn1(self.b_conv1(x)))
            h = self.b_gn2(self.b_conv2(h))
            idn = self.d_gn(self.d_conv(x))
            return torch.relu(h + idn)

    torch.manual_seed(11)
    tm = TorchStemBlock().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    def conv(k):  # torch [out,in,kh,kw] -> flax [kh,kw,in,out]
        return sd[k].transpose(2, 3, 1, 0).copy()

    def gn(k):
        return {"scale": sd[k + ".weight"].copy(), "bias": sd[k + ".bias"].copy()}

    stem_params = {"conv1": {"kernel": conv("conv1.weight")}, "bn1": gn("gn1")}
    block_params = {
        "conv1": {"kernel": conv("b_conv1.weight")}, "bn1": gn("b_gn1"),
        "conv2": {"kernel": conv("b_conv2.weight")}, "bn2": gn("b_gn2"),
        "down_conv": {"kernel": conv("d_conv.weight")}, "down_bn": gn("d_gn"),
    }

    x = np.random.RandomState(13).rand(2, 33, 33, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    stem = _ResNet18Stem(norm="group")
    blk = BasicBlock(features=128, stride=2, norm="group")
    h = stem.apply({"params": jax.tree_util.tree_map(jnp.asarray, stem_params)},
                   jnp.asarray(x))
    out = blk.apply({"params": jax.tree_util.tree_map(jnp.asarray, block_params)},
                    h)
    np.testing.assert_allclose(
        np.asarray(out), ref.transpose(0, 2, 3, 1), atol=2e-5, rtol=0
    )

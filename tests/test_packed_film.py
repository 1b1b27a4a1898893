"""Grouped-conv packing of the per-camera FiLM-ResNet18 encoders must be
IDENTICAL math: outputs, BN batch_stats updates, and gradients (mapped
back per camera) all match running the three trunks separately.
Reference per-key encoders: robomimic/models/obs_nets.py:240-463."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.models.base_nets import ResNet18ConvFiLM
from robot_manipulation_vq_vae_tpu.models.packed_film import (
    PackedResNet18ConvFiLM,
    pack_film_resnet18_params,
    unpack_grads_per_camera,
)

G = 3
IMG = 32          # tiny spatial size: the plan/stride structure is identical
B = 2
LANG = 16


@pytest.fixture(scope="module")
def trunks_and_inputs():
    rng = np.random.RandomState(0)
    x_cams = [rng.randn(B, IMG, IMG, 3).astype(np.float32) for _ in range(G)]
    lang = rng.randn(B, LANG).astype(np.float32)
    models = [ResNet18ConvFiLM(lang_emb_dim=LANG) for _ in range(G)]
    variables = [
        m.init(jax.random.PRNGKey(10 + g), jnp.asarray(x_cams[g]),
               jnp.asarray(lang), train=False)
        for g, m in enumerate(models)
    ]
    # non-trivial BN stats so the running-average path is exercised too
    for g in range(G):
        variables[g] = jax.tree_util.tree_map(lambda a: a, variables[g])
    return models, variables, x_cams, lang


def _packed(variables, x_cams):
    packed_vars = pack_film_resnet18_params(variables)
    x_packed = jnp.concatenate([jnp.asarray(x) for x in x_cams], axis=-1)
    return PackedResNet18ConvFiLM(groups=G, lang_emb_dim=LANG), packed_vars, \
        x_packed


def test_eval_forward_identical(trunks_and_inputs):
    models, variables, x_cams, lang = trunks_and_inputs
    outs = [
        m.apply(v, jnp.asarray(x), jnp.asarray(lang), train=False)
        for m, v, x in zip(models, variables, x_cams)
    ]
    pm, pv, xp = _packed(variables, x_cams)
    out_p = pm.apply(pv, xp, jnp.asarray(lang), train=False)
    assert out_p.shape[-1] == G * 512
    for g in range(G):
        np.testing.assert_allclose(
            np.asarray(out_p[..., g * 512:(g + 1) * 512]),
            np.asarray(outs[g]), rtol=2e-5, atol=2e-5,
            err_msg=f"camera {g} features diverge packed-vs-separate",
        )


def test_train_forward_and_bn_stats_identical(trunks_and_inputs):
    """float64: train-mode BN at the deep stages normalizes over as few as
    B*1*1 elements, so 1/sqrt(var+eps) amplifies fp32 reduction-order noise
    into O(1) output differences by block7 — in f64 the identical-math
    claim is assertable at 1e-9."""
    models, variables, x_cams, lang = trunks_and_inputs
    with jax.enable_x64():
        _train_forward_check(models, variables, x_cams, lang)


def _train_forward_check(models, variables, x_cams, lang):
    to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float64), t
    )
    variables = [to64(v) for v in variables]
    x_cams = [np.asarray(x, np.float64) for x in x_cams]
    lang = np.asarray(lang, np.float64)
    outs, new_stats = [], []
    for m, v, x in zip(models, variables, x_cams):
        out, mut = m.apply(
            v, jnp.asarray(x), jnp.asarray(lang), train=True,
            mutable=["batch_stats"],
        )
        outs.append(out)
        new_stats.append(mut["batch_stats"])

    pm, pv, xp = _packed(variables, x_cams)
    out_p, mut_p = pm.apply(
        pv, xp, jnp.asarray(lang), train=True, mutable=["batch_stats"]
    )
    assert out_p.dtype == jnp.float64
    for g in range(G):
        np.testing.assert_allclose(
            np.asarray(out_p[..., g * 512:(g + 1) * 512]),
            np.asarray(outs[g]), rtol=1e-9, atol=1e-9,
        )
    # the packed BN running stats must equal the per-camera stats,
    # channel-blocked (stem + one deep block is representative)
    for path in (("stem_bn1",), ("block7", "bn2")):
        sep_paths = {
            ("stem_bn1",): ("stem", "bn1"),
            ("block7", "bn2"): ("block7", "bn2"),
        }[path]
        node_p = mut_p["batch_stats"]
        for p in path:
            node_p = node_p[p]
        for stat in ("mean", "var"):
            seps = []
            for st in new_stats:
                node = st
                for p in sep_paths:
                    node = node[p]
                seps.append(np.asarray(node[stat]))
            np.testing.assert_allclose(
                np.asarray(node_p[stat]), np.concatenate(seps, -1),
                rtol=1e-5, atol=1e-6,
                err_msg=f"BN {path} {stat} diverges packed-vs-separate",
            )


def test_gradients_identical(trunks_and_inputs):
    """d(sum of per-camera losses)/d(weights): the packed trunk's conv
    gradients, split per camera, equal each separate trunk's gradients
    (f64 — fp32 conv-reduction reordering leaves ~0.2% single-element
    noise that would force meaninglessly loose tolerances)."""
    models, variables, x_cams, lang = trunks_and_inputs
    with jax.enable_x64():
        _gradient_check(models, variables, x_cams, lang)


def _gradient_check(models, variables, x_cams, lang):
    to64 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float64), t
    )
    variables = [to64(v) for v in variables]
    x_cams = [np.asarray(x, np.float64) for x in x_cams]
    lang_j = jnp.asarray(lang, jnp.float64)

    def sep_loss(params, g):
        out = models[g].apply(
            {"params": params, "batch_stats": variables[g]["batch_stats"]},
            jnp.asarray(x_cams[g]), lang_j, train=False,
        )
        return jnp.sum(out * out)

    sep_grads = [
        jax.grad(sep_loss)(variables[g]["params"], g) for g in range(G)
    ]

    pm, pv, xp = _packed(variables, x_cams)

    def packed_loss(params):
        out = pm.apply(
            {"params": params, "batch_stats": pv["batch_stats"]},
            xp, lang_j, train=False,
        )
        return jnp.sum(out * out)

    packed_grads = jax.grad(packed_loss)(pv["params"])

    per_cam = unpack_grads_per_camera(
        packed_grads["stem_conv1"]["kernel"], G
    )
    for g in range(G):
        np.testing.assert_allclose(
            per_cam[g], np.asarray(sep_grads[g]["stem"]["conv1"]["kernel"]),
            rtol=1e-9, atol=1e-10,
            err_msg=f"stem conv grad diverges for camera {g}",
        )
    per_cam = unpack_grads_per_camera(
        packed_grads["block0"]["conv1"]["kernel"], G
    )
    for g in range(G):
        np.testing.assert_allclose(
            per_cam[g], np.asarray(sep_grads[g]["block0"]["conv1"]["kernel"]),
            rtol=1e-9, atol=1e-10,
        )
    # FiLM beta/gamma Dense grads: packed layout is [G betas | G gammas]
    fk = np.asarray(packed_grads["film0"]["lang_proj"]["kernel"])
    for g in range(G):
        sep = np.asarray(sep_grads[g]["film0"]["lang_proj"]["kernel"])
        np.testing.assert_allclose(
            fk[:, g * 64:(g + 1) * 64], sep[:, :64],
            rtol=1e-9, atol=1e-10, err_msg=f"film beta grad cam {g}",
        )
        np.testing.assert_allclose(
            fk[:, G * 64 + g * 64:G * 64 + (g + 1) * 64], sep[:, 64:],
            rtol=1e-9, atol=1e-10, err_msg=f"film gamma grad cam {g}",
        )


def test_params_only_pack_and_roundtrip(trunks_and_inputs):
    """A stats-less (params-only) variable tree — e.g. a frozen/exported
    checkpoint — must pack without a batch_stats output and round-trip
    losslessly; mixing stats-ful and stats-less trees must raise."""
    from robot_manipulation_vq_vae_tpu.models.packed_film import (
        unpack_film_resnet18_params,
    )

    _, variables, _, _ = trunks_and_inputs
    params_only = [{"params": v["params"]} for v in variables]
    packed = pack_film_resnet18_params(params_only)
    assert "batch_stats" not in packed
    cams = unpack_film_resnet18_params(packed, G)
    for g in range(G):
        flat_in = jax.tree_util.tree_leaves(params_only[g]["params"])
        flat_out = jax.tree_util.tree_leaves(cams[g]["params"])
        assert len(flat_in) == len(flat_out)
        for a, b in zip(flat_in, flat_out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mixed = [params_only[0]] + [dict(v) for v in variables[1:]]
    with pytest.raises(ValueError, match="batch_stats"):
        pack_film_resnet18_params(mixed)


def test_params_only_unpack_is_usable(trunks_and_inputs):
    """Regression: unpacking a params-only packed tree must NOT emit empty
    batch_stats stubs — a tree with a batch_stats collection whose leaves
    are missing crashes `ResNet18ConvFiLM.apply` with
    ScopeVariableNotFoundError on first use."""
    from robot_manipulation_vq_vae_tpu.models.packed_film import (
        unpack_film_resnet18_params,
    )

    models, variables, x_cams, lang = trunks_and_inputs
    params_only = [{"params": v["params"]} for v in variables]
    cams = unpack_film_resnet18_params(
        pack_film_resnet18_params(params_only), G
    )
    for g in range(G):
        assert "batch_stats" not in cams[g]
        # usable as-is for a stats-initializing apply (fresh BN stats)
        out, new_vars = models[g].apply(
            cams[g], jnp.asarray(x_cams[g]), jnp.asarray(lang),
            train=True, mutable=["batch_stats"],
        )
        assert np.all(np.isfinite(np.asarray(out)))
        assert "batch_stats" in new_vars

"""config.train.packed_rgb_encoders: the ObservationEncoder's grouped-conv
packed path must be interchangeable with the default per-camera path —
same features given converted params (models/packed_film.py layout
converters), same randomizer rng draws, and a lossless layout roundtrip.
Reference per-key encoders: robomimic/models/obs_nets.py:240-463."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
from robot_manipulation_vq_vae_tpu.models import obs_nets as ObsNets
from robot_manipulation_vq_vae_tpu.models.packed_film import (
    convert_variables_default_to_packed,
    convert_variables_packed_to_default,
)
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.config import config_factory

CAMS = ["cam_left", "cam_right"]
IMG = 32
CROP = 28
B = 2
LANG = 16


def _make_config(packed):
    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["eef", "lang_emb"]
        config.observation.modalities.obs.rgb = list(CAMS)
        config.observation.encoder.rgb.core_class = (
            "VisualCoreLanguageConditioned"
        )
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 16,
            "backbone_class": "ResNet18ConvFiLM",
            "backbone_kwargs": {"pretrained": False,
                                "input_coord_conv": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 8, "learnable_temperature": False,
                            "temperature": 1.0, "noise_std": 0.0},
        }
        config.observation.encoder.rgb.obs_randomizer_class = (
            "CropRandomizer"
        )
        config.observation.encoder.rgb.obs_randomizer_kwargs = {
            "crop_height": CROP, "crop_width": CROP, "num_crops": 1,
            "pos_enc": False,
        }
        config.train.packed_rgb_encoders = packed
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    return config


def _encoder(config):
    shapes = [("eef", (3,)), ("lang_emb", (LANG,))] + [
        (c, (IMG, IMG, 3)) for c in CAMS
    ]
    kwargs = ObsUtils.obs_encoder_kwargs_from_config(config.observation.encoder)
    return ObsNets.obs_encoder_factory(shapes, encoder_kwargs=kwargs)


def _obs(seed=0):
    rng = np.random.RandomState(seed)
    obs = {
        "eef": jnp.asarray(rng.randn(B, 3).astype(np.float32)),
        "lang_emb": jnp.asarray(rng.randn(B, LANG).astype(np.float32)),
    }
    for c in CAMS:
        obs[c] = jnp.asarray(
            rng.randint(0, 255, (B, IMG, IMG, 3)).astype(np.float32) / 255.0
        )
    return obs


@pytest.fixture()
def packed_off():
    yield
    ObsNets.set_packed_rgb_encoders(False)


def test_packed_mode_matches_default_with_converted_params(packed_off):
    config = _make_config(packed=False)
    enc = _encoder(config)
    obs = _obs()
    rngs = {"params": jax.random.PRNGKey(0),
            "randomizer": jax.random.PRNGKey(1)}

    ObsNets.set_packed_rgb_encoders(False)
    v_def = enc.init(rngs, obs, train=False)
    out_def = enc.apply(v_def, obs, train=False)

    ObsNets.set_packed_rgb_encoders(True)
    v_packed = convert_variables_default_to_packed(
        {k: v for k, v in v_def.items()}, CAMS
    )
    out_packed = enc.apply(v_packed, obs, train=False)
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_def), rtol=2e-5, atol=2e-5,
        err_msg="packed encoder diverges from default with converted params",
    )

    # packed tree really is the traced layout (init under packed == shape
    # of the converted tree)
    v_init_packed = enc.init(rngs, obs, train=False)
    t1 = jax.tree_util.tree_structure(v_init_packed)
    t2 = jax.tree_util.tree_structure(v_packed)
    assert t1 == t2, f"converted layout != traced packed layout\n{t1}\n{t2}"


def test_train_mode_same_crops_and_features(packed_off):
    """train=True: the two-pass randomizer structure preserves the rng
    draw ORDER, so both modes see identical crops; features match (f64 —
    train-mode BN at tiny spatial sizes amplifies fp32 noise chaotically)."""
    config = _make_config(packed=False)
    enc = _encoder(config)
    with jax.enable_x64():
        obs = {k: jnp.asarray(v, jnp.float64) for k, v in _obs().items()}
        rngs = {"params": jax.random.PRNGKey(0),
                "randomizer": jax.random.PRNGKey(1)}
        ObsNets.set_packed_rgb_encoders(False)
        v_def = enc.init(rngs, obs, train=False)
        v_def = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, v_def,
        )
        out_def, mut_def = enc.apply(
            v_def, obs, train=True, mutable=["batch_stats"],
            rngs={"randomizer": jax.random.PRNGKey(7)},
        )
        ObsNets.set_packed_rgb_encoders(True)
        v_packed = convert_variables_default_to_packed(
            {k: v for k, v in v_def.items()}, CAMS
        )
        out_packed, mut_packed = enc.apply(
            v_packed, obs, train=True, mutable=["batch_stats"],
            rngs={"randomizer": jax.random.PRNGKey(7)},
        )
        np.testing.assert_allclose(
            np.asarray(out_packed), np.asarray(out_def),
            rtol=1e-9, atol=1e-9,
        )


def test_layout_roundtrip_lossless(packed_off):
    config = _make_config(packed=False)
    enc = _encoder(config)
    obs = _obs()
    rngs = {"params": jax.random.PRNGKey(0),
            "randomizer": jax.random.PRNGKey(1)}
    ObsNets.set_packed_rgb_encoders(False)
    v_def = enc.init(rngs, obs, train=False)
    v_def = {k: v for k, v in v_def.items()}
    back = convert_variables_packed_to_default(
        convert_variables_default_to_packed(v_def, CAMS), CAMS
    )
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(v_def)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(back)[0],
        jax.tree_util.tree_flatten_with_path(v_def)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"roundtrip changed {jax.tree_util.keystr(pa)}",
        )


@pytest.mark.slow
def test_flagship_algo_trains_with_packed_encoders(packed_off):
    """End-to-end: the tiny flagship ICL algo with packed_rgb_encoders=on
    (2 cameras) trains 2 finite steps and serves get_action."""
    import __graft_entry__ as ge

    cams = {"cam_a": (32, 32, 3), "cam_b": (32, 32, 3)}
    old_rgb = ge.RGB_KEYS
    ge.RGB_KEYS = cams
    try:
        config = ge._tiny_config(with_rgb=True)
        with config.values_unlocked():
            config.train.packed_rgb_encoders = True
        algo = ge._make_algo(config, with_rgb=True)
        batch = algo.process_batch_for_training(
            ge._make_batch(b=4, with_rgb=True)
        )
        jbatch = {
            "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
            "actions": jnp.asarray(batch["actions"]),
        }
        for _ in range(2):
            info = algo.train_on_batch(jbatch, epoch=0)
            assert np.isfinite(float(info["losses"]["action_loss"]))
        flat = jax.tree_util.tree_flatten_with_path(algo.state.params)[0]
        assert any("packed_backbone" in jax.tree_util.keystr(p)
                   for p, _ in flat), "packed trunk not traced"
        rng = np.random.RandomState(5)
        obs = {k: rng.randn(2, ge.H, *s).astype(np.float32)
               for k, s in ge.OBS_KEYS.items()}
        for k, s in cams.items():
            obs[k] = rng.randint(0, 255, (2, ge.H) + s).astype(np.uint8)
        obs["lang_emb"] = rng.randn(2, ge.H, ge.LANG_DIM).astype(np.float32)
        ctx = {"obs": {k: v.copy() for k, v in obs.items()},
               "actions": rng.randn(2, ge.H, ge.A).astype(np.float32)}
        act = np.asarray(algo.get_action(obs, context_batch=ctx))
        assert np.all(np.isfinite(act))
    finally:
        ge.RGB_KEYS = old_rgb


def test_converter_rejects_reordered_keys(packed_off):
    """Group i of the packed trunk is bound to packed_keys[i] by POSITION;
    a key list that disagrees with the tree's own core_* order would
    silently feed each camera through another camera's weights. The
    converters must refuse it (strict_order escape hatch for trees whose
    dict order was canonicalized by a checkpointer)."""
    config = _make_config(packed=False)
    enc = _encoder(config)
    obs = _obs()
    rngs = {"params": jax.random.PRNGKey(0),
            "randomizer": jax.random.PRNGKey(1)}
    ObsNets.set_packed_rgb_encoders(False)
    v_def = {k: v for k, v in enc.init(rngs, obs, train=False).items()}
    swapped = list(reversed(CAMS))
    with pytest.raises(ValueError, match="spec order"):
        convert_variables_default_to_packed(v_def, swapped)
    v_packed = convert_variables_default_to_packed(v_def, CAMS)
    with pytest.raises(ValueError, match="spec order"):
        convert_variables_packed_to_default(v_packed, swapped)
    # escape hatch still converts (caller asserts the order is spec order)
    out = convert_variables_default_to_packed(
        v_def, swapped, strict_order=False
    )

    def _has_packed(node):
        if isinstance(node, dict):
            return "packed_backbone" in node or any(
                _has_packed(v) for v in node.values()
            )
        return False

    assert _has_packed(out["params"])

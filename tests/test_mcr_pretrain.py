"""MCR representation pretraining: loss-math verification against an
independent numpy re-derivation of the reference formulas
(``robomimic/algo/mcr/trainer.py:29-163``), trainer/snapshot behavior, and
the pretrain -> export -> policy-warm-start loop (``algo/mcr.py``)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.algo.mcr_pretrain import (
    EPS,
    MCRPretrainer,
    MCRRepresentation,
    synthetic_batches,
)

B, IMG, A = 4, 32, 7
STATE_DIM = 14 * 3  # state_window=3, no actions


def _make_batch(seed=0, b=B):
    return next(synthetic_batches(
        batch_size=b, image_size=IMG, action_dim=A, state_dim=STATE_DIM,
        num_batches=1, seed=seed,
    ))


def _model(**kw):
    defaults = dict(
        size=18, hidden_dim=16, l2dist=True, tcn_weight=1.0,
        align_state_weight=0.25, bc_weight=0.5, action_dim=A,
        resize_to_224=False,
    )
    defaults.update(kw)
    return MCRRepresentation(**defaults)


def test_loss_math_vs_numpy_rederivation():
    """Full loss (TCN InfoNCE + BC MSE + state-align) vs an independent
    numpy implementation of the reference trainer's formulas on the
    model's own embeddings, with pinned negative permutations."""
    model = _model()
    batch = _make_batch()
    rng = np.random.RandomState(3)
    neg_perms = np.stack([rng.permutation(B) for _ in range(3)])

    variables = model.init(
        jax.random.PRNGKey(0), batch, jnp.asarray(neg_perms), train=False
    )
    (loss, metrics) = model.apply(
        variables, batch, jnp.asarray(neg_perms), train=False
    )

    # independent embeddings via the public encode/encode_state/bc_predict
    imgs = batch["images"].reshape((B * 5,) + batch["images"].shape[2:])
    alles = np.asarray(model.apply(
        variables, imgs, train=False, method=MCRRepresentation.encode
    ))
    alle = alles.reshape(B, 5, -1)
    es0, es1, es2 = alle[:, 2], alle[:, 3], alle[:, 4]
    s0p = np.asarray(model.apply(
        variables, batch["state_s0"], method=MCRRepresentation.encode_state
    ))
    s2p = np.asarray(model.apply(
        variables, batch["state_s2"], method=MCRRepresentation.encode_state
    ))
    pred = np.asarray(model.apply(
        variables, alles, method=MCRRepresentation.bc_predict
    ))

    def sim(a, b):  # l2dist=True branch (reference models_mcr.py:154-157)
        return -np.linalg.norm(a - b, axis=-1)

    # TCN (reference trainer.py:64-118)
    sim_0_2, sim_1_2, sim_0_1 = sim(es2, es0), sim(es2, es1), sim(es1, es0)
    neg0 = np.stack([sim(es0, es0[p]) for p in neg_perms], -1)
    neg2 = np.stack([sim(es2, es2[p]) for p in neg_perms], -1)
    sl1 = -np.log(EPS + np.exp(sim_1_2) / (
        EPS + np.exp(sim_0_2) + np.exp(sim_1_2) + np.exp(neg2).sum(-1)))
    sl2 = -np.log(EPS + np.exp(sim_0_1) / (
        EPS + np.exp(sim_0_1) + np.exp(sim_0_2) + np.exp(neg0).sum(-1)))
    tcn = ((sl1 + sl2) / 2.0).mean()

    # BC MSE (reference trainer.py:121-126)
    bc = np.mean((pred - batch["actions"].reshape(B * 5, A)) ** 2)

    # state alignment (reference trainer.py:129-160)
    s00, s22 = sim(es0, s0p), sim(es2, s2p)
    s02, s20 = sim(es0, s2p), sim(es2, s0p)
    s0l = -np.log(EPS + np.exp(s00) / (EPS + np.exp(s00) + np.exp(s02)))
    s2l = -np.log(EPS + np.exp(s22) / (EPS + np.exp(s22) + np.exp(s20)))
    align = ((s0l + s2l) / 2.0).mean()

    expected = 1.0 * tcn + 0.5 * bc + 0.25 * align
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["tcnloss"]), tcn, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["bc_loss"]), bc, rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["state_align_loss"]), align, rtol=1e-5
    )
    # alignment metrics are fractions in [0, 1]
    assert 0.0 <= float(metrics["aligned"]) <= 1.0
    assert 0.0 <= float(metrics["stateimg_aligned"]) <= 1.0


def test_cosine_sim_branch():
    model = _model(l2dist=False, align_state_weight=0.0, bc_weight=0.0)
    batch = _make_batch()
    perms = jnp.tile(jnp.arange(B), (3, 1))
    variables = model.init(jax.random.PRNGKey(0), batch, perms, train=False)
    loss, metrics = model.apply(variables, batch, perms, train=False)
    assert np.isfinite(float(loss))
    # self-similarity negatives (identity perms) make the task hard: loss
    # must exceed the 2-way-contrast floor of log(2)/... just sanity-check
    assert float(metrics["tcnloss"]) > 0.0


def test_trainer_steps_eval_and_snapshot_roundtrip(tmp_path):
    model = _model(align_state_weight=0.0, bc_weight=0.5)
    batches = synthetic_batches(2, IMG, A, state_dim=STATE_DIM, seed=1)
    example = next(batches)
    tr = MCRPretrainer(model, lr=1e-3, seed=0, example_batch=example)

    m1 = tr.update(example)
    m2 = tr.update(next(batches))
    assert tr.step == 2
    assert np.isfinite(m1["full_loss"]) and np.isfinite(m2["full_loss"])

    # eval step: metrics computed, no param update, step not advanced
    params_before = jax.device_get(tr.params)
    me = tr.update(next(batches), eval=True)
    assert tr.step == 2 and np.isfinite(me["full_loss"])
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, params_before,
        jax.device_get(tr.params),
    )

    snap = str(tmp_path / "snapshot.pkl")
    tr.save_snapshot(snap)
    tr2 = MCRPretrainer(model, lr=1e-3, seed=7, example_batch=example)
    tr2.load_snapshot(snap)
    assert tr2.step == 2
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, jax.device_get(tr.params),
        jax.device_get(tr2.params),
    )
    # resumed trainer can keep stepping
    m3 = tr2.update(next(batches))
    assert tr2.step == 3 and np.isfinite(m3["full_loss"])


def test_cli_synthetic_run_and_resume(tmp_path):
    from robot_manipulation_vq_vae_tpu.scripts.train_mcr_representation import (
        main,
    )

    work = str(tmp_path / "run")
    trunk = str(tmp_path / "trunk.pkl")
    args = [
        "--dataset", "synthetic", "--work_dir", work,
        "--train_steps", "3", "--eval_freq", "2", "--batch_size", "2",
        "--size", "18", "--image_size", str(IMG), "--lr", "1e-3",
        "--export_trunk", trunk,
    ]
    main(args)
    assert os.path.exists(os.path.join(work, "snapshot.pkl"))
    assert os.path.exists(os.path.join(work, "metrics.jsonl"))
    with open(trunk, "rb") as f:
        tree = pickle.load(f)
    assert "stem" in tree  # ResNet trunk param layout

    # resume from the snapshot and train further
    main(args + ["--load_snap", os.path.join(work, "snapshot.pkl"),
                 "--train_steps", "4"])


@pytest.mark.slow
def test_export_trunk_warm_starts_mcr_policy(tmp_path, monkeypatch):
    """The full produce -> consume loop: pretrained ResNet-50 trunk pickle
    grafts onto the MCR policy's rgb encoder backbone via RMVQ_MCR_CKPT
    (``algo/mcr.py:51-82``)."""
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    model = _model(size=50, tcn_weight=1.0, align_state_weight=0.0,
                   bc_weight=0.0)
    example = _make_batch(b=2)
    tr = MCRPretrainer(model, lr=1e-4, seed=0, example_batch=example)
    trunk_path = str(tmp_path / "mcr_trunk.pkl")
    tr.export_trunk(trunk_path)
    monkeypatch.setenv("RMVQ_MCR_CKPT", trunk_path)

    config = config_factory("mcr")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = ["eef"]
        config.observation.modalities.obs.rgb = ["cam"]
        config.observation.encoder.rgb.core_class = "VisualCore"
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 8,
            "backbone_class": "ResNet50Conv",
            "backbone_kwargs": {"pretrained": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 4},
        }
        config.observation.encoder.rgb.obs_randomizer_class = None
        config.train.seed = 0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    algo = AlgoReg.algo_factory(
        "mcr", config,
        obs_key_shapes={"eef": (3,), "cam": (IMG, IMG, 3)}, ac_dim=A,
    )
    rng = np.random.RandomState(0)
    batch = algo.process_batch_for_training({
        "obs": {
            "eef": rng.randn(2, 1, 3).astype(np.float32),
            "cam": rng.randint(0, 255, (2, 1, IMG, IMG, 3)).astype(np.uint8),
        },
        "actions": rng.randn(2, 1, A).astype(np.float32),
    })
    algo.ensure_state(batch)

    with open(trunk_path, "rb") as f:
        trunk = pickle.load(f)

    def find_backbones(tree, path=()):
        found = []
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "backbone" and isinstance(v, dict):
                    found.append((path + (k,), v))
                else:
                    found.extend(find_backbones(v, path + (k,)))
        return found

    backbones = find_backbones(jax.device_get(algo.state.params))
    assert backbones, "no rgb encoder backbone found in policy params"
    for _, sub in backbones:
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, sub, trunk
        )

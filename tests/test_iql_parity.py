"""IQL loss + training-trajectory parity vs the reference torch algo
(reference ``robomimic/algo/iql.py:36-427``), run end-to-end through BOTH
frameworks' algo objects: expectile V regression, min-target-Q advantage
weights, per-critic TD updates with polyak targets, and the
advantage-weighted actor NLL — from transplanted-identical weights on
identical batches."""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_flagship import load_reference_robomimic
from reference_loader import ensure_diffusers_stub
from test_training_trajectory_parity import assert_mostly_close
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, O, A = 16, 5, 3
LAYERS = (8, 8)
LR = 1e-3
TAU = 0.05
QUANTILE = 0.7
BETA = 0.5
DISCOUNT = 0.95


@pytest.fixture(scope="module")
def algo_pair():
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("iql")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "iql", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("iql")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "iql", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


def _tune(cfg):
    cfg.algo.critic.layer_dims = list(LAYERS)
    cfg.algo.actor.layer_dims = list(LAYERS)
    cfg.algo.discount = DISCOUNT
    cfg.algo.target_tau = TAU
    cfg.algo.vf_quantile = QUANTILE
    cfg.algo.adv.beta = BETA
    cfg.algo.critic.use_huber = False
    for k in ("actor", "critic", "vf"):
        cfg.algo.optim_params[k].learning_rate.initial = LR
        cfg.algo.optim_params[k].learning_rate.scheduler_type = None
        cfg.algo.optim_params[k].regularization.L2 = 0.0


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def torch_iql_to_flax(ref):
    sd = {k: v.detach().numpy() for k, v in ref.nets.state_dict().items()}
    params = {
        "actor": {"net": {
            "mlp": {
                "fc0": _lin(sd, "actor.nets.mlp._model.0"),
                "out": _lin(sd, "actor.nets.mlp._model.2"),
            },
            "decoder": {
                "head_mean": _lin(sd, "actor.nets.decoder.nets.mean"),
                "head_scale": _lin(sd, "actor.nets.decoder.nets.scale"),
            },
        }},
        "vf": {"mlp": {
            "fc0": _lin(sd, "vf.nets.mlp._model.0"),
            "fc1": _lin(sd, "vf.nets.mlp._model.2"),
            "out": _lin(sd, "vf.nets.decoder.nets.value"),
        }},
    }
    for i in range(2):
        for src, dst in ((f"critic.{i}", f"critic{i}"),
                         (f"critic_target.{i}", f"critic{i}_target")):
            params[dst] = {"mlp": {
                "fc0": _lin(sd, f"{src}.nets.mlp._model.0"),
                "fc1": _lin(sd, f"{src}.nets.mlp._model.2"),
                "out": _lin(sd, f"{src}.nets.decoder.nets.value"),
            }}
    return params


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {"flat": rng.randn(B, 1, O).astype(np.float32)},
        "next_obs": {"flat": rng.randn(B, 1, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, 1, A)).astype(np.float32),
        "rewards": rng.rand(B, 1).astype(np.float32),
        "dones": (rng.rand(B, 1) < 0.2).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


def _sync(ref, ours):
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    params = torch_iql_to_flax(ref)
    ours.state = ours.state.replace(params=params)


@pytest.mark.slow
def test_iql_loss_parity(algo_pair):
    """validate-mode losses equal: per-critic TD, expectile V, actor NLL,
    mean log-prob and advantage weights."""
    ref, ours = algo_pair
    _sync(ref, ours)
    raw = make_raw_batch(1)

    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]

    pairs = [
        ("critic/critic1_loss", "critic/critic1_loss"),
        ("critic/critic2_loss", "critic/critic2_loss"),
        ("vf/v_loss", "vf_loss"),
        ("actor/loss", "actor/loss"),
        ("actor/log_prob", "actor/log_prob"),
    ]
    for rk, ok in pairs:
        want = float(rinfo[rk].detach().float().mean())
        got = float(oinfo[ok])
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5,
                                   err_msg=f"{rk} vs {ok}")
    np.testing.assert_allclose(
        float(oinfo["adv/weight_mean"]),
        float(rinfo["adv/adv_weight"].detach().mean()),
        atol=2e-5, rtol=1e-5,
    )


@pytest.mark.slow
def test_iql_training_trajectory_parity(algo_pair):
    """12 real Adam steps through both frameworks: actor/critic/vf params
    AND the polyak'd target critics must track (optimizer + target-update
    parity, reference iql.py:238-270)."""
    ref, ours = algo_pair
    _sync(ref, ours)

    for i in range(12):
        raw = make_raw_batch(100 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )

    final_ref = torch_iql_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 IQL steps: {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_smooth_l1_matches_torch():
    """use_huber=True path: our smooth_l1_loss == nn.SmoothL1Loss."""
    from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils

    rng = np.random.RandomState(7)
    a = rng.randn(64, 1).astype(np.float32) * 2
    b = rng.randn(64, 1).astype(np.float32)
    want = torch.nn.SmoothL1Loss()(torch.from_numpy(a), torch.from_numpy(b))
    got = LossUtils.smooth_l1_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(got), float(want), atol=1e-6, rtol=0)


@pytest.mark.slow
def test_tanh_wrapped_gaussian_matches_reference():
    """TanhWrappedGaussian.log_prob (with and without a pre-tanh value) and
    rsample_with_pretanh match the reference TanhWrappedDistribution over an
    Independent Normal (reference distributions.py:11-85) — the CQL actor's
    probability machinery."""
    load_reference_robomimic()
    import importlib

    ref_dists = importlib.import_module("robomimic.models.distributions")
    import torch.distributions as D

    from robot_manipulation_vq_vae_tpu.models.distributions import (
        DiagGaussian, TanhWrappedGaussian,
    )

    rng = np.random.RandomState(11)
    mean = rng.randn(6, 4).astype(np.float32)
    std = np.exp(rng.randn(6, 4)).astype(np.float32) * 0.5
    base_t = D.Independent(D.Normal(torch.from_numpy(mean),
                                    torch.from_numpy(std)), 1)
    ref = ref_dists.TanhWrappedDistribution(base_dist=base_t, scale=1.0)
    ours = TanhWrappedGaussian(
        base=DiagGaussian(mean=jnp.asarray(mean), scale=jnp.asarray(std))
    )

    # log_prob from values only (atanh path), incl. saturated actions
    vals = np.tanh(rng.randn(6, 4)).astype(np.float32)
    vals[0, 0] = 1.0  # exercise the clamp
    want = ref.log_prob(torch.from_numpy(vals)).numpy()
    got = np.asarray(ours.log_prob(jnp.asarray(vals)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)

    # log_prob with an explicit pre-tanh value
    pre = rng.randn(6, 4).astype(np.float32)
    want = ref.log_prob(torch.tanh(torch.from_numpy(pre)),
                        pre_tanh_value=torch.from_numpy(pre)).numpy()
    got = np.asarray(
        ours.log_prob(jnp.tanh(jnp.asarray(pre)), jnp.asarray(pre))
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # rsample_with_pretanh: action == tanh(pre_tanh), pre_tanh ~ N(mean, std)
    a, z = ours.rsample_with_pretanh(jax.random.PRNGKey(0), sample_shape=(5,))
    assert a.shape == (5, 6, 4) and z.shape == (5, 6, 4)
    np.testing.assert_allclose(np.asarray(a), np.tanh(np.asarray(z)),
                               atol=1e-6, rtol=0)

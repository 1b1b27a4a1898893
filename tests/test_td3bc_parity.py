"""TD3-BC loss + trajectory parity vs the reference torch algo (reference
``robomimic/algo/td3_bc.py:46-567``), driven end-to-end through both algo
objects: n-step reward folding, weighted min/max ensemble targets, the
lam = alpha/mean|Q| BC-regularized actor, the delayed actor/target update
counter, and polyak updates that fire only on actor gradient steps.
Target-policy smoothing noise is random, so both configs pin
``actor.noise_std = 0`` to make the step deterministic."""

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
N_STEP = 3


def _tune(cfg):
    cfg.algo.critic.layer_dims = list(LAYERS)
    cfg.algo.actor.layer_dims = list(LAYERS)
    cfg.algo.discount = 0.95
    cfg.algo.n_step = N_STEP
    cfg.algo.target_tau = 0.05
    cfg.algo.alpha = 2.5
    cfg.algo.critic.ensemble.weight = 0.75
    cfg.algo.critic.use_huber = False
    cfg.algo.actor.noise_std = 0.0
    cfg.algo.actor.update_freq = 2
    cfg.algo.infinite_horizon = True
    for k in ("actor", "critic"):
        cfg.algo.optim_params[k].learning_rate.initial = LR
        cfg.algo.optim_params[k].learning_rate.scheduler_type = None
        cfg.algo.optim_params[k].regularization.L2 = 0.0


@pytest.fixture(scope="module")
def algo_pair():
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("td3_bc")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "td3_bc", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("td3_bc")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "td3_bc", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def _mimo(sd, prefix, head):
    return {"mlp": {
        "fc0": _lin(sd, f"{prefix}.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{prefix}.nets.mlp._model.2"),
        "out": _lin(sd, f"{prefix}.nets.decoder.nets.{head}"),
    }}


def torch_td3bc_to_flax(ref):
    sd = {k: v.detach().numpy() for k, v in ref.nets.state_dict().items()}
    params = {
        "actor": {"net": {
            "mlp": {
                "fc0": _lin(sd, "actor.nets.mlp._model.0"),
                "out": _lin(sd, "actor.nets.mlp._model.2"),
            },
            "decoder": {"head_action": _lin(sd, "actor.nets.decoder.nets.action")},
        }},
        "actor_target": {"net": {
            "mlp": {
                "fc0": _lin(sd, "actor_target.nets.mlp._model.0"),
                "out": _lin(sd, "actor_target.nets.mlp._model.2"),
            },
            "decoder": {
                "head_action": _lin(sd, "actor_target.nets.decoder.nets.action")
            },
        }},
    }
    for i in range(2):
        params[f"critic{i}"] = _mimo(sd, f"critic.{i}", "value")
        params[f"critic{i}_target"] = _mimo(sd, f"critic_target.{i}", "value")
    return params


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {"flat": rng.randn(B, N_STEP, O).astype(np.float32)},
        "next_obs": {"flat": rng.randn(B, N_STEP, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, N_STEP, A)).astype(np.float32),
        "rewards": rng.rand(B, N_STEP).astype(np.float32),
        "dones": (rng.rand(B, N_STEP) < 0.3).astype(np.float32),
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
    ours.state = ours.state.replace(params=torch_td3bc_to_flax(ref))


@pytest.mark.slow
def test_td3bc_processed_batch_parity(algo_pair):
    """n-step reward folding, n-step done OR, infinite-horizon terminal
    scaling, and the next_obs offset (reference td3_bc.py:144-195)."""
    ref, ours = algo_pair
    raw = make_raw_batch(2)
    rb = ref.process_batch_for_training(_to_torch(raw))
    ob = ours.process_batch_for_training(raw)
    np.testing.assert_allclose(
        np.asarray(ob["rewards"]), rb["rewards"].numpy(), atol=1e-6, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(ob["dones"]), rb["dones"].numpy())
    np.testing.assert_allclose(
        np.asarray(ob["next_obs"]["flat"]), rb["next_obs"]["flat"].numpy(),
        atol=0, rtol=0,
    )


@pytest.mark.slow
def test_td3bc_loss_parity(algo_pair):
    """validate-mode losses equal: per-critic TD against the weighted
    min/max ensemble target, and the lam-weighted DDPG+BC actor loss."""
    ref, ours = algo_pair
    _sync(ref, ours)
    raw = make_raw_batch(1)

    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]

    for key in ("critic/critic1_loss", "critic/critic2_loss", "actor/loss"):
        np.testing.assert_allclose(
            float(oinfo[key]), float(rinfo[key].detach()),
            atol=2e-5, rtol=1e-5, err_msg=key,
        )


@pytest.mark.slow
def test_td3bc_training_trajectory_parity(algo_pair):
    """12 real Adam steps: critics update every step, the actor only every
    ``update_freq``-th critic step, and targets polyak only on actor steps
    (reference td3_bc.py:393-430) — final actor/critic/target trees track."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.actor_update_counter = 0

    for i in range(12):
        raw = make_raw_batch(100 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )

    final_ref = torch_td3bc_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 TD3-BC steps: {jax.tree_util.keystr(path)}",
        )

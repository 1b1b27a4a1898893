"""HBC whole-algo parity vs the reference torch algo (reference
``robomimic/algo/hbc.py:38-344``): the GL subgoal planner and the
goal-conditioned BC_RNN actor trained as one hierarchical algo, in both
"separate" (dataset subgoals) and "cascade" (planner-predicted subgoals)
modes — from transplanted-identical weights on identical batches. This is
also the first optimizer-trajectory coverage of the LSTM stack: the
torch nn.LSTM transplants gate-for-gate into our TorchLSTMCell, whose
redundant b_ih/b_hh double-bias parametrization exists precisely because
a fused-single-bias cell (flax OptimizedLSTMCell) sees HALF torch's
effective Adam step on the gate biases and cannot track trajectories.

Goal-conditioning note (documented divergence, PARITY.md): the reference
HBC writes the actor's goal modalities to a dead top-level config key
(``actor_obs_config["goal"]``, hbc.py:118) instead of
``modalities.goal``, so its actor silently trains UN-conditioned and
ignores the planner's subgoals at rollout. We wire ``modalities.goal``
correctly; the harness sets the reference config's
``observation.actor.modalities.goal`` explicitly so both sides build the
goal-conditioned actor the reference intended.

Everything is deterministic (plain GL planner, no VAE; LSTM actor; no
randomized subgoal indices), so no noise injection is needed.
"""


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

B, O, A, T = 8, 5, 3, 4
H_RNN, N_LSTM = 10, 2
SUBGOAL_H = 3
LR = 1e-3


def _tune(cfg, mode):
    cfg.algo.mode = mode
    cfg.algo.actor_use_random_subgoals = False
    cfg.algo.planner.vae.enabled = False
    cfg.algo.planner.subgoal_horizon = SUBGOAL_H
    cfg.algo.planner.ae.planner_layer_dims = [8, 8]
    cfg.algo.actor.rnn.enabled = True
    cfg.algo.actor.rnn.horizon = T
    cfg.algo.actor.rnn.hidden_dim = H_RNN
    cfg.algo.actor.rnn.num_layers = N_LSTM
    cfg.algo.actor.actor_layer_dims = []
    cfg.train.seq_length = T
    for side, names in (("planner", ("goal_network",)),
                        ("actor", ("policy",))):
        for n in names:
            cfg.algo[side].optim_params[n].learning_rate.initial = LR
            cfg.algo[side].optim_params[n].learning_rate.scheduler_type = None
            cfg.algo[side].optim_params[n].regularization.L2 = 0.0


def _build_pair(mode):
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("hbc")
    with rcfg.unlocked():
        for side in ("planner", "actor"):
            rcfg.observation[side].modalities.obs.low_dim = ["flat"]
            rcfg.observation[side].modalities.obs.rgb = []
        rcfg.observation.planner.modalities.subgoal.low_dim = ["flat"]
        rcfg.observation.planner.modalities.subgoal.rgb = []
        # the reference's own goal-modality override lands on a dead key
        # (hbc.py:118); set the real one so the actor is goal-conditioned
        rcfg.observation.actor.modalities.goal.low_dim = ["flat"]
        rcfg.observation.actor.modalities.goal.rgb = []
        rcfg.algo.planner.language_conditioned = False
        rcfg.algo.actor.language_conditioned = False
        _tune(rcfg, mode)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "hbc", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("hbc")
    with cfg.values_unlocked():
        for side in ("planner", "actor"):
            cfg.observation[side].modalities.obs.low_dim = ["flat"]
            cfg.observation[side].modalities.obs.rgb = []
        cfg.observation.planner.modalities.subgoal.low_dim = ["flat"]
        cfg.observation.planner.modalities.subgoal.rgb = []
        _tune(cfg, mode)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "hbc", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


@pytest.fixture(scope="module")
def algo_pair():
    return _build_pair("separate")


@pytest.fixture(scope="module")
def algo_pair_cascade():
    return _build_pair("cascade")


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def _lstm_cell(sd, prefix, layer):
    """torch nn.LSTM layer -> our TorchLSTMCell params. Both use gate
    blocks in (i, f, g, o) order AND torch's redundant double-bias
    parametrization (b_ih/b_hh map 1:1)."""
    w_ih = sd[f"{prefix}.weight_ih_l{layer}"]
    w_hh = sd[f"{prefix}.weight_hh_l{layer}"]
    b_ih = sd[f"{prefix}.bias_ih_l{layer}"]
    b_hh = sd[f"{prefix}.bias_hh_l{layer}"]
    h = w_hh.shape[1]
    out = {}
    for k, g in enumerate("ifgo"):
        sl = slice(k * h, (k + 1) * h)
        out[f"i{g}"] = {
            "kernel": jnp.asarray(w_ih[sl].T.copy()),
            "bias": jnp.asarray(b_ih[sl].copy()),
        }
        out[f"h{g}"] = {
            "kernel": jnp.asarray(w_hh[sl].T.copy()),
            "bias": jnp.asarray(b_hh[sl].copy()),
        }
    return out


def torch_hbc_to_flax(ref):
    """(planner_params, actor_params). The reference actor's outer
    ``decoder`` head is dead weight (RNN_MIMO_MLP with per_step=True
    decodes through per_step_net only) and has no counterpart here."""
    psd = {k: v.detach().numpy().copy()
           for k, v in ref.planner.nets.state_dict().items()}
    planner = {"goal_network": {"net": {
        "mlp": {
            "fc0": _lin(psd, "goal_network.nets.mlp._model.0"),
            "out": _lin(psd, "goal_network.nets.mlp._model.2"),
        },
        "decoder": {"head_flat": _lin(psd, "goal_network.nets.decoder.nets.flat")},
    }}}
    asd = {k: v.detach().numpy().copy()
           for k, v in ref.actor.nets.state_dict().items()}
    rnn = {
        f"lstm{i}": _lstm_cell(asd, "policy.nets.rnn.nets", i)
        for i in range(N_LSTM)
    }
    actor = {"policy": {
        "head": {"out": _lin(asd, "policy.nets.rnn.per_step_net.nets.action")},
        "rnn": rnn,
    }}
    return planner, actor


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {"flat": rng.randn(B, T, O).astype(np.float32)},
        "next_obs": {"flat": rng.randn(B, T, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, T, A)).astype(np.float32),
        "rewards": rng.rand(B, T).astype(np.float32),
        "dones": (rng.rand(B, T) < 0.2).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


def _sync(ref, ours):
    raw = make_raw_batch(0)
    pb = ours.process_batch_for_training(raw)
    ours.planner.ensure_state(pb["planner"])
    if pb["actor"].get("goal_obs") is None:
        # cascade mode injects the goal at train time (hbc.py:104-110);
        # ensure_state needs one for shape inference
        pb["actor"]["goal_obs"] = {
            k: np.asarray(v)
            for k, v in ours.planner.get_subgoal_predictions(
                pb["planner"]["obs"]
            ).items()
        }
    ours.actor.ensure_state(pb["actor"])
    planner, actor = torch_hbc_to_flax(ref)
    ours.planner.state = ours.planner.state.replace(params=planner)
    ours.actor.state = ours.actor.state.replace(params=actor)


def _compare_losses(rinfo, oinfo):
    # the reference GL reports flat loss keys; its BC actor wraps them in
    # "losses" (gl.py log conventions differ from bc.py)
    pairs = [
        (rinfo["planner"], oinfo["planner"]["losses"], "goal_loss"),
        (rinfo["planner"], oinfo["planner"]["losses"], "goal_flat_loss"),
    ] + [
        (rinfo["actor"]["losses"], oinfo["actor"]["losses"], k)
        for k in ("l2_loss", "l1_loss", "cos_loss", "action_loss")
    ]
    for rsrc, osrc, key in pairs:
        rv = rsrc[key]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        np.testing.assert_allclose(float(osrc[key]), want, atol=3e-5,
                                   rtol=1e-5, err_msg=key)


def _run_trajectory(ref, ours, n=12, seed0=100):
    for i in range(n):
        raw = make_raw_batch(seed0 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )
    planner_ref, actor_ref = torch_hbc_to_flax(ref)
    for ours_params, ref_params, name in (
        (ours.planner.state.params, planner_ref, "planner"),
        (ours.actor.state.params, actor_ref, "actor"),
    ):
        flat_o = jax.tree_util.tree_leaves_with_path(ours_params)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(ref_params))
        assert len(flat_o) == len(flat_r)
        for path, leaf in flat_o:
            assert_mostly_close(
                leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
                msg=f"after 12 HBC steps [{name}]: "
                    f"{jax.tree_util.keystr(path)}",
            )


@pytest.mark.slow
def test_hbc_separate_loss_parity(algo_pair):
    """separate mode: planner subgoal MSE + goal-conditioned BC_RNN actor
    composite loss (with the dataset subgoal as the actor goal) equal in
    validate mode."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_eval()
    raw = make_raw_batch(1)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )
    _compare_losses(rinfo, oinfo)


@pytest.mark.slow
def test_hbc_separate_trajectory_parity(algo_pair):
    """12 real separate-mode steps track across the planner MLP and the
    full LSTM actor stack (both cells' gates + per-step head)."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_train()
    _run_trajectory(ref, ours)


@pytest.mark.slow
def test_hbc_cascade_loss_parity(algo_pair_cascade):
    """cascade mode: the actor trains against the PLANNER'S predicted
    subgoals (reference hbc.py:199-206) — covers get_subgoal_predictions
    threading between the sub-algos."""
    ref, ours = algo_pair_cascade
    _sync(ref, ours)
    ref.set_eval()
    raw = make_raw_batch(2)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )
    _compare_losses(rinfo, oinfo)


@pytest.mark.slow
def test_hbc_cascade_trajectory_parity(algo_pair_cascade):
    """12 real cascade-mode steps: the actor's goals come from the
    co-evolving planner, so planner drift propagates into actor gradients
    — both stacks must still track."""
    ref, ours = algo_pair_cascade
    _sync(ref, ours)
    ref.set_train()
    _run_trajectory(ref, ours, seed0=200)

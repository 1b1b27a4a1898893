"""IRIS whole-algo parity vs the reference torch algo (reference
``robomimic/algo/iris.py:34-183``): a ValuePlanner (GL_VAE subgoal sampler
+ BCQ value network) trained jointly with a goal-conditioned BC_RNN actor
— from transplanted-identical weights on identical batches, with every
sample site pinned (GL_VAE encoder rsample + BCQ cVAE encoder rsample via
one monkeypatched ``TorchUtils.reparameterize`` queue; BCQ backup prior
draws via a strict ``torch.randn`` queue; ours via the documented
``GL_VAE._noise_hook`` / ``BCQ._noise_hook`` seams).

Goal-conditioning note: the reference IRIS has the same dead-key goal
override bug as HBC (iris.py:115, PARITY.md divergence #14); the harness
sets ``observation.actor.modalities.goal`` explicitly so both sides build
the intended goal-conditioned actor.
"""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_flagship import load_reference_robomimic
from reference_loader import ensure_diffusers_stub
from test_training_trajectory_parity import assert_mostly_close
from test_hbc_parity import _lin, _lstm_cell
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, O, A, T = 8, 5, 3, 4
H_RNN, N_LSTM = 10, 2
SUBGOAL_H = 3
GL_LATENT = 6
BCQ_LATENT = 14  # reference default action_sampler.vae.latent_dim
N_SAMPLES = 4    # value.critic.num_action_samples
N_STEP = 2       # value.n_step < SUBGOAL_H <= T
LR = 1e-3


def _tune(cfg):
    cfg.algo.mode = "separate"
    cfg.algo.actor_use_random_subgoals = False
    vp = cfg.algo.value_planner
    vp.planner.vae.enabled = True
    vp.planner.vae.latent_dim = GL_LATENT
    vp.planner.vae.encoder_layer_dims = [8, 8]
    vp.planner.vae.decoder_layer_dims = [8, 8]
    vp.planner.subgoal_horizon = SUBGOAL_H
    vp.value.n_step = N_STEP
    vp.value.discount = 0.95
    vp.value.target_tau = 0.05
    vp.value.critic.layer_dims = [8, 8]
    vp.value.critic.num_action_samples = N_SAMPLES
    vp.value.critic.use_huber = False
    vp.value.actor.enabled = False
    vp.value.action_sampler.vae.encoder_layer_dims = [8, 8]
    vp.value.action_sampler.vae.decoder_layer_dims = [8, 8]
    cfg.algo.actor.rnn.enabled = True
    cfg.algo.actor.rnn.horizon = T
    cfg.algo.actor.rnn.hidden_dim = H_RNN
    cfg.algo.actor.rnn.num_layers = N_LSTM
    cfg.algo.actor.actor_layer_dims = []
    cfg.train.seq_length = T
    for params, names in (
        (vp.planner.optim_params, ("goal_network",)),
        (vp.value.optim_params, ("action_sampler", "critic", "actor")),
        (cfg.algo.actor.optim_params, ("policy",)),
    ):
        for n in names:
            params[n].learning_rate.initial = LR
            params[n].learning_rate.scheduler_type = None
            params[n].regularization.L2 = 0.0


@pytest.fixture(scope="module")
def algo_pair():
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("iris")
    with rcfg.unlocked():
        for side in ("value_planner.planner", "value_planner.value", "actor"):
            node = rcfg.observation
            for part in side.split("."):
                node = node[part]
            node.modalities.obs.low_dim = ["flat"]
            node.modalities.obs.rgb = []
        rcfg.observation.value_planner.planner.modalities.subgoal.low_dim = ["flat"]
        rcfg.observation.value_planner.planner.modalities.subgoal.rgb = []
        # the reference's own goal override lands on a dead key (iris.py:115)
        rcfg.observation.actor.modalities.goal.low_dim = ["flat"]
        rcfg.observation.actor.modalities.goal.rgb = []
        for node in (rcfg.algo.value_planner.planner,
                     rcfg.algo.value_planner.value, rcfg.algo.actor):
            node.language_conditioned = False
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "iris", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("iris")
    with cfg.values_unlocked():
        for side in ("value_planner.planner", "value_planner.value", "actor"):
            node = cfg.observation
            for part in side.split("."):
                node = node[part]
            node.modalities.obs.low_dim = ["flat"]
            node.modalities.obs.rgb = []
        cfg.observation.value_planner.planner.modalities.subgoal.low_dim = ["flat"]
        cfg.observation.value_planner.planner.modalities.subgoal.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "iris", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


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


def _mlp3(sd, prefix, head):
    return {
        "fc0": _lin(sd, f"{prefix}.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{prefix}.nets.mlp._model.2"),
        "out": _lin(sd, f"{prefix}.nets.decoder.nets.{head}"),
    }


def torch_glvae_to_flax(ref_planner):
    """Reference GL_VAE goal_network (VAE with [input=subgoal; condition=
    obs] encoder order and [latent; condition] decoder order) -> our
    SubgoalVAE ([cond; subgoal] / [cond; latent] orders: first-layer
    kernel rows permute)."""
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_planner.nets.state_dict().items()}
    gn = "goal_network.nets"
    q_net = {
        "fc0": _lin(sd, f"{gn}.encoder.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{gn}.encoder.nets.mlp._model.2"),
    }
    k = q_net["fc0"]["kernel"]  # rows = [subgoal(O); obs(O)]
    q_net["fc0"]["kernel"] = jnp.concatenate([k[O:], k[:O]], axis=0)
    mean = _lin(sd, f"{gn}.encoder.nets.decoder.nets.mean")
    logvar = _lin(sd, f"{gn}.encoder.nets.decoder.nets.logvar")
    q_net["out"] = {
        "kernel": jnp.concatenate([mean["kernel"], logvar["kernel"]], axis=1),
        "bias": jnp.concatenate([mean["bias"], logvar["bias"]]),
    }
    dec_mlp = {
        "fc0": _lin(sd, f"{gn}.decoder.nets.mlp._model.0"),
        "out": _lin(sd, f"{gn}.decoder.nets.mlp._model.2"),
    }
    k = dec_mlp["fc0"]["kernel"]  # rows = [latent; obs]
    dec_mlp["fc0"]["kernel"] = jnp.concatenate(
        [k[GL_LATENT:], k[:GL_LATENT]], axis=0
    )
    return {"goal_network": {
        "q_net": q_net,
        "dec_mlp": dec_mlp,
        "dec_heads": {
            "head_flat": _lin(sd, f"{gn}.decoder.nets.decoder.nets.flat")
        },
    }}


def torch_bcq_value_to_flax(ref_value):
    """Reference BCQ (actor disabled) -> our BCQ params; same mapping as
    tests/test_bcq_parity.py's, inlined for the value sub-algo."""
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_value.nets.state_dict().items()}
    vae = "action_sampler._vae.nets"
    q_net = {
        "fc0": _lin(sd, f"{vae}.encoder.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{vae}.encoder.nets.mlp._model.2"),
    }
    k = q_net["fc0"]["kernel"]  # rows = [action(A); obs(O)]
    q_net["fc0"]["kernel"] = jnp.concatenate([k[A:], k[:A]], axis=0)
    mean = _lin(sd, f"{vae}.encoder.nets.decoder.nets.mean")
    logvar = _lin(sd, f"{vae}.encoder.nets.decoder.nets.logvar")
    q_net["out"] = {
        "kernel": jnp.concatenate([mean["kernel"], logvar["kernel"]], axis=1),
        "bias": jnp.concatenate([mean["bias"], logvar["bias"]]),
    }
    decoder = {
        "fc0": _lin(sd, f"{vae}.decoder.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{vae}.decoder.nets.mlp._model.2"),
        "out": _lin(sd, f"{vae}.decoder.nets.decoder.nets.action"),
    }
    k = decoder["fc0"]["kernel"]  # rows = [latent; obs]
    decoder["fc0"]["kernel"] = jnp.concatenate(
        [k[BCQ_LATENT:], k[:BCQ_LATENT]], axis=0
    )
    params = {"action_sampler": {"q_net": q_net, "decoder_net": decoder}}
    for i in range(2):
        params[f"critic{i}"] = {"mlp": _mlp3(sd, f"critic.{i}", "value")}
        params[f"critic{i}_target"] = {
            "mlp": _mlp3(sd, f"critic_target.{i}", "value")
        }
    return params


def torch_actor_to_flax(ref_actor):
    sd = {k: v.detach().numpy().copy()
          for k, v in ref_actor.nets.state_dict().items()}
    rnn = {
        f"lstm{i}": _lstm_cell(sd, "policy.nets.rnn.nets", i)
        for i in range(N_LSTM)
    }
    return {"policy": {
        "head": {"out": _lin(sd, "policy.nets.rnn.per_step_net.nets.action")},
        "rnn": rnn,
    }}


def _sync(ref, ours):
    raw = make_raw_batch(0)
    pb = ours.process_batch_for_training(raw)
    ours.planner.planner.ensure_state(pb["planner"]["planner"])
    ours.planner.value_net.ensure_state(pb["planner"]["value_net"])
    ours.actor.ensure_state(pb["actor"])
    ours.planner.planner.state = ours.planner.planner.state.replace(
        params=torch_glvae_to_flax(ref.planner.planner)
    )
    ours.planner.value_net.state = ours.planner.value_net.state.replace(
        params=torch_bcq_value_to_flax(ref.planner.value_net)
    )
    ours.actor.state = ours.actor.state.replace(
        params=torch_actor_to_flax(ref.actor)
    )


def make_step_noise(seed):
    rng = np.random.RandomState(seed)
    return {
        "gl": rng.randn(B, GL_LATENT).astype(np.float32),
        "bcq_enc": rng.randn(B, BCQ_LATENT).astype(np.float32),
        "bcq_backup": rng.randn(B * N_SAMPLES, BCQ_LATENT).astype(np.float32),
    }


def _ref_noise_patches(monkeypatch, reparam_queue, randn_queue):
    import robomimic.utils.torch_utils as RefTorchUtils

    def reparameterize(mu, logvar):
        e = torch.from_numpy(reparam_queue.pop(0))
        assert tuple(e.shape) == tuple(mu.shape)
        return mu + torch.exp(0.5 * logvar) * e

    monkeypatch.setattr(RefTorchUtils, "reparameterize", reparameterize)

    def randn(*shape, **kwargs):
        t = torch.from_numpy(randn_queue.pop(0))
        assert tuple(t.shape) == tuple(shape)
        return t

    monkeypatch.setattr(torch, "randn", randn)


def _set_hooks(ours, noise):
    ours.planner.planner._noise_hook = (
        None if noise is None else lambda: jnp.asarray(noise["gl"])
    )
    ours.planner.value_net._noise_hook = (
        None if noise is None else lambda: {
            "enc": jnp.asarray(noise["bcq_enc"]),
            "backup": jnp.asarray(noise["bcq_backup"]),
        }
    )


@pytest.mark.slow
def test_iris_loss_parity(algo_pair, monkeypatch):
    """validate-mode losses equal across all three sub-algos: GL_VAE
    subgoal ELBO, BCQ batch-constrained critic losses, and the
    goal-conditioned BC_RNN composite (goals = dataset target subgoals,
    reference iris.py:152)."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_eval()
    raw = make_raw_batch(1)
    noise = make_step_noise(11)

    _ref_noise_patches(
        monkeypatch, [noise["gl"], noise["bcq_enc"]], [noise["bcq_backup"]]
    )
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )

    _set_hooks(ours, noise)
    try:
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=True
        )
    finally:
        _set_hooks(ours, None)

    rplan = rinfo["planner"]["planner"]  # reference GL_VAE reports flat keys
    oplan = oinfo["planner"]["planner"]["losses"]
    for rk, ok in (("recons_loss", "recons_loss"), ("kl_loss", "kl_loss")):
        np.testing.assert_allclose(
            float(oplan[ok]), float(rplan[rk].detach()), atol=3e-5,
            rtol=1e-5, err_msg=rk,
        )
    rval = rinfo["planner"]["value_net"]
    oval = oinfo["planner"]["value_net"]["losses"]
    for key in ("action_sampler/loss", "critic/critic1_loss",
                "critic/critic2_loss"):
        rv = rval[key]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        np.testing.assert_allclose(float(oval[key]), want, atol=3e-5,
                                   rtol=1e-5, err_msg=key)
    ract = rinfo["actor"]["losses"]
    oact = oinfo["actor"]["losses"]
    for key in ("l2_loss", "l1_loss", "cos_loss", "action_loss"):
        np.testing.assert_allclose(
            float(oact[key]), float(ract[key].detach()), atol=3e-5,
            rtol=1e-5, err_msg=key,
        )


@pytest.mark.slow
def test_iris_trajectory_parity(algo_pair, monkeypatch):
    """12 real IRIS steps with identical injected noise: GL_VAE, both BCQ
    critics + cVAE sampler + polyak targets, and the LSTM actor must all
    track through the joint hierarchical step."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_train()

    reparam_queue, randn_queue = [], []
    _ref_noise_patches(monkeypatch, reparam_queue, randn_queue)

    for i in range(12):
        raw = make_raw_batch(100 + i)
        noise = make_step_noise(500 + i)
        reparam_queue.extend([noise["gl"], noise["bcq_enc"]])
        randn_queue.append(noise["bcq_backup"])
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not reparam_queue and not randn_queue

        _set_hooks(ours, noise)
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            _set_hooks(ours, None)

    for ours_params, ref_params, name in (
        (ours.planner.planner.state.params,
         torch_glvae_to_flax(ref.planner.planner), "gl_vae"),
        (ours.planner.value_net.state.params,
         torch_bcq_value_to_flax(ref.planner.value_net), "bcq"),
        (ours.actor.state.params, torch_actor_to_flax(ref.actor), "actor"),
    ):
        flat_o = jax.tree_util.tree_leaves_with_path(ours_params)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(ref_params))
        assert len(flat_o) == len(flat_r)
        for path, leaf in flat_o:
            assert_mostly_close(
                leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
                msg=f"after 12 IRIS steps [{name}]: "
                    f"{jax.tree_util.keystr(path)}",
            )

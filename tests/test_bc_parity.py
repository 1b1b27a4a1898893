"""BC family loss + trajectory parity vs the reference torch algos
(reference ``robomimic/algo/bc.py``): the weighted L2/SmoothL1/cosine
composite for plain BC, and the Gaussian NLL path through the
just-reworked GaussianActorNetwork transforms (mean clamp + tanh,
softplus-scaled std with limits)."""

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

B, O, A = 16, 5, 4
LAYERS = (8, 8)
LR = 1e-3


def _build_pair(mode="plain"):
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    def tune(cfg):
        cfg.algo.actor_layer_dims = list(LAYERS)
        cfg.algo.optim_params.policy.learning_rate.initial = LR
        cfg.algo.optim_params.policy.learning_rate.scheduler_type = None
        cfg.algo.optim_params.policy.regularization.L2 = 0.0
        if mode == "gaussian":
            cfg.algo.gaussian.enabled = True
        elif mode == "gmm":
            cfg.algo.gmm.enabled = True
            cfg.algo.gmm.num_modes = 3
        else:
            # exercise every term of the composite loss
            cfg.algo.loss.l2_weight = 1.0
            cfg.algo.loss.l1_weight = 0.3
            cfg.algo.loss.cos_weight = 0.1

    rcfg = ref_config_factory("bc")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "bc", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("bc")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "bc", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def _actor_params(ref, heads):
    sd = {k: v.detach().numpy() for k, v in ref.nets.state_dict().items()}
    return {"policy": {"net": {
        "mlp": {
            "fc0": _lin(sd, "policy.nets.mlp._model.0"),
            "out": _lin(sd, "policy.nets.mlp._model.2"),
        },
        "decoder": {
            f"head_{h}": _lin(sd, f"policy.nets.decoder.nets.{h}")
            for h in heads
        },
    }}}


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {"flat": rng.randn(B, 1, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, 1, A)).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


def _run_pair(mode, heads, loss_keys):
    ref, ours = _build_pair(mode=mode)
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=_actor_params(ref, heads))

    # --- validate-mode loss parity. The reference pipeline runs validation
    # epochs under set_eval() (train_utils.run_epoch), which our coupled
    # train=not-validate flag mirrors — so put the torch nets in eval mode
    # too (for Gaussian heads this selects the low-noise sigma=1e-4 dist)
    ref.nets.eval()
    raw = make_raw_batch(1)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]
    for key in loss_keys:
        np.testing.assert_allclose(
            float(oinfo[key]), float(rinfo["losses"][key].detach()),
            atol=2e-5, rtol=1e-5, err_msg=key,
        )

    # --- 12-step Adam trajectory parity (train mode on both sides)
    ref.nets.train()
    for i in range(12):
        raw = make_raw_batch(100 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )
    final_ref = _actor_params(ref, heads)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 BC steps: {jax.tree_util.keystr(path)}",
        )


@pytest.mark.slow
def test_bc_composite_loss_and_trajectory_parity():
    """Plain BC: weighted L2 + SmoothL1 + cosine([:3]) composite
    (reference bc.py:166-199) and its optimizer trajectory."""
    _run_pair(
        mode="plain", heads=("action",),
        loss_keys=("l2_loss", "l1_loss", "cos_loss", "action_loss"),
    )


@pytest.mark.slow
def test_bc_gaussian_nll_and_trajectory_parity():
    """BC_Gaussian: NLL through the reference GaussianActorNetwork output
    transforms (reference bc.py:288-337)."""
    _run_pair(
        mode="gaussian", heads=("mean", "scale"),
        loss_keys=("log_probs", "action_loss"),
    )


@pytest.mark.slow
def test_bc_gmm_nll_and_trajectory_parity():
    """BC_GMM: mixture NLL through GMMActorNetwork (reference
    bc.py:378-487 factory routing to BC_GMM with gmm.enabled)."""
    _run_pair(
        mode="gmm", heads=("mean", "scale", "logits"),
        loss_keys=("log_probs", "action_loss"),
    )


@pytest.mark.slow
def test_gl_subgoal_loss_and_trajectory_parity():
    """Plain GL planner: per-key subgoal MSE summed (reference
    gl.py:137-182), subgoal-horizon batch slicing, and 12 Adam steps."""
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    SH = 3  # subgoal horizon

    def tune(cfg):
        cfg.algo.vae.enabled = False  # plain deterministic GL
        cfg.algo.ae.planner_layer_dims = list(LAYERS)
        cfg.algo.subgoal_horizon = SH
        cfg.algo.optim_params.goal_network.learning_rate.initial = LR
        cfg.algo.optim_params.goal_network.learning_rate.scheduler_type = None
        cfg.algo.optim_params.goal_network.regularization.L2 = 0.0

    rcfg = ref_config_factory("gl")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.observation.modalities.subgoal.low_dim = ["flat"]
        rcfg.observation.modalities.subgoal.rgb = []
        rcfg.algo.language_conditioned = False
        tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "gl", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("gl")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        cfg.observation.modalities.subgoal.low_dim = ["flat"]
        cfg.observation.modalities.subgoal.rgb = []
        tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "gl", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )

    def params_of(r):
        sd = {k: v.detach().numpy() for k, v in r.nets.state_dict().items()}
        return {"goal_network": {"net": {
            "mlp": {
                "fc0": _lin(sd, "goal_network.nets.mlp._model.0"),
                "out": _lin(sd, "goal_network.nets.mlp._model.2"),
            },
            "decoder": {"head_flat": _lin(sd, "goal_network.nets.decoder.nets.flat")},
        }}}

    def raw_batch(seed):
        rng = np.random.RandomState(seed)
        return {
            "obs": {"flat": rng.randn(B, SH, O).astype(np.float32)},
            "next_obs": {"flat": rng.randn(B, SH, O).astype(np.float32)},
            "actions": rng.uniform(-0.9, 0.9, (B, SH, A)).astype(np.float32),
        }

    ours.ensure_state(ours.process_batch_for_training(raw_batch(0)))
    ours.state = ours.state.replace(params=params_of(ref))

    raw = raw_batch(1)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]
    for key in ("goal_flat_loss", "goal_loss"):
        np.testing.assert_allclose(
            float(oinfo[key]), float(rinfo[key].detach()),
            atol=2e-5, rtol=1e-5, err_msg=key,
        )

    for i in range(12):
        raw = raw_batch(100 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )
    final_ref = params_of(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 GL steps: {jax.tree_util.keystr(path)}",
        )


# --------------------------------------------------------------------------
# BC_VAE: the cVAE policy (reference bc.py:391-508) — the family member the
# VAEActor tanh-squash fix directly affects
# --------------------------------------------------------------------------

BCVAE_LATENT = 14  # reference default vae.latent_dim


@pytest.mark.slow
def test_bc_vae_loss_and_trajectory_parity(monkeypatch):
    """BC_VAE: ELBO (recon through the tanh action squash + analytic KL)
    equal in validate mode under an injected identical encoder eps, and 12
    Adam steps track — via the `BC_VAE._noise_hook` seam and a
    monkeypatched `TorchUtils.reparameterize`."""

    def tune_vae(cfg):
        cfg.algo.vae.enabled = True
        cfg.algo.vae.encoder_layer_dims = list(LAYERS)
        cfg.algo.vae.decoder_layer_dims = list(LAYERS)

    # _build_pair closes over `mode`; replicate with vae knobs
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("bc")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        rcfg.algo.actor_layer_dims = list(LAYERS)
        rcfg.algo.optim_params.policy.learning_rate.initial = LR
        rcfg.algo.optim_params.policy.learning_rate.scheduler_type = None
        rcfg.algo.optim_params.policy.regularization.L2 = 0.0
        tune_vae(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "bc", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("bc")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        cfg.algo.actor_layer_dims = list(LAYERS)
        cfg.algo.optim_params.policy.learning_rate.initial = LR
        cfg.algo.optim_params.policy.learning_rate.scheduler_type = None
        cfg.algo.optim_params.policy.regularization.L2 = 0.0
        tune_vae(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "bc", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    assert type(ref).__name__ == "BC_VAE" and type(ours).__name__ == "BC_VAE"

    def transplant():
        """Same VAE mapping as tests/test_bcq_parity.py (the reference
        encoder concatenates [action; obs], its decoder [latent; obs])."""
        sd = {k: v.detach().numpy().copy()
              for k, v in ref.nets.state_dict().items()}
        vae = "policy._vae.nets"
        q_net = {
            "fc0": _lin(sd, f"{vae}.encoder.nets.mlp._model.0"),
            "fc1": _lin(sd, f"{vae}.encoder.nets.mlp._model.2"),
        }
        k = q_net["fc0"]["kernel"]
        q_net["fc0"]["kernel"] = jnp.concatenate([k[A:], k[:A]], axis=0)
        mean = _lin(sd, f"{vae}.encoder.nets.decoder.nets.mean")
        logvar = _lin(sd, f"{vae}.encoder.nets.decoder.nets.logvar")
        q_net["out"] = {
            "kernel": jnp.concatenate(
                [mean["kernel"], logvar["kernel"]], axis=1
            ),
            "bias": jnp.concatenate([mean["bias"], logvar["bias"]]),
        }
        decoder = {
            "fc0": _lin(sd, f"{vae}.decoder.nets.mlp._model.0"),
            "fc1": _lin(sd, f"{vae}.decoder.nets.mlp._model.2"),
            "out": _lin(sd, f"{vae}.decoder.nets.decoder.nets.action"),
        }
        k = decoder["fc0"]["kernel"]
        decoder["fc0"]["kernel"] = jnp.concatenate(
            [k[BCVAE_LATENT:], k[:BCVAE_LATENT]], axis=0
        )
        return {"policy": {"q_net": q_net, "decoder_net": decoder}}

    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=transplant())

    import robomimic.utils.torch_utils as RefTorchUtils
    queue = []

    def reparameterize(mu, logvar):
        e = torch.from_numpy(queue.pop(0))
        assert tuple(e.shape) == tuple(mu.shape)
        return mu + torch.exp(0.5 * logvar) * e

    monkeypatch.setattr(RefTorchUtils, "reparameterize", reparameterize)

    def step_eps(seed):
        return np.random.RandomState(seed).randn(B, BCVAE_LATENT).astype(
            np.float32
        )

    # --- validate-mode loss parity
    ref.set_eval()
    raw = make_raw_batch(1)
    eps = step_eps(11)
    queue.append(eps)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )["losses"]
    type(ours)._noise_hook = staticmethod(lambda: jnp.asarray(eps))
    try:
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=True
        )["losses"]
    finally:
        type(ours)._noise_hook = None
    for key in ("recons_loss", "kl_loss", "action_loss"):
        np.testing.assert_allclose(
            float(oinfo[key]), float(rinfo[key].detach()), atol=3e-5,
            rtol=1e-5, err_msg=key,
        )

    # --- 12-step trajectory parity
    ref.set_train()
    for i in range(12):
        raw = make_raw_batch(100 + i)
        eps = step_eps(500 + i)
        queue.append(eps)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not queue
        type(ours)._noise_hook = staticmethod(
            lambda e=eps: jnp.asarray(e)
        )
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            type(ours)._noise_hook = None

    final_ref = transplant()
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 BC_VAE steps: {jax.tree_util.keystr(path)}",
        )

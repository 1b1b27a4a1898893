"""BCQ loss + training-trajectory parity vs the reference torch algo
(reference ``robomimic/algo/bcq.py:33-668``), run end-to-end through BOTH
frameworks' algo objects: the cVAE action-sampler ELBO, the
ensemble-min/max batch-constrained backup over sampled candidates, the
perturbation-actor DDPG loss, and the per-net polyak targets — from
transplanted-identical weights on identical batches.

BCQ has three sample sites per step (the cVAE encoder rsample during
sampler training, the prior draws decoded into backup candidates, and the
actor-phase prior draw), so the harness pre-draws every standard-normal
array per step from one numpy RNG and feeds the SAME draws to both
frameworks: the torch side by monkeypatching
``TorchUtils.reparameterize`` and ``torch.randn`` (the standard-prior
sampler, vae_nets.py:419), ours through the documented ``BCQ._noise_hook``
seam. Both frameworks tile observations sample-major
([ob1;ob1;ob2;ob2;...], reference obs_utils.py:560-580 vs our
``jnp.repeat``), so draws inject without relayout.

Weight-layout note: the reference VAE encoder MIMO concatenates
[action; obs] and its decoder [latent; obs] (vae_nets.py:_create_encoder/
_create_decoder put the "input" group first), while ours concatenates
obs-features first — the transplant permutes first-layer kernel rows
accordingly.
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

B, O, A = 16, 5, 3
LAYERS = (8, 8)
LATENT = 14  # reference default action_sampler.vae.latent_dim
LR = 1e-3
N_STEP = 2
N_SAMPLES = 4  # critic.num_action_samples


def _tune(cfg):
    cfg.algo.critic.layer_dims = list(LAYERS)
    cfg.algo.actor.layer_dims = list(LAYERS)
    cfg.algo.actor.enabled = True
    cfg.algo.action_sampler.vae.encoder_layer_dims = list(LAYERS)
    cfg.algo.action_sampler.vae.decoder_layer_dims = list(LAYERS)
    cfg.algo.discount = 0.95
    cfg.algo.n_step = N_STEP
    cfg.algo.target_tau = 0.05
    cfg.algo.critic.num_action_samples = N_SAMPLES
    cfg.algo.critic.use_huber = False
    for k in ("action_sampler", "critic", "actor"):
        cfg.algo.optim_params[k].learning_rate.initial = LR
        cfg.algo.optim_params[k].learning_rate.scheduler_type = None
        cfg.algo.optim_params[k].regularization.L2 = 0.0


def _tune_distributional(cfg):
    _tune(cfg)
    cfg.algo.critic.distributional.enabled = True
    cfg.algo.critic.distributional.num_atoms = 21
    cfg.algo.critic.value_bounds = [-10.0, 10.0]


def _build_pair(tune_fn):
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("bcq")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        tune_fn(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "bcq", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("bcq")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        tune_fn(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "bcq", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    return ref, ours


@pytest.fixture(scope="module")
def algo_pair():
    return _build_pair(_tune)


@pytest.fixture(scope="module")
def algo_pair_dist():
    return _build_pair(_tune_distributional)


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def _mlp3(sd, prefix, head):
    """Reference MIMO_MLP (two hidden layers + one decoder head) -> our
    3-layer MLP params."""
    return {
        "fc0": _lin(sd, f"{prefix}.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{prefix}.nets.mlp._model.2"),
        "out": _lin(sd, f"{prefix}.nets.decoder.nets.{head}"),
    }


def torch_bcq_to_flax(ref):
    sd = {k: v.detach().numpy() for k, v in ref.nets.state_dict().items()}
    vae = "action_sampler._vae.nets"

    # encoder: reference concatenates [action; obs]; ours [obs; action]
    q_net = {
        "fc0": _lin(sd, f"{vae}.encoder.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{vae}.encoder.nets.mlp._model.2"),
    }
    k = q_net["fc0"]["kernel"]  # rows = inputs
    q_net["fc0"]["kernel"] = jnp.concatenate([k[A:], k[:A]], axis=0)
    # mean/logvar heads -> our single out layer split as [mean; logvar]
    mean = _lin(sd, f"{vae}.encoder.nets.decoder.nets.mean")
    logvar = _lin(sd, f"{vae}.encoder.nets.decoder.nets.logvar")
    q_net["out"] = {
        "kernel": jnp.concatenate([mean["kernel"], logvar["kernel"]], axis=1),
        "bias": jnp.concatenate([mean["bias"], logvar["bias"]]),
    }

    # decoder: reference concatenates [latent; obs]; ours [obs; latent]
    decoder = {
        "fc0": _lin(sd, f"{vae}.decoder.nets.mlp._model.0"),
        "fc1": _lin(sd, f"{vae}.decoder.nets.mlp._model.2"),
        "out": _lin(sd, f"{vae}.decoder.nets.decoder.nets.action"),
    }
    k = decoder["fc0"]["kernel"]
    decoder["fc0"]["kernel"] = jnp.concatenate([k[LATENT:], k[:LATENT]], axis=0)

    params = {
        "action_sampler": {"q_net": q_net, "decoder_net": decoder},
        "actor": {"mlp": _mlp3(sd, "actor", "action")},
        "actor_target": {"mlp": _mlp3(sd, "actor_target", "action")},
    }
    n_critics = len({k.split(".")[1] for k in sd if k.startswith("critic.")})
    # the C51 critic's decoder head is named log_probs (value_nets.py)
    head = ("log_probs" if "critic.0.nets.decoder.nets.log_probs.weight" in sd
            else "value")
    for i in range(n_critics):
        params[f"critic{i}"] = {"mlp": _mlp3(sd, f"critic.{i}", head)}
        params[f"critic{i}_target"] = {
            "mlp": _mlp3(sd, f"critic_target.{i}", head)
        }
    return params


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {"flat": rng.randn(B, N_STEP, O).astype(np.float32)},
        "next_obs": {"flat": rng.randn(B, N_STEP, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, N_STEP, A)).astype(np.float32),
        "rewards": rng.rand(B, N_STEP).astype(np.float32),
        "dones": (rng.rand(B, N_STEP) < 0.2).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


def make_step_noise(seed):
    """One training step's worth of standard-normal draws, in both
    frameworks' shared sample-major layout and the reference's call order:
    encoder rsample, backup prior draws, actor-phase prior draw."""
    rng = np.random.RandomState(seed)
    return {
        "enc": rng.randn(B, LATENT).astype(np.float32),
        "backup": rng.randn(B * N_SAMPLES, LATENT).astype(np.float32),
        "actor": rng.randn(B, LATENT).astype(np.float32),
    }


def _ref_noise_patches(monkeypatch, reparam_queue, randn_queue):
    """Make the reference consume our pre-drawn arrays: the encoder
    rsample becomes mean + exp(logvar/2) * eps with injected eps, and the
    standard-prior torch.randn draws pop from a strict queue."""
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


def _ours_noise(noise):
    return {k: jnp.asarray(v) for k, v in noise.items()}


def _sync(ref, ours):
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=torch_bcq_to_flax(ref))


@pytest.mark.slow
def test_bcq_loss_parity(algo_pair, monkeypatch):
    """validate-mode losses equal under identical injected noise: cVAE
    ELBO (recon + kl_weight * KL), both batch-constrained critic losses,
    and the perturbation-actor DDPG loss."""
    ref, ours = algo_pair
    _sync(ref, ours)
    raw = make_raw_batch(1)
    noise = make_step_noise(11)

    _ref_noise_patches(
        monkeypatch, [noise["enc"]], [noise["backup"], noise["actor"]]
    )
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )

    ours._noise_hook = lambda: _ours_noise(noise)
    try:
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=True
        )["losses"]
    finally:
        ours._noise_hook = None

    pairs = [
        ("action_sampler/loss", "action_sampler/loss"),
        ("action_sampler/kl_loss", "action_sampler/kl_loss"),
        ("critic/critic1_loss", "critic/critic1_loss"),
        ("critic/critic2_loss", "critic/critic2_loss"),
        ("actor/loss", "actor/loss"),
    ]
    for rk, ok in pairs:
        rv = rinfo[rk]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        got = float(oinfo[ok])
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5,
                                   err_msg=f"{rk} vs {ok}")


@pytest.mark.slow
def test_bcq_training_trajectory_parity(algo_pair, monkeypatch):
    """12 real steps through both frameworks with identical injected
    noise: the cVAE sampler, both critics, the perturbation actor AND all
    polyak'd targets must track — covering the reference's intra-step
    ordering (critic backup uses the post-step sampler but the pre-step
    target actor; the actor phase uses the post-step critic1)."""
    ref, ours = algo_pair
    _sync(ref, ours)

    reparam_queue, randn_queue = [], []
    _ref_noise_patches(monkeypatch, reparam_queue, randn_queue)

    for i in range(12):
        raw = make_raw_batch(100 + i)
        noise = make_step_noise(500 + i)
        reparam_queue.append(noise["enc"])
        randn_queue.extend([noise["backup"], noise["actor"]])
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not reparam_queue and not randn_queue, (
            "reference consumed an unexpected number of draws"
        )

        ours._noise_hook = lambda: _ours_noise(noise)
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            ours._noise_hook = None

    final_ref = torch_bcq_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 BCQ steps: {jax.tree_util.keystr(path)}",
        )


def _patch_fixed_reference_projection(monkeypatch):
    """The reference's C51 projection has an upstream bug:
    ``vmin, vmax = atoms[0], atoms[1]`` (loss_utils.py:185) instead of
    ``atoms[-1]`` (cf. the ACME source it adapts), so every backed-up value
    clamps into the first atom interval and the target collapses to a
    one-hot at atom 1. We deliberately implement the CORRECT projection
    (documented divergence, PARITY.md); for whole-algo parity the
    reference runs with the bug-fixed equivalent of its own code."""
    import robomimic.algo.bcq as ref_bcq

    def fixed(values, probabilities, atoms):
        if len(atoms.shape) > 1:
            atoms = atoms.squeeze(0)
        vmin, vmax = atoms[0], atoms[-1]
        d = atoms[1] - atoms[0]
        b = (values.clamp(min=vmin, max=vmax) - vmin) / d
        lower, upper = b.floor().long(), b.ceil().long()
        eq = (upper == lower).to(probabilities.dtype)
        ml = probabilities * (b.ceil() - b + eq)
        mu = probabilities * (b - b.floor())
        out = torch.zeros(values.shape[0], atoms.shape[0])
        out.scatter_add_(1, lower, ml)
        out.scatter_add_(1, upper, mu)
        return out

    monkeypatch.setattr(
        ref_bcq.LossUtils, "project_values_onto_atoms", fixed
    )


@pytest.mark.slow
def test_bcq_distributional_loss_parity(algo_pair_dist, monkeypatch):
    """BCQ_Distributional (C51 critic, single-critic ensemble, actor
    enabled): validate-mode ELBO, projected cross-entropy critic loss and
    perturbation-actor loss equal under identical injected noise —
    covering the inherited target-actor perturbation of the backup
    candidates (reference bcq.py:946-1022 + 452-461)."""
    ref, ours = algo_pair_dist
    _sync(ref, ours)
    raw = make_raw_batch(2)
    noise = make_step_noise(21)

    _patch_fixed_reference_projection(monkeypatch)
    _ref_noise_patches(
        monkeypatch, [noise["enc"]], [noise["backup"], noise["actor"]]
    )
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )

    ours._noise_hook = lambda: _ours_noise(noise)
    try:
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=True
        )["losses"]
    finally:
        ours._noise_hook = None

    for key in ("action_sampler/loss", "critic/critic1_loss", "actor/loss"):
        rv = rinfo[key]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        np.testing.assert_allclose(float(oinfo[key]), want, atol=3e-5,
                                   rtol=1e-5, err_msg=key)


@pytest.mark.slow
def test_bcq_distributional_trajectory_parity(algo_pair_dist, monkeypatch):
    """12 real BCQ_Distributional steps track across the cVAE sampler, the
    single distributional critic, the perturbation actor and the polyak'd
    targets under identical injected noise."""
    ref, ours = algo_pair_dist
    _sync(ref, ours)

    _patch_fixed_reference_projection(monkeypatch)
    reparam_queue, randn_queue = [], []
    _ref_noise_patches(monkeypatch, reparam_queue, randn_queue)

    for i in range(12):
        raw = make_raw_batch(200 + i)
        noise = make_step_noise(700 + i)
        reparam_queue.append(noise["enc"])
        randn_queue.extend([noise["backup"], noise["actor"]])
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not reparam_queue and not randn_queue

        ours._noise_hook = lambda: _ours_noise(noise)
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            ours._noise_hook = None

    final_ref = torch_bcq_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 BCQ_Distributional steps: "
                f"{jax.tree_util.keystr(path)}",
        )


# --------------------------------------------------------------------------
# BCQ_GMM: GMM action sampler (NLL-trained; candidates are mixture samples)
# --------------------------------------------------------------------------

N_MODES = 3


def _tune_gmm(cfg):
    _tune(cfg)
    cfg.algo.action_sampler.gmm.enabled = True
    cfg.algo.action_sampler.gmm.num_modes = N_MODES
    cfg.algo.action_sampler.gmm.low_noise_eval = True
    cfg.algo.action_sampler.actor_layer_dims = list(LAYERS)


@pytest.fixture(scope="module")
def algo_pair_gmm():
    return _build_pair(_tune_gmm)


def torch_bcq_gmm_to_flax(ref):
    sd = {k: v.detach().numpy().copy() for k, v in ref.nets.state_dict().items()}
    sampler = {"net": {
        "mlp": {
            "fc0": _lin(sd, "action_sampler.nets.mlp._model.0"),
            "out": _lin(sd, "action_sampler.nets.mlp._model.2"),
        },
        "decoder": {
            f"head_{h}": _lin(sd, f"action_sampler.nets.decoder.nets.{h}")
            for h in ("mean", "scale", "logits")
        },
    }}
    params = {
        "action_sampler": sampler,
        "actor": {"mlp": _mlp3(sd, "actor", "action")},
        "actor_target": {"mlp": _mlp3(sd, "actor_target", "action")},
    }
    for i in range(2):
        params[f"critic{i}"] = {"mlp": _mlp3(sd, f"critic.{i}", "value")}
        params[f"critic{i}_target"] = {
            "mlp": _mlp3(sd, f"critic_target.{i}", "value")
        }
    return params


def make_gmm_step_noise(seed):
    """(mode, eps) pairs for the two mixture-sample sites, in the shared
    sample-major layout: backup (B*S,), actor phase (B,)."""
    rng = np.random.RandomState(seed)
    return {
        "enc": None,  # GMM sampler trains with NLL - no sample site
        "backup": (rng.randint(0, N_MODES, B * N_SAMPLES),
                   rng.randn(B * N_SAMPLES, A).astype(np.float32)),
        "actor": (rng.randint(0, N_MODES, B),
                  rng.randn(B, A).astype(np.float32)),
    }


def _ours_gmm_noise(noise):
    return {
        "enc": None,
        "backup": tuple(jnp.asarray(x) for x in noise["backup"]),
        "actor": tuple(jnp.asarray(x) for x in noise["actor"]),
    }


def _ref_gmm_patches(monkeypatch, queue):
    """Replace torch MixtureSameFamily.sample with a strict queue consumer
    of injected (mode, eps): sample = loc[mode] + scale[mode] * eps —
    exactly a mixture draw with the categorical pick and normal eps
    pinned."""
    import torch.distributions as D

    def sample(self, sample_shape=torch.Size()):
        mode_np, eps_np = queue.pop(0)
        mode = torch.from_numpy(np.asarray(mode_np)).long()
        eps = torch.from_numpy(eps_np)
        loc = self.component_distribution.base_dist.loc      # (N, M, A)
        scale = self.component_distribution.base_dist.scale
        assert loc.shape[0] == mode.shape[0]
        idx = mode.view(-1, 1, 1).expand(-1, 1, loc.shape[-1])
        return (loc.gather(1, idx) + scale.gather(1, idx) * eps[:, None, :]
                ).squeeze(1)

    monkeypatch.setattr(D.MixtureSameFamily, "sample", sample)


def _sync_gmm(ref, ours):
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=torch_bcq_gmm_to_flax(ref))


@pytest.mark.slow
def test_bcq_gmm_loss_parity(algo_pair_gmm, monkeypatch):
    """BCQ_GMM: validate-mode NLL sampler loss, batch-constrained critic
    losses over low-noise-eval mixture candidates, and perturbation-actor
    loss equal under identical injected (mode, eps) draws."""
    ref, ours = algo_pair_gmm
    _sync_gmm(ref, ours)
    raw = make_raw_batch(3)
    noise = make_gmm_step_noise(31)

    _ref_gmm_patches(monkeypatch, [noise["backup"], noise["actor"]])
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )

    ours._noise_hook = lambda: _ours_gmm_noise(noise)
    try:
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=True
        )["losses"]
    finally:
        ours._noise_hook = None

    for key in ("action_sampler/loss", "critic/critic1_loss",
                "critic/critic2_loss", "actor/loss"):
        rv = rinfo[key]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        np.testing.assert_allclose(float(oinfo[key]), want, atol=3e-5,
                                   rtol=1e-5, err_msg=key)


@pytest.mark.slow
def test_bcq_gmm_trajectory_parity(algo_pair_gmm, monkeypatch):
    """12 real BCQ_GMM steps track across the GMM sampler, both critics,
    the perturbation actor and the polyak'd targets — covering the
    reference's eval()-mode sampler during the critic phase (low-noise
    sigma=1e-4 mixture candidates)."""
    ref, ours = algo_pair_gmm
    _sync_gmm(ref, ours)
    # the validate-mode loss test leaves the torch sampler in eval()
    # (train_on_batch only restores train mode on real updates)
    ref.set_train()

    queue = []
    _ref_gmm_patches(monkeypatch, queue)

    for i in range(12):
        raw = make_raw_batch(300 + i)
        noise = make_gmm_step_noise(900 + i)
        queue.extend([noise["backup"], noise["actor"]])
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not queue, "reference consumed an unexpected number of draws"

        ours._noise_hook = lambda: _ours_gmm_noise(noise)
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            ours._noise_hook = None

    final_ref = torch_bcq_gmm_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 BCQ_GMM steps: {jax.tree_util.keystr(path)}",
        )

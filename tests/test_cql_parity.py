"""CQL loss + training-trajectory parity vs the reference torch algo
(reference ``robomimic/algo/cql.py:38-668``), run end-to-end through BOTH
frameworks' algo objects: the tanh-Gaussian policy loss with the learned
entropy weight, the bc_start_steps warmup baseline, the entropy-subtracted
critic backup, the conservative logsumexp penalty over random/current/next
action candidates, and the Lagrange-style learned cql weight — from
transplanted-identical weights on identical batches.

CQL is stochastic (five sample sites per step), so the harness pre-draws
every standard-normal eps / uniform array per step from one numpy RNG and
feeds the SAME draws to both frameworks: the torch side by monkeypatching
``TanhWrappedDistribution.rsample`` and ``torch.FloatTensor`` (the
reference's uniform sampler, cql.py:422), ours through the documented
``CQL._noise_hook`` seam. Layout note: the reference draws (N, B, A) and
permutes to batch-major before flattening; our step draws batch-major
(B*N, A) directly, so injected arrays are transposed accordingly.
"""

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
N_STEP = 2
N_RAND = 4
BC_START_STEPS = 3


def _tune(cfg):
    cfg.algo.critic.layer_dims = list(LAYERS)
    cfg.algo.actor.layer_dims = list(LAYERS)
    cfg.algo.discount = 0.95
    cfg.algo.n_step = N_STEP
    cfg.algo.target_tau = 0.05
    cfg.algo.critic.num_random_actions = N_RAND
    # exercise the entropy-subtracted backup (default is deterministic)
    cfg.algo.critic.deterministic_backup = False
    cfg.algo.critic.use_huber = False
    cfg.algo.actor.bc_start_steps = BC_START_STEPS
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

    rcfg = ref_config_factory("cql")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "cql", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("cql")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "cql", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
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


def torch_cql_to_flax(ref):
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
        "log_entropy_weight": {
            "value": jnp.asarray(sd["log_entropy_weight.param"]).reshape(())
        },
        "log_cql_weight": {
            "value": jnp.asarray(sd["log_cql_weight.param"]).reshape(())
        },
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
        "dones": (rng.rand(B, N_STEP) < 0.2).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


def make_step_noise(seed):
    """One training step's worth of draws, in the reference's (N, B, A)
    layout and call order: actor rsample, backup rsample, uniform randoms,
    curr-policy N-samples, next-policy N-samples."""
    rng = np.random.RandomState(seed)
    return {
        "actor": rng.randn(B, A).astype(np.float32),
        "backup": rng.randn(B, A).astype(np.float32),
        "rand": rng.uniform(-1.0, 1.0, (N_RAND, B, A)).astype(np.float32),
        "curr": rng.randn(N_RAND, B, A).astype(np.float32),
        "next": rng.randn(N_RAND, B, A).astype(np.float32),
    }


def _ref_noise_patches(monkeypatch, normal_queue, uniform_queue):
    """Make the reference consume our pre-drawn arrays: rsample becomes
    mean + std * eps (exactly Independent(Normal).rsample with injected
    eps), and torch.FloatTensor(N,B,A).uniform_ returns our uniforms."""
    import robomimic.models.distributions as ref_dists

    def rsample(self, sample_shape=torch.Size(), return_pretanh_value=False):
        e = torch.from_numpy(normal_queue.pop(0))
        z = self.base_dist.mean + self.base_dist.stddev * e
        out = torch.tanh(z) * self.scale
        return (out, z) if return_pretanh_value else out

    monkeypatch.setattr(ref_dists.TanhWrappedDistribution, "rsample", rsample)

    class _FakeFloatTensor:
        def __init__(self, *shape):
            self.shape = shape

        def uniform_(self, lo, hi):
            t = torch.from_numpy(uniform_queue.pop(0))
            assert tuple(t.shape) == tuple(self.shape)
            return t

    monkeypatch.setattr(torch, "FloatTensor", _FakeFloatTensor)


def _ours_noise(noise):
    """Transpose the reference's (N, B, A) draws into our batch-major
    (B*N, A) layout (row i*N+j of the tiled batch is obs_i, sample_j)."""
    def flat(x):
        return jnp.asarray(x.transpose(1, 0, 2).reshape(B * N_RAND, A))

    return {
        "actor": jnp.asarray(noise["actor"]),
        "backup": jnp.asarray(noise["backup"]),
        "rand": flat(noise["rand"]),
        "curr": flat(noise["curr"]),
        "next": flat(noise["next"]),
    }


def _sync(ref, ours):
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=torch_cql_to_flax(ref))


@pytest.mark.slow
def test_cql_loss_parity(algo_pair, monkeypatch):
    """validate-mode losses equal under identical injected noise: policy
    loss (entropy_weight * logp - minQ baseline), entropy weight, both
    conservative critic losses, and the clamped cql weight."""
    ref, ours = algo_pair
    _sync(ref, ours)
    raw = make_raw_batch(1)
    noise = make_step_noise(11)

    _ref_noise_patches(
        monkeypatch,
        [noise["actor"], noise["backup"], noise["curr"], noise["next"]],
        [noise["rand"]],
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
        ("actor/loss", "actor/loss"),
        ("entropy_weight", "entropy_weight"),
        ("critic/critic1_loss", "critic/critic1_loss"),
        ("critic/critic2_loss", "critic/critic2_loss"),
        ("critic/cql_weight", "critic/cql_weight"),
    ]
    for rk, ok in pairs:
        rv = rinfo[rk]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        got = float(oinfo[ok])
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5,
                                   err_msg=f"{rk} vs {ok}")


@pytest.mark.slow
def test_cql_training_trajectory_parity(algo_pair, monkeypatch):
    """12 real steps through both frameworks with identical injected noise:
    actor, both critics, the polyak'd targets AND the learned
    log_entropy_weight / log_cql_weight must track — covering the
    bc_start_steps warmup switch (steps 0-2 use the dataset-likelihood
    baseline, reference cql.py:300-305), the post-policy-step entropy
    weight in the backup, and the pre-step cql weight in the critic loss."""
    ref, ours = algo_pair
    _sync(ref, ours)

    normal_queue, uniform_queue = [], []
    _ref_noise_patches(monkeypatch, normal_queue, uniform_queue)

    for i in range(12):
        raw = make_raw_batch(100 + i)
        noise = make_step_noise(500 + i)
        normal_queue.extend(
            [noise["actor"], noise["backup"], noise["curr"], noise["next"]]
        )
        uniform_queue.append(noise["rand"])
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        assert not normal_queue and not uniform_queue, (
            "reference consumed an unexpected number of draws"
        )

        ours._noise_hook = lambda: _ours_noise(noise)
        try:
            ours.train_on_batch(
                ours.process_batch_for_training(raw), epoch=1, validate=False
            )
        finally:
            ours._noise_hook = None

    final_ref = torch_cql_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 CQL steps: {jax.tree_util.keystr(path)}",
        )

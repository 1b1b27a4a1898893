"""Inference-path (rollout ``get_action``) parity for the offline-RL and
hierarchical families, vs the reference torch algos from
transplanted-identical weights. The TRAINING paths are covered by the
whole-algo parity modules; these tests pin the SERVING semantics:

- TD3-BC: deterministic tanh actor — exact equality.
- CQL: the reference samples its tanh-Gaussian in eval mode, where
  GaussianActorNetwork pins sigma to 1e-4 (low-noise eval); ours returns
  tanh(mean). Equal within the 1e-4-noise envelope.
- IQL: the default actor is a (tanh-)Gaussian whose eval-mode sample
  pins sigma to 1e-4 — both sides land within the low-noise envelope of
  tanh(mean).
- BCQ: the full sample -> perturb(live actor) -> argmax-Q(critic0)
  pipeline with injected prior draws on both sides.
- HBC: the subgoal-refresh cadence (every ``subgoal_update_interval``
  steps) + the goal-conditioned BC_RNN actor's STATEFUL stepwise rollout
  over 6 env steps.

Each pair reuses the corresponding training-parity module's builders and
weight transplants (``algo_pair._fixture_function()``).
"""

import numpy as np
import pytest


import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _pair(module_name):
    import importlib

    m = importlib.import_module(module_name)
    # unwrap the fixture to its plain function across pytest versions
    fixture = m.algo_pair
    fn = (getattr(fixture, "_fixture_function", None)
          or getattr(fixture, "__wrapped__", None) or fixture)
    ref, ours = fn()
    m._sync(ref, ours)
    return m, ref, ours


def _obs(m, seed):
    raw = m.make_raw_batch(seed)
    # single-frame obs for the flat RL algos: [B, O]
    return {k: v[:, 0] for k, v in raw["obs"].items()}


@pytest.mark.slow
def test_td3bc_get_action_parity():
    m, ref, ours = _pair("test_td3bc_parity")
    ref.set_eval()
    obs = _obs(m, 5)
    want = ref.get_action({k: torch.from_numpy(v) for k, v in obs.items()})
    got = ours.get_action(obs)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_cql_get_action_parity():
    m, ref, ours = _pair("test_cql_parity")
    ref.set_eval()
    obs = _obs(m, 5)
    torch.manual_seed(0)  # the 1e-4-sigma eval sample still draws eps
    want = ref.get_action({k: torch.from_numpy(v) for k, v in obs.items()})
    got = ours.get_action(obs)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=2e-3
    )


@pytest.mark.slow
def test_iql_get_action_parity():
    """The reference IQL's default actor is a (tanh-)Gaussian whose
    eval-mode sample pins sigma to 1e-4 — both sides land within the
    low-noise envelope of tanh(mean)."""
    m, ref, ours = _pair("test_iql_parity")
    ref.set_eval()
    obs = _obs(m, 5)
    torch.manual_seed(0)
    want = ref.get_action({k: torch.from_numpy(v) for k, v in obs.items()})
    got = ours.get_action(obs)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=2e-3
    )


@pytest.mark.slow
def test_bcq_get_action_parity(monkeypatch):
    m, ref, ours = _pair("test_bcq_parity")
    ref.set_eval()
    obs = _obs(m, 5)
    b = next(iter(obs.values())).shape[0]
    n = int(ref.algo_config.critic.num_action_samples_rollout)
    z = np.random.RandomState(9).randn(b * n, m.LATENT).astype(np.float32)

    def randn(*shape, **kwargs):
        assert tuple(shape) == tuple(z.shape)
        return torch.from_numpy(z)

    monkeypatch.setattr(torch, "randn", randn)
    want = ref.get_action({k: torch.from_numpy(v) for k, v in obs.items()})

    orig = type(ours)._sample_actions

    def inject(params, aux, o, key, num_samples, z_=None):
        return orig(ours, params, aux, o, key, num_samples,
                    z=jnp.asarray(z))

    monkeypatch.setattr(ours, "_sample_actions", inject)
    got = ours.get_action(obs)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), atol=1e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_hbc_get_action_cadence_parity():
    """6 stateful env steps: the planner refreshes the subgoal on steps 0,
    k, 2k... (reference hbc.py:275-310) and the BC_RNN actor steps its
    hidden state between refreshes — actions must match step-for-step."""
    m, ref, ours = _pair("test_hbc_parity")
    ref.set_eval()
    ref.reset()
    ours.reset()
    interval = int(ref.algo_config.subgoal_update_interval)
    assert interval >= 2  # the cadence must actually matter in 6 steps

    rng = np.random.RandomState(3)
    for step in range(6):
        obs = {"flat": rng.randn(2, m.O).astype(np.float32)}
        want = ref.get_action(
            {k: torch.from_numpy(v) for k, v in obs.items()}
        )
        got = ours.get_action(obs)
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), atol=1e-4,
            err_msg=f"rollout step {step}",
        )


@pytest.mark.slow
def test_iris_get_subgoal_predictions_parity(monkeypatch):
    """IRIS serving path: the ValuePlanner samples N subgoals from the
    GL_VAE prior and ranks them by the BCQ value network's best-Q-over-
    candidates state value (reference gl.py:702-736) — with the prior and
    candidate draws injected identically on both sides, the selected
    subgoal must match exactly."""
    from robot_manipulation_vq_vae_tpu.algo.gl import SubgoalVAE

    m, ref, ours = _pair("test_iris_parity")
    ref.set_eval()
    obs = {"flat": np.random.RandomState(4).randn(2, m.O).astype(np.float32)}
    b = 2
    n_vp = int(ref.algo_config.value_planner.num_samples)
    n_act = int(
        ref.algo_config.value_planner.value.critic.num_action_samples_rollout
    )
    rng = np.random.RandomState(40)
    z_gl = rng.randn(b * n_vp, m.GL_LATENT).astype(np.float32)
    z_bcq = rng.randn(b * n_vp * n_act, m.BCQ_LATENT).astype(np.float32)

    queue = [z_gl, z_bcq]

    def randn(*shape, **kwargs):
        t = torch.from_numpy(queue.pop(0))
        assert tuple(t.shape) == tuple(shape)
        return t

    monkeypatch.setattr(torch, "randn", randn)
    # the reference exposes subgoal prediction only on the ValuePlanner
    # (its HBC/IRIS never override the base PlannerAlgo stub)
    want = ref.planner.get_subgoal_predictions(
        {k: torch.from_numpy(v) for k, v in obs.items()}
    )
    assert not queue

    def pinned_call(self, obs_dict, goal_dict=None, train=False):
        cond = self._cond(obs_dict, goal_dict, train)
        return self.decode(jnp.asarray(z_gl), cond)

    monkeypatch.setattr(SubgoalVAE, "__call__", pinned_call)
    value_net = ours.planner.value_net
    orig_sample = type(value_net)._sample_actions

    def inject(params, aux, o, key, num_samples, z=None):
        return orig_sample(value_net, params, aux, o, key, num_samples,
                           z=jnp.asarray(z_bcq))

    monkeypatch.setattr(value_net, "_sample_actions", inject)
    got = ours.get_subgoal_predictions(obs)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].detach().numpy(), atol=1e-5,
            rtol=1e-4, err_msg=k,
        )

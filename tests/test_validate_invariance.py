"""Validate-mode must be a pure read: for EVERY algorithm in the
registry, a ``train_on_batch(..., validate=True)`` call may compute
losses but must leave parameters, optimizer states AND auxiliary
collections (EMA codebooks, BN stats) bit-identical — the reference's
``maybe_no_grad``/no-backprop semantics. This sweep exists because the
parity campaign caught exactly this bug class once (ICLRNN_GMM's jitted
step applied optimizer updates in validate mode).

A real train step runs first so optimizer states are past their zero
init (a validate leak that re-zeroes or double-steps state would
otherwise be invisible).
"""

import numpy as np
import pytest

import jax

from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, O, A, T = 8, 5, 3, 14


def _set(cfg, path, value):
    node = cfg
    parts = path.split(".")
    for p in parts[:-1]:
        node = node[p]
    node[parts[-1]] = value


# algo name -> (config name, {config-path: value})
CASES = {
    "bc": ("bc", {}),
    "bc_rnn": ("bc", {"algo.rnn.enabled": True, "algo.rnn.horizon": 4,
                      "algo.rnn.hidden_dim": 10, "algo.rnn.num_layers": 2}),
    "bc_vae": ("bc", {"algo.vae.enabled": True,
                      "algo.vae.encoder_layer_dims": [8, 8],
                      "algo.vae.decoder_layer_dims": [8, 8]}),
    "bcq": ("bcq", {"algo.actor.enabled": True,
                    "algo.critic.num_action_samples": 3}),
    "bcq_gmm": ("bcq", {"algo.action_sampler.gmm.enabled": True,
                        "algo.critic.num_action_samples": 3}),
    "bcq_distributional": ("bcq", {
        "algo.critic.distributional.enabled": True,
        "algo.critic.distributional.num_atoms": 11,
        "algo.critic.value_bounds": [-10.0, 10.0],
        "algo.critic.num_action_samples": 3}),
    "cql": ("cql", {"algo.critic.num_random_actions": 3}),
    "iql": ("iql", {}),
    "td3_bc": ("td3_bc", {}),
    "gl": ("gl", {"algo.vae.enabled": False}),
    "gl_vae": ("gl", {"algo.vae.enabled": True}),
    "hbc": ("hbc", {"algo.planner.vae.enabled": False,
                    "algo.actor.rnn.enabled": True,
                    "algo.actor.rnn.horizon": 4,
                    "algo.actor.rnn.hidden_dim": 10,
                    "algo.actor.rnn.num_layers": 2}),
    "iris": ("iris", {"algo.value_planner.planner.vae.enabled": True,
                      "algo.value_planner.value.critic.num_action_samples": 3,
                      "algo.actor.rnn.enabled": True,
                      "algo.actor.rnn.horizon": 4,
                      "algo.actor.rnn.hidden_dim": 10,
                      "algo.actor.rnn.num_layers": 2}),
    "icl_plain": ("icl", {"algo.transformer.enabled": False,
                          "algo.transformer.ln_act_enabled": False}),
    "icl_gaussian": ("icl", {"algo.transformer.enabled": False,
                             "algo.transformer.ln_act_enabled": False,
                             "algo.gaussian.enabled": True}),
    "icl_rnn_gmm": ("icl", {"algo.transformer.enabled": False,
                            "algo.transformer.ln_act_enabled": False,
                            "algo.gmm.enabled": True,
                            "algo.rnn.enabled": True,
                            "algo.rnn.horizon": 4,
                            "algo.rnn.hidden_dim": 10,
                            "algo.rnn.num_layers": 2}),
    "icl_hvqvae": ("icl", {
        "algo.transformer.enabled": True,
        "algo.transformer.ln_act_enabled": False,
        "algo.transformer.context_length": 4,
        "algo.transformer.embed_dim": 32,
        "algo.transformer.num_layers": 2,
        "algo.transformer.num_heads": 4,
        "algo.transformer.vqvae.num_subclusters": 16,
        "algo.transformer.vqvae.num_clusters": 8,
        "algo.transformer.vqvae.embed_dim": 32,
        "algo.transformer.vqvae.num_stages": 1,
        "algo.transformer.vqvae.num_layers_per_stage": 2,
        "algo.transformer.supervise_all_steps": True}),
    "icl_gmm_paper": ("icl_gmm_paper", {
        "algo.transformer.context_length": 4,
        "algo.transformer.embed_dim": 32,
        "algo.transformer.num_layers": 2,
        "algo.transformer.num_heads": 4,
        "algo.transformer.ln_act_enabled": False,
        "algo.transformer.supervise_all_steps": True}),
    "icl_mamba": ("icl_mamba", {
        "algo.mamba.enabled": True,
        "algo.mamba.ln_act_enabled": False,
        "algo.mamba.context_length": 4,
        "algo.mamba.embed_dim": 32,
        "algo.mamba.num_layers": 2,
        "algo.mamba.num_heads": 4,
        "algo.mamba.vqvae.num_subclusters": 16,
        "algo.mamba.vqvae.num_clusters": 8,
        "algo.mamba.vqvae.embed_dim": 32,
        "algo.mamba.vqvae.num_stages": 1,
        "algo.mamba.vqvae.num_layers_per_stage": 2,
        "algo.mamba.supervise_all_steps": True}),
    "mcr": ("mcr", {}),
    "diffusion_policy": ("diffusion_policy", {
        "algo.horizon.observation_horizon": 2,
        "algo.horizon.action_horizon": 2,
        "algo.horizon.prediction_horizon": 4}),
    "act": ("act", {}),
}


def _make(case):
    config_name, overrides = CASES[case]
    cfg = config_factory(config_name)
    with cfg.values_unlocked():
        for side in ("planner", "actor", "value_planner.planner",
                     "value_planner.value"):
            node = cfg.observation
            ok = True
            for part in side.split("."):
                if part not in node:
                    ok = False
                    break
                node = node[part]
            if ok and "modalities" in node:
                node.modalities.obs.low_dim = ["flat"]
                node.modalities.obs.rgb = []
                if "subgoal" in node.modalities:
                    node.modalities.subgoal.low_dim = ["flat"]
                    node.modalities.subgoal.rgb = []
        if "modalities" in cfg.observation:
            cfg.observation.modalities.obs.low_dim = ["flat"]
            cfg.observation.modalities.obs.rgb = []
            if "subgoal" in cfg.observation.modalities:
                cfg.observation.modalities.subgoal.low_dim = ["flat"]
                cfg.observation.modalities.subgoal.rgb = []
        cfg.train.seq_length = 4
        for path, value in overrides.items():
            _set(cfg, path, value)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    algo_name = config_name
    return AlgoReg.algo_factory(
        algo_name, cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )


def make_raw_batch(seed, case):
    rng = np.random.RandomState(seed)
    b = 2 * B if "icl" in case else B
    return {
        "obs": {"flat": rng.randn(b, T, O).astype(np.float32)},
        "next_obs": {"flat": rng.randn(b, T, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (b, T, A)).astype(np.float32),
        "rewards": rng.rand(b, T).astype(np.float32),
        "dones": (rng.rand(b, T) < 0.2).astype(np.float32),
    }


def _states(algo):
    """Every AlgoState reachable from an algo (hierarchical algos nest)."""
    if hasattr(algo, "planner"):
        inner = getattr(algo.planner, "planner", None)
        if inner is not None:  # ValuePlanner
            return (_states(inner) + _states(algo.planner.value_net)
                    + _states(algo.actor))
        return _states(algo.planner) + _states(algo.actor)
    return [algo]


@pytest.mark.slow
@pytest.mark.parametrize("case", sorted(CASES))
def test_validate_leaves_state_untouched(case):
    algo = _make(case)
    raw = make_raw_batch(0, case)
    # one REAL step first so optimizer states are non-trivial
    algo.train_on_batch(algo.process_batch_for_training(raw), epoch=1,
                        validate=False)

    before = [
        jax.device_get({
            "params": a.state.params,
            "opt": a.state.opt_states,
            "aux": a.state.aux,
        })
        for a in _states(algo)
    ]
    raw2 = make_raw_batch(1, case)
    algo.train_on_batch(algo.process_batch_for_training(raw2), epoch=1,
                        validate=True)
    after = [
        jax.device_get({
            "params": a.state.params,
            "opt": a.state.opt_states,
            "aux": a.state.aux,
        })
        for a in _states(algo)
    ]
    for b_tree, a_tree in zip(before, after):
        flat_b = jax.tree_util.tree_leaves_with_path(b_tree)
        flat_a = dict(jax.tree_util.tree_leaves_with_path(a_tree))
        assert len(flat_b) == len(flat_a)
        for path, leaf in flat_b:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_a[path]),
                err_msg=f"{case}: validate step mutated "
                        f"{jax.tree_util.keystr(path)}",
            )

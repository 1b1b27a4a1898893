"""Whole-algo training parity for the NON-transformer ICL variants —
ICL (plain MSE actor), ICLGaussian, ICLGMM, ICLRNN, ICLRNN_GMM (reference
``robomimic/algo/icl.py:147-510``) — every factory-reachable ICL class
(the transformer branches are covered by `test_icl_parity.py` /
`test_icl_gmm_parity.py`; the reference's vae branch is more unreachable
upstream code — its factory routes it to ICLTransformerHVQVAE too, a
quirk both factories reproduce).

These classes are deterministic in training (composite/NLL losses with no
sample site), so the harness is the BC-family pattern: transplanted
weights, validate-mode loss equality, 12-step Adam trajectory tracking.
The RNN variants additionally exercise the torch nn.LSTM ->
TorchLSTMCell transplant over the ICL config's rnn horizon.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_flagship import load_reference_robomimic
from reference_loader import ensure_diffusers_stub
from test_training_trajectory_parity import assert_mostly_close
from test_hbc_parity import _lstm_cell
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, O, A, T = 16, 5, 3, 4
LAYERS = (8, 8)
H_RNN, N_LSTM = 10, 2
LR = 1e-3

MODES = {
    "plain": dict(cls="ICL", heads=("action",),
                  loss_keys=("l2_loss", "l1_loss", "cos_loss", "action_loss")),
    "gaussian": dict(cls="ICLGaussian", heads=("mean", "scale"),
                     loss_keys=("log_probs", "action_loss")),
    "gmm": dict(cls="ICLGMM", heads=("mean", "scale", "logits"),
                loss_keys=("log_probs", "action_loss")),
    "rnn": dict(cls="ICLRNN", heads=("action",),
                loss_keys=("l2_loss", "l1_loss", "cos_loss", "action_loss")),
    "rnn_gmm": dict(cls="ICLRNN_GMM", heads=("mean", "scale", "logits"),
                    loss_keys=("log_probs", "action_loss")),
}


def _tune(cfg, mode):
    cfg.algo.transformer.enabled = False
    cfg.algo.transformer.ln_act_enabled = False
    cfg.algo.gaussian.enabled = mode == "gaussian"
    cfg.algo.gmm.enabled = mode in ("gmm", "rnn_gmm")
    cfg.algo.vae.enabled = False
    cfg.algo.rnn.enabled = mode in ("rnn", "rnn_gmm")
    cfg.algo.rnn.horizon = T
    cfg.algo.rnn.hidden_dim = H_RNN
    cfg.algo.rnn.num_layers = N_LSTM
    cfg.algo.actor_layer_dims = [] if mode.startswith("rnn") else list(LAYERS)
    cfg.algo.optim_params.policy.learning_rate.initial = LR
    cfg.algo.optim_params.policy.learning_rate.scheduler_type = None
    cfg.algo.optim_params.policy.regularization.L2 = 0.0
    cfg.train.seq_length = T


def _build_pair(mode):
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    from robomimic.algo import algo_factory as ref_algo_factory

    rcfg = ref_config_factory("icl")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        _tune(rcfg, mode)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "icl", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )

    cfg = config_factory("icl")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg, mode)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "icl", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    want_cls = MODES[mode]["cls"]
    assert type(ref).__name__ == want_cls, type(ref).__name__
    assert type(ours).__name__ == want_cls, type(ours).__name__
    return ref, ours


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def _transplant(ref, mode):
    sd = {k: v.detach().numpy().copy() for k, v in ref.nets.state_dict().items()}
    heads = MODES[mode]["heads"]
    if mode.startswith("rnn"):
        rnn = {
            f"lstm{i}": _lstm_cell(sd, "policy.nets.rnn.nets", i)
            for i in range(N_LSTM)
        }
        per_step = "policy.nets.rnn.per_step_net.nets"
        if heads == ("action",):
            return {"policy": {
                "head": {"out": _lin(sd, f"{per_step}.action")}, "rnn": rnn,
            }}
        head_names = {"mean": "mean_head", "scale": "scale_head",
                      "logits": "logit_head"}
        return {"policy": {
            "rnn": rnn,
            **{head_names[h]: {"out": _lin(sd, f"{per_step}.{h}")}
               for h in heads},
        }}
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
        "obs": {"flat": rng.randn(B, T, O).astype(np.float32)},
        "actions": rng.uniform(-0.9, 0.9, (B, T, A)).astype(np.float32),
    }


def _to_torch(batch):
    return {
        k: ({kk: torch.from_numpy(np.asarray(vv)) for kk, vv in v.items()}
            if isinstance(v, dict) else torch.from_numpy(np.asarray(v)))
        for k, v in batch.items()
    }


@pytest.mark.slow
@pytest.mark.parametrize("mode", sorted(MODES))
def test_icl_variant_loss_and_trajectory_parity(mode):
    ref, ours = _build_pair(mode)
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    ours.state = ours.state.replace(params=_transplant(ref, mode))

    # --- validate-mode loss parity (reference validates under set_eval)
    ref.set_eval()
    raw = make_raw_batch(1)
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )["losses"]
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]
    for key in MODES[mode]["loss_keys"]:
        np.testing.assert_allclose(
            float(oinfo[key]), float(rinfo[key].detach()), atol=3e-5,
            rtol=1e-5, err_msg=f"{mode}: {key}",
        )

    # --- 12-step Adam trajectory parity
    ref.set_train()
    for i in range(12):
        raw = make_raw_batch(100 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )
    final_ref = _transplant(ref, mode)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 ICL[{mode}] steps: {jax.tree_util.keystr(path)}",
        )

"""Whole-algo training parity for the PAPER path — ICLTransformer_GMM
(reference ``robomimic/algo/icl.py:1408-1540``; unreachable from the
reference factory, which routes every transformer config to
ICLTransformerHVQVAE — reproduced quirk, exposed here as the
``icl_gmm_paper`` algo name): the in-context batch split (context half /
train half keyed on lang_emb), the LipVQ tokenizer embedded in the ICL
encoder, the 3T-interleaved ICL_MIMO transformer with GMM head, and the
TWO-BACKWARD scheme — the LipVQ loss steps a dedicated AdamW(1e-3, wd
1e-4) over the tokenizer subtree, then the NLL steps the policy optimizer
over all policy params.

Deterministic (GMM NLL has no sample site; LipVQ quantization is exact;
dropouts pinned to 0), so no noise injection is needed. Loss comparison
happens on TRAIN-mode steps: the reference class calls
``self._vq_vae_loss.backward()`` unconditionally in ``_compute_losses``,
so its validate path crashes under ``maybe_no_grad`` — dead upstream code
(the factory never reaches this class); our validate mode works and is
covered by the e2e matrix.
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
from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
    convert_gpt_backbone,
    convert_lipvq,
)
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B2 = 16          # full batch; the algo splits it into context/train halves
O, LANG = 5, 7
A = 12           # LipVQ's latent/action dim in the shipped paper config
T = 4
EMBED, HEADS, N_LAYERS = 32, 4, 2
N_MODES = 5
LR = 1e-3


def _tune(cfg):
    cfg.algo.gmm.enabled = True
    cfg.algo.gmm.num_modes = N_MODES
    cfg.algo.transformer.enabled = True
    cfg.algo.transformer.context_length = T
    cfg.algo.transformer.embed_dim = EMBED
    cfg.algo.transformer.num_layers = N_LAYERS
    cfg.algo.transformer.num_heads = HEADS
    cfg.algo.transformer.emb_dropout = 0.0
    cfg.algo.transformer.attn_dropout = 0.0
    cfg.algo.transformer.block_output_dropout = 0.0
    cfg.algo.transformer.fast_enabled = False
    cfg.algo.transformer.bin_enabled = False
    cfg.algo.transformer.ln_act_enabled = False
    cfg.algo.transformer.vq_vae_enabled = True
    cfg.algo.transformer.supervise_all_steps = True
    cfg.algo.transformer.pred_future_acs = False
    cfg.algo.optim_params.policy.learning_rate.initial = LR
    cfg.algo.optim_params.policy.learning_rate.scheduler_type = None
    cfg.algo.optim_params.policy.regularization.L2 = 0.0
    cfg.train.max_grad_norm = 1e6


@pytest.fixture(scope="module")
def algo_pair():
    load_reference_robomimic()
    ensure_diffusers_stub()
    from robomimic.config import config_factory as ref_config_factory
    import robomimic.utils.obs_utils as RefObsUtils
    import robomimic.algo.icl as ref_icl

    rcfg = ref_config_factory("icl")
    with rcfg.unlocked():
        rcfg.observation.modalities.obs.low_dim = ["flat", "lang_emb"]
        rcfg.observation.modalities.obs.rgb = []
        rcfg.algo.language_conditioned = False
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    # the reference factory cannot reach ICLTransformer_GMM (quirk #4);
    # instantiate the class directly, as its paper experiments did
    ref = ref_icl.ICLTransformer_GMM(
        algo_config=rcfg.algo, obs_config=rcfg.observation,
        global_config=rcfg,
        obs_key_shapes={"flat": (O,), "lang_emb": (LANG,)},
        ac_dim=A, device="cpu",
    )

    cfg = config_factory("icl_gmm_paper")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat", "lang_emb"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "icl_gmm_paper", cfg,
        obs_key_shapes={"flat": (O,), "lang_emb": (LANG,)}, ac_dim=A,
    )
    assert type(ours).__name__ == "ICLTransformer_GMM"
    return ref, ours


def _lin(sd, key):
    return {
        "kernel": jnp.asarray(sd[key + ".weight"].T.copy()),
        "bias": jnp.asarray(sd[key + ".bias"].copy()),
    }


def torch_icl_gmm_to_flax(ref):
    sd = {k: v.detach().numpy().copy() for k, v in ref.nets.state_dict().items()}
    # the timestep embedding lives under params., not nets.
    sd["policy.params.embed_timestep"] = (
        ref.nets["policy"].params["embed_timestep"].detach().numpy().copy()
    )
    p = "policy.nets."
    net = {
        "encoder": {"action_network": jax.tree_util.tree_map(
            jnp.asarray,
            convert_lipvq(sd, prefix=p + "encoder.action_network."),
        )},
        "embedding": {
            "embed_encoder": _lin(sd, p + "embed_encoder"),
            "embed_ln": {
                "scale": jnp.asarray(sd[p + "embed_ln.weight"].copy()),
                "bias": jnp.asarray(sd[p + "embed_ln.bias"].copy()),
            },
            "embed_timestep": jnp.asarray(
                sd["policy.params.embed_timestep"]
            ),
        },
        "transformer": jax.tree_util.tree_map(
            jnp.asarray,
            convert_gpt_backbone(
                sd, prefix=p + "transformer.", num_layers=N_LAYERS
            ),
        ),
        "decoder": {
            "head_mean": _lin(sd, p + "decoder.nets.mean"),
            "head_scale": _lin(sd, p + "decoder.nets.scale"),
            "head_logits": _lin(sd, p + "decoder.nets.logits"),
        },
    }
    return {"policy": {"net": net}}


def make_raw_batch(seed):
    rng = np.random.RandomState(seed)
    return {
        "obs": {
            "flat": rng.randn(B2, T, O).astype(np.float32),
            "lang_emb": rng.randn(B2, T, LANG).astype(np.float32),
        },
        "actions": rng.uniform(-0.9, 0.9, (B2, T, A)).astype(np.float32),
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
    ours.state = ours.state.replace(params=torch_icl_gmm_to_flax(ref))


@pytest.mark.slow
def test_icl_gmm_paper_training_parity(algo_pair):
    """12 real two-backward steps through both frameworks: per-step NLL,
    action loss and LipVQ loss equal (computed pre-update, so step 1 is a
    pure loss-parity check), and the final policy params — LipVQ tokenizer
    (stepped by BOTH optimizers), embeddings, GPT trunk and GMM heads —
    track the reference."""
    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_train()

    for i in range(12):
        raw = make_raw_batch(100 + i)
        rinfo = ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        oinfo = ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )["losses"]
        for key in ("log_probs", "action_loss"):
            np.testing.assert_allclose(
                float(oinfo[key]), float(rinfo["losses"][key].detach()),
                atol=2e-4, rtol=2e-4, err_msg=f"step {i}: {key}",
            )
        np.testing.assert_allclose(
            float(oinfo["vq_vae_loss"]), float(ref._vq_vae_loss.detach()),
            atol=2e-4, rtol=2e-4, err_msg=f"step {i}: vq_vae_loss",
        )

    final_ref = torch_icl_gmm_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 paper-ICL steps: {jax.tree_util.keystr(path)}",
        )

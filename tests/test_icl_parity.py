"""Whole-algo training parity for the FLAGSHIP path — ICLTransformerHVQVAE
(reference ``robomimic/algo/icl.py:909-1405``) — run end-to-end through
BOTH frameworks' algo objects from transplanted-identical weights: the
HVQVAE forward with EMA codebook mutation, the transformer policy
sequence prediction, the weighted L2+SmoothL1+cosine action loss, the
combined ``0.1*vqvae_loss + action_loss`` single-backward co-training
step, and the separate policy/vqvae Adam optimizers.

Determinism: low_dim obs (no crop randomizer), every dropout pinned to 0,
HVQVAE codebooks pre-initialized healthy on both sides (cluster_size 10,
decay 0.99: the RNG-dependent dead-code replacement cannot fire within 12
steps), so NO noise injection is needed — unlike the CQL/BCQ harnesses.

Transplants reuse the shipped converter (`utils/ckpt_conversion.py
convert_transformer_actor`, the same mapping the flagship `.pth` interop
test exercises) and the HVQVAE mapping from `test_hvqvae_parity`.
"""


import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from reference_flagship import load_reference_robomimic
from reference_loader import ensure_diffusers_stub
from test_training_trajectory_parity import assert_mostly_close
import test_hvqvae_parity as thp
from robot_manipulation_vq_vae_tpu.config import config_factory
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
    convert_transformer_actor,
)
import robot_manipulation_vq_vae_tpu.algo as AlgoReg

B, O, A = 8, 5, 3
T = 4            # transformer context length
EMBED, HEADS, N_LAYERS = 32, 4, 2
# HVQVAE sized to match test_hvqvae_parity's STAGES/LAYERS so its
# torch_to_flax mapping is directly reusable
KZ, KQ = 16, 8
LR = 1e-3


def _tune(cfg):
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
    cfg.algo.transformer.vqvae.num_subclusters = KZ
    cfg.algo.transformer.vqvae.num_clusters = KQ
    cfg.algo.transformer.vqvae.embed_dim = EMBED
    cfg.algo.transformer.vqvae.num_stages = thp.STAGES
    cfg.algo.transformer.vqvae.num_layers_per_stage = thp.LAYERS
    cfg.algo.transformer.vqvae.dropout = 0.0
    cfg.algo.transformer.vqvae.lambda_rec = 1.0
    cfg.algo.transformer.vqvae.pretrain_epochs = 0
    cfg.train.max_grad_norm = 1e6  # exercised on both sides, never fires
    cfg.algo.optim_params.policy.learning_rate.initial = LR
    cfg.algo.optim_params.policy.learning_rate.scheduler_type = None
    cfg.algo.optim_params.policy.regularization.L2 = 0.0


@pytest.fixture(scope="module")
def algo_pair():
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
        _tune(rcfg)
    rcfg.lock()
    RefObsUtils.initialize_obs_utils_with_config(rcfg)
    torch.manual_seed(0)
    ref = ref_algo_factory(
        "icl", rcfg, obs_key_shapes={"flat": (O,)}, ac_dim=A, device="cpu"
    )
    # pre-initialize the EMA codebooks healthy, exactly like
    # test_training_trajectory_parity's HVQVAE co-training setup
    vq = ref.nets["vqvae"]
    with torch.no_grad():
        vq.codebook_z.copy_(
            torch.nn.functional.normalize(torch.randn(KZ, EMBED), dim=-1)
        )
        vq.codebook_q.copy_(
            torch.nn.functional.normalize(torch.randn(KQ, EMBED), dim=-1)
        )
        vq.embed_avg_z.copy_(vq.codebook_z * 10.0)
        vq.embed_avg_q.copy_(vq.codebook_q * 10.0)
        vq.cluster_size_z.fill_(10.0)
        vq.cluster_size_q.fill_(10.0)
        vq.codebooks_initialized.fill_(True)

    cfg = config_factory("icl")
    with cfg.values_unlocked():
        cfg.observation.modalities.obs.low_dim = ["flat"]
        cfg.observation.modalities.obs.rgb = []
        _tune(cfg)
    cfg.lock()
    ObsUtils.initialize_obs_utils_with_config(cfg)
    ours = AlgoReg.algo_factory(
        "icl", cfg, obs_key_shapes={"flat": (O,)}, ac_dim=A
    )
    assert type(ref).__name__ == "ICLTransformerHVQVAE"
    assert type(ours).__name__ == "ICLTransformerHVQVAE"
    return ref, ours


def _policy_convert(sd):
    """Policy-subtree converter over a name->array mapping (weights OR
    Adam moments — the mapping is pure transposes, so both transform
    identically)."""
    cfg_view = {
        "algo": {"transformer": {"num_layers": N_LAYERS}},
        "observation": {"modalities": {"obs": {"rgb": []}}},
    }
    pol_params, _ = convert_transformer_actor(sd, cfg_view, prefix="policy.")
    return pol_params


def _vq_param_convert(sd):
    """HVQVAE PARAM-only converter (no vq buffers) over a name->array
    mapping — the moments counterpart of test_hvqvae_parity.torch_to_flax."""
    enc = {
        "input_projection": {
            "kernel": sd["encoder.input_projection.weight"].T,
            "bias": sd["encoder.input_projection.bias"],
        },
        "ln": {"scale": sd["encoder.ln.weight"], "bias": sd["encoder.ln.bias"]},
    }
    enc.update(thp._mstcn_params("encoder", sd, thp.STAGES, thp.LAYERS))
    dec = {
        "output_projection": {
            "kernel": sd["decoder.output_projection.weight"].T,
            "bias": sd["decoder.output_projection.bias"],
        }
    }
    dec.update(thp._mstcn_params("decoder", sd, thp.STAGES, thp.LAYERS))
    return {"encoder": enc, "decoder": dec}


def torch_icl_to_flax(ref):
    """Map the reference algo's full state into (params, aux) trees."""
    sd = {k: v.detach().numpy().copy() for k, v in ref.nets.state_dict().items()}
    pol_params = _policy_convert(sd)
    vq_vars = thp.torch_to_flax(ref.nets["vqvae"])
    # jnp.array(copy=True): torch mutates its buffers in place (optimizers,
    # EMA); on CPU jnp.asarray may zero-copy the shared numpy views, which
    # would silently alias our state to the torch training
    params = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True),
        {"policy": pol_params, "vqvae": vq_vars["params"]},
    )
    vq = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), vq_vars["vq"]
    )
    return params, vq


def _sync(ref, ours):
    raw = make_raw_batch(0)
    ours.ensure_state(ours.process_batch_for_training(raw))
    params, vq = torch_icl_to_flax(ref)
    aux = dict(ours.state.aux)
    aux["vqvae"] = {"vq": vq}
    ours.state = ours.state.replace(params=params, aux=aux)


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


LOSS_KEYS = ("l2_loss", "l1_loss", "cos_loss", "action_loss",
             "vqvae_loss", "L_rec")


@pytest.mark.slow
def test_icl_hvqvae_loss_parity(algo_pair):
    """validate-mode losses equal: the action composite (L2 + SmoothL1 +
    eef-delta cosine through the reference loss weights) and the full
    HVQVAE loss stack, computed through both frameworks' algo objects."""
    ref, ours = algo_pair
    _sync(ref, ours)
    raw = make_raw_batch(1)

    # the reference harness validates in eval mode (train_utils run_epoch
    # calls set_eval), which gates the HVQVAE's in-forward EMA mutation —
    # matching our step's training=not validate
    ref.set_eval()
    rinfo = ref.train_on_batch(
        ref.process_batch_for_training(_to_torch(raw)), epoch=1, validate=True
    )["losses"]
    oinfo = ours.train_on_batch(
        ours.process_batch_for_training(raw), epoch=1, validate=True
    )["losses"]

    for key in LOSS_KEYS:
        rv = rinfo[key]
        want = float(rv.detach().float().mean()) if torch.is_tensor(rv) else float(rv)
        np.testing.assert_allclose(float(oinfo[key]), want, atol=3e-5,
                                   rtol=2e-5, err_msg=key)


@pytest.mark.slow
def test_icl_hvqvae_training_trajectory_parity(algo_pair):
    """12 real co-training steps through both frameworks: the policy
    (embedding + GPT trunk + action head), the HVQVAE encoder/decoder
    params AND the EMA-mutated codebook state (codebook_z/q, cluster
    sizes, embed averages) must all track across the combined-loss
    single-backward two-optimizer step."""
    ref, ours = algo_pair
    _sync(ref, ours)
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

    final_params, final_vq = torch_icl_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_params))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"after 12 ICL steps: {jax.tree_util.keystr(path)}",
        )

    ours_vq = ours.state.aux["vqvae"]["vq"]
    for key in ("codebook_z", "codebook_q", "cluster_size_z",
                "cluster_size_q", "embed_avg_z", "embed_avg_q"):
        assert_mostly_close(
            ours_vq[key], final_vq[key], atol=1.5e-2, frac=0.99, max_abs=0.05,
            msg=f"EMA state {key} after 12 ICL steps",
        )
    # the dead-code replacement precondition held on both sides
    assert float(jnp.min(ours_vq["cluster_size_z"])) > 1.0


@pytest.mark.slow
def test_icl_hvqvae_midtraining_migration(algo_pair):
    """Exact MID-TRAINING migration torch -> TPU: train the reference for
    6 steps, convert its weights AND both optimizers' Adam moments
    (`ckpt_conversion.convert_torch_adam_moments` — the weight converters
    are pure index maps, so exp_avg/exp_avg_sq transform identically),
    graft them into fresh optax states, then run 6 MORE steps in each
    framework on identical batches: the final parameters must track as if
    the whole 12-step run had happened in one framework."""
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_torch_adam_moments,
        graft_adam_moments,
    )

    ref, ours = algo_pair
    _sync(ref, ours)
    ref.set_train()

    # phase 1: 6 reference-only steps
    for i in range(6):
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(make_raw_batch(300 + i))),
            epoch=1, validate=False,
        )

    # migrate: weights + EMA state + optimizer moments
    params, vq = torch_icl_to_flax(ref)
    aux = dict(ours.state.aux)
    aux["vqvae"] = {"vq": vq}
    pol_names = [
        "policy." + n for n, _ in ref.nets["policy"].named_parameters()
    ]
    c_p, mu_p, nu_p = convert_torch_adam_moments(
        ref.optimizers["policy"].state_dict(), pol_names, _policy_convert
    )
    vq_names = [n for n, _ in ref.nets["vqvae"].named_parameters()]
    c_v, mu_v, nu_v = convert_torch_adam_moments(
        ref.optimizers["vqvae"].state_dict(), vq_names, _vq_param_convert
    )
    # the module-scoped ref may have trained in earlier tests; migration
    # works from ANY midpoint — the step counts just have to agree
    assert c_p >= 6 and c_p == c_v
    opt_states = dict(ours.state.opt_states)
    opt_states["policy"] = graft_adam_moments(
        ours.optimizers["policy"].init(params["policy"]), c_p, mu_p, nu_p
    )
    opt_states["vqvae"] = graft_adam_moments(
        ours.optimizers["vqvae"].init(params["vqvae"]), c_v, mu_v, nu_v
    )
    ours.state = ours.state.replace(
        params=params, aux=aux, opt_states=opt_states
    )

    # phase 2: 6 further steps in EACH framework on identical batches
    for i in range(6):
        raw = make_raw_batch(400 + i)
        ref.train_on_batch(
            ref.process_batch_for_training(_to_torch(raw)), epoch=1,
            validate=False,
        )
        ours.train_on_batch(
            ours.process_batch_for_training(raw), epoch=1, validate=False
        )

    final_params, final_vq = torch_icl_to_flax(ref)
    flat_o = jax.tree_util.tree_leaves_with_path(ours.state.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(final_params))
    assert len(flat_o) == len(flat_r)
    for path, leaf in flat_o:
        assert_mostly_close(
            leaf, flat_r[path], atol=5e-4, frac=0.995, max_abs=2e-2,
            msg=f"post-migration divergence: {jax.tree_util.keystr(path)}",
        )
    ours_vq = ours.state.aux["vqvae"]["vq"]
    for key in ("codebook_z", "codebook_q", "cluster_size_z",
                "cluster_size_q", "embed_avg_z", "embed_avg_q"):
        assert_mostly_close(
            ours_vq[key], final_vq[key], atol=1.5e-2, frac=0.99, max_abs=0.05,
            msg=f"post-migration EMA state {key}",
        )

"""FAST modality end-to-end: stubbed host stage (FAST processor + CLIP)
driven through the ICL GMM train step via io_callback.

Reference pipeline: ``robomimic/models/obs_nets.py:1199-1212,1308-1336`` -
FAST-tokenize each [T, A] prompt chunk, CLIP-text-encode the stringified
token ids, L2-normalize, resample to seq_len, project 512 -> feature dim.
The external artifacts are frozen/no-grad, so tests inject deterministic
stubs via ``FastHostEncoder.from_components`` - no downloads required.
"""

import hashlib

import numpy as np
import pytest

import jax

from robot_manipulation_vq_vae_tpu.models.tokenizers.fast import (
    CLIP_TEXT_DIM,
    FastActionTokenizer,
    FastHostEncoder,
    resample_latents,
)

B, H, A = 4, 4, 12
WINDOW = 2 * H - 1
OBS_KEYS = {"robot0_eef_pos": (5,), "robot0_gripper_qpos": (2,)}


class StubProcessor:
    """Deterministic FAST-processor stand-in: token count varies with the
    chunk content so both resample branches (D >= seq_len and D < seq_len)
    are exercised."""

    def __call__(self, actions_batch):
        chunk = np.asarray(actions_batch)[0]  # [T, A]
        h = hashlib.sha256(np.round(chunk, 4).tobytes()).digest()
        count = 2 + h[0] % 12  # 2..13 tokens
        return [[int.from_bytes(h[i : i + 2], "big") for i in range(count)]]


def stub_clip_encode(texts):
    """Deterministic text -> R^512, seeded per string."""
    out = np.zeros((len(texts), CLIP_TEXT_DIM), np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:4], "big")
        out[i] = np.random.RandomState(seed).randn(CLIP_TEXT_DIM)
    return out


def make_host_encoder():
    return FastHostEncoder.from_components(StubProcessor(), stub_clip_encode)


# ---------------------------------------------------------------------------
# resample semantics vs the reference torch logic
# ---------------------------------------------------------------------------

def _reference_resample_torch(latents, seq_len):
    """Verbatim reference semantics (obs_nets.py:1322-1332) in torch."""
    import torch

    latent_vector = torch.as_tensor(latents)
    D, dim = latent_vector.shape
    if D >= seq_len:
        indices = torch.linspace(0, D - 1, steps=seq_len).long()
        aggregated = latent_vector[indices]
    else:
        aggregated = torch.zeros(seq_len, dim)
        aggregated[:D] = latent_vector
    return aggregated.numpy()


@pytest.mark.parametrize("d", [1, 3, 9, 10, 11, 25, 64])
def test_resample_matches_reference(d):
    seq_len = 10
    latents = np.random.RandomState(d).randn(d, 8).astype(np.float32)
    ours = resample_latents(latents, seq_len)
    ref = _reference_resample_torch(latents, seq_len)
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (seq_len, 8)


def test_resample_subsample_keeps_endpoints():
    latents = np.arange(25, dtype=np.float32)[:, None]
    out = resample_latents(latents, 10)
    assert out[0, 0] == 0.0 and out[-1, 0] == 24.0


def test_resample_zero_pads_below_d():
    latents = np.ones((4, 6), np.float32)
    out = resample_latents(latents, 10)
    np.testing.assert_array_equal(out[:4], latents)
    np.testing.assert_array_equal(out[4:], 0.0)


# ---------------------------------------------------------------------------
# host encoder with injected components
# ---------------------------------------------------------------------------

def test_host_encoder_deterministic_and_normalized():
    enc = make_host_encoder()
    rng = np.random.RandomState(0)
    acts = rng.randn(3, H, A).astype(np.float32)
    lat1 = enc.encode_batch(acts, seq_len=H)
    lat2 = enc.encode_batch(acts, seq_len=H)
    assert lat1.shape == (3, H, CLIP_TEXT_DIM)
    np.testing.assert_array_equal(lat1, lat2)
    # non-padded rows are L2-normalized
    norms = np.linalg.norm(lat1, axis=-1)
    nonzero = norms > 0
    np.testing.assert_allclose(norms[nonzero], 1.0, rtol=1e-5)
    # both resample branches occur across the batch draws
    counts = [len(StubProcessor()(a[None])[0]) for a in acts]
    assert any(c >= H for c in counts) or any(c < H for c in counts)


def test_io_callback_under_jit():
    tok = FastActionTokenizer(
        output_dim=0, seq_len=H, host_encoder=make_host_encoder()
    )
    acts = np.random.RandomState(1).randn(2, H, A).astype(np.float32)

    eager = tok.clip_latents_io_callback(acts)
    jitted = jax.jit(tok.clip_latents_io_callback)(acts)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted))
    host = tok.host.encode_batch(acts, seq_len=H)
    np.testing.assert_allclose(np.asarray(eager), host, rtol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: fast_enabled=True through the ICL GMM train step
# ---------------------------------------------------------------------------

def _fast_algo():
    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS)
        config.observation.modalities.obs.rgb = []
        config.algo.transformer.enabled = True
        config.algo.transformer.context_length = H
        config.algo.transformer.embed_dim = 32
        config.algo.transformer.num_layers = 1
        config.algo.transformer.num_heads = 4
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.fast_enabled = True
        config.algo.transformer.vq_vae_enabled = False
        config.algo.transformer.ln_act_enabled = False
        config.algo.gmm.enabled = True
        config.train.seed = 0
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)
    algo = AlgoReg.algo_factory(
        "icl_gmm_paper", config, obs_key_shapes=dict(OBS_KEYS), ac_dim=A
    )
    assert isinstance(algo, AlgoReg.ICLTransformer_GMM)
    algo.set_fast_tokenizer(
        FastActionTokenizer(
            output_dim=0, seq_len=H, host_encoder=make_host_encoder()
        )
    )
    return algo


@pytest.mark.slow
def test_fast_enabled_trains_end_to_end():
    algo = _fast_algo()
    rng = np.random.RandomState(2)

    def make_batch():
        return {
            "obs": {
                k: rng.randn(B, WINDOW, *s).astype(np.float32)
                for k, s in OBS_KEYS.items()
            },
            "actions": rng.randn(B, WINDOW, A).astype(np.float32),
        }

    params_before = None
    for i in range(2):
        batch = algo.process_batch_for_training(make_batch())
        info = algo.train_on_batch(batch, epoch=0)
        log = algo.log_info(info)
        assert np.isfinite(log["Loss"])
        assert np.isfinite(log["Log_Likelihood"])
        if params_before is None:
            params_before = jax.tree_util.tree_map(
                np.asarray, algo.state.params["policy"]
            )

    # the FastProjection MLP (encoder action_network) must have trained
    proj_before = params_before["net"]["encoder"]["action_network"]
    proj_after = algo.state.params["policy"]["net"]["encoder"]["action_network"]
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        proj_before, proj_after,
    )
    assert max(jax.tree_util.tree_leaves(deltas)) > 0

    # rollout path also runs the host stage via io_callback
    obs = {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()}
    ctx = {
        "obs": {k: rng.randn(1, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()},
        "actions": rng.randn(1, H, A).astype(np.float32),
    }
    ac = algo.get_action(obs, context_batch=ctx)
    assert ac.shape == (1, A)
    assert np.all(np.isfinite(np.asarray(ac)))

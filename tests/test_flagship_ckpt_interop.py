"""Full flagship checkpoint interop: a reference-layout ``.pth`` built from
the REAL reference ``ICLTransformerHVQVAE`` (policy with FiLM-ResNet18 +
SpatialSoftmax + CropRandomizer encoder + GPT backbone; MSTCN HVQVAE),
including the stray metadata keys ``fix_ckpt.py`` strips, converted into a
working JAX policy with matching actions.

Reference: ``robomimic/utils/train_utils.py:1186-1235`` (save_model layout),
``fix_ckpt.py:6-55`` (stray keys), ``robomimic/algo/icl.py:1302-1405``
(get_action + serialize), ``robomimic/utils/dataset.py:1246-1250``
(gaussian scale/offset inversion).
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from reference_flagship import (
    A,
    H,
    LANG_DIM,
    OBS_KEYS,
    RGB_KEYS,
    build_reference_flagship,
)

B = 2


@pytest.fixture(scope="module")
def reference_setup():
    algo, config, shapes = build_reference_flagship()
    algo.set_eval()

    # emulate a trained checkpoint: randomize codebooks/EMA buffers and mark
    # them initialized so both sides quantize against identical state
    rng = np.random.RandomState(7)
    vq = algo.nets["vqvae"]
    with torch.no_grad():
        vq.codebook_z.copy_(torch.from_numpy(
            rng.randn(*vq.codebook_z.shape).astype(np.float32)))
        vq.codebook_q.copy_(torch.from_numpy(
            rng.randn(*vq.codebook_q.shape).astype(np.float32)))
        vq.embed_avg_z.copy_(vq.codebook_z.data)
        vq.embed_avg_q.copy_(vq.codebook_q.data)
        vq.cluster_size_z.fill_(1.0)
        vq.cluster_size_q.fill_(1.0)
        vq.codebooks_initialized.fill_(True)
    return algo, config, shapes


def make_pth_dict(algo, config, shapes, tmp_path):
    """Reference save_model layout incl. stray keys + gaussian-inverted
    normalization stats."""
    model_blob = algo.serialize()
    assert "vq_vae_enabled" in model_blob  # stray keys present (icl.py:1374)
    assert "vqvae_config" in model_blob

    shape_meta = {
        "all_shapes": {k: list(s) for k, s in shapes.items()},
        "all_obs_keys": list(shapes),
        "ac_dim": A,
        "use_images": True,
    }
    # gaussian stats as the reference writes them: scale=mean, offset=std
    stats = {
        "actions": {
            "scale": np.linspace(0.5, 2.0, A).astype(np.float32)[None],
            "offset": np.linspace(0.1, 0.4, A).astype(np.float32)[None],
        }
    }
    cfg = json.loads(config.dump())
    cfg["train"]["action_config"] = {
        "actions": {"normalization": "gaussian"}
    }
    params = dict(
        model=model_blob,
        config=json.dumps(cfg),
        algo_name="icl",
        env_metadata={"env_name": "Fake", "type": 1, "env_kwargs": {}},
        shape_metadata=shape_meta,
        action_normalization_stats=stats,
    )
    path = str(tmp_path / "flagship.pth")
    torch.save(params, path)
    return path


def _jax_algo_from_pth(path):
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_flagship_checkpoint,
    )

    raw = FileUtils.load_reference_torch_checkpoint(path)
    converted = convert_flagship_checkpoint(raw)
    policy, ckpt_dict = FileUtils.policy_from_checkpoint(ckpt_dict=converted)
    return policy, ckpt_dict


@pytest.mark.slow
def test_pth_roundtrip_identical_actions(reference_setup, tmp_path):
    """.pth in -> identical actions out (the VERDICT item-6 gate)."""
    ref_algo, config, shapes = reference_setup
    path = make_pth_dict(ref_algo, config, shapes, tmp_path)
    policy, ckpt_dict = _jax_algo_from_pth(path)
    jax_algo = policy.policy

    rng = np.random.RandomState(3)
    low_dim = {
        k: rng.randn(B, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()
    }
    lang = rng.randn(B, H, LANG_DIM).astype(np.float32)
    img_hwc = rng.rand(
        B, H, *[(32, 32, 3)][0]
    ).astype(np.float32)  # [B,H,32,32,3] in [0,1]
    ctx_actions = rng.randn(B, H, A).astype(np.float32)

    # reference forward (torch, CHW)
    obs_t = {k: torch.from_numpy(v) for k, v in low_dim.items()}
    obs_t["lang_emb"] = torch.from_numpy(lang)
    obs_t["robot0_agentview_image"] = torch.from_numpy(
        np.transpose(img_hwc, (0, 1, 4, 2, 3)).copy()
    )
    with torch.no_grad():
        ref_ac = ref_algo.get_action(
            obs_t, {"obs": {}, "actions": torch.from_numpy(ctx_actions)}
        ).numpy()

    # ours (HWC float in [0,1])
    obs_j = dict(low_dim)
    obs_j["lang_emb"] = lang
    obs_j["robot0_agentview_image"] = img_hwc
    jax_ac = np.asarray(
        jax_algo.get_action(obs_j, context_batch={"actions": ctx_actions})
    )

    assert jax_ac.shape == ref_ac.shape
    np.testing.assert_allclose(jax_ac, ref_ac, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_stray_keys_and_stats_survive(reference_setup, tmp_path):
    ref_algo, config, shapes = reference_setup
    path = make_pth_dict(ref_algo, config, shapes, tmp_path)
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_flagship_checkpoint,
        detect_gaussian_inversion,
        remap_gaussian_stats,
    )

    raw = FileUtils.load_reference_torch_checkpoint(path)
    converted = convert_flagship_checkpoint(raw)

    # stray keys did not leak into the param trees
    flat = jax.tree_util.tree_leaves(converted["model"])
    assert all(hasattr(x, "shape") or np.isscalar(x) for x in flat)

    # gaussian inversion detected; verbatim by default (behavior-preserving)
    cfg = json.loads(converted["config"])
    keys = detect_gaussian_inversion(
        cfg, converted["action_normalization_stats"]
    )
    assert keys == ["actions"]
    verbatim = converted["action_normalization_stats"]["actions"]
    np.testing.assert_array_equal(
        verbatim["scale"], raw["action_normalization_stats"]["actions"]["scale"]
    )

    # fix_gaussian=True swaps to conventional semantics
    fixed = convert_flagship_checkpoint(raw, fix_gaussian=True)
    fs = fixed["action_normalization_stats"]["actions"]
    np.testing.assert_array_equal(fs["scale"], verbatim["offset"])
    np.testing.assert_array_equal(fs["offset"], verbatim["scale"])
    # remap is an involution
    rt = remap_gaussian_stats(
        remap_gaussian_stats({"actions": verbatim}, ["actions"]), ["actions"]
    )
    np.testing.assert_array_equal(rt["actions"]["scale"], verbatim["scale"])

    # shape metadata converted CHW -> HWC for the rgb key
    assert converted["shape_metadata"]["all_shapes"][
        "robot0_agentview_image"
    ] == [32, 32, 3]


@pytest.mark.slow
def test_vqvae_reconstruction_parity(reference_setup, tmp_path):
    """The converted HVQVAE reproduces the reference's context-action
    reconstruction (the quantity fed to the policy at inference,
    icl.py:1302-1354)."""
    ref_algo, config, shapes = reference_setup
    path = make_pth_dict(ref_algo, config, shapes, tmp_path)
    policy, _ = _jax_algo_from_pth(path)
    jax_algo = policy.policy

    rng = np.random.RandomState(11)
    actions = rng.randn(B, H, A).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_algo.nets["vqvae"](
            torch.from_numpy(actions), training=False
        )
    ref_recon = ref_out[0].numpy() if isinstance(ref_out, tuple) else (
        ref_out["reconstructed_actions"].numpy()
        if isinstance(ref_out, dict) else ref_out.numpy()
    )

    import jax.numpy as jnp

    vq = jax_algo.nets["vqvae"]
    out = vq.apply(
        {"params": jax_algo.state.params["vqvae"],
         **jax_algo.state.aux["vqvae"]},
        jnp.asarray(actions), training=False,
    )
    np.testing.assert_allclose(
        np.asarray(out["reconstructed_actions"]), ref_recon,
        atol=2e-4, rtol=1e-3,
    )


@pytest.mark.slow
def test_convert_torch_checkpoint_cli(reference_setup, tmp_path):
    """The conversion CLI writes a .ckpt that loads through
    policy_from_checkpoint(ckpt_path=...) with identical actions to the
    in-memory conversion path."""
    from robot_manipulation_vq_vae_tpu.scripts.conversion import (
        convert_torch_checkpoint as cli,
    )
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    ref_algo, config, shapes = reference_setup
    path = make_pth_dict(ref_algo, config, shapes, tmp_path)
    out = str(tmp_path / "converted.ckpt")
    cli.main(["--pth", str(path), "--output", out])

    policy, _ = FileUtils.policy_from_checkpoint(ckpt_path=out)
    policy_mem, _ = _jax_algo_from_pth(path)

    rng = np.random.RandomState(7)
    low_dim = {
        k: rng.randn(B, H, *s).astype(np.float32) for k, s in OBS_KEYS.items()
    }
    obs_j = dict(low_dim)
    obs_j["lang_emb"] = rng.randn(B, H, LANG_DIM).astype(np.float32)
    obs_j["robot0_agentview_image"] = rng.rand(B, H, 32, 32, 3).astype(
        np.float32
    )
    ctx_actions = rng.randn(B, H, A).astype(np.float32)
    a_file = np.asarray(policy.policy.get_action(
        obs_j, context_batch={"actions": ctx_actions}
    ))
    a_mem = np.asarray(policy_mem.policy.get_action(
        obs_j, context_batch={"actions": ctx_actions}
    ))
    np.testing.assert_allclose(a_file, a_mem, atol=1e-6)


@pytest.mark.slow
def test_moment_conversion_with_stats_false(reference_setup, tmp_path):
    """Optimizer-moment migration for an IMAGE-conditioned policy: the
    weight converters run in with_stats=False mode over a dict keyed by
    named_parameters only (BatchNorm running statistics are buffers with
    no Adam state), and the resulting moment tree has exactly the
    trainable-parameter structure."""
    import jax
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_torch_adam_moments,
        convert_transformer_actor,
    )

    ref_algo, config, shapes = reference_setup
    policy = ref_algo.nets["policy"]
    # one real step so every param has optimizer state
    opt = torch.optim.Adam(policy.parameters(), lr=1e-3)
    rng = np.random.RandomState(0)
    obs_t = {
        k: torch.from_numpy(rng.randn(B, H, *s).astype(np.float32))
        for k, s in OBS_KEYS.items()
    }
    obs_t["lang_emb"] = torch.from_numpy(
        rng.randn(B, H, LANG_DIM).astype(np.float32)
    )
    obs_t["robot0_agentview_image"] = torch.from_numpy(
        rng.rand(B, H, 3, 32, 32).astype(np.float32)
    )
    out = policy(obs_dict=obs_t, actions=None, goal_dict=None)
    out.sum().backward()
    opt.step()

    names = ["policy." + n for n, _ in policy.named_parameters()]

    def convert(sd):
        params, _ = convert_transformer_actor(
            sd, json.loads(config.dump()) if hasattr(config, "dump")
            else config,
            prefix="policy.", with_stats=False,
        )
        return params

    count, mu, nu = convert_torch_adam_moments(
        opt.state_dict(), names, convert
    )
    assert count == 1
    # the moment tree must cover the image trunk (BN scale/bias included,
    # running stats excluded by construction)
    flat = dict(jax.tree_util.tree_leaves_with_path(mu))
    keys = [jax.tree_util.keystr(p) for p in flat]
    assert any("backbone" in k and "bn1" in k for k in keys), keys[:5]
    assert not any("mean" in k and "stem" in k for k in keys)

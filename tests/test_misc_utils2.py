"""Direct coverage of previously indirectly-tested utility modules:
action_utils, initializers, vis_utils, and the run_trained_agent script."""

import os
import types

import numpy as np
import pytest

import robot_manipulation_vq_vae_tpu.utils.action_utils as ActionUtils
import robot_manipulation_vq_vae_tpu.utils.test_utils as TestUtils


def test_action_dict_vector_roundtrip():
    d = {
        "action_dict/rel_pos": np.arange(6, dtype=np.float32).reshape(2, 3),
        "action_dict/gripper": np.array([[1.0], [0.0]], np.float32),
    }
    vec = ActionUtils.action_dict_to_vector(d)
    assert vec.shape == (2, 4)
    shapes = {"action_dict/rel_pos": (3,), "action_dict/gripper": (1,)}
    back = ActionUtils.vector_to_action_dict(vec, shapes)
    for k in d:
        np.testing.assert_array_equal(back[k], d[k])


def test_initializers_match_torch_distributions():
    """torch_linear_kernel_init must match torch nn.Linear's
    kaiming_uniform(a=sqrt(5)): U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.utils.initializers import (
        gpt_init,
        torch_linear_bias_init,
        torch_linear_kernel_init,
    )

    fan_in = 64
    k = torch_linear_kernel_init(jax.random.PRNGKey(0), (fan_in, 128))
    bound = 1.0 / np.sqrt(fan_in)
    assert float(jnp.max(jnp.abs(k))) <= bound + 1e-6
    # roughly uniform: std of U(-b, b) is b/sqrt(3)
    np.testing.assert_allclose(
        float(jnp.std(k)), bound / np.sqrt(3), rtol=0.1
    )
    b = torch_linear_bias_init(fan_in)(jax.random.PRNGKey(1), (128,))
    assert float(jnp.max(jnp.abs(b))) <= bound + 1e-6
    g = gpt_init(jax.random.PRNGKey(2), (256, 256))
    np.testing.assert_allclose(float(jnp.std(g)), 0.02, rtol=0.1)


def test_make_model_prediction_plot(tmp_path):
    from robot_manipulation_vq_vae_tpu.utils.vis_utils import (
        image_tensor_to_numpy,
        make_model_prediction_plot,
    )

    t, d = 20, 3
    rng = np.random.RandomState(0)
    out = make_model_prediction_plot(
        hdf5_path="demo.hdf5",
        save_path=str(tmp_path / "plots" / "p.png"),
        action_names=["x", "y", "z"],
        actual_actions=rng.randn(t, d),
        predicted_actions=rng.randn(t, d),
        images=rng.rand(4, 16, 16, 3),
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0

    img = image_tensor_to_numpy(np.array([[[0.0, 0.5, 1.5]]]))
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(img, [[[0, 127, 255]]])


@pytest.mark.slow
def test_run_trained_agent_script(tmp_path, monkeypatch):
    """Train a tiny checkpoint through the test harness, then drive the
    run_trained_agent CLI path against the registered scripted env
    (reference scripts/run_trained_agent.py)."""
    from robot_manipulation_vq_vae_tpu.scripts import run_trained_agent
    from robot_manipulation_vq_vae_tpu.scripts.train import train

    TestUtils.register_fake_env()
    config = TestUtils.get_base_config("bc")
    with config.values_unlocked():
        config.experiment.rollout.enabled = False  # rollouts come below
        config.train.output_dir = str(tmp_path / "out")
    config.lock()
    train(config)

    import glob

    ckpts = glob.glob(
        str(tmp_path / "out" / "**" / "models" / "*.ckpt"), recursive=True
    )
    assert ckpts
    args = types.SimpleNamespace(
        agent=ckpts[0], env=None, n_rollouts=2, horizon=8, render=False,
        # .gif: imageio writes it natively (no ffmpeg in this image)
        video_path=str(tmp_path / "rollout.gif"), video_skip=2,
    )
    run_trained_agent.main(args)
    assert os.path.exists(args.video_path)

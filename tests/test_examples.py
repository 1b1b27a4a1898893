"""Run the examples/ programs end to end (the reference's own test strategy
includes test_examples.py running examples/ — reference
robomimic/tests/test_examples.py)."""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def run_example(name, *args, timeout=600):
    env = dict(os.environ)
    # JAX_PLATFORMS is already set (and ignored) on plugin backends; the
    # package honors RMVQ_FORCE_CPU via the config API, which sticks
    env["RMVQ_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, name), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert result.returncode == 0, (
        f"{name} failed:\nstdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    )
    return result.stdout


def test_simple_config_example():
    out = run_example("simple_config.py")
    assert "batch_size=100" in out
    assert "batch_size=200" in out
    # the locked config rejected the new key
    assert "cannot set 'optimizer'" in out


def test_simple_obs_nets_example():
    out = run_example("simple_obs_nets.py")
    assert "encoder feature shape: (4, 140)" in out
    assert "decoded action shape: (4, 7)" in out


def test_add_new_modality_example():
    out = run_example("add_new_modality.py")
    assert "encoder output dim: [24]" in out
    assert "encoded feature shape: (4, 24)" in out
    assert "custom scan processor round-trip OK" in out


@pytest.mark.slow
def test_simple_train_loop_example():
    out = run_example("simple_train_loop.py")
    # three epochs of finite losses were printed
    assert out.count("mean Loss =") == 3
    assert "nan" not in out


@pytest.mark.slow
def test_train_bc_rnn_example():
    out = run_example("train_bc_rnn.py", "--debug")
    assert "Epoch 2: Loss" in out
    assert "save checkpoint to" in out


@pytest.mark.slow
@pytest.mark.parametrize("name", ["datasets", "run_policy"])
def test_notebooks_execute(name, tmp_path):
    """The examples/notebooks/ walkthroughs execute cleanly (reference ships
    examples/notebooks/{datasets,run_policy}.ipynb)."""
    pytest.importorskip("nbconvert")
    nb_path = os.path.join(EXAMPLES_DIR, "notebooks", f"{name}.ipynb")
    env = dict(os.environ)
    env["RMVQ_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, "-m", "jupyter", "nbconvert",
         "--ExecutePreprocessor.timeout=900", "--to", "notebook",
         "--execute", nb_path, "--output", str(tmp_path / "out.ipynb")],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]

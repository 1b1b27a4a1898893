"""Mesh-shape sweep for the flagship multi-chip train step: the driver's
``dryrun_multichip`` validates one (dp=4, mp=2) mesh; this sweep asserts
the same invariants — sharded step-1 loss equals the unsharded loss AND
the post-step EMA codebook statistics are equal up to fp32
reduction-order noise — for pure-data-parallel (dp=8, mp=1) and
tensor-parallel-heavy (dp=2, mp=4) layouts on the 8 virtual CPU devices,
so a sharding rule that only happens to work at mp=2 cannot hide.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from robot_manipulation_vq_vae_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_state,
)


@pytest.mark.slow
@pytest.mark.parametrize("dp,mp", [(8, 1), (2, 4)])
def test_mesh_shape_sweep(dp, mp):
    n = dp * mp
    if len(jax.devices()) < n:
        pytest.skip(f"need {n} devices")

    config = ge._tiny_config(with_rgb=True)
    algo = ge._make_algo(config, with_rgb=True)
    batch = algo.process_batch_for_training(
        ge._make_batch(b=max(ge.B, 2 * dp), with_rgb=True)
    )
    jbatch = {
        "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
        "actions": jnp.asarray(batch["actions"]),
    }
    algo.ensure_state(jbatch)

    algo_ref = ge._make_algo(config, with_rgb=True)
    algo_ref.ensure_state(jbatch)
    ref_loss = float(
        algo_ref.train_on_batch(jbatch, epoch=0)["losses"]["action_loss"]
    )
    assert np.isfinite(ref_loss)

    mesh = make_mesh(n_devices=n, mp=mp)
    with mesh:
        algo.state = shard_state(mesh, algo.state)
        info = algo.train_on_batch(shard_batch(mesh, jbatch), epoch=0)
        loss = float(info["losses"]["action_loss"])
        np.testing.assert_allclose(
            loss, ref_loss, rtol=1e-4,
            err_msg=f"(dp={dp}, mp={mp}) sharded loss diverges",
        )

    vq_sharded = jax.device_get(algo.state.aux["vqvae"]["vq"])
    vq_ref = jax.device_get(algo_ref.state.aux["vqvae"]["vq"])
    for key in sorted(vq_ref):
        np.testing.assert_allclose(
            np.asarray(vq_sharded[key], np.float32),
            np.asarray(vq_ref[key], np.float32),
            rtol=1e-5, atol=1e-6,
            err_msg=f"(dp={dp}, mp={mp}) post-step VQ state '{key}' "
                    f"diverges (EMA dp-aggregation bug)",
        )

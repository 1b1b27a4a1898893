"""Sim-free coverage of the serving bench's three measurement paths at
tiny shapes: the batch-size sweep, the dp-sharded get_action (runs on the
8-device virtual CPU mesh — the multi-chip serving number), and the
end-to-end subprocess-env rollout pipeline (reference tianshou usage
robomimic/utils/train_utils.py:317-529)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_bench_infer_all_paths_tiny():
    import bench_infer

    results = bench_infer.main(
        batch_sizes=(1, 8),
        mixed_precision=False,
        img_hw=32,
        ctx_len=4,
        rollout_fps=True,
        rollout_envs=4,
        rollout_horizon=2,
    )
    by_metric = {}
    for r in results:
        by_metric.setdefault(r["metric"], []).append(r)

    lat = by_metric["icl_hvqvae_get_action_latency"]
    batches = sorted(r["batch"] for r in lat if not r.get("sharded"))
    assert batches == [1, 8]
    for r in lat:
        assert np.isfinite(r["value"]) and r["value"] > 0
        assert r["actions_per_sec"] > 0

    sharded = [r for r in lat if r.get("sharded")]
    assert len(sharded) == 1, "dp-sharded serving leg missing on 8-dev mesh"
    assert sharded[0]["n_devices"] == 8
    assert sharded[0]["batch"] == 8

    roll = by_metric["rollout_fps"]
    assert len(roll) == 1
    assert roll[0]["n_envs"] == 4
    assert roll[0]["actions_per_sec"] > 0
    assert roll[0]["env_steps_per_sec"] > 0

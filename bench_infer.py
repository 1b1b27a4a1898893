"""Flagship serving latency: ICLTransformerHVQVAE.get_action (HVQVAE
context-action reconstruction + FiLM-ResNet18 x3 cams + 6L/512d transformer)
as ONE jitted device call, at rollout shapes (obs window = context_length).

Timing: N sequential calls, fetch only the last output — the device executes
in order, so the final fetch syncs the whole chain and amortizes the
(unreliable on tunneled backends) per-call sync.

Prints one JSON line per batch size."""

import json
import os
import time

import numpy as np


def main(batch_sizes=(1, 16), mixed_precision=False):
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.utils.train_utils import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from robot_manipulation_vq_vae_tpu.config import config_factory
    from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
    import robot_manipulation_vq_vae_tpu.algo as AlgoReg

    H, A = 16, 12
    IMG = (128, 128, 3)
    LOW_DIM = {
        "robot0_base_to_eef_pos": (3,),
        "robot0_base_to_eef_quat": (4,),
        "robot0_base_pos": (3,),
        "robot0_base_quat": (4,),
        "robot0_gripper_qpos": (2,),
    }
    CAMS = [
        "robot0_agentview_left_image",
        "robot0_agentview_right_image",
        "robot0_eye_in_hand_image",
    ]
    obs_key_shapes = dict(LOW_DIM)
    obs_key_shapes.update({c: IMG for c in CAMS})

    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(LOW_DIM)
        config.observation.modalities.obs.rgb = CAMS
        config.observation.encoder.rgb.core_class = "VisualCore"
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 64,
            "backbone_class": "ResNet18Conv",
            "backbone_kwargs": {"pretrained": False, "input_coord_conv": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 32},
        }
        config.observation.encoder.rgb.obs_randomizer_class = "CropRandomizer"
        config.observation.encoder.rgb.obs_randomizer_kwargs = {
            "crop_height": 116, "crop_width": 116, "num_crops": 1,
            "pos_enc": False,
        }
        config.algo.transformer.enabled = True
        config.algo.transformer.context_length = H
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = True
        config.train.mixed_precision = mixed_precision
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=obs_key_shapes, ac_dim=A
    )

    results = []
    for b in batch_sizes:
        key = jax.random.PRNGKey(0)
        obs = {}
        for i, (k, s) in enumerate(LOW_DIM.items()):
            obs[k] = jax.random.normal(jax.random.fold_in(key, i), (b, H) + s)
        for i, c in enumerate(CAMS):
            obs[c] = jax.random.randint(
                jax.random.fold_in(key, 20 + i), (b, H) + IMG, 0, 255,
                jnp.uint8,
            )
        ctx = {"actions": jax.random.uniform(
            jax.random.fold_in(key, 40), (b, H, A), jnp.float32, -1, 1
        )}
        init_batch = {
            "obs": {k: np.asarray(v) for k, v in obs.items()},
            "actions": np.asarray(ctx["actions"]),
        }
        algo.ensure_state(init_batch)

        t0 = time.perf_counter()
        out = algo.get_action(obs, context_batch=ctx)
        np.asarray(out)
        compile_sec = time.perf_counter() - t0

        for _ in range(3):  # warmup dispatches
            out = algo.get_action(obs, context_batch=ctx)
        np.asarray(out)
        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            out = algo.get_action(obs, context_batch=ctx)
        np.asarray(out)  # in-order execution: syncs the whole chain
        dt = (time.perf_counter() - t0) / n
        result = {
            "metric": "icl_hvqvae_get_action_latency",
            "value": round(dt * 1e3, 3),
            "unit": f"ms/call (batch {b})",
            "batch": b,
            "actions_per_sec": round(b / dt, 1),
            "compile_sec": round(compile_sec, 1),
            "mixed_precision": bool(mixed_precision),
        }
        results.append(result)
        # flush each batch size to the result file as soon as measured, so
        # a deadline kill from the bench harness still captures batch 1.
        # tmp + os.replace: a kill mid-write must not tear the file and
        # lose the batches already flushed (same pattern as
        # bench_tokenizer.py / bench_loader.py).
        path = os.environ.get("RMVQ_RESULT_FILE")
        if path:
            from robot_manipulation_vq_vae_tpu.utils.file_utils import (
                atomic_write_json,
            )

            atomic_write_json(path, results)
        print(json.dumps(result))
    return results


if __name__ == "__main__":
    if os.environ.get("RMVQ_REQUIRE_TPU", "0") == "1":
        # launched speculatively at t=0 (same contract as bench_train.py):
        # bail out cheaply on CPU, rc=3 tells the parent "skipped, not
        # failed". Package import FIRST so RMVQ_FORCE_CPU is honored.
        import robot_manipulation_vq_vae_tpu  # noqa: F401
        import jax

        if jax.default_backend() == "cpu":
            print(json.dumps({"skipped": "cpu backend"}))
            raise SystemExit(3)
    batches = tuple(
        int(b) for b in os.environ.get("RMVQ_INFER_BATCHES", "1,16").split(",")
    )
    main(
        batch_sizes=batches,
        mixed_precision=os.environ.get("RMVQ_BF16", "0") == "1",
    )

"""Flagship training-step throughput at the reference's shipped scale:
ICLTransformerHVQVAE (3 cameras 128x128 -> 116 crop, FiLM ResNet18 +
SpatialSoftmax, 6L/512d/8H transformer, ctx 16; HVQVAE 1024/512 codebooks,
2x4 MSTCN) on synthetic data, batch 64.

Prints one JSON line with steps/sec and samples/sec. The reference trains
this config at 500 steps/epoch on one CUDA GPU; typical reference throughput
for this model family is a few steps/sec (never published - see BASELINE.md).
"""

import json
import os
import time


def build_flagship(mixed_precision=False, batch_size=64,
                   frozen_batch_norm=False, pool_free_stem=False,
                   context_length=16, img_hw=128,
                   packed_rgb_encoders=False, pallas_pool=False):
    """Construct the flagship ICLTransformerHVQVAE algo at the reference's
    shipped scale plus a device-side synthetic batch maker. Shared by the
    throughput bench below and scripts/training_quality_run.py (which
    varies the batch per step to exercise codebook dynamics)."""
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

    B, H = batch_size, context_length
    A = 12
    IMG = (img_hw, img_hw, 3)
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
    obs_key_shapes["lang_emb"] = (768,)

    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(LOW_DIM) + ["lang_emb"]
        config.observation.modalities.obs.rgb = CAMS
        config.observation.encoder.rgb.core_class = "VisualCoreLanguageConditioned"
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 64,
            "backbone_class": "ResNet18ConvFiLM",
            "backbone_kwargs": {"pretrained": False, "input_coord_conv": False},
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {"num_kp": 32, "learnable_temperature": False,
                             "temperature": 1.0, "noise_std": 0.0},
        }
        config.observation.encoder.rgb.obs_randomizer_class = "CropRandomizer"
        crop = img_hw - 12  # shipped ratio: 128 -> 116
        config.observation.encoder.rgb.obs_randomizer_kwargs = {
            "crop_height": crop, "crop_width": crop, "num_crops": 1,
            "pos_enc": False,
        }
        config.algo.transformer.enabled = True
        config.algo.transformer.context_length = H
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = True
        config.algo.transformer.ln_act_enabled = True
        config.train.batch_size = B
        config.train.max_grad_norm = 100.0
        config.train.mixed_precision = mixed_precision
        config.train.frozen_batch_norm = frozen_batch_norm
        config.train.pool_free_stem = pool_free_stem
        config.train.packed_rgb_encoders = packed_rgb_encoders
        config.train.pallas_pool = pallas_pool
    config.lock()
    ObsUtils.initialize_obs_utils_with_config(config)

    algo = AlgoReg.algo_factory(
        "icl", config, obs_key_shapes=obs_key_shapes, ac_dim=A
    )

    def make_batch(seed=0):
        """Synthesize a batch ON DEVICE: benchmark environments reach the
        chip over a slow tunnel, so host->device image uploads would
        dominate and measure the tunnel, not the training step. Different
        seeds give independent batches (training-quality runs cycle them
        so codebook dynamics see varied data)."""
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        batch = {"obs": {}}
        batch["actions"] = jax.random.uniform(
            jax.random.fold_in(key, 1), (B, H, A), jnp.float32, -1, 1
        )
        for i, (k, s) in enumerate(LOW_DIM.items()):
            batch["obs"][k] = jax.random.normal(
                jax.random.fold_in(key, 10 + i), (B, H) + s
            )
        for i, c in enumerate(CAMS):
            batch["obs"][c] = jax.random.randint(
                jax.random.fold_in(key, 20 + i), (B, H) + IMG, 0, 255,
                jnp.uint8,
            )
        batch["obs"]["lang_emb"] = jax.random.normal(
            jax.random.fold_in(key, 30), (B, H, 768)
        )
        return batch

    return algo, make_batch


def measure(mixed_precision=False, batch_size=64, n_long=11,
            frozen_batch_norm=False, pool_free_stem=False,
            packed_rgb_encoders=False, pallas_pool=False):
    """Measure flagship train-step throughput; returns the result dict."""
    algo, make_batch = build_flagship(
        mixed_precision=mixed_precision, batch_size=batch_size,
        frozen_batch_norm=frozen_batch_norm, pool_free_stem=pool_free_stem,
        packed_rgb_encoders=packed_rgb_encoders, pallas_pool=pallas_pool,
    )
    B = batch_size
    batch = make_batch(0)

    t0 = time.perf_counter()
    info = algo.train_on_batch(batch, epoch=0)  # init + compile
    float(info["losses"]["action_loss"])
    compile_time = time.perf_counter() - t0

    # XLA's own FLOP count for the whole compiled step (fwd+bwd+update),
    # used to derive achieved TFLOP/s from the measured step time. The
    # program was just compiled by the train_on_batch call above, so this
    # re-lower + compile hits the compilation cache (~0s).
    step_flops = None
    try:
        cost = (
            algo._train_step_jit.lower(algo.state, batch, False)
            .compile()
            .cost_analysis()
        )
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost:
            step_flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    # timed steps chain on the algo state (each step consumes the previous
    # state); sync cost is amortized by differencing two chain lengths
    def chain(n):
        t0 = time.perf_counter()
        for _ in range(n):
            info = algo.train_on_batch(batch, epoch=0)
        float(info["losses"]["action_loss"])
        return time.perf_counter() - t0

    chain(1)
    t_short, n_short = chain(1), 1
    t_long = chain(n_long)
    per_step = max((t_long - t_short) / (n_long - n_short), 1e-9)
    steps_per_sec = 1.0 / per_step
    result = {
        "metric": "icl_hvqvae_train_step_throughput",
        "value": round(steps_per_sec, 3),
        "unit": f"steps/sec (batch {B}, 3x128x128 cams)",
        "samples_per_sec": round(steps_per_sec * B, 1),
        "compile_sec": round(compile_time, 1),
        "mixed_precision": bool(mixed_precision),
    }
    if frozen_batch_norm:
        # opt-in speed mode (config.train.frozen_batch_norm) — flagged so a
        # recorded number is never mistaken for reference-semantics BN
        result["frozen_batch_norm"] = True
    if pool_free_stem:
        result["pool_free_stem"] = True  # ditto (config.train.pool_free_stem)
    if packed_rgb_encoders:
        # identical-math layout mode (config.train.packed_rgb_encoders):
        # flagged for provenance, NOT a semantic divergence
        result["packed_rgb_encoders"] = True
    if pallas_pool:
        # semantics-preserving Pallas stem pool (config.train.pallas_pool)
        result["pallas_pool"] = True
    if step_flops:
        result["tflops_per_sec"] = round(step_flops * steps_per_sec / 1e12, 1)
    return result


def main(mixed_precision=False, batch_size=64):
    print(json.dumps(measure(mixed_precision, batch_size)))


if __name__ == "__main__":
    if os.environ.get("RMVQ_REQUIRE_TPU", "0") == "1":
        # launched speculatively (before the parent knows its backend):
        # bail out cheaply on CPU, where batch-64 image training is
        # infeasible. rc=3 tells the parent "skipped, not failed".
        # Package import FIRST: it honors RMVQ_FORCE_CPU before the
        # backend initializes (bare jax would contact the axon tunnel).
        import robot_manipulation_vq_vae_tpu  # noqa: F401
        import jax

        if jax.default_backend() == "cpu":
            print(json.dumps({"skipped": "cpu backend"}))
            raise SystemExit(3)
    mp = os.environ.get("RMVQ_BF16", "0") == "1"
    result = measure(
        mixed_precision=mp,
        batch_size=int(os.environ.get("RMVQ_BATCH", "64")),
        n_long=int(os.environ.get("RMVQ_NLONG", "6")),
        frozen_batch_norm=os.environ.get("RMVQ_BN_FROZEN", "0") == "1",
        pool_free_stem=os.environ.get("RMVQ_POOL_FREE", "0") == "1",
        packed_rgb_encoders=os.environ.get("RMVQ_PACKED", "0") == "1",
        pallas_pool=os.environ.get("RMVQ_PALLAS_POOL", "0") == "1",
    )
    # write to a result file as soon as measured (more robust than stdout
    # harvesting if the parent kills us between print and flush); tmp +
    # os.replace so a deadline kill mid-dump can't leave a torn file that
    # discards the fully measured flagship number
    path = os.environ.get("RMVQ_RESULT_FILE")
    if path:
        from robot_manipulation_vq_vae_tpu.utils.file_utils import (
            atomic_write_json,
        )

        atomic_write_json(path, result)
    print(json.dumps(result))

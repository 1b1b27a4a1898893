"""Flagship serving latency: ICLTransformerHVQVAE.get_action (HVQVAE
context-action reconstruction + FiLM-ResNet18 x3 cams + 6L/512d transformer)
as ONE jitted device call, at rollout shapes (obs window = context_length).

Timing: N sequential calls, fetch only the last output — the device executes
in order, so the final fetch syncs the whole chain and amortizes the
(unreliable on tunneled backends) per-call sync.

Two optional extra measurements after the batch sweep:

* ``RMVQ_ROLLOUT_FPS=1``: the END-TO-END batched eval pipeline — 16
  subprocess fake envs emitting flagship-shaped FrameStack windows, the
  real ``run_batched_rollout`` loop (obs pipes -> batchify -> normalize ->
  device -> action scatter; reference tianshou SubprocVectorEnv usage
  ``robomimic/utils/train_utils.py:317-529``) — reported as ``rollout_fps``
  actions/s, to sit next to the device-only batch-16 number.
* dp-sharded batch-16 get_action whenever >1 device is visible (reference
  serving ``robomimic/algo/algo.py:666-924``): the multi-chip serving
  number, measured the day real multi-chip hardware appears; silently
  skipped at n_devices=1.

Prints one JSON line per measurement."""

import json
import os
import time

import numpy as np

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


class FlagshipWindowFakeEnv:
    """Deterministic fake env emitting flagship-shaped FrameStack windows
    ([H] x 3 cams 128x128x3 uint8 + low-dim) so the rollout leg measures
    the REAL eval pipeline cost (subprocess obs pipes, batchify, device
    round-trip, action scatter) at flagship scale without a simulator.
    Obs synthesis is a cheap roll+increment: the pipe transfer is the
    payload under test, not image generation."""

    env_lang = None

    def __init__(self, seed=0, h=H, img=IMG):
        rng = np.random.RandomState(seed)
        self._imgs = {
            c: rng.randint(0, 255, (h,) + tuple(img), np.uint8) for c in CAMS
        }
        self._low = {
            k: rng.randn(h, *s).astype(np.float32)
            for k, s in LOW_DIM.items()
        }
        self._t = 0

    def _obs(self):
        obs = {c: np.roll(v, self._t, axis=0) for c, v in self._imgs.items()}
        obs.update(
            {k: v + 0.01 * self._t for k, v in self._low.items()}
        )
        return obs

    def reset(self):
        self._t = 0
        return self._obs()

    def step(self, action):
        self._t += 1
        return self._obs(), 1.0, False, {}

    def is_success(self):
        return {"task": False}


def main(batch_sizes=(1, 16), mixed_precision=False, img_hw=None,
         ctx_len=None, rollout_fps=False, rollout_envs=16,
         rollout_horizon=25):
    """@img_hw/@ctx_len shrink the model for sim-free CPU tests; the bench
    defaults are the flagship's shipped scale (128px, ctx 16)."""
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

    global H, IMG  # FlagshipWindowFakeEnv defaults follow the active shapes
    if ctx_len is not None:
        H = int(ctx_len)
    if img_hw is not None:
        IMG = (int(img_hw), int(img_hw), 3)

    obs_key_shapes = dict(LOW_DIM)
    obs_key_shapes.update({c: IMG for c in CAMS})
    crop = IMG[0] - 12  # shipped ratio: 128 -> 116

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
            "crop_height": crop, "crop_width": crop, "num_crops": 1,
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
        _flush(results)
        print(json.dumps(result))

    # ---- dp-sharded batch-16 serving (multi-chip story) -----------------
    # Runs whenever >1 device is visible (virtual CPU meshes included);
    # silently skipped on the single-chip bench host so the leg keeps
    # working at n=1 — the number exists the day real multi-chip hardware
    # appears. Reference serving: robomimic/algo/algo.py:666-924.
    n_dev = len(jax.devices())
    b_sh = max(batch_sizes)
    if n_dev > 1 and b_sh > 1 and b_sh % n_dev == 0:
        from robot_manipulation_vq_vae_tpu.parallel import (
            make_mesh,
            shard_batch,
        )

        b = b_sh
        key = jax.random.PRNGKey(1)
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
        mesh = make_mesh(n_devices=n_dev, mp=1)
        with mesh:
            obs_sh = shard_batch(mesh, obs)
            ctx_sh = {"actions": shard_batch(mesh, ctx["actions"])}
            t0 = time.perf_counter()
            out = algo.get_action(obs_sh, context_batch=ctx_sh)
            np.asarray(out)
            compile_sec = time.perf_counter() - t0
            for _ in range(3):
                out = algo.get_action(obs_sh, context_batch=ctx_sh)
            np.asarray(out)
            n = 50
            t0 = time.perf_counter()
            for _ in range(n):
                out = algo.get_action(obs_sh, context_batch=ctx_sh)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / n
        result = {
            "metric": "icl_hvqvae_get_action_latency",
            "value": round(dt * 1e3, 3),
            "unit": f"ms/call (batch {b}, dp={n_dev})",
            "batch": b,
            "sharded": True,
            "n_devices": n_dev,
            "actions_per_sec": round(b / dt, 1),
            "compile_sec": round(compile_sec, 1),
            "mixed_precision": bool(mixed_precision),
        }
        results.append(result)
        _flush(results)
        print(json.dumps(result))

    # ---- end-to-end batched rollout pipeline (fake envs) ----------------
    # The device-only batch-16 number above excludes everything the real
    # eval loop pays: subprocess env pools piping ~36 MB of framestacked
    # images per lockstep, host batchify, obs normalization, and the
    # action scatter. This measures that WHOLE loop via the production
    # run_batched_rollout over 16 fake envs at flagship obs shapes
    # (reference tianshou usage robomimic/utils/train_utils.py:317-529).
    if rollout_fps:
        from robot_manipulation_vq_vae_tpu.algo.algo import ICLRolloutPolicy
        from robot_manipulation_vq_vae_tpu.envs.vector_env import (
            SubprocVectorEnv,
        )
        from robot_manipulation_vq_vae_tpu.utils.train_utils import (
            run_batched_rollout,
        )

        n_envs = int(rollout_envs)
        horizon = int(rollout_horizon)
        h_env, img_env = H, IMG
        venv = SubprocVectorEnv(
            [(lambda s=s: FlagshipWindowFakeEnv(seed=s, h=h_env, img=img_env))
             for s in range(n_envs)],
            shared_obs=os.environ.get("RMVQ_ROLLOUT_SHM", "1") == "1",
        )
        try:
            policy = ICLRolloutPolicy(algo)
            ctx_roll = {
                "actions": np.random.RandomState(0)
                .uniform(-1, 1, (1, H, A)).astype(np.float32)
            }
            # warmup pass: compiles the n_envs-batch get_action if the
            # batch sweep above didn't already cover it
            run_batched_rollout(policy, venv, horizon=2,
                                context_batch=ctx_roll)
            t0 = time.perf_counter()
            run_batched_rollout(policy, venv, horizon=horizon,
                                context_batch=ctx_roll)
            dt = time.perf_counter() - t0
        finally:
            venv.close()
        n_actions = n_envs * horizon
        result = {
            "metric": "rollout_fps",
            "value": round(n_actions / dt, 1),
            "unit": f"actions/sec end-to-end ({n_envs} subprocess envs)",
            "actions_per_sec": round(n_actions / dt, 1),
            "env_steps_per_sec": round(horizon / dt, 2),
            "n_envs": n_envs,
            "horizon": horizon,
            "shared_obs": venv._shared_obs,
            "mixed_precision": bool(mixed_precision),
        }
        results.append(result)
        _flush(results)
        print(json.dumps(result))
    return results


def _flush(results):
    """Flush results to the result file as soon as each lands, so a
    deadline kill from the bench harness still captures what finished.
    tmp + os.replace: a kill mid-write must not tear the file and lose
    already-flushed entries (same pattern as bench_tokenizer.py /
    bench_loader.py)."""
    path = os.environ.get("RMVQ_RESULT_FILE")
    if path:
        from robot_manipulation_vq_vae_tpu.utils.file_utils import (
            atomic_write_json,
        )

        atomic_write_json(path, results)


if __name__ == "__main__":
    if os.environ.get("RMVQ_REQUIRE_TPU", "0") == "1":
        # may run on a CPU-only host: bail out cheaply, rc=3 tells the
        # parent "skipped, not failed" (same contract as bench_train.py).
        # Package import FIRST so RMVQ_FORCE_CPU is honored.
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
        rollout_fps=os.environ.get("RMVQ_ROLLOUT_FPS", "0") == "1",
        rollout_envs=int(os.environ.get("RMVQ_ROLLOUT_ENVS", "16")),
        rollout_horizon=int(os.environ.get("RMVQ_ROLLOUT_HORIZON", "25")),
    )

"""Training entry point.

Mirrors the reference CLI and flow (``robomimic/scripts/train.py``):

    python -m robot_manipulation_vq_vae_tpu.scripts.train --config cfg.json
        [--algo NAME] [--name RUN] [--dataset PATH] [--debug] [--eval_only]

Flow (reference train.py:47-538): config -> obs-utils init -> per-dataset
env/shape metadata -> eval envs (optional; requires robosuite on host) ->
logger -> algo -> datasets/loaders -> epoch loop {run_epoch -> rollouts ->
checkpoints -> MSE eval}.
"""

import argparse
import glob
import json
import os
import sys
import time
import traceback
from collections import OrderedDict

import numpy as np

from robot_manipulation_vq_vae_tpu.config import config_factory
import robot_manipulation_vq_vae_tpu.algo  # noqa: F401 (registers algos)
from robot_manipulation_vq_vae_tpu.algo import (
    ICLRolloutPolicy,
    RolloutPolicy,
    algo_factory,
)
from robot_manipulation_vq_vae_tpu.data.loader import DataLoader, InfiniteLoader
from robot_manipulation_vq_vae_tpu.models import obs_core  # noqa: F401 (registers cores)
from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
from robot_manipulation_vq_vae_tpu.utils import lang_utils as LangUtils
from robot_manipulation_vq_vae_tpu.utils import log_utils as LogUtils
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils import train_utils as TrainUtils


def train(config, eval_only=False, auto_resume=False):
    """Main train loop (reference train.py:47-487)."""
    np.random.seed(config.train.seed)

    print("\n============= New Training Run with Config =============")
    print(config)
    log_dir, ckpt_dir, video_dir, time_str = TrainUtils.get_exp_dir(config)

    if config.experiment.logging.terminal_output_to_txt:
        logger = LogUtils.PrintLogger(os.path.join(log_dir, "log.txt"))
        sys.stdout = logger
        sys.stderr = logger

    ObsUtils.initialize_obs_utils_with_config(config)

    # per-dataset env/shape metadata (reference train.py:76-103)
    dataset_cfg = config.train.data
    if isinstance(dataset_cfg, str):
        dataset_cfg = [{"path": dataset_cfg}]
    dataset_paths = [e["path"] for e in dataset_cfg]
    for p in dataset_paths:
        assert os.path.exists(os.path.expanduser(p)), f"dataset {p} missing"

    env_meta_list, shape_meta_list = [], []
    for entry in dataset_cfg:
        env_meta = FileUtils.get_env_metadata_from_dataset(
            dataset_path=entry["path"],
            ds_format=config.train.data_format,
        )
        meta_update = config.experiment.env_meta_update_dict
        if meta_update:
            env_meta.setdefault("env_kwargs", {})
            for k, v in meta_update.get("env_kwargs", {}).items():
                env_meta["env_kwargs"][k] = v
        if config.experiment.env is not None:
            # evaluate in a different env than the dataset's (reference
            # train.py:105-107)
            env_meta["env_name"] = config.experiment.env
        env_meta_list.append(env_meta)
        shape_meta_list.append(
            FileUtils.get_shape_metadata_from_dataset(
                dataset_path=entry["path"],
                action_keys=config.train.action_keys,
                all_obs_keys=config.all_obs_keys,
                ds_format=config.train.data_format,
                verbose=True,
            )
        )
    shape_meta = shape_meta_list[0]

    # eval envs (only when rollouts enabled AND the sim stack is installed)
    envs = OrderedDict()
    if config.experiment.rollout.get("enabled", False) and not eval_only:
        try:
            for entry, env_meta in zip(dataset_cfg, env_meta_list):
                if not entry.get("do_eval", True):
                    continue

                def make_env(env_meta=env_meta):
                    env = EnvUtils.create_env_from_metadata(
                        env_meta=env_meta,
                        render=False,
                        render_offscreen=config.experiment.render_video,
                        use_image_obs=shape_meta["use_images"],
                    )
                    return EnvUtils.wrap_env_from_config(env, config=config)

                if config.experiment.rollout.get("batched", False):
                    # subprocess env pool stepping in lockstep (reference
                    # train.py:141-144, tianshou SubprocVectorEnv)
                    from robot_manipulation_vq_vae_tpu.envs.vector_env import (
                        SubprocVectorEnv,
                    )

                    n_batch = int(
                        config.experiment.rollout.get("num_batch_envs", 5)
                    )
                    # shared_obs: workers write observations into one
                    # shm-backed batch array instead of pickling ~MBs of
                    # images through pipes every lockstep (vector_env.py)
                    envs[env_meta["env_name"]] = SubprocVectorEnv(
                        [make_env] * n_batch, shared_obs=True
                    )
                else:
                    env = make_env()
                    envs[env.name] = env
            # extra eval-only envs (zero-shot evaluation;
            # experiment.additional_envs, upstream robomimic semantics)
            for extra_name in (config.experiment.additional_envs or []):
                extra_meta = dict(env_meta_list[0])
                extra_meta["env_name"] = extra_name
                env = EnvUtils.create_env_from_metadata(
                    env_meta=extra_meta,
                    render=False,
                    render_offscreen=config.experiment.render_video,
                    use_image_obs=shape_meta["use_images"],
                )
                env = EnvUtils.wrap_env_from_config(env, config=config)
                envs[env.name] = env
        except ImportError as e:
            LogUtils.log_warning(
                f"rollouts disabled: sim stack unavailable ({e})"
            )

    data_logger = LogUtils.DataLogger(
        log_dir, config=config,
        log_tb=config.experiment.logging.log_tb,
        log_wandb=config.experiment.logging.log_wandb,
    )

    model = algo_factory(
        algo_name=config.algo_name,
        config=config,
        obs_key_shapes=shape_meta["all_shapes"],
        ac_dim=shape_meta["ac_dim"],
    )

    # checkpoint warm-start (reference train.py:173-178)
    ckpt_path = config.experiment.ckpt_path
    start_epoch = 1
    if auto_resume and ckpt_path is None:
        # crash recovery: pick up the newest checkpoint of this experiment
        # (pairs with experiment.save.include_optimizer for a true resume)
        pattern = os.path.join(
            os.path.abspath(os.path.expanduser(config.train.output_dir)),
            config.experiment.name, "*", "models", "model_epoch_*",
        )
        candidates = [
            p for p in glob.glob(pattern)
            if p.endswith(".ckpt") or p.endswith(".orbax")
        ]
        if candidates:
            def epoch_of(p):
                stem = os.path.basename(p).split(".")[0]
                digits = "".join(
                    c for c in stem.split("model_epoch_")[1] if c.isdigit()
                )
                return int(digits or 0)

            ckpt_path = max(candidates, key=epoch_of)
            start_epoch = epoch_of(ckpt_path) + 1
            print(f"auto-resume: found {ckpt_path} (epoch {start_epoch - 1})")
    if ckpt_path is not None and os.path.exists(ckpt_path) and not (
        os.path.isdir(ckpt_path) and not ckpt_path.endswith(".orbax")
    ):
        ckpt = FileUtils.maybe_dict_from_checkpoint(ckpt_path=ckpt_path)
        model.deserialize(ckpt["model"])
        print(f"warm-started model weights from {ckpt_path}")

    print("\n============= Model Summary =============")
    print(model)

    lang_encoder = LangUtils.LangEncoder()

    trainset, validset = TrainUtils.load_data_for_training(
        config, obs_keys=shape_meta["all_obs_keys"], lang_encoder=lang_encoder
    )
    print(f"\n============= Training Dataset =============\n{trainset}")

    obs_normalization_stats = None
    if config.train.hdf5_normalize_obs:
        obs_normalization_stats = trainset.normalize_obs()
    action_normalization_stats = trainset.get_action_normalization_stats()

    sampler_weights = trainset.get_dataset_sampler()
    train_loader = DataLoader(
        trainset,
        batch_size=config.train.batch_size,
        shuffle=True,
        sampler_weights=sampler_weights,
        num_workers=min(int(config.train.num_data_workers) or 1, 16),
        drop_last=True,
        seed=config.train.seed,
        # safe here: the DevicePrefetcher worker blocks until each batch's
        # host->device transfer completes before drawing the next, so ring
        # buffers are never recycled under an in-flight DMA
        reuse_buffers=True,
    )
    # context loader for ICL rollouts (reference train.py:217-224: batch=1)
    context_loader = InfiniteLoader(
        DataLoader(
            trainset, batch_size=1, shuffle=True,
            sampler_weights=sampler_weights, num_workers=1,
            seed=config.train.seed + 1,
        )
    )
    valid_loader = None
    if validset is not None:
        valid_loader = DataLoader(
            validset, batch_size=config.train.batch_size, shuffle=True,
            num_workers=1, seed=config.train.seed,
        )

    best_return = {k: -np.inf for k in envs}
    # per-epoch numeric summaries (timing buckets, losses), returned to
    # programmatic callers — flagship_smoke derives its steady-state
    # steps/s from the LAST epoch (the first pays the XLA compile)
    epoch_history = []
    best_success_rate = {k: -1.0 for k in envs}
    last_ckpt_time = time.time()

    train_num_steps = config.experiment.epoch_every_n_steps
    valid_num_steps = config.experiment.validation_epoch_every_n_steps
    # ONE device-prefetch pipeline for the whole run: the worker thread
    # fetches + processes + device_puts batches while the device steps, so
    # host->device transfer overlaps compute (the TPU analogue of the
    # reference's 48 DataLoader workers + pinned-memory copies). Batches
    # flow strictly in loader order and are never dropped, so the sample
    # stream is identical to the synchronous path (exact-resume safe).
    train_iter = None
    if not eval_only:
        from robot_manipulation_vq_vae_tpu.data.prefetch import (
            DevicePrefetcher,
        )

        train_iter = DevicePrefetcher(
            train_loader,
            prepare=TrainUtils.make_batch_preparer(
                model, obs_normalization_stats
            ),
            depth=2,
        )

    for epoch in range(start_epoch, config.train.num_epochs + 1):
        # eval-while-training mode: a *directory* ckpt_path makes the loop
        # re-load model_epoch_{N} each epoch (reference train.py:259-267,
        # used by config_gen/eval_ckpt.py)
        if ckpt_path is not None and os.path.isdir(ckpt_path):
            epoch_ckpt = os.path.join(ckpt_path, f"model_epoch_{epoch}.ckpt")
            if not os.path.isfile(epoch_ckpt):
                orbax_ckpt = os.path.join(
                    ckpt_path, f"model_epoch_{epoch}.orbax"
                )
                if os.path.isdir(orbax_ckpt):
                    epoch_ckpt = orbax_ckpt
            if os.path.exists(epoch_ckpt):
                ckpt = FileUtils.maybe_dict_from_checkpoint(
                    ckpt_path=epoch_ckpt
                )
                model.deserialize(ckpt["model"])
                print(f"loaded {epoch_ckpt}")
            else:
                print(f"waiting: {epoch_ckpt} not found, skipping epoch")
                continue

        profile_dir = os.environ.get("RMVQ_PROFILE_DIR")
        if profile_dir and epoch == 2 and not eval_only:
            # capture one profiled epoch (view with tensorboard / xprof)
            import jax

            with jax.profiler.trace(profile_dir):
                step_log = TrainUtils.run_epoch(
                    model=model,
                    data_loader=train_loader,
                    epoch=epoch,
                    num_steps=train_num_steps,
                    obs_normalization_stats=obs_normalization_stats,
                    data_loader_iter=train_iter,
                )
            model.on_epoch_end(epoch)
        elif not eval_only:
            step_log = TrainUtils.run_epoch(
                model=model,
                data_loader=train_loader,
                epoch=epoch,
                num_steps=train_num_steps,
                obs_normalization_stats=obs_normalization_stats,
                data_loader_iter=train_iter,
            )
            model.on_epoch_end(epoch)
        else:
            step_log = {}

        # checkpoint cadence (reference train.py:283-294)
        epoch_ckpt_name = f"model_epoch_{epoch}"
        should_save_ckpt = False
        ckpt_reason = None
        if config.experiment.save.enabled:
            time_check = (
                config.experiment.save.every_n_seconds is not None
                and time.time() - last_ckpt_time
                > config.experiment.save.every_n_seconds
            )
            epoch_check = (
                config.experiment.save.every_n_epochs is not None
                and epoch > 0
                and epoch % config.experiment.save.every_n_epochs == 0
            )
            epoch_list_check = epoch in config.experiment.save.epochs
            should_save_ckpt = time_check or epoch_check or epoch_list_check
            if should_save_ckpt:
                last_ckpt_time = time.time()
                ckpt_reason = "time"

        for k, v in step_log.items():
            if k.startswith("Time_"):
                data_logger.record(f"Timing_Stats/Train_{k[5:]}", v, epoch)
            else:
                data_logger.record(f"Train/{k}", v, epoch)

        # validation (reference train.py:303-324)
        if config.experiment.validate and valid_loader is not None:
            valid_step_log = TrainUtils.run_epoch(
                model=model, data_loader=valid_loader, epoch=epoch,
                validate=True, num_steps=valid_num_steps,
            )
            for k, v in valid_step_log.items():
                if k.startswith("Time_"):
                    data_logger.record(f"Timing_Stats/Valid_{k[5:]}", v, epoch)
                else:
                    data_logger.record(f"Valid/{k}", v, epoch)

        # rollout evaluation (reference train.py:325-430)
        video_paths = None
        rollout_check = (
            epoch % config.experiment.rollout.rate == 0 or eval_only
        )
        if (
            config.experiment.rollout.enabled
            and envs
            and (epoch > config.experiment.rollout.warmstart)
            and rollout_check
        ):
            is_icl = config.algo_name.startswith("icl")
            wrapper = ICLRolloutPolicy if is_icl else RolloutPolicy
            rollout_model = wrapper(
                model,
                obs_normalization_stats=obs_normalization_stats,
                action_normalization_stats=action_normalization_stats,
                lang_encoder=lang_encoder,
            )
            context_batch = None
            if is_icl:
                raw = next(context_loader)
                context_batch = model.process_batch_for_training(raw)

            num_episodes = config.experiment.rollout.n
            all_rollout_logs, video_paths = TrainUtils.rollout_with_stats(
                policy=rollout_model,
                envs=envs,
                horizon=config.experiment.rollout.horizon,
                context_batch=context_batch,
                use_goals=config.use_goals,
                num_episodes=num_episodes,
                render=config.experiment.render,
                video_dir=video_dir if config.experiment.render_video else None,
                epoch=epoch,
                video_skip=config.experiment.video_skip,
                terminate_on_success=config.experiment.rollout.terminate_on_success,
            )
            for env_name, rollout_logs in all_rollout_logs.items():
                for k, v in rollout_logs.items():
                    if k.startswith("Time_"):
                        data_logger.record(
                            f"Timing_Stats/Rollout_{env_name}_{k[5:]}", v, epoch
                        )
                    else:
                        data_logger.record(
                            f"Rollout/{k}/{env_name}", v, epoch, log_stats=True
                        )
                print(f"Env: {env_name}")
                print(json.dumps(rollout_logs, sort_keys=True, indent=4))

            updated = TrainUtils.should_save_from_rollout_logs(
                all_rollout_logs=all_rollout_logs,
                best_return=best_return,
                best_success_rate=best_success_rate,
                epoch_ckpt_name=epoch_ckpt_name,
                save_on_best_rollout_return=config.experiment.save.on_best_rollout_return,
                save_on_best_rollout_success_rate=config.experiment.save.on_best_rollout_success_rate,
            )
            best_return = updated["best_return"]
            best_success_rate = updated["best_success_rate"]
            epoch_ckpt_name = updated["epoch_ckpt_name"]
            should_save_ckpt = should_save_ckpt or updated["should_save_ckpt"]

        # model-prediction MSE eval (reference train.py:439-459)
        mse_cfg = config.experiment.mse
        if mse_cfg.get("enabled", False) and (
            epoch % mse_cfg.get("every_n_epochs", 50) == 0
            or (should_save_ckpt and mse_cfg.get("on_save_ckpt", False))
        ):
            savedir = (
                os.path.join(video_dir, f"mse_epoch_{epoch}")
                if mse_cfg.get("visualize", False)
                else None
            )
            mse_log, _ = model.compute_mse_visualize(
                trainset, validset,
                num_samples=mse_cfg.get("num_samples", 20),
                savedir=savedir,
            )
            for k, v in mse_log.items():
                data_logger.record(f"{k}", v, epoch)

        # save checkpoint (reference train.py:469-479)
        if should_save_ckpt and not eval_only:
            ckpt_ext = (
                ".orbax"
                if config.experiment.save.get("format", "pickle") == "orbax"
                else ".ckpt"
            )
            TrainUtils.save_model(
                model=model,
                config=config,
                env_meta=env_meta_list[0],
                shape_meta=shape_meta,
                ckpt_path=os.path.join(ckpt_dir, epoch_ckpt_name + ckpt_ext),
                obs_normalization_stats=obs_normalization_stats,
                action_normalization_stats=action_normalization_stats,
            )

        # host RAM telemetry (reference train.py:480-483)
        try:
            import psutil

            mem = psutil.virtual_memory()
            data_logger.record("System/RAM_Usage_pct", mem.percent, epoch)
        except ImportError:
            pass

        if "Loss" in step_log:
            print(f"Epoch {epoch}: Loss {step_log['Loss']:.6f}")
        epoch_history.append({
            "epoch": epoch,
            "num_steps": train_num_steps,
            **{k: float(v) for k, v in step_log.items()
               if isinstance(v, (int, float, np.floating, np.integer))},
        })
        if eval_only:
            break

    if train_iter is not None:
        train_iter.close()
    data_logger.close()
    return epoch_history


def main(args):
    TrainUtils.enable_compile_cache()
    if args.config is not None:
        with open(args.config) as f:
            ext_cfg = json.load(f)
        config = config_factory(ext_cfg["algo_name"])
        with config.values_unlocked():
            config.update(ext_cfg)
    else:
        config = config_factory(args.algo)

    if args.dataset is not None:
        with config.values_unlocked():
            config.train.data = args.dataset
    if args.name is not None:
        with config.values_unlocked():
            config.experiment.name = args.name
    if args.output_dir is not None:
        with config.values_unlocked():
            config.train.output_dir = args.output_dir

    if args.debug:
        with config.values_unlocked():
            config.unlock()
            config.experiment.epoch_every_n_steps = 3
            config.experiment.validation_epoch_every_n_steps = 3
            config.train.num_epochs = 2
            config.experiment.rollout.rate = 1
            config.experiment.rollout.n = 2
            config.experiment.rollout.horizon = 10
            config.experiment.save.every_n_epochs = 1
            config.lock_keys()

    config.lock()

    if args.debug:
        train(config, eval_only=args.eval_only,
              auto_resume=getattr(args, "auto_resume", False))
        return

    try:
        train(config, eval_only=args.eval_only,
              auto_resume=getattr(args, "auto_resume", False))
    except Exception as e:
        print(f"run failed with error:\n{e}\n\n{traceback.format_exc()}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--algo", type=str, default=None)
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument(
        "--auto_resume", action="store_true",
        help="resume from the newest checkpoint of this experiment "
             "(use with experiment.save.include_optimizer for a true resume)",
    )
    args = parser.parse_args()
    main(args)

"""Training harness utilities (reference ``robomimic/utils/train_utils.py``):
experiment dirs, dataset factory, the epoch loop with timing buckets, env
rollout loops (plain + ICL), checkpoint-save policy, and model saving.
"""

import os
import time
from collections import OrderedDict
from copy import deepcopy

import numpy as np

from robot_manipulation_vq_vae_tpu.data.dataset import (
    MetaDataset,
    SequenceDataset,
)
from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
from robot_manipulation_vq_vae_tpu.utils import log_utils as LogUtils
from robot_manipulation_vq_vae_tpu.utils import tensor_utils as TensorUtils


def enable_compile_cache(cache_dir="/tmp/rmvq_jax_cache"):
    """Turn on JAX's persistent compilation cache (safe to call repeatedly).
    Saves minutes per process on tunneled TPU backends where every fresh
    compile is a remote round-trip."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or unsupported backend


def get_exp_dir(config, auto_remove_exp_dir=False):
    """Create the timestamped experiment directory tree
    (reference train_utils.py:32-92). Returns (log_dir, ckpt_dir, video_dir,
    time_str)."""
    import datetime

    t_now = time.time()
    time_str = datetime.datetime.fromtimestamp(t_now).strftime(
        "%Y%m%d%H%M%S"
    )
    base_output_dir = os.path.expanduser(config.train.output_dir)
    if not os.path.isabs(base_output_dir):
        base_output_dir = os.path.abspath(base_output_dir)
    base_output_dir = os.path.join(base_output_dir, config.experiment.name)
    base_output_dir = os.path.join(base_output_dir, time_str)
    os.makedirs(base_output_dir, exist_ok=True)

    log_dir = os.path.join(base_output_dir, "logs")
    ckpt_dir = os.path.join(base_output_dir, "models")
    video_dir = os.path.join(base_output_dir, "videos")
    for d in (log_dir, ckpt_dir, video_dir):
        os.makedirs(d, exist_ok=True)
    return log_dir, ckpt_dir, video_dir, time_str


def load_data_for_training(config, obs_keys, lang_encoder=None):
    """Build train (and maybe valid) datasets from config
    (reference train_utils.py:94-163)."""
    train_filter_by_attribute = config.train.hdf5_filter_key
    valid_filter_by_attribute = config.train.hdf5_validation_filter_key
    if config.experiment.validate:
        assert valid_filter_by_attribute is not None

    train_dataset = dataset_factory(
        config, obs_keys,
        filter_by_attribute=train_filter_by_attribute,
        lang_encoder=lang_encoder,
    )
    valid_dataset = None
    if config.experiment.validate:
        valid_dataset = dataset_factory(
            config, obs_keys,
            filter_by_attribute=valid_filter_by_attribute,
            lang_encoder=lang_encoder,
        )
    return train_dataset, valid_dataset


def dataset_factory(config, obs_keys, filter_by_attribute=None,
                    dataset_path=None, lang_encoder=None):
    """SequenceDataset per config.train.data entry; multiple entries are
    wrapped in a weighted MetaDataset (reference train_utils.py:164-278)."""
    ds_kwargs = dict(
        obs_keys=obs_keys,
        action_keys=config.train.action_keys,
        dataset_keys=config.train.dataset_keys,
        action_config=config.train.action_config,
        frame_stack=config.train.frame_stack,
        seq_length=config.train.seq_length,
        pad_frame_stack=config.train.pad_frame_stack,
        pad_seq_length=config.train.pad_seq_length,
        get_pad_mask=False,
        goal_mode=config.train.goal_mode,
        hdf5_cache_mode=config.train.hdf5_cache_mode,
        hdf5_use_swmr=config.train.hdf5_use_swmr,
        hdf5_normalize_obs=config.train.hdf5_normalize_obs,
        load_next_obs=config.train.hdf5_load_next_obs,
        shuffled_obs_key_groups=config.train.shuffled_obs_key_groups,
        lang_encoder=lang_encoder,
    )

    if dataset_path is not None:
        return SequenceDataset(
            hdf5_path=dataset_path,
            filter_by_attribute=filter_by_attribute,
            **ds_kwargs,
        )

    data_cfg = config.train.data
    if isinstance(data_cfg, str):
        return SequenceDataset(
            hdf5_path=data_cfg,
            filter_by_attribute=filter_by_attribute,
            **ds_kwargs,
        )

    # list of dataset dicts: {path, [filter_key], [weight], [lang]}
    datasets, weights = [], []
    for entry in data_cfg:
        entry_filter = entry.get("filter_key", filter_by_attribute)
        datasets.append(
            SequenceDataset(
                hdf5_path=entry["path"],
                filter_by_attribute=entry_filter,
                **{**ds_kwargs, "dataset_lang": entry.get("lang", None)},
            )
        )
        weights.append(entry.get("weight", 1.0))
    if len(datasets) == 1:
        return datasets[0]
    return MetaDataset(
        datasets, weights,
        normalize_weights_by_ds_size=False,
    )


def batchify_obs(obs_list):
    """List of obs dicts -> batched obs dict (reference :680-697)."""
    keys = list(obs_list[0].keys())
    return {k: np.stack([obs[k] for obs in obs_list]) for k in keys}


def make_batch_preparer(model, obs_normalization_stats=None):
    """The host-side per-batch work as one callable (for DevicePrefetcher's
    worker thread): per-algo slicing + obs normalization. Pure numpy, so
    safe off the main thread."""

    def prepare(batch):
        input_batch = model.process_batch_for_training(batch)
        return model.postprocess_batch_for_training(
            input_batch, obs_normalization_stats=obs_normalization_stats
        )

    return prepare


def run_epoch(model, data_loader, epoch, validate=False, num_steps=None,
              obs_normalization_stats=None, data_loader_iter=None):
    """One epoch of gradient steps with the reference's timing buckets
    (reference train_utils.py:1238-1335).

    ``data_loader_iter`` may be a ``data.prefetch.DevicePrefetcher`` (the
    production path, wired in ``scripts/train.py``): host batch fetch,
    per-algo processing, and the host->device transfer then all run on a
    background thread, overlapping the device step — the reference overlaps
    the same way with DataLoader workers + pinned-memory copies. In that
    mode ``Data_Loading`` measures pipeline stall (waiting for a
    device-ready batch), ``Process_Batch`` is ~0 (the work happens in the
    worker and is reported separately via ``prefetch/*`` keys), and
    ``Train_Batch`` measures the device step (blocked on explicitly for
    honest attribution, since dispatch alone returns immediately).
    """
    from robot_manipulation_vq_vae_tpu.data.prefetch import DevicePrefetcher

    epoch_timestamp = time.time()
    if validate:
        model.set_eval()
    else:
        model.set_train()
    if num_steps is None:
        num_steps = len(data_loader)

    step_log_all = []
    timing_stats = dict(
        Data_Loading=[], Process_Batch=[], Train_Batch=[], Log_Info=[]
    )

    prefetcher = (
        data_loader_iter
        if isinstance(data_loader_iter, DevicePrefetcher) else None
    )
    if prefetcher is not None:
        prefetcher.reset_stats()
        iterator = None
    else:
        iterator = (
            data_loader_iter if data_loader_iter is not None
            else iter(data_loader)
        )
    for _ in LogUtils.custom_tqdm(range(num_steps)):
        t = time.time()
        if prefetcher is not None:
            input_batch = prefetcher.get()
            timing_stats["Data_Loading"].append(time.time() - t)
            timing_stats["Process_Batch"].append(0.0)
        else:
            try:
                batch = next(iterator)
            except StopIteration:
                iterator = iter(data_loader)
                batch = next(iterator)
            timing_stats["Data_Loading"].append(time.time() - t)

            t = time.time()
            input_batch = model.process_batch_for_training(batch)
            input_batch = model.postprocess_batch_for_training(
                input_batch, obs_normalization_stats=obs_normalization_stats
            )
            timing_stats["Process_Batch"].append(time.time() - t)

        t = time.time()
        info = model.train_on_batch(input_batch, epoch, validate=validate)
        if prefetcher is not None:
            # under async dispatch train_on_batch returns at enqueue time;
            # block here so Train_Batch honestly carries the device step
            # (the prefetch worker keeps transferring concurrently)
            try:
                import jax

                jax.block_until_ready(info)
            except Exception:
                pass
        timing_stats["Train_Batch"].append(time.time() - t)

        t = time.time()
        step_log_all.append(model.log_info(info))
        timing_stats["Log_Info"].append(time.time() - t)

    step_log_dict = {}
    for step_log in step_log_all:
        for k, v in step_log.items():
            step_log_dict.setdefault(k, []).append(v)
    out = {k: float(np.mean(v)) for k, v in step_log_dict.items()}
    for k, v in timing_stats.items():
        out[f"Time_{k}"] = float(np.sum(v) / 60.0)
    out["Time_Epoch"] = (time.time() - epoch_timestamp) / 60.0
    if prefetcher is not None:
        # worker-side decomposition (concurrent with the buckets above):
        # where host time actually went, incl. measured transfer MB/s
        for k, v in prefetcher.transfer_summary().items():
            out[f"prefetch/{k}"] = v
    return out


def is_every_n_steps(interval, current_step, skip_zero=False):
    if interval is None:
        return False
    assert isinstance(interval, int) and interval > 0
    assert isinstance(current_step, int) and current_step >= 0
    if skip_zero and current_step == 0:
        return False
    return current_step % interval == 0


# ---------------------------------------------------------------------------
# rollouts
# ---------------------------------------------------------------------------

def run_batched_rollout(policy, venv, horizon, context_batch=None,
                        terminate_on_success=False):
    """Vector-env rollout: one batched policy query steps every env in
    lockstep (reference run_rollout batched branch, train_utils.py:320-457,
    over tianshou's SubprocVectorEnv). Returns one result dict per env."""
    langs = venv.get_env_attr("env_lang")
    policy.start_episode(lang=langs[0] if langs else None)
    # prefer the pool's batched-dict API: with shared_obs the obs batch is
    # the shm-backed array itself (no per-env pickling, no parent re-stack)
    use_batched_api = hasattr(venv, "step_batched")
    if use_batched_api:
        ob_batch = venv.reset_batched()
    else:
        ob_list = venv.reset()
    n = len(venv)

    returns = np.zeros(n)
    success = np.zeros(n, bool)
    horizons = np.full(n, horizon)
    active = np.ones(n, bool)
    t0 = time.time()
    for step_i in range(horizon):
        if not use_batched_api:
            ob_batch = batchify_obs(ob_list)
        if context_batch is not None:
            acs = policy(ob=ob_batch, context_batch=context_batch,
                         batched=True)
        else:
            acs = policy(ob=ob_batch, batched=True)
        if use_batched_api:
            ob_batch, rews, dones, _ = venv.step_batched(np.asarray(acs))
        else:
            ob_list, rews, dones, _ = venv.step(np.asarray(acs))
        returns += np.asarray(rews) * active
        succ_now = np.asarray([s["task"] for s in venv.is_success()])
        success |= active & succ_now
        finished = np.asarray(dones, bool) | (
            succ_now if terminate_on_success else False
        )
        horizons[active & finished] = step_i + 1
        active &= ~finished
        if not active.any():
            break
    dt = (time.time() - t0) / n
    return [
        dict(
            Return=float(returns[i]),
            Horizon=int(horizons[i]),
            Success_Rate=float(success[i]),
            Exception_Rate=0.0,
            time=dt,
        )
        for i in range(n)
    ]


def run_rollout(policy, env, horizon, context_batch=None, use_goals=False,
                render=False, video_writer=None, video_skip=5,
                terminate_on_success=False):
    """Single-env rollout (reference run_rollout :279-486 and icl variant
    :487-697 - unified here; @context_batch switches the ICL path)."""
    policy.start_episode(lang=getattr(env, "env_lang", None))
    ob_dict = env.reset()
    goal_dict = env.get_goal() if use_goals else None

    results = {}
    video_count = 0
    total_reward = 0.0
    success = {"task": False}
    got_exception = False
    rollout_timestamp = time.time()

    try:
        for step_i in range(horizon):
            if context_batch is not None:
                ac = policy(ob=ob_dict, context_batch=context_batch,
                            goal=goal_dict)
            else:
                ac = policy(ob=ob_dict, goal=goal_dict)
            ob_dict, r, done, _ = env.step(ac)
            total_reward += r

            cur_success_metrics = env.is_success()
            for k in success:
                success[k] = success[k] or cur_success_metrics[k]

            if render:
                env.render(mode="human")
            if video_writer is not None:
                if video_count % video_skip == 0:
                    video_img = env.render(
                        mode="rgb_array", height=512, width=512
                    )
                    video_writer.append_data(video_img)
                video_count += 1

            if done or (terminate_on_success and success["task"]):
                break
    except tuple(getattr(env, "rollout_exceptions", ()) or ()) as e:
        got_exception = True
        print(f"WARNING: rollout exception {e}")

    results["Return"] = total_reward
    results["Horizon"] = step_i + 1
    results["Success_Rate"] = float(success["task"])
    results["Exception_Rate"] = float(got_exception)
    results["time"] = time.time() - rollout_timestamp
    for k in success:
        if k != "task":
            results[f"{k}_Success_Rate"] = float(success[k])
    return results


def rollout_with_stats(policy, envs, horizon, context_batch=None,
                       use_goals=False, num_episodes=None, render=False,
                       video_dir=None, video_path=None, epoch=None,
                       video_skip=5, terminate_on_success=False,
                       verbose=False):
    """Rollout @num_episodes per env with aggregated stats + videos
    (reference rollout_with_stats :698-903 / icl :904-1111)."""
    try:
        import imageio
    except ImportError:
        imageio = None

    all_rollout_logs = OrderedDict()
    write_video = (video_dir is not None) or (video_path is not None)

    for env_name, env in envs.items():
        video_writer = None
        if write_video and imageio is not None:
            if video_dir is not None:
                video_str = (
                    f"_epoch_{epoch}.mp4" if epoch is not None else ".mp4"
                )
                this_video_path = os.path.join(
                    video_dir, f"{env_name}{video_str}"
                )
            else:
                this_video_path = video_path
            try:
                video_writer = imageio.get_writer(this_video_path, fps=20)
            except Exception as e:  # missing ffmpeg plugin etc.
                LogUtils.log_warning(f"video writing disabled: {e}")
                video_writer = None

        from robot_manipulation_vq_vae_tpu.envs.vector_env import (
            SubprocVectorEnv,
        )

        batched = isinstance(env, SubprocVectorEnv)
        rollout_logs = []
        num_success = 0
        if batched:
            # each pass collects len(env) episodes in lockstep
            n_passes = (num_episodes + len(env) - 1) // len(env)
            for pass_i in LogUtils.custom_tqdm(range(n_passes)):
                try:
                    infos = run_batched_rollout(
                        policy=policy, venv=env, horizon=horizon,
                        context_batch=context_batch,
                        terminate_on_success=terminate_on_success,
                    )
                except Exception as e:
                    print(f"Batched rollout exception at pass {pass_i}: {e}")
                    break
                rollout_logs.extend(infos)
                num_success += sum(i["Success_Rate"] for i in infos)
            rollout_logs = rollout_logs[:num_episodes]
        else:
            for ep_i in LogUtils.custom_tqdm(range(num_episodes)):
                try:
                    rollout_info = run_rollout(
                        policy=policy,
                        env=env,
                        horizon=horizon,
                        context_batch=context_batch,
                        use_goals=use_goals,
                        render=render,
                        video_writer=video_writer,
                        video_skip=video_skip,
                        terminate_on_success=terminate_on_success,
                    )
                except Exception as e:
                    print(f"Rollout exception at episode {ep_i}: {e}")
                    break
                rollout_logs.append(rollout_info)
                num_success += rollout_info["Success_Rate"]
                if verbose:
                    print(
                        f"Episode {ep_i + 1}, horizon={horizon}, "
                        f"num_success={num_success}"
                    )

        if video_writer is not None:
            video_writer.close()

        if rollout_logs:
            rollout_logs_mean = {
                k: float(np.mean([rl[k] for rl in rollout_logs]))
                for k in rollout_logs[0]
            }
            rollout_logs_mean["Time_Episode"] = (
                np.sum([rl["time"] for rl in rollout_logs]) / 60.0
            )
            all_rollout_logs[env_name] = rollout_logs_mean
        else:
            all_rollout_logs[env_name] = {"Success_Rate": 0.0}
    return all_rollout_logs, None


def should_save_from_rollout_logs(all_rollout_logs, best_return,
                                  best_success_rate, epoch_ckpt_name,
                                  save_on_best_rollout_return,
                                  save_on_best_rollout_success_rate):
    """Track best return/success and decide whether to checkpoint
    (reference :1112-1185)."""
    should_save = False
    for env_name, rollout_logs in all_rollout_logs.items():
        if "Return" not in rollout_logs:
            # every episode for this env errored (rollout_with_stats'
            # fallback entry) - nothing to rank
            continue
        if rollout_logs["Return"] > best_return[env_name]:
            best_return[env_name] = rollout_logs["Return"]
            if save_on_best_rollout_return:
                epoch_ckpt_name += f"_{env_name}_return_{rollout_logs['Return']}"
                should_save = True
        if rollout_logs["Success_Rate"] > best_success_rate[env_name]:
            best_success_rate[env_name] = rollout_logs["Success_Rate"]
            if save_on_best_rollout_success_rate:
                epoch_ckpt_name += (
                    f"_{env_name}_success_{rollout_logs['Success_Rate']}"
                )
                should_save = True
    return dict(
        best_return=best_return,
        best_success_rate=best_success_rate,
        epoch_ckpt_name=epoch_ckpt_name,
        should_save_ckpt=should_save,
    )


def save_model(model, config, env_meta, shape_meta, ckpt_path,
               obs_normalization_stats=None, action_normalization_stats=None):
    """Write a self-describing checkpoint (reference :1186-1235)."""
    env_meta = deepcopy(env_meta)
    shape_meta = deepcopy(shape_meta)
    include_opt = bool(
        config.experiment.save.get("include_optimizer", False)
    )
    params = dict(
        model=model.serialize(include_optimizer=include_opt),
        algo_name=config.algo_name,
        config=config.dump(),
        env_metadata=env_meta,
        shape_metadata=shape_meta,
    )
    if obs_normalization_stats is not None:
        params["obs_normalization_stats"] = TensorUtils.to_numpy(
            obs_normalization_stats
        )
    if action_normalization_stats is not None:
        params["action_normalization_stats"] = TensorUtils.to_numpy(
            action_normalization_stats
        )
    FileUtils.save_checkpoint(params, ckpt_path)
    print(f"save checkpoint to {ckpt_path}")

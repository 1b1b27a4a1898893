"""Replay stored sim states to regenerate observations (incl. rendered
images) into a new HDF5.

Re-designed from the reference scripts
(``robocasa/scripts/dataset_states_to_obs.py:1-666`` and
``robomimic/scripts/dataset_states_to_obs.py``) as a producer/writer
pipeline: ``--num_procs`` worker processes each own an env instance and pull
demo indices from a shared work queue; extracted trajectories stream through
a result queue to a single HDF5 writer in the parent process (HDF5 has one
writer; the sim stepping is the parallel part). ``--num_procs 0`` runs
serially in-process (debugging, and sim-free tests with an injected env
factory).

Host-side, sim-bound workflow: the default env factory requires
robosuite/robocasa on the machine; tests inject a fake factory.

Divergence from the reference (documented): the robocasa fork's
``--include-next-obs`` is broken upstream (``extract_trajectory`` never
fills ``traj["next_obs"]``, so the writer raises); here next_obs is actually
extracted (obs at states[t+1]; final step executed with the last action).
"""

import argparse
import json
import multiprocessing
import os
import queue as pyqueue
import time
import traceback

import h5py
import numpy as np


# ---------------------------------------------------------------------------
# per-demo extraction (runs inside workers)
# ---------------------------------------------------------------------------

def extract_trajectory(env, initial_state, states, actions, done_mode=0,
                       include_next_obs=False, add_datagen_info=False):
    """Re-execute one demo by resetting to each stored sim state and
    collecting observations (reference
    ``robocasa/scripts/dataset_states_to_obs.py:24-118``).

    done_mode 0: done=1 whenever s' is a task success state;
    done_mode 1: done=1 at the end of the trajectory;
    done_mode 2: both.
    """
    assert len(states) == len(actions)
    env.reset()
    obs = env.reset_to(initial_state)
    ep_meta = None
    if hasattr(env, "get_ep_meta"):
        ep_meta = env.get_ep_meta()

    traj = dict(obs=[], next_obs=[], rewards=[], dones=[],
                actions=np.asarray(actions), states=np.asarray(states),
                datagen_info=[])
    traj_len = len(states)
    for t in range(traj_len):
        obs = env.reset_to({"states": states[t]})
        if add_datagen_info and hasattr(env, "get_datagen_info"):
            traj["datagen_info"].append(env.get_datagen_info(action=actions[t]))
        # reward convention r(s'): reward AFTER the transition into states[t]
        r = env.get_reward()
        done = False
        if done_mode in (1, 2):
            done = done or (t == traj_len - 1)
        if done_mode in (0, 2):
            done = done or bool(env.is_success()["task"])
        traj["obs"].append(obs)
        traj["rewards"].append(r)
        traj["dones"].append(int(done))
        if include_next_obs:
            if t + 1 < traj_len:
                traj["next_obs"].append(env.reset_to({"states": states[t + 1]}))
            else:
                next_obs, _, _, _ = env.step(actions[t])
                traj["next_obs"].append(next_obs)

    # list-of-dicts -> dict-of-arrays
    for prefix in ("obs", "next_obs", "datagen_info"):
        entries = traj[prefix]
        traj[prefix] = (
            {k: np.stack([e[k] for e in entries]) for k in entries[0]}
            if entries else {}
        )
    traj["rewards"] = np.asarray(traj["rewards"])
    traj["dones"] = np.asarray(traj["dones"])
    if ep_meta is not None:
        traj["ep_meta"] = json.dumps(ep_meta, indent=4)
    model_xml = initial_state.get("model")
    if model_xml is not None:
        traj["model_file"] = model_xml
    return traj


def default_env_factory(env_meta, args):
    """Create a sim env for data processing (requires robosuite/robocasa)."""
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils

    if args.generative_textures:
        env_meta["env_kwargs"]["generative_textures"] = "100p"
    if args.randomize_cameras:
        env_meta["env_kwargs"]["randomize_cameras"] = True
    env_class = EnvUtils.get_env_class(env_meta=env_meta)
    return env_class.create_for_data_processing(
        env_name=env_meta["env_name"],
        camera_names=args.camera_names,
        camera_height=args.camera_height,
        camera_width=args.camera_width,
        reward_shaping=args.shaped,
        **env_meta.get("env_kwargs", {}),
    )


def _worker(proc_idx, dataset_path, demos, work_queue, result_queue,
            args, env_factory):
    """Worker: own env + own read-only HDF5 handle; pull demo indices until
    the queue drains (reference ``extract_multiple_trajectories``,
    dataset_states_to_obs.py:305-445)."""
    try:
        from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

        env_meta = FileUtils.get_env_metadata_from_dataset(dataset_path)
        env = env_factory(env_meta, args)
        with h5py.File(dataset_path, "r") as fin:
            while True:
                idx = work_queue.get()  # blocking; None = drained sentinel
                if idx is None:
                    break
                ep = demos[idx]
                try:
                    states = fin[f"data/{ep}/states"][()]
                    actions = fin[f"data/{ep}/actions"][()]
                    initial_state = {"states": states[0]}
                    model_xml = fin[f"data/{ep}"].attrs.get("model_file")
                    if model_xml is not None:
                        initial_state["model"] = model_xml
                    traj = extract_trajectory(
                        env, initial_state, states, actions,
                        done_mode=args.done_mode,
                        include_next_obs=args.include_next_obs,
                        add_datagen_info=args.add_datagen_info,
                    )
                    result_queue.put((ep, traj, proc_idx))
                except Exception:
                    # report and continue with the next demo (reference
                    # prints and re-queues; we fail just the demo)
                    traceback.print_exc()
                    result_queue.put((ep, None, proc_idx))
    finally:
        # the done sentinel carries env.serialize() so the parent can write
        # the env_args attr without building (another) expensive sim env
        env_args = None
        try:
            env_args = env.serialize()
        except Exception:
            pass
        result_queue.put(("__done__", env_args, proc_idx))


# ---------------------------------------------------------------------------
# single-writer HDF5 output (parent process)
# ---------------------------------------------------------------------------

def _write_traj(fin, data_grp, ep, traj, args):
    """Write one episode (reference ``write_traj_to_file``,
    dataset_states_to_obs.py:124-211)."""
    g = data_grp.create_group(ep)
    g.create_dataset("actions", data=np.asarray(traj["actions"]))
    g.create_dataset("states", data=np.asarray(traj["states"]))
    if args.copy_rewards:
        g.create_dataset("rewards", data=fin[f"data/{ep}/rewards"][()])
    else:
        g.create_dataset("rewards", data=traj["rewards"])
    if args.copy_dones:
        g.create_dataset("dones", data=fin[f"data/{ep}/dones"][()])
    else:
        g.create_dataset("dones", data=traj["dones"])

    compress = {} if args.no_compress else {"compression": "gzip"}
    for k, v in traj["obs"].items():
        g.create_dataset(f"obs/{k}", data=v, **compress)
    if args.include_next_obs:
        for k, v in traj["next_obs"].items():
            g.create_dataset(f"next_obs/{k}", data=v, **compress)
    for k, v in traj.get("datagen_info", {}).items():
        g.create_dataset(f"datagen_info/{k}", data=v)

    # copy action dict from the source (if present)
    if f"data/{ep}/action_dict" in fin:
        for k in fin[f"data/{ep}/action_dict"]:
            g.create_dataset(
                f"action_dict/{k}",
                data=fin[f"data/{ep}/action_dict/{k}"][()],
            )

    if "model_file" in traj:
        g.attrs["model_file"] = traj["model_file"]
    if "ep_meta" in traj:
        g.attrs["ep_meta"] = traj["ep_meta"]
    g.attrs["num_samples"] = len(traj["actions"])
    return len(traj["actions"])


def make_demo_ids_contiguous(path):
    """Rename data/demo_* groups to demo_0..demo_{N-1} preserving numeric
    order (reference ``DatasetUtils.make_demo_ids_contiguous``)."""
    with h5py.File(path, "a") as f:
        demos = sorted(f["data"].keys(), key=lambda d: int(d.split("_")[-1]))
        for new_i, old in enumerate(demos):
            new = f"demo_{new_i}"
            if new != old:
                f["data"].move(old, new)


def resolve_output_path(args):
    """Reference output naming (dataset_states_to_obs.py:451-470)."""
    if args.output_name is not None:
        return os.path.join(os.path.dirname(args.dataset), args.output_name)
    base = os.path.basename(args.dataset)[:-5]
    if len(args.camera_names) == 0:
        name = base + "_ld.hdf5"
    else:
        suffix = str(args.camera_width)
        if args.randomize_cameras:
            suffix += "_randcams"
        tex = "_gentex" if args.generative_textures else ""
        name = f"{base}{tex}_im{suffix}.hdf5"
    return os.path.join(os.path.dirname(args.dataset), name)


def run(args, env_factory=default_env_factory):
    """Full pipeline: worker pool -> single writer -> postprocess."""
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    output_path = resolve_output_path(args)
    print(f"input file: {args.dataset}")
    print(f"output file: {output_path}")

    with h5py.File(args.dataset, "r") as f:
        if args.filter_key is not None:
            demos = [
                e.decode("utf-8") for e in np.array(f[f"mask/{args.filter_key}"])
            ]
        else:
            demos = list(f["data"].keys())
    demos = sorted(demos, key=lambda d: int(d.split("_")[-1]))
    if args.n is not None:
        demos = demos[: args.n]

    start = time.time()
    env_meta = FileUtils.get_env_metadata_from_dataset(args.dataset)
    total_samples = 0
    num_written = 0

    with h5py.File(args.dataset, "r") as fin, \
            h5py.File(output_path, "w") as fout:
        data_grp = fout.create_group("data")

        def write(ep, traj):
            nonlocal total_samples, num_written
            if traj is None:
                print(f"SKIPPED {ep} (extraction failed)")
                return
            n = _write_traj(fin, data_grp, ep, traj, args)
            total_samples += n
            num_written += 1
            rate = (time.time() - start) / max(num_written, 1)
            print(f"ep {num_written}: wrote {n} transitions to group {ep} "
                  f"({rate:.2f} sec/demo)")

        env_args = None  # env.serialize() blob for the env_args attr
        if args.num_procs <= 0:
            # serial in-process mode
            env = env_factory(dict(env_meta), args)
            for ep in demos:
                states = fin[f"data/{ep}/states"][()]
                actions = fin[f"data/{ep}/actions"][()]
                initial_state = {"states": states[0]}
                model_xml = fin[f"data/{ep}"].attrs.get("model_file")
                if model_xml is not None:
                    initial_state["model"] = model_xml
                write(ep, extract_trajectory(
                    env, initial_state, states, actions,
                    done_mode=args.done_mode,
                    include_next_obs=args.include_next_obs,
                    add_datagen_info=args.add_datagen_info,
                ))
            env_args = env.serialize()  # reuse the serial env
            if hasattr(env, "close"):
                env.close()
        else:
            # spawn: fork is unsafe once JAX/h5py threads exist in the parent
            ctx = multiprocessing.get_context("spawn")
            work_queue = ctx.Queue()
            result_queue = ctx.Queue()
            for i in range(len(demos)):
                work_queue.put(i)
            for _ in range(args.num_procs):
                work_queue.put(None)  # one drain sentinel per worker
            procs = [
                ctx.Process(
                    target=_worker,
                    args=(i, args.dataset, demos, work_queue, result_queue,
                          args, env_factory),
                )
                for i in range(args.num_procs)
            ]
            for p in procs:
                p.start()
            # poll with a timeout and track worker liveness: sentinels come
            # from a Python finally block, so a hard-killed worker (MuJoCo
            # segfault, OOM) would otherwise hang this loop forever; a dead
            # worker only loses its one in-flight demo — queued indices are
            # picked up by the surviving workers
            done_workers = set()
            while len(done_workers) < len(procs):
                try:
                    ep, payload, widx = result_queue.get(timeout=10.0)
                except pyqueue.Empty:
                    for i, p in enumerate(procs):
                        if i not in done_workers and not p.is_alive():
                            done_workers.add(i)
                            print(
                                f"WARNING: worker {i} died hard (exitcode "
                                f"{p.exitcode}); its in-flight demo was "
                                f"skipped"
                            )
                    continue
                if ep == "__done__":
                    done_workers.add(widx)
                    if payload is not None:
                        env_args = payload
                    continue
                write(ep, payload)
            for p in procs:
                p.join()

        if "mask" in fin:
            fin.copy("mask", fout)
        data_grp.attrs["total"] = total_samples
        if env_args is None:
            # last resort (e.g. every worker died before serializing):
            # build a fresh env just for the metadata
            env = env_factory(dict(env_meta), args)
            env_args = env.serialize()
            if hasattr(env, "close"):
                env.close()
        data_grp.attrs["env_args"] = json.dumps(env_args, indent=4)

    print(f"Wrote {total_samples} total samples to {output_path}")

    if not args.no_postprocess:
        # reference postprocessing chain (dataset_states_to_obs.py:280-300)
        from robot_manipulation_vq_vae_tpu.scripts.conversion.extract_action_dict \
            import extract_action_dict
        from robot_manipulation_vq_vae_tpu.scripts.filter_dataset_size import (
            filter_dataset_size,
        )

        make_demo_ids_contiguous(output_path)
        try:
            extract_action_dict(output_path)
        except Exception as e:
            print(f"WARNING: extract_action_dict skipped ({e})")
        n_total = num_written
        for n in (10, 20, 30, 40, 50, 60, 70, 75, 80, 90, 100, 125, 150,
                  200, 250, 300, 400, 500, 600, 700, 800, 900, 1000, 1500,
                  2000, 2500, 3000, 4000, 5000, 10000):
            if n <= n_total:
                filter_dataset_size(output_path, num_demos=n)

    print(f"Time elapsed: {time.time() - start:.2f} seconds")
    return output_path


def build_parser():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("--dataset", type=str, required=True,
                        help="path to input hdf5 dataset")
    parser.add_argument("--output_name", type=str, default=None,
                        help="name of output hdf5 (defaults to the "
                             "reference's _ld/_im{W} naming)")
    parser.add_argument("--filter_key", type=str, default=None,
                        help="filter key for input dataset")
    parser.add_argument("--n", type=int, default=None,
                        help="stop after n trajectories")
    parser.add_argument("--shaped", action="store_true",
                        help="use shaped rewards")
    parser.add_argument("--camera_names", type=str, nargs="*",
                        default=["robot0_agentview_left",
                                 "robot0_agentview_right",
                                 "robot0_eye_in_hand"],
                        help="cameras for image obs (empty = low-dim only)")
    parser.add_argument("--camera_height", type=int, default=128)
    parser.add_argument("--camera_width", type=int, default=128)
    parser.add_argument("--done_mode", type=int, default=0, choices=(0, 1, 2),
                        help="0: done at success states; 1: done at "
                             "trajectory end; 2: both")
    parser.add_argument("--copy_rewards", action="store_true",
                        help="copy rewards from source instead of inferring")
    parser.add_argument("--copy_dones", action="store_true",
                        help="copy dones from source instead of inferring")
    parser.add_argument("--include-next-obs", dest="include_next_obs",
                        action="store_true", help="also write next_obs")
    parser.add_argument("--no_compress", action="store_true",
                        help="disable gzip compression of observations")
    parser.add_argument("--num_procs", type=int, default=5,
                        help="parallel extraction workers (0 = serial)")
    parser.add_argument("--add_datagen_info", action="store_true",
                        help="add datagen info (mimicgen)")
    parser.add_argument("--generative_textures", action="store_true")
    parser.add_argument("--randomize_cameras", action="store_true")
    parser.add_argument("--no_postprocess", action="store_true",
                        help="skip action-dict extraction + demo-id "
                             "renumbering + size filter keys")
    return parser


if __name__ == "__main__":
    run(build_parser().parse_args())

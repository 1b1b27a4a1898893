"""Replay dataset demos for visual inspection
(reference ``robomimic/scripts/playback_dataset.py:81-392`` and
``robocasa/scripts/playback_dataset.py``).

Modes:
  * ``--use-obs``: dump stored camera frames straight to video (no sim);
    also handles flat r2d2-format files (no ``data/`` group).
  * state playback (default; requires robosuite on the host): reset the env
    to each stored state and render to video or on-screen.
  * ``--use-actions``: re-execute stored actions open-loop, warning when
    the resulting sim states diverge from the recorded ones.
  * ``--first``: only the first frame of each episode (quick scene survey).
"""

import argparse
import random

import h5py
import numpy as np

# per-env-type default render cameras (reference playback_dataset.py:36-44)
DEFAULT_CAMERAS = {
    1: ["agentview"],       # robosuite
    2: [None],              # gym
    4: ["robot0_agentview_left", "robot0_agentview_right",
        "robot0_eye_in_hand"],  # robocasa
}


def playback_trajectory_with_obs(traj_grp, video_writer, video_skip=5,
                                 image_names=None, first=False):
    """Write stored image observations to video (reference :157-190).
    ``image_names`` are camera names; the obs keys carry an ``_image``
    suffix."""
    assert image_names, "must specify at least one image observation"
    video_count = 0
    traj_len = traj_grp[f"obs/{image_names[0]}_image"].shape[0]
    for i in range(traj_len):
        if video_count % video_skip == 0:
            frames = [
                np.asarray(traj_grp[f"obs/{k}_image"][i]) for k in image_names
            ]
            video_writer.append_data(np.concatenate(frames, axis=1))
        video_count += 1
        if first:
            break


def playback_trajectory_with_env(env, initial_state, states, actions=None,
                                 render=False, video_writer=None,
                                 video_skip=5, camera_names=None,
                                 first=False):
    """Replay one trajectory through the simulator (reference :81-155).
    With ``actions``, play them open-loop and warn when the sim state
    diverges from the recorded state sequence."""
    write_video = video_writer is not None
    assert not (render and write_video)
    env.reset_to(initial_state)

    traj_len = states.shape[0]
    if actions is not None:
        assert states.shape[0] == actions.shape[0]

    video_count = 0
    for i in range(traj_len):
        if actions is not None:
            env.step(actions[i])
            if i < traj_len - 1:
                state_playback = env.get_state()["states"]
                if not np.array_equal(states[i + 1], state_playback):
                    err = np.linalg.norm(states[i + 1] - state_playback)
                    print(f"warning: playback diverged by {err} at step {i}")
        else:
            env.reset_to({"states": states[i]})

        if render:
            env.render(mode="human", camera_name=camera_names[0])
        if write_video:
            if video_count % video_skip == 0:
                frames = [
                    env.render(mode="rgb_array", height=512, width=512,
                               camera_name=c)
                    for c in camera_names
                ]
                video_writer.append_data(np.concatenate(frames, axis=1))
            video_count += 1
        if first:
            break


def playback_dataset(args, env_factory=None, video_writer_factory=None):
    """Main entry (reference :192-320). ``env_factory(env_meta, args)`` and
    ``video_writer_factory(path)`` are injectable for sim-free tests."""
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    write_video = not args.render
    if args.video_path is None:
        args.video_path = args.dataset.split(".hdf5")[0] + ".mp4"
        if args.use_actions:
            args.video_path = args.video_path[:-4] + "_use_actions.mp4"
    assert not (args.render and write_video)

    if args.render_image_names is None:
        env_meta = FileUtils.get_env_metadata_from_dataset(args.dataset)
        env_type = EnvUtils.get_env_type(env_meta=env_meta)
        args.render_image_names = DEFAULT_CAMERAS[env_type]
    if args.render:
        assert len(args.render_image_names) == 1

    if args.use_obs:
        assert write_video, "obs playback can only write video"
        assert not args.use_actions, "obs playback does not replay actions"

    env = None
    is_robosuite_env = False
    if not args.use_obs:
        # obs modalities are unused during playback; register a dummy spec
        ObsUtils.initialize_obs_utils_with_obs_specs(
            {"obs": {"low_dim": ["robot0_eef_pos"], "rgb": []}}
        )
        env_meta = FileUtils.get_env_metadata_from_dataset(args.dataset)
        if env_factory is not None:
            env = env_factory(env_meta, args)
        else:
            env = EnvUtils.create_env_from_metadata(
                env_meta=env_meta, render=args.render,
                render_offscreen=write_video,
            )
        is_robosuite_env = EnvUtils.is_robosuite_env(env_meta)

    if video_writer_factory is None:
        def video_writer_factory(path):
            import imageio

            return imageio.get_writer(path, fps=20)

    f = h5py.File(args.dataset, "r")
    if args.filter_key is not None:
        demos = [
            e.decode("utf-8") for e in np.array(f[f"mask/{args.filter_key}"])
        ]
    elif "data" in f.keys():
        demos = list(f["data"].keys())
    else:
        demos = None

    video_writer = video_writer_factory(args.video_path) if write_video else None

    if demos is None:
        # flat r2d2-format file: obs live at the root
        assert args.use_obs
        playback_trajectory_with_obs(
            f, video_writer, video_skip=args.video_skip,
            image_names=args.render_image_names, first=args.first,
        )
        f.close()
        if video_writer is not None:
            video_writer.close()
        return

    demos = sorted(demos, key=lambda d: int(d.split("_")[-1]))
    if args.n is not None:
        random.shuffle(demos)  # reference samples a random subset (:268-271)
        demos = demos[: args.n]

    for ep in demos:
        print(f"Playing back episode: {ep}")
        if args.use_obs:
            playback_trajectory_with_obs(
                f[f"data/{ep}"], video_writer, video_skip=args.video_skip,
                image_names=args.render_image_names, first=args.first,
            )
            continue

        states = f[f"data/{ep}/states"][()]
        initial_state = {"states": states[0]}
        if is_robosuite_env:
            initial_state["model"] = f[f"data/{ep}"].attrs["model_file"]
            initial_state["ep_meta"] = f[f"data/{ep}"].attrs.get("ep_meta")
        actions = f[f"data/{ep}/actions"][()] if args.use_actions else None
        playback_trajectory_with_env(
            env, initial_state, states, actions=actions, render=args.render,
            video_writer=video_writer, video_skip=args.video_skip,
            camera_names=args.render_image_names, first=args.first,
        )

    f.close()
    if video_writer is not None:
        video_writer.close()
        print(f"wrote {args.video_path}")


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="path to hdf5 dataset")
    parser.add_argument("--filter_key", type=str, default=None,
                        help="filter key to select a subset of demos")
    parser.add_argument("--n", type=int, default=None,
                        help="playback at most n (randomly chosen) demos")
    parser.add_argument("--use-obs", dest="use_obs", action="store_true",
                        help="render stored image obs instead of the sim")
    parser.add_argument("--use-actions", dest="use_actions",
                        action="store_true",
                        help="open-loop action playback instead of states")
    parser.add_argument("--render", action="store_true",
                        help="on-screen rendering (no video)")
    parser.add_argument("--video_path", type=str, default=None,
                        help="output video path (default: next to dataset)")
    parser.add_argument("--video_skip", type=int, default=5,
                        help="write a frame every n steps")
    parser.add_argument("--render_image_names", type=str, nargs="+",
                        default=None,
                        help="camera/image names to render (default: "
                             "per-env-type cameras)")
    parser.add_argument("--first", action="store_true",
                        help="only the first frame of each episode")
    return parser


if __name__ == "__main__":
    playback_dataset(build_parser().parse_args())

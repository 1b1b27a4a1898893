"""Replay dataset demos for visual inspection
(reference ``robomimic/scripts/playback_dataset.py`` and
``robocasa/scripts/playback_dataset.py``).

Two modes:
  * image playback (no sim needed): dump stored camera frames to video;
  * state/action playback (requires robosuite on the host): reset the env
    to stored states, or re-execute actions, and render.
"""

import argparse

import h5py
import numpy as np


def playback_images(hdf5_path, video_path, image_keys, n=5, video_skip=5):
    """Write stored image obs straight to video (no simulator)."""
    import imageio

    writer = imageio.get_writer(video_path, fps=20)
    with h5py.File(hdf5_path, "r") as f:
        demos = sorted(list(f["data"].keys()))[:n]
        for ep in demos:
            length = int(f[f"data/{ep}"].attrs["num_samples"])
            for t in range(0, length, video_skip):
                frames = [
                    np.asarray(f[f"data/{ep}/obs/{k}"][t]) for k in image_keys
                ]
                writer.append_data(np.concatenate(frames, axis=1))
    writer.close()
    print(f"wrote {video_path}")


def playback_with_env(hdf5_path, video_path, n=5, use_actions=False,
                      video_skip=5, camera="robot0_agentview_center"):
    """Replay through the simulator (host-side robosuite required)."""
    import imageio

    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

    env_meta = FileUtils.get_env_metadata_from_dataset(hdf5_path)
    env = EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=False, render_offscreen=True
    )
    writer = imageio.get_writer(video_path, fps=20)
    with h5py.File(hdf5_path, "r") as f:
        demos = sorted(list(f["data"].keys()))[:n]
        for ep in demos:
            states = f[f"data/{ep}/states"][()]
            model_xml = f[f"data/{ep}"].attrs.get("model_file")
            env.reset()
            init = {"states": states[0]}
            if model_xml is not None:
                init["model"] = model_xml
            env.reset_to(init)
            if use_actions:
                actions = f[f"data/{ep}/actions"][()]
                for t, ac in enumerate(actions):
                    env.step(ac)
                    if t % video_skip == 0:
                        writer.append_data(
                            env.render(mode="rgb_array", height=512,
                                       width=512, camera_name=camera)
                        )
            else:
                for t in range(0, len(states), video_skip):
                    env.reset_to({"states": states[t]})
                    writer.append_data(
                        env.render(mode="rgb_array", height=512, width=512,
                                   camera_name=camera)
                    )
    writer.close()
    print(f"wrote {video_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("dataset", type=str)
    parser.add_argument("--video_path", type=str, default="playback.mp4")
    parser.add_argument("--n", type=int, default=5)
    parser.add_argument("--use_obs", action="store_true",
                        help="image playback from stored obs (no sim)")
    parser.add_argument("--use_actions", action="store_true")
    parser.add_argument("--image_keys", nargs="+",
                        default=["robot0_agentview_left_image"])
    args = parser.parse_args()
    if args.use_obs:
        playback_images(args.dataset, args.video_path, args.image_keys, args.n)
    else:
        playback_with_env(
            args.dataset, args.video_path, args.n, use_actions=args.use_actions
        )

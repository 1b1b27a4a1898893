"""Export dataset trajectories as USD scenes for offline rendering
(reference ``robocasa/scripts/generate_usd_trajectories.py`` +
``robocasa/utils/usd/``): replay each demo's stored sim states and stream
the MuJoCo scene into a USD stage per episode.

Host-side, sim-bound AND USD-bound: requires robosuite/robocasa (MuJoCo
>= 3) and the OpenUSD python bindings (``pxr``). The hdf5 iteration and
file layout are self-contained; the scene streaming delegates to MuJoCo's
USD exporter."""

import argparse
import json
import os

import h5py


def export_demo_to_usd(env, states, output_dir, demo_name, camera_height=480,
                       camera_width=640):
    """Replay @states and write one USD stage for the episode."""
    from mujoco.usd.exporter import USDExporter  # MuJoCo's built-in exporter

    exporter = USDExporter(
        model=env.env.sim.model._model,
        height=camera_height,
        width=camera_width,
        output_directory_name=demo_name,
        output_directory_root=output_dir,
    )
    for t in range(len(states)):
        env.reset_to({"states": states[t]})
        exporter.update_scene(env.env.sim.data._data)
    exporter.save_scene(filetype="usd")


def main(args):
    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    ObsUtils.initialize_obs_utils_with_obs_specs(
        obs_modality_specs=dict(obs=dict(low_dim=["robot0_eef_pos"], rgb=[]))
    )
    env_meta = FileUtils.get_env_metadata_from_dataset(args.dataset)
    env = EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=False, render_offscreen=True
    )

    os.makedirs(args.output_dir, exist_ok=True)
    with h5py.File(args.dataset, "r") as f:
        demos = sorted(list(f["data"].keys()))
        if args.n is not None:
            demos = demos[: args.n]
        for ep in demos:
            states = f[f"data/{ep}/states"][()]
            init = {"states": states[0]}
            model_xml = f[f"data/{ep}"].attrs.get("model_file")
            if model_xml is not None:
                init["model"] = model_xml
            ep_meta = f[f"data/{ep}"].attrs.get("ep_meta")
            if ep_meta is not None:
                init["ep_meta"] = json.loads(ep_meta) if isinstance(
                    ep_meta, str
                ) else ep_meta
            env.reset()
            env.reset_to(init)
            export_demo_to_usd(
                env, states, args.output_dir, ep,
                camera_height=args.camera_height,
                camera_width=args.camera_width,
            )
            print(f"exported {ep}")
    print(f"USD stages written under {args.output_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--n", type=int, default=None)
    parser.add_argument("--camera_height", type=int, default=480)
    parser.add_argument("--camera_width", type=int, default=640)
    main(parser.parse_args())

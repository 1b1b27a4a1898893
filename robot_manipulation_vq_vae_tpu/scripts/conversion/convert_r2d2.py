"""Post-process raw R2D2 (DROID) ``trajectory.h5`` files into the layout
``data.dataset.R2D2Dataset`` consumes (reference
``robomimic/scripts/conversion/convert_r2d2.py``):

  * derive ``observation/robot_state/{eef_pos, eef_quat}`` from the stored
    cartesian pose (euler -> quaternion);
  * expand ``action/{cartesian_position, cartesian_velocity}`` into
    ``abs_*`` / ``rel_*`` pos + rot_euler + rot_6d action-dict keys;
  * promote 1-d action keys to [T, 1];
  * drop timesteps where robot movement was disabled;
  * (host-gated, requires the ``r2d2`` package + MP4 recordings) decode and
    attach per-camera image streams with stable hand/varied camera naming.

Everything except the MP4 decode is pure h5py/numpy and unit-testable."""

import argparse
import os

import h5py
import numpy as np

from robot_manipulation_vq_vae_tpu.utils import rotation_utils as RotUtils


def add_eef_state(f):
    """cartesian_position [T, 6] -> eef_pos [T, 3] + eef_quat [T, 4]
    (reference :137-144)."""
    cart = f["observation/robot_state"]["cartesian_position"]
    eef_pos = cart[:, 0:3].astype(np.float64)
    eef_euler = cart[:, 3:6].astype(np.float64)
    eef_quat = RotUtils.euler_angles_to_quat(eef_euler).astype(np.float64)
    for name, data in (("eef_pos", eef_pos), ("eef_quat", eef_quat)):
        if name in f["observation/robot_state"]:
            del f["observation/robot_state"][name]
        f["observation/robot_state"].create_dataset(name, data=data)


def add_action_dict_keys(f):
    """Expand absolute/relative cartesian actions into pos/rot_euler/rot_6d
    keys (reference :146-180)."""
    group = f["action"]
    for in_key, prefix in (
        ("cartesian_position", "abs_"),
        ("cartesian_velocity", "rel_"),
    ):
        in_action = group[in_key][:]
        pos = in_action[:, :3].astype(np.float64)
        rot_euler = in_action[:, 3:6].astype(np.float64)
        rot_6d = RotUtils.euler_angles_to_rot_6d(
            rot_euler, convention="XYZ"
        ).astype(np.float64)
        for key, data in (
            (prefix + "pos", pos),
            (prefix + "rot_euler", rot_euler),
            (prefix + "rot_6d", rot_6d),
        ):
            if key in group:
                del group[key]
            group.create_dataset(key, data=data)

    # all action keys must be at least [T, 1] (reference :175-180)
    for k in list(group):
        if isinstance(group[k], h5py.Dataset) and len(group[k].shape) == 1:
            reshaped = np.reshape(group[k][:], (-1, 1))
            del group[k]
            group.create_dataset(k, data=reshaped)


def remove_timesteps(f, timesteps_to_remove):
    """Delete rows from every [T, ...] dataset in the file
    (reference :192-210)."""
    total = f["action/cartesian_position"].shape[0]

    def _recurse(g):
        for k in g:
            if isinstance(g[k], h5py.Dataset):
                if g[k].shape[0] != total:
                    continue
                new = np.delete(g[k], timesteps_to_remove, axis=0)
                del g[k]
                g.create_dataset(k, data=new)
            elif isinstance(g[k], h5py.Group):
                _recurse(g[k])

    for k in f:
        _recurse(f[k])


def add_camera_images(f, path, imsize):
    """Decode the MP4 recordings next to @path into per-camera uint8 image
    datasets (reference :19-135). Requires the host ``r2d2`` package."""
    from r2d2.camera_utils.info import camera_type_to_string_dict
    from r2d2.camera_utils.wrappers.recorded_multi_camera_wrapper import (
        RecordedMultiCameraWrapper,
    )

    recording_dir = os.path.join(os.path.dirname(path), "recordings", "MP4")
    camera_kwargs = {
        t: dict(image=True, concatenate_images=False,
                resolution=(imsize, imsize), resize_func="cv2")
        for t in ("hand_camera", "varied_camera")
    }
    camera_reader = RecordedMultiCameraWrapper(recording_dir, camera_kwargs)
    demo_len = f["action"]["cartesian_position"].shape[0]

    cam_id_to_type = {}
    by_type = {"hand_camera": [], "varied_camera": []}
    for k in f["observation"]["camera_type"]:
        cam_type = camera_type_to_string_dict[
            f["observation"]["camera_type"][k][0]
        ]
        cam_id_to_type[k] = cam_type
        by_type[cam_type].append(k)
    # sorted ids keep the hand/varied camera naming stable across episodes
    name_to_cam_key = {}
    hand = sorted(by_type["hand_camera"])[0]
    name_to_cam_key["hand_camera_left_image"] = f"{hand}_left"
    name_to_cam_key["hand_camera_right_image"] = f"{hand}_right"
    for i, cam_id in enumerate(sorted(by_type["varied_camera"])):
        for side in ("left", "right"):
            name_to_cam_key[f"varied_camera_{i+1}_{side}_image"] = (
                f"{cam_id}_{side}"
            )

    if "camera" not in f["observation"]:
        f["observation"].create_group("camera").create_group("image")
    image_grp = f["observation/camera/image"]

    cam_data = {name: [] for name in name_to_cam_key}
    for index in range(demo_len):
        camera_obs = camera_reader.read_cameras(
            index=index, camera_type_dict=cam_id_to_type, timestamp_dict={}
        )
        for name, cam_key in name_to_cam_key.items():
            if camera_obs is None:
                im = np.zeros((imsize, imsize, 3))
            else:
                im = camera_obs["image"][cam_key]
            cam_data[name].append(im[:, :, ::-1])  # bgr -> rgb

    for name, frames in cam_data.items():
        if name in image_grp:
            del image_grp[name]
        image_grp.create_dataset(
            name, data=np.array(frames).astype(np.uint8), compression="gzip"
        )

    # camera extrinsics, renamed to match the image keys (reference :121-135)
    if "extrinsics" not in f["observation/camera"]:
        f["observation/camera"].create_group("extrinsics")
    extr_grp = f["observation/camera/extrinsics"]
    for raw_key in f["observation/camera_extrinsics"]:
        cam_key = "_".join(raw_key.split("_")[:2])
        im_name = next(
            (k for k, v in name_to_cam_key.items() if v == cam_key), None
        )
        if im_name is None:
            continue
        extr_name = "_".join(
            im_name.split("_")[:-2] + raw_key.split("_")[1:]
        )
        extr_grp.create_dataset(
            extr_name, data=f["observation/camera_extrinsics"][raw_key],
            compression="gzip",
        )


def convert_dataset(path, imsize=128, keep_idle_timesteps=False,
                    with_images=True):
    with h5py.File(path, "a") as f:
        if with_images:
            add_camera_images(f, path, imsize)
        add_eef_state(f)
        add_action_dict_keys(f)
        if not keep_idle_timesteps:
            movement_enabled = (
                f["observation/controller_info/movement_enabled"][:]
            )
            remove_timesteps(f, np.where(~movement_enabled.astype(bool))[0])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--folder", type=str,
                        default="~/datasets/r2d2/success")
    parser.add_argument("--imsize", type=int, default=128)
    parser.add_argument("--keep_idle_timesteps", action="store_true")
    args = parser.parse_args()

    datasets = []
    for root, _, files in os.walk(os.path.expanduser(args.folder)):
        for name in files:
            if name == "trajectory.h5":
                datasets.append(os.path.join(root, name))
    print(f"converting {len(datasets)} datasets...")
    for d in datasets:
        try:
            convert_dataset(d, args.imsize, args.keep_idle_timesteps)
        except Exception as e:  # keep going over the corpus, as the reference does
            print("Exception for dataset path:", d)
            print(e)

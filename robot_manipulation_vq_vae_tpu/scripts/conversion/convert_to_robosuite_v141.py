"""Upgrade a robosuite-v1.2 dataset's stored model xmls to v1.4.1 (reference
``robomimic/scripts/conversion/convert_to_robosuite_v141.py``): regenerate
each demo's model xml from a live v1.4.1 env, then graft back the
task-object bodies from the old xml (object geometry must match the recorded
states). Pure-XML helpers are module-level and testable without a sim."""

import argparse
import json
import os
import xml.etree.ElementTree as ET
from shutil import copyfile

import h5py

# env_name -> task-object body names carried over from the old xml (:31-97)
BODIES_TO_KEEP = {
    "Lift": ("cube_main",),
    "TwoArmTransport": ("payload_root",),
}


def find_element(root, tag, name=None):
    """First element with @tag (and name attribute, if given)."""
    for elem in root.iter(tag):
        if name is None or elem.get("name") == name:
            return elem
    return None


def replace_element(parent, old_elem, new_elem):
    """Swap @old_elem for @new_elem in @parent, preserving position."""
    idx = list(parent).index(old_elem)
    parent.remove(old_elem)
    parent.insert(idx, new_elem)


def graft_bodies(new_xml_str, old_xml_str, body_names):
    """Replace named worldbody children in @new_xml_str with the versions
    from @old_xml_str. Pure function - unit-testable."""
    old_root = ET.fromstring(old_xml_str)
    new_root = ET.fromstring(new_xml_str)
    worldbody = find_element(new_root, "worldbody")
    for bname in body_names:
        body_new = find_element(new_root, "body", bname)
        body_old = find_element(old_root, "body", bname)
        if body_new is not None and body_old is not None:
            replace_element(worldbody, body_new, body_old)
    return ET.tostring(new_root, encoding="utf8").decode("utf8")


def convert_xml(old_xml_str, env_name, env):
    """Old stored xml -> fresh v1.4.1 xml (+ grafted task bodies)."""
    xml_str = env.env.sim.model.get_xml()
    body_names = BODIES_TO_KEEP.get(env_name)
    if body_names:
        xml_str = graft_bodies(xml_str, old_xml_str, body_names)
    return xml_str


def main(args):
    import robosuite

    from robot_manipulation_vq_vae_tpu.utils import env_utils as EnvUtils
    from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
    from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

    dataset = os.path.expanduser(args.dataset)
    output = os.path.expanduser(args.output_dataset)
    assert output != dataset
    assert robosuite.__version__ == "1.4.1"
    copyfile(dataset, output)

    ObsUtils.initialize_obs_utils_with_obs_specs(
        obs_modality_specs=dict(obs=dict(low_dim=["robot0_eef_pos"], rgb=[]))
    )
    env_meta = FileUtils.get_env_metadata_from_dataset(dataset_path=dataset)
    env = EnvUtils.create_env_from_metadata(
        env_meta=env_meta, render=False, render_offscreen=True
    )
    env.reset()

    with h5py.File(output, "r+") as f:
        env_args = json.loads(f["data"].attrs["env_args"])
        env_name = env_args["env_name"]
        for demo_key in list(f["data"].keys()):
            ep = f[f"data/{demo_key}"]
            ep.attrs["model_file"] = convert_xml(
                ep.attrs["model_file"], env_name, env
            )
        env_args["env_version"] = robosuite.__version__
        f["data"].attrs["env_args"] = json.dumps(env_args, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--output_dataset", type=str, required=True)
    main(parser.parse_args())

"""Sim-free coverage of browse_mjcf_model's XML preparation and
play_dataset_montage's registry-driven playback loop."""

import os
import xml.etree.ElementTree as ET

import h5py
import json
import numpy as np

from robot_manipulation_vq_vae_tpu.scripts.browse_mjcf_model import (
    prepare_model_xml,
    resolve_asset_paths,
)
from robot_manipulation_vq_vae_tpu.scripts.play_dataset_montage import (
    montage_tasks,
)

MJCF = """
<mujoco model="m">
  <asset>
    <mesh name="a" file="/old/home/robosuite/models/assets/m.stl"/>
    <texture name="t" file="local_tex.png"/>
  </asset>
  <worldbody>
    <body>
      <geom name="vis" group="1" size="0.1"/>
      <geom name="col" group="0" size="0.1"/>
      <site name="ext_p0" pos="0 0 0"/>
      <site name="ext_px" pos="2 0 0"/>
      <site name="ext_py" pos="0 4 0"/>
      <site name="ext_pz" pos="0 0 6"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_resolve_asset_paths_rewrites_robosuite_paths():
    root = ET.fromstring(MJCF)
    resolve_asset_paths(root, package_root="/new/env/robosuite")
    mesh = root.find("asset/mesh")
    assert mesh.get("file") == "/new/env/robosuite/models/assets/m.stl"
    # non-robosuite paths untouched
    assert root.find("asset/texture").get("file") == "local_tex.png"


def test_prepare_model_xml_edits():
    out = prepare_model_xml(
        MJCF, hide_sites=True, show_bbox=True, show_coll_geoms=False,
        package_root="/pkg/robosuite",
    )
    root = ET.fromstring(out)
    # skybox + light injected
    assert root.find("asset/texture[@type='skybox']") is not None
    assert root.find("worldbody/light") is not None
    # collision geom invisible, visual untouched
    geoms = {g.get("name"): g for g in root.iter("geom")}
    assert geoms["col"].get("rgba") == "1.0 0.0 0.0 0.0"
    assert geoms["vis"].get("rgba") is None
    # bbox site from ext_ sites: center (1, 2, 3), half-size (1, 2, 3)
    boxes = [s for s in root.iter("site") if s.get("type") == "box"]
    assert len(boxes) == 1
    np.testing.assert_allclose(
        [float(x) for x in boxes[0].get("pos").split()], [1, 2, 3]
    )
    np.testing.assert_allclose(
        [float(x) for x in boxes[0].get("size").split()], [1, 2, 3]
    )
    # named sites hidden
    named = [s for s in root.iter("site") if s.get("name")]
    assert all(s.get("rgba") == "0 0 0 0" for s in named)


def test_prepare_model_xml_show_coll():
    out = prepare_model_xml(MJCF, show_coll_geoms=True,
                            package_root="/pkg/robosuite")
    root = ET.fromstring(out)
    geoms = {g.get("name"): g for g in root.iter("geom")}
    assert geoms["col"].get("rgba") == "1.0 0.0 0.0 0.5"


def test_montage_skips_missing_and_plays_local(tmp_path, monkeypatch):
    # stage one task's dataset at its registry-resolved location
    import robot_manipulation_vq_vae_tpu.utils.dataset_registry as reg

    monkeypatch.setenv("ROBOCASA_DATASET_BASE", str(tmp_path / "datasets"))
    task = next(iter(reg.SINGLE_STAGE_TASK_DATASETS))
    ds_path = reg.get_ds_path(task, ds_type="human_raw")
    os.makedirs(os.path.dirname(ds_path), exist_ok=True)
    rng = np.random.RandomState(0)
    with h5py.File(ds_path, "w") as f:
        data = f.create_group("data")
        data.attrs["env_args"] = json.dumps(
            {"env_name": "Fake", "type": 2, "env_kwargs": {}}
        )
        g = data.create_group("demo_0")
        g.create_dataset("states", data=rng.rand(4, 3).astype(np.float32))
        g.create_dataset("actions", data=rng.rand(4, 2).astype(np.float32))
        g.attrs["num_samples"] = 4

    class Writer:
        frames = []

        def append_data(self, f):
            Writer.frames.append(f)

        def close(self):
            pass

    class Env:
        def reset_to(self, state):
            return {}

        def render(self, **kw):
            return np.zeros((4, 4, 3), np.uint8)

    missing_task = [
        t for t in reg.SINGLE_STAGE_TASK_DATASETS if t != task
    ][0]
    results = montage_tasks(
        str(tmp_path / "out"), num_demos_per_task=1,
        tasks=[task, missing_task],
        env_factory=lambda meta, a: Env(),
        video_writer_factory=lambda p: Writer(),
    )
    assert results[task].endswith(f"{task}.mp4")
    assert results[missing_task] is None
    assert Writer.frames  # something was rendered

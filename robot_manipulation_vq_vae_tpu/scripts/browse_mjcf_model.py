"""Visualize / screenshot MJCF models
(reference ``robocasa/scripts/browse_mjcf_model.py:1-256``).

The XML preparation (asset path resolution, white skybox, extra lighting,
collision-geom visibility, exterior bounding-box site, site hiding) is pure
``xml.etree`` and runs anywhere; loading the sim and launching the viewer /
offscreen screenshot require MuJoCo (+ robosuite for asset path roots) on
the host and are gated behind lazy imports.
"""

import argparse
import os
import time
import xml.etree.ElementTree as ET

import numpy as np


def _s2a(s):
    return np.array([float(x) for x in s.split()])


def _a2s(a):
    return " ".join(str(float(x)) for x in np.asarray(a).ravel())


def resolve_asset_paths(root, package_root=None):
    """Rewrite mesh/texture file paths recorded on another machine to the
    local robosuite install (reference ``edit_model_xml`` :21-60)."""
    if package_root is None:
        try:
            import robosuite

            package_root = os.path.split(robosuite.__file__)[0]
        except ImportError:
            return root  # nothing to resolve against
    path_split = package_root.split("/")
    asset = root.find("asset")
    if asset is None:
        return root
    for elem in asset.findall("mesh") + asset.findall("texture"):
        old_path = elem.get("file")
        if old_path is None:
            continue
        parts = old_path.split("/")
        hits = [i for i, v in enumerate(parts) if v == "robosuite"]
        if hits:
            elem.set("file", "/".join(path_split + parts[max(hits) + 1:]))
    return root


def prepare_model_xml(xml, hide_sites=True, show_bbox=False,
                      show_coll_geoms=False, package_root=None):
    """Apply the reference's viewing edits to an MJCF string; returns the
    edited XML string (reference ``read_model`` :63-171)."""
    root = ET.fromstring(xml)
    resolve_asset_paths(root, package_root=package_root)

    asset = root.find("asset")
    if asset is None:
        asset = ET.SubElement(root, "asset")
    asset.append(ET.fromstring(
        '<texture builtin="flat" height="256" rgb1="1 1 1" rgb2="1 1 1" '
        'type="skybox" width="256"/>'
    ))

    worldbody = root.find("worldbody")
    if worldbody is None:
        worldbody = ET.SubElement(root, "worldbody")
    worldbody.append(ET.fromstring(
        '<light pos="2.0 -2.0 2.0" dir="0.01 0.01 -1" '
        'specular="0.3 0.3 0.3" ambient="0.3 0.3 0.3" '
        'diffuse="0.3 0.3 0.3" directional="true" castshadow="false"/>'
    ))

    # collision geoms (group 0): red-translucent or invisible
    for g in root.iter("geom"):
        if g.get("group") == "0":
            g.set("rgba", "1.0 0.0 0.0 0.5" if show_coll_geoms
                  else "1.0 0.0 0.0 0.0")

    sites = {s.get("name"): s for s in root.iter("site") if s.get("name")}
    if show_bbox:
        center = size = None
        if "ext_p0" in sites:
            p0 = _s2a(sites["ext_p0"].get("pos"))
            px = _s2a(sites["ext_px"].get("pos"))
            py = _s2a(sites["ext_py"].get("pos"))
            pz = _s2a(sites["ext_pz"].get("pos"))
            center = np.array([
                (p0[0] + px[0]) / 2, (p0[1] + py[1]) / 2, (p0[2] + pz[2]) / 2,
            ])
            size = np.array([px[0] - p0[0], py[1] - p0[1], pz[2] - p0[2]])
        elif "bottom_site" in sites:
            top = _s2a(sites["top_site"].get("pos"))
            bottom = _s2a(sites["bottom_site"].get("pos"))
            hr = _s2a(sites["horizontal_radius_site"].get("pos"))
            center = (top + bottom) / 2
            size = np.array([hr[0], hr[1], top[2] - center[2]]) * 2
        if center is not None:
            worldbody.append(ET.fromstring(
                f'<site type="box" pos="{_a2s(center)}" '
                f'size="{_a2s(size / 2)}" rgba="0 1 0 0.2"/>'
            ))

    for site in root.iter("site"):
        if hide_sites:
            site.set("rgba", "0 0 0 0")
    return ET.tostring(root, encoding="unicode")


def read_model(xml=None, filepath=None, hide_sites=True, show_bbox=False,
               show_coll_geoms=False):
    """Prepared XML -> (MjModel sim handle, info) — requires MuJoCo."""
    assert (xml is not None) + (filepath is not None) == 1
    if filepath is not None:
        with open(filepath) as f:
            xml = f.read()
    xml = prepare_model_xml(
        xml, hide_sites=hide_sites, show_bbox=show_bbox,
        show_coll_geoms=show_coll_geoms,
    )
    import mujoco

    if filepath is not None:
        os.chdir(os.path.dirname(os.path.abspath(filepath)))
    t = time.time()
    model = mujoco.MjModel.from_xml_string(xml)
    data = mujoco.MjData(model)
    return (model, data), {"sim_load_time": time.time() - t}


def get_model_screenshot(model, data, im_width=1024, im_height=1024):
    import mujoco

    renderer = mujoco.Renderer(model, height=im_height, width=im_width)
    mujoco.mj_forward(model, data)
    renderer.update_scene(data)
    return renderer.render()


def main(args):
    (model, data), info = read_model(
        filepath=args.mjcf, hide_sites=False, show_bbox=args.show_bbox,
        show_coll_geoms=args.show_coll_geoms,
    )
    print("sim load time:", info["sim_load_time"])
    if args.screenshot:
        import imageio

        out = os.path.join(
            os.path.dirname(os.path.abspath(args.mjcf)), "screenshot.png"
        )
        imageio.imwrite(out, get_model_screenshot(model, data))
        print(f"wrote {out}")
    else:
        import mujoco.viewer

        mujoco.viewer.launch(model, data)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mjcf", type=str, required=True)
    parser.add_argument("--screenshot", action="store_true",
                        help="save a screenshot next to the mjcf instead of "
                             "launching the interactive viewer")
    parser.add_argument("--show_bbox", action="store_true",
                        help="visualize exterior bounding box (ext_ sites)")
    parser.add_argument("--show_coll_geoms", action="store_true",
                        help="show collision geoms (group 0)")
    main(parser.parse_args())

"""RoboCasa kitchen-asset AVAILABILITY CHECKER (zero-egress twin of the
reference ``robocasa/scripts/download_kitchen_assets.py``).

The simulator itself stays a host-side dependency of this framework
(SURVEY.md §7 Phase 5: the sim is not ported), so its ~5 GB of MuJoCo asset
zips live wherever the host robocasa install is. This script checks each
registry entry's folder under that install (or ``--assets_root``) and prints
the canonical URL for anything missing. It does NOT download anything.
"""

import argparse
import os

# asset registry (reference download_kitchen_assets.py:12-44); folders are
# relative to the robocasa package root
DOWNLOAD_ASSET_REGISTRY = dict(
    textures=dict(
        message="Environment textures",
        url="https://utexas.box.com/shared/static/otdsyfjontk17jdp24bkhy2hgalofbh4.zip",
        folder="models/assets/textures",
    ),
    fixtures=dict(
        message="Fixtures",
        url="https://utexas.box.com/shared/static/pobhbsjyacahg2mx8x4rm5fkz3wlmyzp.zip",
        folder="models/assets/fixtures",
    ),
    objaverse=dict(
        message="Objaverse objects",
        url="https://utexas.box.com/shared/static/ejt1kc2v5vhae1rl4k5697i4xvpbjcox.zip",
        folder="models/assets/objects/objaverse",
    ),
    aigen_objs=dict(
        message="AI-generated objects",
        url="https://utexas.box.com/shared/static/os3hrui06lasnuvwqpmwn0wcrduh6jg3.zip",
        folder="models/assets/objects/aigen_objs",
    ),
    generative_textures=dict(
        message="AI-generated environment textures",
        url="https://utexas.box.com/shared/static/gf9nkadvfrowkb9lmkcx58jwt4d6c1g3.zip",
        folder="models/assets/generative_textures",
    ),
)


def resolve_assets_root(cli_root=None):
    """robocasa package dir if importable, else --assets_root / env var."""
    if cli_root:
        return cli_root
    env = os.environ.get("RMVQ_ROBOCASA_ROOT")
    if env:
        return env
    try:
        import robocasa

        return robocasa.__path__[0]
    except ImportError:
        return None


def main(args):
    root = resolve_assets_root(args.assets_root)
    if root is None:
        print(
            "robocasa is not installed and no --assets_root / "
            "RMVQ_ROBOCASA_ROOT given; cannot locate asset folders."
        )
        return 1
    missing = []
    for name, reg in DOWNLOAD_ASSET_REGISTRY.items():
        folder = os.path.join(root, reg["folder"])
        ok = os.path.isdir(folder) and len(os.listdir(folder)) > 0
        print(f"[{'OK ' if ok else 'MISSING'}] {reg['message']}: {folder}")
        if not ok:
            missing.append((name, reg, folder))
    if missing:
        print(
            f"\n{len(missing)} asset packs missing. This environment has no "
            "network egress; on a connected machine run the upstream "
            "robocasa download_kitchen_assets.py, or fetch and unzip "
            "manually:"
        )
        for name, reg, folder in missing:
            print(f"  {reg['url']}  ->  {folder}")
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument(
        "--assets_root", type=str, default=None,
        help="robocasa package root containing models/assets "
             "(default: the installed robocasa, or RMVQ_ROBOCASA_ROOT)",
    )
    raise SystemExit(main(parser.parse_args()))

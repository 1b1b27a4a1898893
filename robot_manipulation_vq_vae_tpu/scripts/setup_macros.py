"""Create a ``macros_private.py`` for machine-local settings
(reference ``robomimic/scripts/setup_macros.py``)."""

import os
import shutil


def main():
    import robot_manipulation_vq_vae_tpu

    pkg_dir = os.path.dirname(robot_manipulation_vq_vae_tpu.__file__)
    src = os.path.join(pkg_dir, "macros.py")
    dst = os.path.join(pkg_dir, "macros_private.py")
    if os.path.exists(dst):
        print(f"{dst} already exists, not overwriting")
        return
    shutil.copyfile(src, dst)
    print(f"created {dst} - edit it for machine-local settings")


if __name__ == "__main__":
    main()

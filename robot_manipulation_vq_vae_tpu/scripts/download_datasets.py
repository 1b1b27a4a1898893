"""Dataset download entry point (reference
``robomimic/scripts/download_datasets.py`` and
``robocasa/scripts/download_datasets.py``).

This build targets zero-egress environments: the script verifies expected
dataset locations (from the registry) and prints exactly what is missing and
where to place it, rather than fetching over the network."""

import argparse
import os

from robot_manipulation_vq_vae_tpu.utils.dataset_registry import (
    MULTI_STAGE_TASK_DATASETS,
    SINGLE_STAGE_TASK_DATASETS,
    get_ds_path,
)


def main(args):
    tasks = args.tasks or (
        list(SINGLE_STAGE_TASK_DATASETS) + list(MULTI_STAGE_TASK_DATASETS)
    )
    missing = []
    for task in tasks:
        for ds_type in ("human_im", "mg_im"):
            path = get_ds_path(task, ds_type)
            if path is None:
                continue
            status = "OK " if os.path.exists(path) else "MISSING"
            if status != "OK ":
                missing.append((task, ds_type, path))
            print(f"[{status}] {task} ({ds_type}): {path}")
    if missing:
        print(
            f"\n{len(missing)} datasets missing. This environment has no "
            "network egress; fetch them with the upstream RoboCasa "
            "download_datasets.py on a connected machine and copy them to "
            "the paths above (or set RMVQ_DATASET_BASE_PATH)."
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Dataset AVAILABILITY CHECKER (zero-egress twin of the "
        "reference download_datasets.py): verifies registry-expected dataset "
        "paths and reports what is missing and where to place it. It does "
        "NOT download anything - fetch on a connected machine with the "
        "upstream script and copy the files to the printed paths."
    )
    parser.add_argument("--tasks", nargs="+", default=None,
                        help="subset of registry task names (default: all)")
    main(parser.parse_args())

"""MoMaRT dataset AVAILABILITY CHECKER (zero-egress twin of the reference
``robomimic/scripts/download_momart_datasets.py``).

Verifies which MoMaRT datasets (https://arxiv.org/abs/2112.05251) are present
under the download directory and prints the canonical URL + size for every
missing one, so they can be fetched on a connected machine and copied in.
It does NOT download anything.

Args mirror the reference: ``--download_dir`` (defaults to
``<package>/../datasets/momart``), ``--tasks`` ('all' or a list of the 5
tasks), ``--dataset_types`` ('all' or a list of expert / suboptimal /
generalize / sample), ``--dry_run``.
"""

import argparse
import os

import robot_manipulation_vq_vae_tpu
from robot_manipulation_vq_vae_tpu import MOMART_DATASET_REGISTRY

ALL_TASKS = [
    "table_setup_from_dishwasher",
    "table_setup_from_dresser",
    "table_cleanup_to_dishwasher",
    "table_cleanup_to_sink",
    "unload_dishwasher",
]
ALL_DATASET_TYPES = ["expert", "suboptimal", "generalize", "sample"]


def main(args):
    default_base = os.path.join(
        os.path.dirname(robot_manipulation_vq_vae_tpu.__path__[0]),
        "datasets", "momart",
    )
    base = args.download_dir or default_base

    tasks = ALL_TASKS if "all" in args.tasks else args.tasks
    types = ALL_DATASET_TYPES if "all" in args.dataset_types else args.dataset_types
    for t in tasks:
        assert t in ALL_TASKS, f"unknown task {t}"
    for dt in types:
        assert dt in ALL_DATASET_TYPES, f"unknown dataset type {dt}"

    missing, total_gb = [], 0.0
    for task in tasks:
        for dtype in types:
            entry = MOMART_DATASET_REGISTRY[task][dtype]
            fname = os.path.basename(entry["url"])
            path = os.path.join(base, task, fname)
            ok = os.path.exists(path)
            print(f"[{'OK ' if ok else 'MISSING'}] {task}/{dtype}: {path}"
                  f" ({entry['size']} GB)")
            if not ok:
                missing.append((path, entry))
                total_gb += entry["size"]

    if missing and not args.dry_run:
        print(
            f"\n{len(missing)} datasets missing (~{total_gb:.1f} GB total). "
            "This environment has no network egress; fetch on a connected "
            "machine and copy to the paths above:"
        )
        for path, entry in missing:
            print(f"  {entry['url']}  ->  {path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--download_dir", type=str, default=None,
                        help="base download directory to check")
    parser.add_argument("--tasks", type=str, nargs="+",
                        default=["table_setup_from_dishwasher"],
                        help="tasks to check ('all' for every task)")
    parser.add_argument("--dataset_types", type=str, nargs="+",
                        default=["expert"],
                        help="dataset types to check ('all' for every type)")
    parser.add_argument("--dry_run", action="store_true",
                        help="only list availability, no fetch instructions")
    main(parser.parse_args())

"""Play sample demos of every registered task into per-task montage videos
(reference ``robocasa/scripts/play_dataset_montage.py:1-63``).

Iterates the dataset registry (single-stage + multi-stage tasks), resolves
each task's dataset path, and replays ``--num_demos_per_task`` demos to
``<output>/<task>.mp4`` through :mod:`playback_dataset`. Datasets that are
not present locally are reported and skipped (zero-egress friendly).
"""

import argparse
import os

from robot_manipulation_vq_vae_tpu.scripts.playback_dataset import (
    build_parser as playback_parser,
    playback_dataset,
)
from robot_manipulation_vq_vae_tpu.utils.dataset_registry import (
    MULTI_STAGE_TASK_DATASETS,
    SINGLE_STAGE_TASK_DATASETS,
    get_ds_path,
)


def montage_tasks(output_dir, num_demos_per_task=10, ds_type="human_raw",
                  tasks=None, env_factory=None, video_writer_factory=None):
    """Returns {task: video_path or None-if-missing}."""
    output_dir = os.path.expanduser(output_dir)
    os.makedirs(output_dir, exist_ok=True)
    if tasks is None:
        tasks = list(SINGLE_STAGE_TASK_DATASETS) + list(
            MULTI_STAGE_TASK_DATASETS
        )

    results = {}
    for i, task in enumerate(tasks):
        ds_path = get_ds_path(task, ds_type=ds_type)
        if ds_path is None or not os.path.exists(ds_path):
            print(f"[{i + 1}/{len(tasks)}] {task}: dataset not found "
                  f"locally ({ds_path}), skipping")
            results[task] = None
            continue
        video_path = os.path.join(output_dir, f"{task}.mp4")
        args = playback_parser().parse_args([
            "--dataset", ds_path,
            "--video_path", video_path,
            "--n", str(num_demos_per_task),
            "--video_skip", "5",
            "--render_image_names",
            "robot0_agentview_center", "robot0_eye_in_hand",
        ])
        print(f"[{i + 1}/{len(tasks)}] Playing sample demos for {task}")
        playback_dataset(args, env_factory=env_factory,
                         video_writer_factory=video_writer_factory)
        results[task] = video_path
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", type=str,
                        default="/tmp/robocasa_dataset_montage",
                        help="path to store videos")
    parser.add_argument("--num_demos_per_task", type=int, default=10,
                        help="number of demos to play per task")
    parser.add_argument("--ds_type", type=str, default="human_raw",
                        help="dataset flavor to resolve in the registry")
    args = parser.parse_args()
    montage_tasks(args.output, args.num_demos_per_task, ds_type=args.ds_type)

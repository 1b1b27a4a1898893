"""Interactive task demo browser (reference
``robocasa/demos/demo_tasks.py:1-153``): pick a task from the annotated
menu, resolve its dataset from the registry, and play back sample demos
(on-screen, or to video with ``--render_offscreen``).

State playback needs the host sim stack; ``--use_obs`` plays stored image
observations and is sim-free."""

import argparse
import os
from collections import OrderedDict

from robot_manipulation_vq_vae_tpu.scripts.demo_kitchen_scenes import (
    choose_option,
)
from robot_manipulation_vq_vae_tpu.scripts.playback_dataset import (
    build_parser as playback_parser,
    playback_dataset,
)
from robot_manipulation_vq_vae_tpu.utils.dataset_registry import get_ds_path

# the reference's curated task menu (demo_tasks.py:70-110)
TASK_DESCRIPTIONS = OrderedDict([
    ("PnPCounterToCab", "pick and place from counter to cabinet"),
    ("PnPCounterToSink", "pick and place from counter to sink"),
    ("PnPMicrowaveToCounter", "pick and place from microwave to counter"),
    ("PnPStoveToCounter", "pick and place from stove to counter"),
    ("OpenSingleDoor", "open cabinet or microwave door"),
    ("CloseDrawer", "close drawer"),
    ("TurnOnMicrowave", "turn on microwave"),
    ("TurnOnSinkFaucet", "turn on sink faucet"),
    ("TurnOnStove", "turn on stove"),
    ("ArrangeVegetables", "arrange vegetables on a cutting board"),
    ("MicrowaveThawing", "place frozen food in microwave for thawing"),
    ("RestockPantry", "restock cans in pantry"),
    ("PreSoakPan", "prepare pan for washing"),
    ("PrepareCoffee", "make coffee"),
])


def main(args):
    task = args.task
    if task is None:
        labels = [f"{k}: {v}" for k, v in TASK_DESCRIPTIONS.items()]
        chosen = choose_option(labels, "task", default=labels[0])
        task = chosen.split(":")[0]

    ds_path = get_ds_path(task, ds_type="human_raw")
    if ds_path is None or not os.path.exists(ds_path):
        raise SystemExit(
            f"dataset for {task} not found at {ds_path}; fetch it with "
            "download_datasets.py on a connected machine"
        )

    playback_args = playback_parser().parse_args(
        ["--dataset", ds_path, "--n", str(args.n)]
        + (["--use-obs"] if args.use_obs else [])
        + (["--render"] if not (args.render_offscreen or args.use_obs)
           else [])
        + (["--video_path",
            os.path.join(args.video_path, f"{task}.mp4")]
           if (args.render_offscreen or args.use_obs) else [])
    )
    playback_dataset(playback_args)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--task", type=str, default=None,
                        help="task with collected demos (menu if omitted)")
    parser.add_argument("--n", type=int, default=3,
                        help="demos to play")
    parser.add_argument("--use_obs", action="store_true",
                        help="play stored image obs (sim-free)")
    parser.add_argument("--render_offscreen", action="store_true",
                        help="render to video instead of on-screen")
    parser.add_argument("--video_path", type=str,
                        default="/tmp/robocasa_demo_tasks",
                        help="video folder for offscreen rendering")
    main(parser.parse_args())

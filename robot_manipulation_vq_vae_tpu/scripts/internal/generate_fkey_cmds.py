"""Print the add_train_filter_key / filter_dataset_size command pairs for a
set of MimicGen tasks (reference
``robomimic/scripts/internal/generate_fkey_cmds.py``)."""

import os

from robot_manipulation_vq_vae_tpu.utils.dataset_registry import (
    SINGLE_STAGE_TASK_DATASETS,
)

TASK_NAMES = [
    "PnPCounterToCab",
    "PnPCabToCounter",
    "PnPCounterToMicrowave",
    "OpenSingleDoor",
    "CloseSingleDoor",
    "OpenDoubleDoor",
    "CloseDoubleDoor",
    "TurnOffSinkFaucet",
    "TurnOnStove",
    "TurnOffStove",
    "CoffeeSetupMug",
    "CoffeeServeMug",
    "CoffeePressButton",
    "TurnOnMicrowave",
    "TurnOffMicrowave",
]

PKG = "robot_manipulation_vq_vae_tpu.scripts"

if __name__ == "__main__":
    for task in TASK_NAMES:
        task_spec = SINGLE_STAGE_TASK_DATASETS[task]
        path = os.path.join(task_spec["mg_path"], "demo_gentex_im128.hdf5")
        print(
            f"python -m {PKG}.internal.add_train_filter_key --dataset {path}; "
            f"python -m {PKG}.filter_dataset_size --dataset {path} "
            f"--input_filter_key train"
        )
        print()

"""ICL transformer configs over MimicGen datasets (reference
``robomimic/scripts/config_gen/icl_xfmr_gen_mg_data.py``)."""

from robot_manipulation_vq_vae_tpu.scripts.config_gen.icl_xfmr_gen import (
    main,
)

if __name__ == "__main__":
    import argparse
    import os
    import tempfile

    parser = argparse.ArgumentParser()
    parser.add_argument("--name", type=str, default="icl_hvqvae_mg")
    parser.add_argument("--tasks", nargs="+", default=[
        "PnPCabToCounter", "PnPCounterToSink", "PnPSinkToCounter",
        "PnPCounterToMicrowave", "PnPMicrowaveToCounter",
        "PnPCounterToStove", "PnPStoveToCounter",
    ])
    parser.add_argument("--ndemos", type=int, default=3000)
    parser.add_argument("--seeds", nargs="+", type=int, default=[123])
    parser.add_argument("--output_dir", type=str, default="expdata/robocasa")
    parser.add_argument(
        "--config_dir", type=str,
        default=os.path.join(tempfile.gettempdir(), "rmvq_configs"),
    )
    parser.add_argument("--wandb_proj_name", type=str, default=None)
    parser.add_argument("--debug", action="store_true")
    main(parser.parse_args())

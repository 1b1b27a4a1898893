"""Convert a reference PyTorch checkpoint (``.pth``) into this framework's
self-describing ``.ckpt``.

The reference releases ``ICLTransformerHVQVAE`` checkpoints written by
``robomimic/utils/train_utils.py:1186-1235`` (save_model) — including the
stray non-tensor keys its own ``fix_ckpt.py`` has to strip. This CLI maps
them onto our Flax trees (``utils/ckpt_conversion.convert_flagship_checkpoint``)
so the result loads straight into ``file_utils.policy_from_checkpoint``
and ``scripts/train.py --resume``-style flows:

    python -m robot_manipulation_vq_vae_tpu.scripts.conversion.convert_torch_checkpoint \
        --pth model_epoch_500.pth --output model_epoch_500.ckpt

``--fix-gaussian`` additionally remaps the reference's inverted gaussian
normalization stats (its dataset layer stores the mean under "scale" and
the std under "offset" — see PARITY.md divergence #8) to conventional
semantics for local re-training; by default the stats load VERBATIM,
which is behavior-preserving for rollouts.
"""

import argparse

from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils
from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
    convert_flagship_checkpoint,
)


def convert(pth_path, out_path, fix_gaussian=False):
    raw = FileUtils.load_reference_torch_checkpoint(pth_path)
    converted = convert_flagship_checkpoint(raw, fix_gaussian=fix_gaussian)
    FileUtils.save_checkpoint(converted, out_path)
    return converted


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="reference .pth -> TPU-framework .ckpt"
    )
    parser.add_argument("--pth", required=True,
                        help="path to the reference torch checkpoint")
    parser.add_argument("--output", required=True,
                        help="path for the converted .ckpt")
    parser.add_argument(
        "--fix-gaussian", action="store_true",
        help="remap the reference's inverted gaussian normalization stats "
             "to conventional semantics (for re-training; rollouts don't "
             "need it)",
    )
    args = parser.parse_args(argv)
    convert(args.pth, args.output, fix_gaussian=args.fix_gaussian)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

"""Strip non-weight metadata entries from a checkpoint's model dict
(reference repo-root ``fix_ckpt.py``): older ICL-HVQVAE checkpoints stored
``vq_vae_enabled`` / ``vqvae_config`` flags inside the weight dict, which
breaks strict loading. Writes ``*_fixed`` alongside the original."""

import argparse
import os

from robot_manipulation_vq_vae_tpu.utils import file_utils as FileUtils

KEYS_TO_REMOVE = ("vq_vae_enabled", "vqvae_config")


def fix_checkpoint(checkpoint_path):
    ckpt = FileUtils.maybe_dict_from_checkpoint(ckpt_path=checkpoint_path)
    model_dict = ckpt.get("model", {})
    removed = []
    for scope in (model_dict, model_dict.get("params", {})):
        for key in KEYS_TO_REMOVE:
            if isinstance(scope, dict) and key in scope:
                scope.pop(key)
                removed.append(key)
    if not removed:
        print("checkpoint is already clean")
        return checkpoint_path

    root, ext = os.path.splitext(checkpoint_path)
    output_path = root + "_fixed" + ext
    if os.path.exists(output_path):
        output_path = root + "_fixed_new" + ext
    FileUtils.save_checkpoint(ckpt, output_path)
    print(f"removed {removed}; wrote {output_path}")
    return output_path


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", type=str)
    fix_checkpoint(parser.parse_args().checkpoint)

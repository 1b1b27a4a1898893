"""Load reference PyTorch modules directly from the read-only mount for
parity testing. The reference is the behavioral oracle: we run its modules
on fixed inputs and assert our JAX implementations match.
"""

import importlib.util
import sys

REFERENCE_ROOT = "/root/reference"


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_lipvq_reference():
    return load_module(
        REFERENCE_ROOT + "/robomimic/models/vq_vae/backbone_lfqvae_v5.py",
        "ref_backbone_lfqvae_v5",
    )


def load_hvqvae_reference():
    return load_module(
        REFERENCE_ROOT + "/robomimic/algo/heirarchical_vqvae.py",
        "ref_heirarchical_vqvae",
    )


def load_bin_reference():
    return load_module(
        REFERENCE_ROOT + "/robomimic/models/bin_action/backbone.py",
        "ref_bin_backbone",
    )

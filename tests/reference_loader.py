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


def ensure_torchvision_stub():
    """The reference's base_nets imports torchvision at module scope; only
    the (unused here) ResNet classes touch it, so stub it out."""
    import importlib.machinery
    import types

    for name in (
        "torchvision", "torchvision.models", "torchvision.transforms",
        "torchvision.transforms.functional",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []
            # a real ModuleSpec so importlib.util.find_spec (e.g. inside a
            # later `import transformers`) doesn't choke on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(
                name, loader=None, is_package=True
            )
            mod.__version__ = "0.0.0-stub"
            sys.modules[name] = mod
    tvt = sys.modules["torchvision.transforms"]
    if not hasattr(tvt, "Lambda"):
        tvt.Lambda = lambda f: f
        tvt.Compose = lambda fs: fs
        tvt.ColorJitter = object
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = tvt
    tvt.functional = sys.modules["torchvision.transforms.functional"]


def load_base_nets_reference():
    ensure_torchvision_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("robomimic.models.base_nets")


def ensure_diffusers_stub():
    """The reference's ``torch_utils.lr_scheduler_from_optim_params`` does a
    function-scope ``from diffusers.optimization import ...`` even when the
    requested scheduler never touches those symbols (torch_utils.py:140-143);
    diffusers is not installed in this image, so satisfy the import with
    inert placeholders (parity tests pin ``scheduler_type`` to None)."""
    import importlib.machinery
    import types

    if "diffusers.optimization" in sys.modules:
        return
    d = types.ModuleType("diffusers")
    d.__path__ = []
    d.__spec__ = importlib.machinery.ModuleSpec(
        "diffusers", loader=None, is_package=True
    )
    o = types.ModuleType("diffusers.optimization")
    o.__spec__ = importlib.machinery.ModuleSpec(
        "diffusers.optimization", loader=None
    )
    o.Union = o.SchedulerType = o.Optional = o.Optimizer = None
    o.TYPE_TO_SCHEDULER_FUNCTION = {}
    d.optimization = o
    sys.modules["diffusers"] = d
    sys.modules["diffusers.optimization"] = o

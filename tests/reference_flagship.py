"""Build the real reference flagship algo (``ICLTransformerHVQVAE``) from
``/root/reference`` for checkpoint-interop testing.

The reference package needs a few third-party modules that are absent in
this image; all are stubbed structurally:

- ``torchvision.models.resnet18``: replaced by a pure-torch structural
  clone with torchvision's exact module layout/naming (conv1, bn1, relu,
  maxpool, layer1..4 of BasicBlocks, avgpool, fc) — the reference's
  ``ResNet18ConvFiLM`` only reorganizes these children, so the resulting
  state-dict keys are identical to a real torchvision trunk.
- ``mamba_ssm`` / ``clip`` / ``diffusers``: module-scope imports of
  components unused by the flagship path.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    mod.__path__ = []
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _make_torch_resnet18():
    """Structural clone of torchvision.models.resnet18 (module layout and
    parameter names match torchvision exactly)."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet18(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64
            for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), (2, 2, 2, 2))
            ):
                stride = 1 if i == 0 else 2
                down = None
                if stride != 1 or inplanes != planes:
                    down = nn.Sequential(
                        nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                        nn.BatchNorm2d(planes),
                    )
                layer = [BasicBlock(inplanes, planes, stride, down)]
                inplanes = planes
                for _ in range(1, blocks):
                    layer.append(BasicBlock(inplanes, planes))
                setattr(self, f"layer{i + 1}", nn.Sequential(*layer))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return self.fc(self.avgpool(x).flatten(1))

    def resnet18(pretrained=False, **kwargs):
        return ResNet18()

    return resnet18


def install_stubs():
    import transformers  # noqa: F401 - must import before torchvision stub

    from reference_loader import ensure_torchvision_stub

    ensure_torchvision_stub()
    sys.modules["torchvision.models"].resnet18 = _make_torch_resnet18()
    _stub("torchvision.utils", save_image=lambda *a, **k: None)
    if "mamba_ssm" not in sys.modules:
        _stub("mamba_ssm", Mamba=object)
    if "clip" not in sys.modules:
        _stub(
            "clip",
            load=lambda *a, **k: (None, None),
            tokenize=lambda x: x,
        )
    if "diffusers" not in sys.modules:
        _stub("diffusers")
        _stub("diffusers.schedulers")
        _stub("diffusers.schedulers.scheduling_ddpm", DDPMScheduler=object)
        _stub("diffusers.schedulers.scheduling_ddim", DDIMScheduler=object)
        _stub("diffusers.training_utils", EMAModel=object)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def load_reference_robomimic():
    install_stubs()
    import importlib

    return importlib.import_module("robomimic")


# tiny flagship dims shared by the builder and the interop test
OBS_KEYS = {"robot0_eef_pos": (5,), "robot0_gripper_qpos": (2,)}
RGB_KEYS = {"robot0_agentview_image": (3, 32, 32)}  # torch CHW
LANG_DIM = 768
H = 4   # context length
A = 12  # action dim


def build_reference_config(robomimic):
    """Tiny flagship config mirroring train_config.json's structure."""
    from robomimic.config import config_factory

    config = config_factory("icl")
    with config.values_unlocked():
        config.observation.modalities.obs.low_dim = list(OBS_KEYS) + [
            "lang_emb"
        ]
        config.observation.modalities.obs.rgb = list(RGB_KEYS)
        config.observation.encoder.rgb.core_class = (
            "VisualCoreLanguageConditioned"
        )
        config.observation.encoder.rgb.core_kwargs = {
            "feature_dimension": 16,
            "backbone_class": "ResNet18ConvFiLM",
            "backbone_kwargs": {
                "pretrained": False, "input_coord_conv": False,
            },
            "pool_class": "SpatialSoftmax",
            "pool_kwargs": {
                "num_kp": 8, "learnable_temperature": False,
                "temperature": 1.0, "noise_std": 0.0,
            },
        }
        config.observation.encoder.rgb.obs_randomizer_class = "CropRandomizer"
        config.observation.encoder.rgb.obs_randomizer_kwargs = {
            "crop_height": 28, "crop_width": 28, "num_crops": 1,
            "pos_enc": False,
        }
        config.algo.transformer.enabled = True
        config.algo.transformer.context_length = H
        config.algo.transformer.embed_dim = 64
        config.algo.transformer.num_layers = 2
        config.algo.transformer.num_heads = 4
        config.algo.transformer.supervise_all_steps = True
        config.algo.transformer.pred_future_acs = True
        config.algo.transformer.causal = False
        config.algo.transformer.vq_vae_enabled = True
        config.algo.transformer.ln_act_enabled = False
        config.algo.transformer.vqvae.num_subclusters = 32
        config.algo.transformer.vqvae.num_clusters = 16
        config.algo.transformer.vqvae.embed_dim = 64
        config.algo.transformer.vqvae.num_stages = 1
        config.algo.transformer.vqvae.num_layers_per_stage = 2
        config.train.seed = 0
    config.lock()
    return config


def build_reference_flagship():
    """Returns (reference algo, config, shape_meta dict)."""
    robomimic = load_reference_robomimic()
    import torch

    from robomimic.algo import algo_factory
    import robomimic.utils.obs_utils as ObsUtils

    config = build_reference_config(robomimic)
    ObsUtils.initialize_obs_utils_with_config(config)

    shapes = {k: list(s) for k, s in OBS_KEYS.items()}
    shapes.update({k: list(s) for k, s in RGB_KEYS.items()})
    shapes["lang_emb"] = [LANG_DIM]

    torch.manual_seed(0)
    algo = algo_factory(
        "icl", config, obs_key_shapes=shapes, ac_dim=A,
        device=torch.device("cpu"),
    )
    return algo, config, shapes

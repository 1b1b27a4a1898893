"""Base network blocks (Flax): MLP, ResNet18 (+FiLM variants), SpatialSoftmax,
pooling, CoordConv, RNN base.

Re-designs of the reference ``robomimic/models/base_nets.py`` blocks with one
deliberate divergence: **images are channels-last ([..., H, W, C])** - the
TPU-native layout - everywhere inside this framework. The reference (and its
checkpoints) are channels-first; the checkpoint converter transposes.
``output_shape`` bookkeeping therefore uses (H, W, C) tuples here.
"""

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.utils.initializers import (
    torch_linear_kernel_init,
)

# Opt-in frozen-stats BatchNorm (`config.train.frozen_batch_norm`): train
# steps normalize with the running statistics instead of batch statistics,
# removing the cross-batch reduction passes — measured +17% flagship
# train-step throughput (9.63 vs 8.24 steps/s, docs/design.md §4). This
# DIVERGES from the reference's train-mode BN semantics (running stats
# stop updating), so it is off by default and never used in parity tests.
# Process-global, set once at algo construction (jitted steps trace it).
_FROZEN_BATCH_NORM = False


def set_frozen_batch_norm(enabled):
    """Enable/disable frozen-stats BatchNorm for subsequently TRACED
    models (called from Algo construction off config.train.frozen_batch_norm)."""
    global _FROZEN_BATCH_NORM
    _FROZEN_BATCH_NORM = bool(enabled)


def _bn_train(train):
    """BN 'training' flag: batch statistics only when training AND the
    frozen-stats speed mode is off."""
    return train and not _FROZEN_BATCH_NORM


def _trunk_norm(h, norm, train, name):
    """The ResNet trunks' normalization layer. ``norm='batch'`` is
    torchvision BatchNorm semantics; ``norm='group'`` swaps in
    GroupNorm(C // 16) exactly like the reference diffusion policy's
    ``replace_bn_with_gn`` (diffusion_policy.py:448-461, features_per_group
    16, torch eps 1e-5) — stateless, so EMA-averaging the whole policy
    stays well-defined ("performance will tank if you forget",
    diffusion_policy.py:64-67)."""
    if norm == "group":
        return nn.GroupNorm(
            num_groups=h.shape[-1] // 16, epsilon=1e-5, name=name
        )(h)
    assert norm == "batch", norm
    return nn.BatchNorm(use_running_average=not _bn_train(train), name=name)(h)


# Opt-in pool-free stem (`config.train.pool_free_stem`): the ResNet stem's
# 7x7/s2 conv + 3x3/s2 maxpool collapse into one 7x7/s4 conv. Parameter
# shapes are untouched and the output spatial shape is IDENTICAL for every
# input size (both compute floor((H-1)/4)+1), but the features diverge
# (subsampled conv vs max over a 2x2 window of stride-2 positions), so it
# is off by default and never used in parity tests. It removes the
# trunk's most wasteful op — maxpool backward's 11.2 ms SelectAndScatter,
# which survived a five-formulation replacement campaign (design.md §4) —
# plus 3/4 of the conv1/bn1 activation traffic.
_POOL_FREE_STEM = False


def set_pool_free_stem(enabled):
    """Enable/disable the pool-free stride-4 stem for subsequently TRACED
    models (called from Algo construction off config.train.pool_free_stem)."""
    global _POOL_FREE_STEM
    _POOL_FREE_STEM = bool(enabled)


# Opt-in Pallas stem pool (`config.train.pallas_pool`): the 3x3/s2 maxpool
# as a Pallas kernel pair — forward records the window argmax, backward is
# an index-routed gather (ops/pallas/stem_pool.py). SEMANTICS-PRESERVING
# (forward bit-equal to nn.max_pool incl. torch tie routing; backward equal
# up to summation order — tests/test_stem_pool_pallas.py), unlike the two
# speed modes above; default set by the round-5 on-chip measurement
# (docs/mfu_campaign_r5.json).
_PALLAS_POOL = False


def set_pallas_pool(enabled):
    """Enable/disable the Pallas stem-pool kernels for subsequently TRACED
    models (called from Algo construction off config.train.pallas_pool)."""
    global _PALLAS_POOL
    _PALLAS_POOL = bool(enabled)


def transformer_args_from_config(transformer_config):
    """Map ``algo.transformer.*`` config keys to network kwargs, including the
    four tokenizer-modality flags (reference ``base_nets.py:41-70``)."""
    args = dict(
        transformer_context_length=transformer_config.context_length,
        transformer_embed_dim=transformer_config.embed_dim,
        transformer_num_heads=transformer_config.num_heads,
        transformer_emb_dropout=transformer_config.emb_dropout,
        transformer_attn_dropout=transformer_config.attn_dropout,
        transformer_block_output_dropout=transformer_config.block_output_dropout,
        transformer_sinusoidal_embedding=transformer_config.sinusoidal_embedding,
        transformer_activation=transformer_config.activation,
        transformer_nn_parameter_for_timesteps=transformer_config.nn_parameter_for_timesteps,
        transformer_num_layers=transformer_config.num_layers,
        transformer_fast_enabled=transformer_config.fast_enabled,
        transformer_bin_enabled=transformer_config.bin_enabled,
        transformer_vq_vae_enabled=transformer_config.vq_vae_enabled,
        transformer_ln_act_enabled=transformer_config.ln_act_enabled,
    )
    if "causal" in transformer_config:
        args["transformer_causal"] = transformer_config.causal
    return args


class MLP(nn.Module):
    """Plain MLP (reference ``MLP`` base_nets.py:240): hidden layer_dims with
    @activation, final Dense to output_dim with optional @output_activation."""

    output_dim: int
    layer_dims: Sequence[int] = ()
    activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    dropouts: Optional[Sequence[float]] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i, dim in enumerate(self.layer_dims):
            x = nn.Dense(
                dim, kernel_init=torch_linear_kernel_init, name=f"fc{i}"
            )(x)
            x = self.activation(x)
            if self.dropouts is not None and self.dropouts[i] > 0:
                x = nn.Dropout(self.dropouts[i])(x, deterministic=deterministic)
        x = nn.Dense(
            self.output_dim, kernel_init=torch_linear_kernel_init, name="out"
        )(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


# ---------------------------------------------------------------------------
# ResNet-18 (channels-last) + FiLM variants
# ---------------------------------------------------------------------------

class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + skip, final ReLU."""

    features: int
    stride: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        h = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv1",
        )(x)
        h = _trunk_norm(h, self.norm, train, "bn1")
        h = nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="conv2",
        )(h)
        h = _trunk_norm(h, self.norm, train, "bn2")
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="down_conv",
            )(x)
            identity = _trunk_norm(identity, self.norm, train, "down_bn")
        return nn.relu(h + identity)


class _ResNet18Stem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (torchvision stem)."""

    coord_conv: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        if self.coord_conv:
            x = add_coord_channels(x)
        stride = 4 if _POOL_FREE_STEM else 2
        x = nn.Conv(
            64, (7, 7), strides=(stride, stride), padding=((3, 3), (3, 3)),
            use_bias=False, name="conv1",
        )(x)
        x = _trunk_norm(x, self.norm, train, "bn1")
        x = nn.relu(x)
        if _POOL_FREE_STEM:
            # opt-in speed mode: stride-4 conv already lands on the pooled
            # grid (floor((H-1)/4)+1 — identical output shape), so the pool
            # and its 11.2 ms SelectAndScatter backward vanish entirely
            return x
        if _PALLAS_POOL:
            # semantics-preserving Pallas pair (recorded-argmax forward +
            # index-routed backward); falls back to the exact XLA
            # formulation off-TPU or at unsupported shapes
            from robot_manipulation_vq_vae_tpu.ops.pallas.stem_pool import (
                max_pool_3x3_s2,
            )

            return max_pool_3x3_s2(x)
        # nn.max_pool's SelectAndScatter backward is the single most
        # expensive non-conv op in the trunk (11.2 ms at flagship shapes),
        # but it SURVIVED a five-formulation replacement campaign — every
        # alternative measured slower or OOMed (docs/design.md §4,
        # ops/pool.py keeps the best challenger + numbers)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


def _resnet_plan(blocks_per_stage):
    """Flatten a torchvision-style stage spec into (features, stride) pairs."""
    plan = []
    for stage, (feat, n_blocks) in enumerate(
        zip((64, 128, 256, 512), blocks_per_stage)
    ):
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            plan.append((feat, stride))
    return plan


_RESNET18_PLAN = _resnet_plan((2, 2, 2, 2))
_RESNET34_PLAN = _resnet_plan((3, 4, 6, 3))


class Bottleneck(nn.Module):
    """torchvision Bottleneck (1x1 -> 3x3 -> 1x1 with 4x expansion)."""

    features: int
    stride: int = 1
    expansion: int = 4
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        out_feat = self.features * self.expansion
        identity = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        h = _trunk_norm(h, self.norm, train, "bn1")
        h = nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, name="conv2",
        )(h)
        h = _trunk_norm(h, self.norm, train, "bn2")
        h = nn.relu(h)
        h = nn.Conv(out_feat, (1, 1), use_bias=False, name="conv3")(h)
        h = _trunk_norm(h, self.norm, train, "bn3")
        if self.stride != 1 or x.shape[-1] != out_feat:
            identity = nn.Conv(
                out_feat, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="down_conv",
            )(x)
            identity = _trunk_norm(identity, self.norm, train, "down_bn")
        return nn.relu(h + identity)


class ResNet18Conv(nn.Module):
    """ResNet-18 trunk (fc removed), reference ``ResNet18Conv``
    (base_nets.py:550-610). Input [..., H, W, C]; output [H/32, W/32, 512]."""

    input_coord_conv: bool = False
    pretrained: bool = False  # accepted for config compat; no torchvision here
    norm: str = "batch"  # "group" = the reference's replace_bn_with_gn

    @nn.compact
    def __call__(self, x, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_RESNET18_PLAN):
            x = BasicBlock(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
        return x

    @staticmethod
    def output_shape(input_shape):
        h, w, _ = input_shape
        return [int(math.ceil(h / 32.0)), int(math.ceil(w / 32.0)), 512]


class FiLMLayer(nn.Module):
    """Feature-wise linear modulation conditioned on a language embedding
    (reference ``FiLMLayer`` base_nets.py:612-650): x -> relu((1+gamma)x+beta)."""

    channels: int

    @nn.compact
    def __call__(self, x, lang_emb):
        proj = nn.Dense(
            self.channels * 2, kernel_init=torch_linear_kernel_init,
            name="lang_proj",
        )(lang_emb)  # [B, 2C]
        beta, gamma = jnp.split(proj, 2, axis=-1)
        beta = beta[:, None, None, :]
        gamma = gamma[:, None, None, :]
        return nn.relu((1.0 + gamma) * x + beta)


class ResNet18ConvFiLM(nn.Module):
    """ResNet-18 trunk with a FiLM layer after every BasicBlock
    (reference ``ResNet18ConvFiLM`` base_nets.py:652-746)."""

    lang_emb_dim: int = 768
    input_coord_conv: bool = False
    pretrained: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, lang_emb, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_RESNET18_PLAN):
            x = BasicBlock(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
            x = FiLMLayer(channels=feat, name=f"film{i}")(x, lang_emb)
        return x

    @staticmethod
    def output_shape(input_shape):
        h, w, _ = input_shape
        return [int(math.ceil(h / 32.0)), int(math.ceil(w / 32.0)), 512]


class ShallowConv(nn.Module):
    """Shallow convolutional encoder from the DSAE paper
    (https://rll.berkeley.edu/dsae/dsae.pdf), reference ``ShallowConv``
    (base_nets.py:1376-1411). Input [..., H, W, C]; output
    [H/2, W/2, output_channel] (NHWC, unlike the reference's CHW)."""

    input_channel: int = 3
    output_channel: int = 32

    @nn.compact
    def __call__(self, x, train=False):
        assert x.shape[-1] == self.input_channel
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)))(x)
        x = nn.relu(x)
        x = nn.Conv(32, (1, 1), strides=(1, 1), padding="VALID")(x)
        x = nn.relu(x)
        x = nn.Conv(32, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.output_channel, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
        )(x)
        return x

    def output_shape(self, input_shape):
        assert len(input_shape) == 3
        assert input_shape[-1] == self.input_channel
        out_h = int(math.floor(input_shape[0] / 2.0))
        out_w = int(math.floor(input_shape[1] / 2.0))
        return [out_h, out_w, self.output_channel]


class ResNet34Conv(nn.Module):
    """ResNet-34 trunk (reference ``ResNet34ConvFiLM`` family,
    base_nets.py:748)."""

    input_coord_conv: bool = False
    pretrained: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_RESNET34_PLAN):
            x = BasicBlock(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
        return x

    @staticmethod
    def output_shape(input_shape):
        h, w, _ = input_shape
        return [int(math.ceil(h / 32.0)), int(math.ceil(w / 32.0)), 512]


class ResNet50Conv(nn.Module):
    """ResNet-50 trunk (reference ``ResNet50ConvFiLM`` family,
    base_nets.py:846; also the MCR pretrained encoder's architecture)."""

    input_coord_conv: bool = False
    pretrained: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_resnet_plan((3, 4, 6, 3))):
            x = Bottleneck(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
        return x

    @staticmethod
    def output_shape(input_shape):
        h, w, _ = input_shape
        return [int(math.ceil(h / 32.0)), int(math.ceil(w / 32.0)), 2048]


class ResNet34ConvFiLM(nn.Module):
    """ResNet-34 with FiLM after every block (reference base_nets.py:748)."""

    lang_emb_dim: int = 768
    input_coord_conv: bool = False
    pretrained: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, lang_emb, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_RESNET34_PLAN):
            x = BasicBlock(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
            x = FiLMLayer(channels=feat, name=f"film{i}")(x, lang_emb)
        return x

    @staticmethod
    def output_shape(input_shape):
        return ResNet34Conv.output_shape(input_shape)


class ResNet50ConvFiLM(nn.Module):
    """ResNet-50 with FiLM after every bottleneck (reference base_nets.py:846)."""

    lang_emb_dim: int = 768
    input_coord_conv: bool = False
    pretrained: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, lang_emb, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_resnet_plan((3, 4, 6, 3))):
            x = Bottleneck(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
            x = FiLMLayer(channels=feat * 4, name=f"film{i}")(x, lang_emb)
        return x

    @staticmethod
    def output_shape(input_shape):
        return ResNet50Conv.output_shape(input_shape)


class ResNet18ConvFiLMCrossAttn(nn.Module):
    """ResNet-18 trunk with FiLM + a cross-attention conditioning stage:
    spatial features attend to the language embedding (reference
    ``base_nets.py:944`` cross-attention FiLM variant)."""

    lang_emb_dim: int = 768
    input_coord_conv: bool = False
    pretrained: bool = False
    num_heads: int = 8
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, lang_emb, train=False):
        x = _ResNet18Stem(coord_conv=self.input_coord_conv, norm=self.norm, name="stem")(x, train=train)
        for i, (feat, stride) in enumerate(_RESNET18_PLAN):
            x = BasicBlock(features=feat, stride=stride, norm=self.norm, name=f"block{i}")(
                x, train=train
            )
            x = FiLMLayer(channels=feat, name=f"film{i}")(x, lang_emb)
        # cross-attention: spatial tokens (queries) attend to the language
        # embedding (single key/value token)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        lang_kv = nn.Dense(c, name="lang_kv")(lang_emb)[:, None, :]  # [B,1,C]
        q = nn.Dense(c, name="q")(tokens)
        k = nn.Dense(c, name="k")(lang_kv)
        v = nn.Dense(c, name="v")(lang_kv)
        att = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c), axis=-1
        )
        attended = jnp.einsum("bqk,bkc->bqc", att, v)
        tokens = tokens + nn.Dense(c, name="attn_out")(attended)
        return tokens.reshape(b, h, w, c)

    @staticmethod
    def output_shape(input_shape):
        return ResNet18Conv.output_shape(input_shape)


_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def r3m_preprocess(x):
    """The reference R3M input pipeline (``base_nets.py:1136-1141``):
    Resize(shortest side -> 256, bilinear) -> CenterCrop(224) -> ImageNet
    normalize. ``x``: [..., H, W, 3] float in [0, 1] (NHWC)."""
    *lead, h, w, c = x.shape
    # torchvision Resize(int): shortest side -> 256, long side truncated
    if h <= w:
        nh, nw = 256, int(256 * w / h)
    else:
        nh, nw = int(256 * h / w), 256
    x = jax.image.resize(x, (*lead, nh, nw, c), method="bilinear")
    top = int(round((nh - 224) / 2.0))
    left = int(round((nw - 224) / 2.0))
    x = x[..., top : top + 224, left : left + 224, :]
    mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(_IMAGENET_STD, x.dtype)
    return (x - mean) / std


class R3MConv(nn.Module):
    """Frozen R3M visual encoder (reference ``base_nets.py:1091-1186``):
    R3M preprocess + ResNet trunk + global average pool, output [B, 1, 1, D]
    (NHWC twin of the reference's [B, D, 1, 1]).

    The R3M weights are an external torch artifact. Load a converted trunk
    with :func:`robot_manipulation_vq_vae_tpu.utils.ckpt_conversion.\
convert_r3m_trunk` (or point ``RMVQ_R3M_FEATURES`` at a converted ``.npz``
    and use :func:`load_r3m_variables`), then merge the returned variables
    into this module's ``trunk`` collection. With ``freeze=True`` (the
    reference default) the trunk runs in eval mode and gradients are stopped,
    so the weights never move even when embedded in a trained policy."""

    r3m_model_class: str = "resnet18"
    freeze: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        trunk_cls = {
            "resnet18": ResNet18Conv,
            "resnet34": ResNet34Conv,
            "resnet50": ResNet50Conv,
        }[self.r3m_model_class]
        x = r3m_preprocess(x)
        feats = trunk_cls(name="trunk")(
            x, train=False if self.freeze else train
        )
        pooled = jnp.mean(feats, axis=(-3, -2), keepdims=True)  # avgpool
        if self.freeze:
            pooled = jax.lax.stop_gradient(pooled)
        return pooled

    def output_shape(self, input_shape=None):
        out_dim = 2048 if self.r3m_model_class == "resnet50" else 512
        return [1, 1, out_dim]


def load_r3m_variables(path=None, model_class="resnet18"):
    """Load converted R3M trunk variables for :class:`R3MConv`.

    ``path`` (or ``$RMVQ_R3M_FEATURES``) names either a ``.npz`` produced by
    saving the output of ``ckpt_conversion.convert_r3m_trunk`` flat, or a
    torch ``.pth`` R3M state dict (converted on the fly, torch required).
    Returns ``{"params": {"trunk": ...}, "batch_stats": {"trunk": ...}}``
    ready to merge into the enclosing model's variables."""
    import os

    path = path or os.environ.get("RMVQ_R3M_FEATURES")
    if not path:
        raise RuntimeError(
            "R3M trunk artifact not found: pass path= or set "
            "RMVQ_R3M_FEATURES to a converted .npz / torch .pth state dict"
        )
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_r3m_trunk,
        unflatten_npz,
    )

    if path.endswith(".npz"):
        import numpy as _np

        return unflatten_npz(dict(_np.load(path)))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_r3m_trunk(sd, model_class=model_class)


class ViTBlock(nn.Module):
    """Pre-LN transformer encoder block (timm/MAE layout: norm1 -> qkv
    attention -> proj; norm2 -> fc1 -> GELU -> fc2)."""

    embed_dim: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.num_heads,
                                        d // self.num_heads), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        att = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d // self.num_heads),
            axis=-1,
        )
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, name="proj")(out)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * d, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(d, name="fc2")(h)


class VisionTransformer(nn.Module):
    """MAE-style ViT encoder trunk (patch embed + cls token + learned pos
    embed + pre-LN blocks + final norm), returning the normed CLS feature.
    Input [..., H, W, 3] NHWC; H == W == img_size."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    img_size: int = 224

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)  # [B, N, D]
        n = x.shape[1]
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n + 1, self.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)), x],
                            axis=1) + pos
        for i in range(self.depth):
            x = ViTBlock(
                embed_dim=self.embed_dim, num_heads=self.num_heads,
                name=f"block{i}",
            )(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 0]


_MVP_VARIANTS = {
    # model_class -> (embed_dim, depth, heads, img_size, patch_size)
    "vits-mae-hoi": (384, 12, 6, 224, 16),
    "vits-mae-in": (384, 12, 6, 224, 16),
    "vits-sup-in": (384, 12, 6, 224, 16),
    "vitb-mae-egosoup": (768, 12, 12, 224, 16),
    "vitl-256-mae-egosoup": (1024, 24, 16, 256, 16),
}


class MVPConv(nn.Module):
    """Frozen MVP (masked visual pretraining) ViT encoder (reference
    ``base_nets.py:1187-1272``): Resize(224|256) -> ViT trunk -> CLS
    feature [B, D]. Load converted MAE/timm-layout weights with
    ``ckpt_conversion.convert_mvp_vit`` into the ``trunk`` collection;
    ``freeze=True`` (reference default) stops gradients."""

    mvp_model_class: str = "vitb-mae-egosoup"
    freeze: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        dim, depth, heads, img_size, patch = (
            _MVP_VARIANTS[self.mvp_model_class]
        )
        *lead, h, w, c = x.shape
        if (h, w) != (img_size, img_size):
            # reference preprocess is Resize only (no normalization)
            x = jax.image.resize(
                x, (*lead, img_size, img_size, c), method="bilinear"
            )
        feats = VisionTransformer(
            embed_dim=dim, depth=depth, num_heads=heads,
            img_size=img_size, patch_size=patch, name="trunk",
        )(x)
        if self.freeze:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def output_shape(self, input_shape=None):
        return [_MVP_VARIANTS[self.mvp_model_class][0]]


def add_coord_channels(x):
    """CoordConv: append normalized x/y coordinate channels
    (reference ``CoordConv2d`` base_nets.py:1287)."""
    *lead, h, w, c = x.shape
    ys = jnp.linspace(-1.0, 1.0, h)[:, None]
    xs = jnp.linspace(-1.0, 1.0, w)[None, :]
    yy = jnp.broadcast_to(ys, (h, w))[..., None]
    xx = jnp.broadcast_to(xs, (h, w))[..., None]
    coords = jnp.concatenate([yy, xx], axis=-1)
    coords = jnp.broadcast_to(coords, tuple(lead) + (h, w, 2))
    return jnp.concatenate([x, coords.astype(x.dtype)], axis=-1)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

class SpatialSoftmax(nn.Module):
    """Spatial-softmax keypoint pooling (reference ``SpatialSoftmax``
    base_nets.py:1510-1640). Input [B, H, W, C] -> keypoints [B, K, 2]."""

    input_shape: Tuple[int, int, int]  # (H, W, C)
    num_kp: Optional[int] = 32
    temperature: float = 1.0
    learnable_temperature: bool = False
    output_variance: bool = False
    noise_std: float = 0.0

    @nn.compact
    def __call__(self, feature, train=False):
        h, w, c = self.input_shape
        num_kp = self.num_kp if self.num_kp is not None else c
        if self.num_kp is not None:
            feature = nn.Conv(self.num_kp, (1, 1), name="kp_conv")(feature)

        if self.learnable_temperature:
            temperature = self.param(
                "temperature", nn.initializers.constant(self.temperature), (1,)
            )
        else:
            temperature = self.temperature

        b = feature.shape[0]
        # [B, H, W, K] -> [B, K, H*W] (h-major flattening matches the
        # reference's [B, K, H, W] reshape)
        att_in = feature.transpose(0, 3, 1, 2).reshape(b * num_kp, h * w)
        attention = jax.nn.softmax(att_in / temperature, axis=-1)

        pos_x, pos_y = np.meshgrid(
            np.linspace(-1.0, 1.0, w), np.linspace(-1.0, 1.0, h)
        )
        pos_x = jnp.asarray(pos_x.reshape(1, h * w), jnp.float32)
        pos_y = jnp.asarray(pos_y.reshape(1, h * w), jnp.float32)

        expected_x = jnp.sum(pos_x * attention, axis=1, keepdims=True)
        expected_y = jnp.sum(pos_y * attention, axis=1, keepdims=True)
        keypoints = jnp.concatenate([expected_x, expected_y], axis=1)
        keypoints = keypoints.reshape(b, num_kp, 2)

        if train and self.noise_std > 0:
            noise = self.noise_std * jax.random.normal(
                self.make_rng("dropout"), keypoints.shape
            )
            keypoints = keypoints + noise

        if self.output_variance:
            exx = jnp.sum(pos_x * pos_x * attention, axis=1, keepdims=True)
            eyy = jnp.sum(pos_y * pos_y * attention, axis=1, keepdims=True)
            exy = jnp.sum(pos_x * pos_y * attention, axis=1, keepdims=True)
            var_x = exx - expected_x**2
            var_y = eyy - expected_y**2
            var_xy = exy - expected_x * expected_y
            cov = jnp.concatenate([var_x, var_xy, var_xy, var_y], axis=1)
            cov = cov.reshape(b, num_kp, 2, 2)
            return keypoints, cov
        return keypoints

    @staticmethod
    def static_output_shape(input_shape, num_kp=32):
        c = input_shape[-1]
        return [num_kp if num_kp is not None else c, 2]


class SpatialMeanPool(nn.Module):
    """Mean over spatial dims: [B, H, W, C] -> [B, C]."""

    @nn.compact
    def __call__(self, x, train=False):
        return jnp.mean(x, axis=(-3, -2))

    @staticmethod
    def static_output_shape(input_shape):
        return [input_shape[-1]]


# ---------------------------------------------------------------------------
# Recurrent base (for RNN policy variants)
# ---------------------------------------------------------------------------

class TorchLSTMCell(nn.RNNCellBase):
    """LSTM cell with torch ``nn.LSTM``'s redundant double-bias
    parametrization: biases on BOTH the input and hidden gate projections
    (b_ih and b_hh). Forward-identical to ``nn.OptimizedLSTMCell`` (the
    two biases just add), but adaptive-optimizer trajectories from
    converted torch checkpoints match exactly — a fused single bias sees
    half the effective Adam step of torch's two redundantly-updated
    halves (verified by tests/test_hbc_parity.py)."""

    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        c, h = carry

        def dense_i(name):
            return nn.Dense(self.features, use_bias=True, name=name)

        def dense_h(name):
            return nn.Dense(
                self.features, use_bias=True,
                kernel_init=nn.initializers.orthogonal(), name=name,
            )

        i = nn.sigmoid(dense_i("ii")(inputs) + dense_h("hi")(h))
        f = nn.sigmoid(dense_i("if")(inputs) + dense_h("hf")(h))
        g = nn.tanh(dense_i("ig")(inputs) + dense_h("hg")(h))
        o = nn.sigmoid(dense_i("io")(inputs) + dense_h("ho")(h))
        new_c = f * c + i * g
        new_h = o * nn.tanh(new_c)
        return (new_c, new_h), new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        mem_shape = input_shape[:-1] + (self.features,)
        return (jnp.zeros(mem_shape), jnp.zeros(mem_shape))

    @property
    def num_feature_axes(self):
        return 1


class RNNBase(nn.Module):
    """Multi-layer LSTM/GRU over [B, T, D] sequences (reference ``RNN_Base``
    base_nets.py:348). Implemented with nn.RNN (lax.scan under jit)."""

    hidden_dim: int
    num_layers: int = 2
    rnn_type: str = "LSTM"  # LSTM or GRU

    @nn.compact
    def __call__(self, x, initial_state=None):
        cell_cls = TorchLSTMCell if self.rnn_type == "LSTM" else nn.GRUCell
        carries = []
        for i in range(self.num_layers):
            cell = cell_cls(features=self.hidden_dim, name=f"{self.rnn_type.lower()}{i}")
            rnn = nn.RNN(cell, return_carry=True, name=f"rnn{i}")
            init_i = None if initial_state is None else initial_state[i]
            if init_i is not None:
                carry, x = rnn(x, initial_carry=init_i)
            else:
                carry, x = rnn(x)
            carries.append(carry)
        return x, carries

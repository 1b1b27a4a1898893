"""Encoder cores (VisualCore / VisualCoreLanguageConditioned / ScanCore) and
observation randomizers (Crop / Color / GaussianNoise).

Functional re-design of ``robomimic/models/obs_core.py``. Cores are Flax
modules; randomizers are parameter-free callables that take an explicit rng
(so the whole obs encoder stays a pure function under jit). Image layout is
channels-last ([..., H, W, C]) throughout.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils.initializers import (
    torch_linear_kernel_init,
)

_POOL_CLASSES = {
    "SpatialSoftmax": BaseNets.SpatialSoftmax,
    "SpatialMeanPool": BaseNets.SpatialMeanPool,
}

_BACKBONE_CLASSES = {
    "ShallowConv": BaseNets.ShallowConv,
    "ResNet18Conv": BaseNets.ResNet18Conv,
    "ResNet18ConvFiLM": BaseNets.ResNet18ConvFiLM,
    "ResNet34Conv": BaseNets.ResNet34Conv,
    "ResNet34ConvFiLM": BaseNets.ResNet34ConvFiLM,
    "ResNet50Conv": BaseNets.ResNet50Conv,
    "ResNet50ConvFiLM": BaseNets.ResNet50ConvFiLM,
    "ResNet18ConvFiLMCrossAttn": BaseNets.ResNet18ConvFiLMCrossAttn,
    "R3MConv": BaseNets.R3MConv,
    "MVPConv": BaseNets.MVPConv,
}

_FILM_BACKBONES = {
    "ResNet18ConvFiLM", "ResNet34ConvFiLM", "ResNet50ConvFiLM",
    "ResNet18ConvFiLMCrossAttn",
}


def _filter_kwargs(cls, kwargs):
    """Keep only kwargs that the (dataclass) module accepts - mirrors
    ``extract_class_init_kwargs_from_dict`` in the reference."""
    fields = {f.name for f in cls.__dataclass_fields__.values()} if hasattr(
        cls, "__dataclass_fields__"
    ) else set()
    return {k: v for k, v in kwargs.items() if k in fields}


@ObsUtils.register_encoder_core
class VisualCore(nn.Module):
    """Backbone -> pool -> flatten -> linear (reference obs_core.py:61-184).

    input_shape is (H, W, C); output is [feature_dimension] when set.
    """

    input_shape: Tuple[int, ...]
    backbone_class: str = "ResNet18Conv"
    pool_class: Optional[str] = "SpatialSoftmax"
    backbone_kwargs: Any = None
    pool_kwargs: Any = None
    flatten: bool = True
    feature_dimension: Optional[int] = 64

    @property
    def language_conditioned(self):
        return False

    def _backbone_and_pool(self, x, lang_emb=None, train=False):
        bcls = _BACKBONE_CLASSES[self.backbone_class]
        bkw = _filter_kwargs(bcls, dict(self.backbone_kwargs or {}))
        backbone = bcls(**bkw, name="backbone")
        if self.backbone_class in _FILM_BACKBONES:
            assert lang_emb is not None, (
                f"{self.backbone_class} requires lang_emb"
            )
            x = backbone(x, lang_emb, train=train)
        else:
            x = backbone(x, train=train)
        # instance call: R3MConv's output dim depends on r3m_model_class
        feat_shape = backbone.output_shape(self.input_shape)

        if self.pool_class is not None:
            pcls = _POOL_CLASSES[self.pool_class]
            pkw = _filter_kwargs(pcls, dict(self.pool_kwargs or {}))
            pkw["input_shape"] = tuple(feat_shape)
            x = pcls(**pkw, name="pool")(x, train=train)
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        if self.feature_dimension is not None:
            assert self.flatten
            x = nn.Dense(
                self.feature_dimension,
                kernel_init=torch_linear_kernel_init,
                name="proj",
            )(x)
        return x

    @nn.compact
    def __call__(self, x, train=False):
        return self._backbone_and_pool(x, train=train)

    def output_shape(self, input_shape=None):
        input_shape = input_shape or self.input_shape
        if self.feature_dimension is not None:
            return [self.feature_dimension]
        bcls = _BACKBONE_CLASSES[self.backbone_class]
        bkw = _filter_kwargs(bcls, dict(self.backbone_kwargs or {}))
        feat_shape = bcls(**bkw).output_shape(input_shape)
        if self.pool_class is not None:
            num_kp = (self.pool_kwargs or {}).get("num_kp", 32)
            if self.pool_class == "SpatialSoftmax":
                feat_shape = BaseNets.SpatialSoftmax.static_output_shape(
                    feat_shape, num_kp
                )
            else:
                feat_shape = BaseNets.SpatialMeanPool.static_output_shape(feat_shape)
        if self.flatten:
            return [int(np.prod(feat_shape))]
        return feat_shape


@ObsUtils.register_encoder_core
class VisualCoreLanguageConditioned(VisualCore):
    """VisualCore whose backbone receives a language embedding for FiLM
    conditioning (reference obs_core.py:186-310)."""

    backbone_class: str = "ResNet18ConvFiLM"

    @property
    def language_conditioned(self):
        return True

    @nn.compact
    def __call__(self, x, lang_emb=None, train=False):
        return self._backbone_and_pool(x, lang_emb=lang_emb, train=train)


@ObsUtils.register_encoder_core
class ScanCore(nn.Module):
    """Conv1D backbone -> optional pool -> flatten -> linear
    (reference obs_core.py:317-440). Input [B, C(=1), L] conventions in the
    reference become [B, L, 1] channels-last here."""

    input_shape: Tuple[int, ...]
    conv_kwargs: Any = None
    conv_activation: str = "relu"
    pool_class: Optional[str] = None
    pool_kwargs: Any = None
    flatten: bool = True
    feature_dimension: Optional[int] = None

    # default conv ladder (matches reference Conv1dBase defaults)
    _DEFAULT_CHANNELS = (32, 64, 64)
    _DEFAULT_KERNELS = (8, 4, 2)
    _DEFAULT_STRIDES = (4, 2, 1)

    @property
    def language_conditioned(self):
        return False

    def _plan(self):
        kw = dict(self.conv_kwargs or {})
        return (
            kw.get("out_channels", self._DEFAULT_CHANNELS),
            kw.get("kernel_size", self._DEFAULT_KERNELS),
            kw.get("stride", self._DEFAULT_STRIDES),
        )

    @nn.compact
    def __call__(self, x, train=False):
        # accept [B, L] or [B, L, 1] or reference-style [B, 1, L]
        if x.ndim == 2:
            x = x[..., None]
        elif x.shape[-2] == 1 and x.shape[-1] != 1:
            x = jnp.swapaxes(x, -1, -2)
        chans, kernels, strides = self._plan()
        for i, (c, k, s) in enumerate(zip(chans, kernels, strides)):
            x = nn.Conv(c, (k,), strides=(s,), padding="VALID", name=f"conv{i}")(x)
            if self.conv_activation == "relu":
                x = nn.relu(x)
        if self.flatten:
            x = x.reshape(x.shape[0], -1)
        if self.feature_dimension is not None:
            x = nn.Dense(
                self.feature_dimension,
                kernel_init=torch_linear_kernel_init,
                name="proj",
            )(x)
        return x

    def output_shape(self, input_shape=None):
        input_shape = input_shape or self.input_shape
        length = input_shape[-1] if input_shape[0] == 1 else input_shape[0]
        chans, kernels, strides = self._plan()
        for k, s in zip(kernels, strides):
            length = (length - k) // s + 1
        if self.feature_dimension is not None:
            return [self.feature_dimension]
        if self.flatten:
            return [int(length * chans[-1])]
        return [length, chans[-1]]


# ---------------------------------------------------------------------------
# randomizers: pure functions of (x, rng, train)
# ---------------------------------------------------------------------------

class Randomizer:
    """Parameter-free augmentation applied around the encoder core
    (reference obs_core.py:443-562): ``forward_in`` before the core (may
    expand batch B -> B*N), ``forward_out`` after (pools back to B)."""

    def output_shape_in(self, input_shape):
        return list(input_shape)

    def output_shape_out(self, input_shape):
        return list(input_shape)

    def forward_in(self, x, rng=None, train=False):
        return x

    def forward_out(self, x):
        return x


def random_crop_hwc(rng, images, crop_h, crop_w, num_crops=1):
    """Sample @num_crops random crops per image. images [B, H, W, C] ->
    [B, N, crop_h, crop_w, C]. Offsets via jax.random; gathers via
    vmapped dynamic_slice (static sizes - jit friendly)."""
    b, h, w, c = images.shape
    rh, rw = jax.random.split(rng)
    hy = jax.random.randint(rh, (b, num_crops), 0, h - crop_h + 1)
    wx = jax.random.randint(rw, (b, num_crops), 0, w - crop_w + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (crop_h, crop_w, c))

    crop_n = jax.vmap(crop_one, in_axes=(None, 0, 0))      # over N
    return jax.vmap(crop_n, in_axes=(0, 0, 0))(images, hy, wx)  # over B


class CropRandomizer(Randomizer):
    """Random crops at train / center crop at eval, mean-pool features
    (reference ``CropRandomizer`` obs_core.py:565-702). input_shape (H, W, C)."""

    def __init__(self, input_shape, crop_height=76, crop_width=76, num_crops=1,
                 pos_enc=False):
        assert len(input_shape) == 3
        assert crop_height < input_shape[0] and crop_width < input_shape[1]
        assert not pos_enc, "pos_enc not supported yet"
        self.input_shape = tuple(input_shape)
        self.crop_height = crop_height
        self.crop_width = crop_width
        self.num_crops = num_crops
        self.pos_enc = pos_enc

    def output_shape_in(self, input_shape=None):
        c = self.input_shape[2]
        return [self.crop_height, self.crop_width, c]

    def forward_in(self, x, rng=None, train=False):
        if train:
            assert rng is not None, "CropRandomizer needs an rng at train time"
            out = random_crop_hwc(
                rng, x, self.crop_height, self.crop_width, self.num_crops
            )
            return out.reshape((-1,) + out.shape[2:])  # [B*N, th, tw, C]
        ch = (x.shape[-3] - self.crop_height) // 2
        cw = (x.shape[-2] - self.crop_width) // 2
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(x, ch, ch + self.crop_height, axis=-3),
            cw, cw + self.crop_width, axis=-2,
        )

    def forward_out(self, x):
        if x.shape[0] % self.num_crops != 0:
            return x
        b = x.shape[0] // self.num_crops
        return x.reshape((b, self.num_crops) + x.shape[1:]).mean(axis=1)


def rgb_to_hsv(rgb):
    """[..., 3] in [0, 1] -> HSV (colorsys semantics, branch-free)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rangec = maxc - minc
    safe_max = jnp.where(maxc > 0, maxc, 1.0)
    s = jnp.where(maxc > 0, rangec / safe_max, 0.0)
    safe_range = jnp.where(rangec > 0, rangec, 1.0)
    rc = (maxc - r) / safe_range
    gc = (maxc - g) / safe_range
    bc = (maxc - b) / safe_range
    h = jnp.where(
        r == maxc, bc - gc,
        jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(rangec > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """HSV [..., 3] -> RGB in [0, 1] (colorsys semantics, branch-free)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, factor):
    """Shift hue by @factor turns (torchvision ``adjust_hue`` semantics:
    factor in [-0.5, 0.5], wraps mod 1)."""
    hsv = rgb_to_hsv(x)
    h = (hsv[..., 0:1] + factor) % 1.0
    return hsv_to_rgb(jnp.concatenate([h, hsv[..., 1:]], axis=-1))


class ColorRandomizer(Randomizer):
    """Brightness/contrast/saturation/hue jitter (reference
    obs_core.py:705-860, i.e. torchvision ColorJitter semantics): hue is an
    exact HSV roundtrip, and the enabled jitters apply in a fresh random
    order per call (``lax.switch`` over the order permutations)."""

    def __init__(self, input_shape, brightness=0.3, contrast=0.3, saturation=0.3,
                 hue=0.3, num_samples=1):
        self.input_shape = tuple(input_shape)
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.num_samples = num_samples

    def forward_in(self, x, rng=None, train=False):
        if not train:
            return x
        assert rng is not None
        import itertools

        b = x.shape[0]
        n = self.num_samples
        x = jnp.repeat(x, n, axis=0)
        rb, rc, rs, rh, r_order = jax.random.split(rng, 5)
        shape = (b * n,) + (1,) * (x.ndim - 1)

        transforms = []
        if self.brightness > 0:
            fb = jax.random.uniform(
                rb, shape, minval=max(0, 1 - self.brightness),
                maxval=1 + self.brightness,
            )
            transforms.append(lambda im: im * fb)
        if self.contrast > 0:
            fc = jax.random.uniform(
                rc, shape, minval=max(0, 1 - self.contrast),
                maxval=1 + self.contrast,
            )

            def _contrast(im):
                mean = jnp.mean(im, axis=(-3, -2, -1), keepdims=True)
                return mean + (im - mean) * fc

            transforms.append(_contrast)
        if self.saturation > 0:
            fs = jax.random.uniform(
                rs, shape, minval=max(0, 1 - self.saturation),
                maxval=1 + self.saturation,
            )

            def _saturation(im):
                gray = jnp.mean(im, axis=-1, keepdims=True)
                return gray + (im - gray) * fs

            transforms.append(_saturation)
        if self.hue > 0:
            fh = jax.random.uniform(
                rh, shape, minval=-self.hue, maxval=self.hue
            )
            transforms.append(
                lambda im: adjust_hue(jnp.clip(im, 0.0, 1.0), fh)
            )

        if not transforms:
            return x
        if len(transforms) == 1:
            return jnp.clip(transforms[0](x), 0.0, 1.0)

        # random application order per call (ColorJitter.get_params)
        perms = list(itertools.permutations(range(len(transforms))))

        def apply_in_order(perm):
            def f(im):
                for i in perm:
                    im = transforms[i](im)
                return im

            return f

        branches = [apply_in_order(p) for p in perms]
        which = jax.random.randint(r_order, (), 0, len(branches))
        x = jax.lax.switch(which, branches, x)
        return jnp.clip(x, 0.0, 1.0)

    def forward_out(self, x):
        if x.shape[0] % self.num_samples != 0:
            return x
        b = x.shape[0] // self.num_samples
        return x.reshape((b, self.num_samples) + x.shape[1:]).mean(axis=1)


class GaussianNoiseRandomizer(Randomizer):
    """Additive gaussian noise (reference obs_core.py:863-954).

    NOTE the reference actually samples *uniform* noise via ``torch.rand``
    despite its name (obs_core.py:916); we implement true gaussian noise and
    document the divergence (the uniform draw is plainly a bug upstream).
    """

    def __init__(self, input_shape, noise_mean=0.0, noise_std=0.3, limits=None,
                 num_samples=1):
        self.input_shape = tuple(input_shape)
        self.noise_mean = noise_mean
        self.noise_std = noise_std
        self.limits = limits
        self.num_samples = num_samples

    def forward_in(self, x, rng=None, train=False):
        if not train:
            return x
        assert rng is not None
        x = jnp.repeat(x, self.num_samples, axis=0)
        noise = self.noise_std * jax.random.normal(rng, x.shape) + self.noise_mean
        x = x + noise
        if self.limits is not None:
            x = jnp.clip(x, self.limits[0], self.limits[1])
        return x

    def forward_out(self, x):
        if x.shape[0] % self.num_samples != 0:
            return x
        b = x.shape[0] // self.num_samples
        return x.reshape((b, self.num_samples) + x.shape[1:]).mean(axis=1)


# register randomizers
ObsUtils.register_randomizer(CropRandomizer)
ObsUtils.register_randomizer(ColorRandomizer)
ObsUtils.register_randomizer(GaussianNoiseRandomizer)

"""Observation encoder/decoder stacks and the MIMO / ICL transformer
assemblies.

Re-design of ``robomimic/models/obs_nets.py`` as spec-driven Flax modules:
the per-key encoder cores and randomizers are built from the same
config-shaped dicts the reference uses (``observation.encoder.*``), but the
whole stack is a pure function - randomizer RNGs are threaded explicitly
('randomizer' stream), BatchNorm state lives in 'batch_stats', VQ codebooks
in 'vq', and the tokenizer side-losses are *returned* instead of cached on
the module (the reference stashes ``self._vq_vae_loss`` as a side channel,
``obs_nets.py:1338-1339``).

Image layout is channels-last ([..., H, W, C]) throughout.
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.models import base_nets as BaseNets
from robot_manipulation_vq_vae_tpu.models import obs_core as ObsCore
from robot_manipulation_vq_vae_tpu.models.transformers import (
    GPT_Backbone,
    sinusoidal_positional_encoding,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.lipvq import LipVQVAE
from robot_manipulation_vq_vae_tpu.models.tokenizers.bin_action import (
    AdaptiveBinActionEmbedding,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.ln_act import (
    LNActEncoder,
    MambaBlock,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.default_encoder import (
    DefaultActionEncoder,
)
from robot_manipulation_vq_vae_tpu.models.tokenizers.fast import FastProjection
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils import tensor_utils as TensorUtils
from robot_manipulation_vq_vae_tpu.utils.initializers import (
    gpt_init,
    torch_linear_kernel_init,
)

LANG_EMB_KEY = ObsUtils.LANG_EMB_KEY


def _freeze_spec(obs_shapes):
    """dict -> tuple of (key, shape) pairs so it can live on a Flax dataclass."""
    if isinstance(obs_shapes, (tuple, list)):
        return tuple((k, tuple(s)) for k, s in obs_shapes)
    return tuple((k, tuple(s)) for k, s in obs_shapes.items())


def _spec_dict(spec):
    return {k: tuple(s) for k, s in spec}


# ---------------------------------------------------------------------------
# pure shape math (free functions: flax wraps Module methods, so modules must
# never be constructed inside them)
# ---------------------------------------------------------------------------

def _key_encoder_config(key, encoder_kwargs):
    modality = ObsUtils.OBS_KEYS_TO_MODALITIES[key]
    if encoder_kwargs is not None and modality in encoder_kwargs:
        return dict(encoder_kwargs[modality])
    if ObsUtils.DEFAULT_ENCODER_KWARGS is not None:
        return dict(ObsUtils.DEFAULT_ENCODER_KWARGS.get(modality, {}))
    return {}


def _build_randomizers_from_config(cfg, shape):
    cls_list = cfg.get("obs_randomizer_class") or None
    kw_list = cfg.get("obs_randomizer_kwargs") or {}
    if not isinstance(cls_list, (list, tuple)):
        cls_list = [cls_list]
    if not isinstance(kw_list, (list, tuple)):
        kw_list = [kw_list]
    rands = []
    for cls_name, kw in zip(cls_list, kw_list):
        if cls_name is None:
            rands.append(None)
            continue
        kw = dict(kw or {})
        kw["input_shape"] = tuple(shape)
        rands.append(ObsUtils.OBS_RANDOMIZERS[cls_name](**kw))
    return rands


def _core_output_shape(core_class, core_kwargs, input_shape):
    """Output shape of an encoder core, computed without constructing it."""
    core_kwargs = dict(core_kwargs or {})
    if core_class is None:
        return list(input_shape)
    if core_class in ("VisualCore", "VisualCoreLanguageConditioned"):
        fd = core_kwargs.get("feature_dimension", 64)
        if fd is not None:
            return [fd]
        backbone = core_kwargs.get("backbone_class", "ResNet18Conv")
        bcls = ObsCore._BACKBONE_CLASSES.get(backbone, BaseNets.ResNet18Conv)
        try:
            feat = bcls.output_shape(input_shape)  # staticmethod backbones
        except TypeError:
            # instance-method backbones (ShallowConv, R3MConv, MVPConv):
            # construct cheaply (parent=None suppresses flax parent capture)
            bkw = ObsCore._filter_kwargs(
                bcls, dict(core_kwargs.get("backbone_kwargs") or {})
            )
            feat = bcls(**bkw, parent=None).output_shape(input_shape)
        pool_class = core_kwargs.get("pool_class", "SpatialSoftmax")
        if pool_class == "SpatialSoftmax":
            num_kp = (core_kwargs.get("pool_kwargs") or {}).get("num_kp", 32)
            feat = BaseNets.SpatialSoftmax.static_output_shape(feat, num_kp)
        elif pool_class == "SpatialMeanPool":
            feat = BaseNets.SpatialMeanPool.static_output_shape(feat)
        if core_kwargs.get("flatten", True):
            return [int(np.prod(feat))]
        return feat
    if core_class == "ScanCore":
        conv_kw = dict(core_kwargs.get("conv_kwargs") or {})
        chans = conv_kw.get("out_channels", ObsCore.ScanCore._DEFAULT_CHANNELS)
        kernels = conv_kw.get("kernel_size", ObsCore.ScanCore._DEFAULT_KERNELS)
        strides = conv_kw.get("stride", ObsCore.ScanCore._DEFAULT_STRIDES)
        length = input_shape[-1] if input_shape[0] == 1 else input_shape[0]
        for k, s in zip(kernels, strides):
            length = (length - k) // s + 1
        fd = core_kwargs.get("feature_dimension")
        if fd is not None:
            return [fd]
        if core_kwargs.get("flatten", True):
            return [int(length * chans[-1])]
        return [length, chans[-1]]
    # custom registered cores (reference extension API, examples/
    # add_new_modality.py): construct the module (cheap - flax dataclass)
    # and ask it for its output shape
    if core_class in ObsUtils.OBS_ENCODER_CORES:
        cls = ObsUtils.OBS_ENCODER_CORES[core_class]
        kwargs = {
            k: v
            for k, v in core_kwargs.items()
            if k in {f.name for f in cls.__dataclass_fields__.values()}
        }
        kwargs["input_shape"] = tuple(input_shape)
        # parent=None: suppress flax's implicit parent capture, since this
        # may run inside another module's method (ObservationEncoder.output_shape)
        return list(cls(**kwargs, parent=None).output_shape(input_shape))
    raise ValueError(f"unknown core class {core_class}")


def encoder_output_dim(obs_shapes, encoder_kwargs=None):
    """Flat feature dim of an ObservationEncoder over @obs_shapes."""
    feat_dim = 0
    for key, shape in _freeze_spec(obs_shapes):
        cfg = _key_encoder_config(key, encoder_kwargs)
        cur = list(shape)
        rands = _build_randomizers_from_config(cfg, shape)
        for rand in rands:
            if rand is not None:
                cur = rand.output_shape_in(cur)
        cur = _core_output_shape(cfg.get("core_class"), cfg.get("core_kwargs"), cur)
        for rand in rands:
            if rand is not None:
                cur = rand.output_shape_out(cur)
        feat_dim += int(np.prod(cur))
    return feat_dim


def group_encoder_output_dim(observation_group_shapes, encoder_kwargs=None):
    return sum(
        encoder_output_dim(shapes, encoder_kwargs)
        for _, shapes in observation_group_shapes
    )


# Opt-in packed rgb encoders (`config.train.packed_rgb_encoders`): run all
# same-config per-camera FiLM-ResNet18 trunks as ONE grouped-conv pass —
# identical math, separate weights (models/packed_film.py). Process-global
# like the base_nets speed modes; set before tracing via
# set_packed_rgb_encoders (algo/algo.py pins it from the config).
_PACKED_RGB = False


def set_packed_rgb_encoders(enabled):
    global _PACKED_RGB
    _PACKED_RGB = bool(enabled)


class _PackedCoreHead(nn.Module):
    """The per-camera tail of a VisualCore (pool -> flatten -> proj) for
    the packed-trunk path. Named ``core_{key}`` so its params live at the
    SAME paths as the default path's pool/proj (only the backbone moves,
    into the shared ``packed_backbone``)."""

    pool_class: Optional[str]
    pool_kwargs: Any
    feature_dimension: Optional[int]
    feat_shape: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train=False):
        if self.pool_class is not None:
            pcls = ObsCore._POOL_CLASSES[self.pool_class]
            pkw = ObsCore._filter_kwargs(pcls, dict(self.pool_kwargs or {}))
            pkw["input_shape"] = tuple(self.feat_shape)
            x = pcls(**pkw, name="pool")(x, train=train)
        x = x.reshape(x.shape[0], -1)
        if self.feature_dimension is not None:
            x = nn.Dense(
                self.feature_dimension,
                kernel_init=torch_linear_kernel_init,
                name="proj",
            )(x)
        return x


class ObservationEncoder(nn.Module):
    """Per-key core + randomizer encoder; concatenates flat features
    (reference ``ObservationEncoder`` obs_nets.py:240-461).

    obs_shapes: ((key, shape), ...) with image shapes (H, W, C).
    encoder_kwargs: {modality: {core_class, core_kwargs,
                                obs_randomizer_class, obs_randomizer_kwargs}}.
    feature_activation: "relu" | None.
    """

    obs_shapes: Any
    encoder_kwargs: Any = None
    feature_activation: Optional[str] = "relu"

    def _key_config(self, key):
        modality = ObsUtils.OBS_KEYS_TO_MODALITIES[key]
        if self.encoder_kwargs is not None and modality in self.encoder_kwargs:
            return dict(self.encoder_kwargs[modality])
        if ObsUtils.DEFAULT_ENCODER_KWARGS is not None:
            return dict(ObsUtils.DEFAULT_ENCODER_KWARGS.get(modality, {}))
        return {}

    def _build_randomizers(self, key, shape):
        cfg = self._key_config(key)
        cls_list = cfg.get("obs_randomizer_class") or None
        kw_list = cfg.get("obs_randomizer_kwargs") or {}
        if not isinstance(cls_list, (list, tuple)):
            cls_list = [cls_list]
        if not isinstance(kw_list, (list, tuple)):
            kw_list = [kw_list]
        rands = []
        for cls_name, kw in zip(cls_list, kw_list):
            if cls_name is None:
                rands.append(None)
                continue
            kw = dict(kw or {})
            kw["input_shape"] = tuple(shape)
            rands.append(ObsUtils.OBS_RANDOMIZERS[cls_name](**kw))
        return rands

    def _core_for(self, key, shape):
        cfg = self._key_config(key)
        core_class = cfg.get("core_class")
        if core_class is None:
            return None, False
        core_kwargs = dict(cfg.get("core_kwargs") or {})
        # randomizers change the core's input shape (reference :314-321)
        in_shape = tuple(shape)
        for rand in self._build_randomizers(key, shape):
            if rand is not None:
                in_shape = tuple(rand.output_shape_in(in_shape))
        core_kwargs["input_shape"] = in_shape
        cls = ObsUtils.OBS_ENCODER_CORES[core_class]
        core_kwargs = {
            k: v
            for k, v in core_kwargs.items()
            if k in {f.name for f in cls.__dataclass_fields__.values()}
        }
        lang = core_class in ("VisualCoreLanguageConditioned",)
        return cls(**core_kwargs, name=f"core_{key}"), lang

    def _packed_rgb_keys(self, spec):
        """Keys eligible for the grouped-conv packed path: >=2 rgb keys
        sharing one shape and one FiLM-ResNet18 VisualCore config (the
        flagship's 3 cameras). Identical math — see models/packed_film.py."""
        cand = []
        sig = None
        for key, shape in spec:
            if ObsUtils.OBS_KEYS_TO_MODALITIES.get(key) != "rgb":
                continue
            cfg = self._key_config(key)
            if cfg.get("core_class") != "VisualCoreLanguageConditioned":
                return []
            ckw = dict(cfg.get("core_kwargs") or {})
            if ckw.get("backbone_class", "ResNet18ConvFiLM") != \
                    "ResNet18ConvFiLM":
                return []
            bkw = dict(ckw.get("backbone_kwargs") or {})
            if bkw.get("norm", "batch") != "batch" or bkw.get(
                    "input_coord_conv", False):
                return []
            this_sig = (tuple(shape), repr(sorted(ckw.items())),
                        repr(sorted(cfg.items())))
            if sig is None:
                sig = this_sig
            elif this_sig != sig:
                return []
            cand.append(key)
        return cand if len(cand) >= 2 else []

    def _packed_rgb_features(self, packed_keys, randomized, lang_emb,
                             train):
        """One grouped-conv trunk pass for all packed cameras, then the
        per-key pool/proj heads under their default param paths
        (``core_{key}/pool``, ``core_{key}/proj``)."""
        from robot_manipulation_vq_vae_tpu.models.packed_film import (
            PackedResNet18ConvFiLM,
        )

        cfg = self._key_config(packed_keys[0])
        ckw = dict(cfg.get("core_kwargs") or {})
        g = len(packed_keys)
        x = jnp.concatenate([randomized[k] for k in packed_keys], axis=-1)
        x = PackedResNet18ConvFiLM(groups=g, name="packed_backbone")(
            x, lang_emb, train=train
        )
        in_shape = randomized[packed_keys[0]].shape[-3:]
        feat_shape = BaseNets.ResNet18ConvFiLM.output_shape(in_shape)
        feats = {}
        for i, key in enumerate(packed_keys):
            per_cam = x[..., i * 512:(i + 1) * 512]
            feats[key] = _PackedCoreHead(
                pool_class=ckw.get("pool_class", "SpatialSoftmax"),
                pool_kwargs=ckw.get("pool_kwargs"),
                feature_dimension=ckw.get("feature_dimension", 64),
                feat_shape=tuple(feat_shape),
                name=f"core_{key}",
            )(per_cam, train=train)
        return feats

    @nn.compact
    def __call__(self, obs_dict, train=False):
        spec = _freeze_spec(self.obs_shapes)
        packed_keys = self._packed_rgb_keys(spec) if _PACKED_RGB else []

        # pass 1: randomizer forward_in for EVERY key in spec order — the
        # 'randomizer' rng draw order stays identical whether or not the
        # packed path is on (each make_rng call folds in a counter)
        randomized, rands_by_key = {}, {}
        for key, shape in spec:
            x = obs_dict[key]
            randomizers = self._build_randomizers(key, shape)
            for rand in randomizers:
                if rand is not None:
                    rng = self.make_rng("randomizer") if train else None
                    x = rand.forward_in(x, rng=rng, train=train)
            randomized[key] = x
            rands_by_key[key] = randomizers

        packed_feats = {}
        if packed_keys:
            packed_feats = self._packed_rgb_features(
                packed_keys, randomized, obs_dict[LANG_EMB_KEY], train
            )

        # pass 2: cores + forward_out, features in spec order
        feats = []
        for key, shape in spec:
            x = randomized[key]
            if key in packed_feats:
                x = packed_feats[key]
                if self.feature_activation == "relu":
                    x = nn.relu(x)
            else:
                core, lang_conditioned = self._core_for(key, shape)
                if core is not None:
                    if lang_conditioned:
                        x = core(
                            x, lang_emb=obs_dict[LANG_EMB_KEY], train=train
                        )
                    else:
                        x = core(x, train=train)
                    if self.feature_activation == "relu":
                        x = nn.relu(x)
            for rand in rands_by_key[key]:
                if rand is not None:
                    x = rand.forward_out(x)
            feats.append(x.reshape(x.shape[0], -1))
        return jnp.concatenate(feats, axis=-1)

    def output_shape(self, input_shape=None):
        return [encoder_output_dim(self.obs_shapes, self.encoder_kwargs)]


def obs_encoder_factory(obs_shapes, feature_activation="relu", encoder_kwargs=None):
    """Mirror of the reference factory (obs_nets.py:54-142)."""
    return ObservationEncoder(
        obs_shapes=_freeze_spec(obs_shapes),
        encoder_kwargs=encoder_kwargs,
        feature_activation=feature_activation,
    )


class ObservationDecoder(nn.Module):
    """Per-key linear heads from a flat feature (reference
    ``ObservationDecoder`` obs_nets.py:714-867)."""

    decode_shapes: Any  # ((key, shape), ...)
    init_scale: Any = None  # uniform(-s, s) head init (reference
    # ``init_last_fc_weight``, policy_nets.py:323-333: weights AND biases)

    @nn.compact
    def __call__(self, feats):
        out = {}
        if self.init_scale is not None:
            s = float(self.init_scale)
            kinit = binit = lambda key, shape, dtype=jnp.float32: (
                jax.random.uniform(key, shape, dtype, -s, s)
            )
        else:
            kinit, binit = torch_linear_kernel_init, None
        for key, shape in _freeze_spec(self.decode_shapes):
            kwargs = {"kernel_init": kinit, "name": f"head_{key}"}
            if binit is not None:
                kwargs["bias_init"] = binit
            flat = nn.Dense(int(np.prod(shape)), **kwargs)(feats)
            out[key] = flat.reshape(feats.shape[:-1] + tuple(shape))
        return out


class ObservationGroupEncoder(nn.Module):
    """One ObservationEncoder per observation group; concatenates group
    features (reference obs_nets.py:870-1117)."""

    observation_group_shapes: Any  # ((group, ((key, shape), ...)), ...)
    encoder_kwargs: Any = None
    feature_activation: Optional[str] = "relu"

    def setup(self):
        groups = {}
        for group, shapes in self.observation_group_shapes:
            groups[group] = ObservationEncoder(
                obs_shapes=shapes,
                encoder_kwargs=self.encoder_kwargs,
                feature_activation=self.feature_activation,
                name=f"enc_{group}",
            )
        self.group_encoders = groups

    def __call__(self, train=False, **inputs):
        outputs = []
        for group, _ in self.observation_group_shapes:
            outputs.append(self.group_encoders[group](inputs[group], train=train))
        return jnp.concatenate(outputs, axis=-1)

    def output_shape(self):
        return [
            group_encoder_output_dim(
                self.observation_group_shapes, self.encoder_kwargs
            )
        ]


def group_shapes_spec(observation_group_shapes):
    return tuple(
        (g, _freeze_spec(shapes)) for g, shapes in observation_group_shapes.items()
    )


class ICLObservationGroupEncoder(nn.Module):
    """Obs-group encoder + prompt-action tokenizer (one of four modalities).

    Reference ``ICLObservationGroupEncoder`` (obs_nets.py:1120-1385). The
    forward returns (obs, context_obs, context_actions, vq_vae_loss) - the
    loss is an explicit output, not a cached attribute. Exactly one of
    fast/bin/vq_vae/ln_act may be enabled; otherwise the spectral-norm
    default encoder is used.

    The reference hardcodes ``seq_len = 10  # FIXME`` (:1300) for the
    fast/ln_act reshape paths; here it is the ``prompt_seq_len`` field
    (default 10 to match).
    """

    observation_group_shapes: Any
    action_input_shape: int = 12  # reference hardcodes 12 (obs_nets.py:2413)
    fast_enabled: bool = False
    bin_enabled: bool = False
    vq_vae_enabled: bool = False
    ln_act_enabled: bool = False
    encoder_kwargs: Any = None
    feature_activation: Optional[str] = None
    prompt_seq_len: int = 10
    vq_num_codes: int = 1024

    def setup(self):
        groups = {}
        for group, shapes in self.observation_group_shapes:
            groups[group] = ObservationEncoder(
                obs_shapes=shapes,
                encoder_kwargs=self.encoder_kwargs,
                feature_activation=self.feature_activation,
                name=f"enc_{group}",
            )
        self.group_encoders = groups
        out_dim = group_encoder_output_dim(
            self.observation_group_shapes, self.encoder_kwargs
        )

        flags = [self.fast_enabled, self.bin_enabled, self.vq_vae_enabled,
                 self.ln_act_enabled]
        assert sum(flags) <= 1, "at most one tokenizer modality may be enabled"

        if self.fast_enabled:
            # host-side FAST+CLIP encode happens outside; device gets latents
            self.action_network = FastProjection(output_dim=out_dim)
        elif self.bin_enabled:
            self.action_network = AdaptiveBinActionEmbedding(
                action_dim=self.action_input_shape, output_dim=out_dim
            )
        elif self.vq_vae_enabled:
            # the main LipVQ-VAE action tokenizer of the paper (:1225-1229)
            self.action_network = LipVQVAE(
                feature_dim=self.action_input_shape,
                latent_dim=out_dim,
                num_codes=self.vq_num_codes,
            )
        elif self.ln_act_enabled:
            self.action_network = LNActEncoder(
                action_dim=self.action_input_shape, output_dim=out_dim
            )
        else:
            self.action_network = DefaultActionEncoder(
                action_dim=self.action_input_shape, output_dim=out_dim
            )

    def __call__(self, inputs, train=False):
        """inputs: {"obs": {...}, ["goal": {...}], "prompt": {"obs": {...},
        "action": [N, A] or precomputed CLIP latents for fast}}.

        All leaves are time-folded ([B*T, ...]) by the caller, mirroring
        ``icl_time_distributed`` (reference tensor_utils.py:1045).
        """
        prompt_obs = inputs["prompt"]["obs"]
        prompt_actions = inputs["prompt"]["action"]

        outputs = []
        for group, _ in self.observation_group_shapes:
            outputs.append(self.group_encoders[group](inputs[group], train=train))
        obs = jnp.concatenate(outputs, axis=-1)
        context_obs = self.group_encoders["obs"](prompt_obs, train=train)

        vq_vae_loss = None
        if self.fast_enabled:
            # prompt_actions here are precomputed/host-encoded CLIP latents
            # [N, 512] (see tokenizers/fast.py for the host stage)
            context_actions = self.action_network(prompt_actions)
        elif self.vq_vae_enabled:
            context_actions, vq_vae_loss = self.action_network(prompt_actions)
        elif self.ln_act_enabled:
            n = prompt_actions.shape[0]
            bsz = n // self.prompt_seq_len
            seq = prompt_actions.reshape(bsz, self.prompt_seq_len, -1)
            context_actions = self.action_network(seq)
        elif self.bin_enabled:
            context_actions = self.action_network(
                prompt_actions, update_stats=train
            )
        else:
            context_actions = self.action_network(
                prompt_actions, deterministic=not train, update_stats=train
            )
        return obs, context_obs, context_actions, vq_vae_loss

    def output_shape(self):
        return [
            group_encoder_output_dim(
                self.observation_group_shapes, self.encoder_kwargs
            )
        ]




class Mamba_Backbone(nn.Module):
    """Stack of Mamba selective-SSM blocks + output LayerNorm - the
    state-space twin of GPT_Backbone (reference ``ICL_MIMO_Mamba``
    obs_nets.py:2637). Inherently causal; sequence mixing runs through
    ``lax.associative_scan`` (TPU-parallel over T)."""

    embed_dim: int
    num_layers: int = 6

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"ln{i}")(x)
            x = x + MambaBlock(
                d_model=self.embed_dim, d_state=16, d_conv=4, expand=2,
                name=f"mamba{i}",
            )(h)
        return nn.LayerNorm(name="output_ln")(x)

class _TransformerEmbedding(nn.Module):
    """Shared input embedding: Dense + positional + LN + dropout
    (reference ``input_embedding`` obs_nets.py:2527-2545)."""

    embed_dim: int
    context_length: int
    emb_dropout: float = 0.1
    sinusoidal: bool = False
    nn_parameter_for_timesteps: bool = False

    @nn.compact
    def __call__(self, x, deterministic=True):
        emb = nn.Dense(
            self.embed_dim, kernel_init=torch_linear_kernel_init,
            name="embed_encoder",
        )(x)
        t = emb.shape[1]
        if self.sinusoidal:
            pos = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.float32)[None], emb.shape[:2]
            )
            time_emb = sinusoidal_positional_encoding(pos, self.embed_dim)
        elif self.nn_parameter_for_timesteps:
            time_emb = self.param(
                "embed_timestep", nn.initializers.zeros,
                (1, self.context_length, self.embed_dim),
            )[:, :t]
        else:
            table = self.param(
                "embed_timestep_table", gpt_init,
                (self.context_length, self.embed_dim),
            )
            time_emb = table[None, :t]
        emb = emb + time_emb
        emb = nn.LayerNorm(name="embed_ln")(emb)
        return nn.Dropout(self.emb_dropout)(emb, deterministic=deterministic)


class MIMO_Transformer(nn.Module):
    """Obs groups -> time-distributed encode -> GPT -> per-step decode
    (reference ``MIMO_Transformer`` obs_nets.py:1804-2060)."""

    input_obs_group_shapes: Any
    output_shapes: Any
    transformer_embed_dim: int
    transformer_num_layers: int
    transformer_num_heads: int
    transformer_context_length: int
    transformer_causal: bool = True
    transformer_emb_dropout: float = 0.1
    transformer_attn_dropout: float = 0.1
    transformer_block_output_dropout: float = 0.1
    transformer_sinusoidal_embedding: bool = False
    transformer_activation: str = "gelu"
    transformer_nn_parameter_for_timesteps: bool = False
    encoder_kwargs: Any = None

    def setup(self):
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=self.input_obs_group_shapes,
            encoder_kwargs=self.encoder_kwargs,
            feature_activation=None,
        )
        self.embedding = _TransformerEmbedding(
            embed_dim=self.transformer_embed_dim,
            context_length=self.transformer_context_length,
            emb_dropout=self.transformer_emb_dropout,
            sinusoidal=self.transformer_sinusoidal_embedding,
            nn_parameter_for_timesteps=self.transformer_nn_parameter_for_timesteps,
        )
        self.transformer = GPT_Backbone(
            embed_dim=self.transformer_embed_dim,
            num_layers=self.transformer_num_layers,
            num_heads=self.transformer_num_heads,
            context_length=self.transformer_context_length,
            causal=self.transformer_causal,
            attn_dropout=self.transformer_attn_dropout,
            block_output_dropout=self.transformer_block_output_dropout,
            activation=self.transformer_activation,
        )
        self.decoder = ObservationDecoder(decode_shapes=self.output_shapes)

    def __call__(self, train=False, **inputs):
        folded, b, t = TensorUtils.fold_time(
            {g: inputs[g] for g, _ in self.input_obs_group_shapes if inputs.get(g)}
        )
        flat = self.encoder(train=train, **folded)
        seq = flat.reshape(b, t, -1)
        emb = self.embedding(seq, deterministic=not train)
        hidden = self.transformer(emb, deterministic=not train)
        out = self.decoder(hidden)
        out["transformer_encoder_outputs"] = hidden
        return out


class ICL_MIMO_Transformer(nn.Module):
    """In-context assembly: interleave [ctx_obs_t, ctx_act_t] pairs, append
    the T query obs -> 3T tokens -> GPT(context 3T) -> decode last T
    (reference ``ICL_MIMO_Transformer`` obs_nets.py:2338-2634)."""

    input_obs_group_shapes: Any
    output_shapes: Any
    transformer_embed_dim: int
    transformer_num_layers: int
    transformer_num_heads: int
    transformer_context_length: int
    transformer_causal: bool = True
    transformer_emb_dropout: float = 0.1
    transformer_attn_dropout: float = 0.1
    transformer_block_output_dropout: float = 0.1
    transformer_sinusoidal_embedding: bool = False
    transformer_activation: str = "gelu"
    transformer_fast_enabled: bool = False
    transformer_bin_enabled: bool = False
    transformer_vq_vae_enabled: bool = False
    transformer_ln_act_enabled: bool = False
    transformer_nn_parameter_for_timesteps: bool = False
    action_input_shape: int = 12
    backbone_type: str = "gpt"  # "gpt" | "mamba" (ICL_MIMO_Mamba)
    encoder_kwargs: Any = None

    def setup(self):
        self.encoder = ICLObservationGroupEncoder(
            observation_group_shapes=self.input_obs_group_shapes,
            action_input_shape=self.action_input_shape,
            fast_enabled=self.transformer_fast_enabled,
            bin_enabled=self.transformer_bin_enabled,
            vq_vae_enabled=self.transformer_vq_vae_enabled,
            ln_act_enabled=self.transformer_ln_act_enabled,
            encoder_kwargs=self.encoder_kwargs,
            feature_activation=None,
            prompt_seq_len=self.transformer_context_length,
        )
        self.embedding = _TransformerEmbedding(
            embed_dim=self.transformer_embed_dim,
            context_length=self.transformer_context_length,
            emb_dropout=self.transformer_emb_dropout,
            sinusoidal=self.transformer_sinusoidal_embedding,
            nn_parameter_for_timesteps=self.transformer_nn_parameter_for_timesteps,
        )
        if self.backbone_type == "mamba":
            self.transformer = Mamba_Backbone(
                embed_dim=self.transformer_embed_dim,
                num_layers=self.transformer_num_layers,
            )
        else:
            self.transformer = GPT_Backbone(
                embed_dim=self.transformer_embed_dim,
                num_layers=self.transformer_num_layers,
                num_heads=self.transformer_num_heads,
                # x3: interleaved [ctx_obs, ctx_act] pairs + query obs
                # (:2455-2465)
                context_length=self.transformer_context_length * 3,
                causal=self.transformer_causal,
                attn_dropout=self.transformer_attn_dropout,
                block_output_dropout=self.transformer_block_output_dropout,
                activation=self.transformer_activation,
            )
        self.decoder = ObservationDecoder(decode_shapes=self.output_shapes)

    def __call__(self, train=False, **inputs):
        # fold time over all group dicts + the prompt (icl_time_distributed,
        # reference tensor_utils.py:1045)
        present = {
            g: inputs[g]
            for g, _ in self.input_obs_group_shapes
            if inputs.get(g) is not None
        }
        present["prompt"] = inputs["prompt"]
        folded, b, t = TensorUtils.fold_time(present)
        obs, ctx_obs, ctx_act, vq_loss = self.encoder(folded, train=train)

        obs = obs.reshape(b, t, -1)
        ctx_obs = ctx_obs.reshape(b, t, -1)
        ctx_act = ctx_act.reshape(b, t, -1)

        obs_emb = self.embedding(obs, deterministic=not train)
        ctx_obs_emb = self.embedding(ctx_obs, deterministic=not train)
        ctx_act_emb = self.embedding(ctx_act, deterministic=not train)

        # interleave context pairs then append query obs (:2586-2598)
        interleaved = jnp.stack([ctx_obs_emb, ctx_act_emb], axis=2)
        interleaved = interleaved.reshape(b, 2 * t, -1)
        tokens = jnp.concatenate([interleaved, obs_emb], axis=1)  # [B, 3T, D]

        hidden = self.transformer(tokens, deterministic=not train)
        last = hidden[:, -t:]                                     # decode last T
        out = self.decoder(last)
        out["transformer_encoder_outputs"] = hidden
        out["vq_vae_loss"] = vq_loss
        return out


class MIMO_MLP(nn.Module):
    """Obs groups -> flat encode -> MLP -> decode
    (reference ``MIMO_MLP`` obs_nets.py:1388-1527)."""

    input_obs_group_shapes: Any
    output_shapes: Any
    layer_dims: Tuple[int, ...]
    encoder_kwargs: Any = None
    decoder_init_scale: Any = None

    def setup(self):
        self.encoder = ObservationGroupEncoder(
            observation_group_shapes=self.input_obs_group_shapes,
            encoder_kwargs=self.encoder_kwargs,
        )
        self.mlp = BaseNets.MLP(
            output_dim=self.layer_dims[-1] if self.layer_dims else 0,
            layer_dims=self.layer_dims[:-1],
            activation=nn.relu,
            output_activation=nn.relu,
        ) if self.layer_dims else None
        self.decoder = ObservationDecoder(
            decode_shapes=self.output_shapes,
            init_scale=self.decoder_init_scale,
        )

    def __call__(self, train=False, **inputs):
        flat = self.encoder(train=train, **inputs)
        if self.mlp is not None:
            flat = self.mlp(flat)
        return self.decoder(flat)

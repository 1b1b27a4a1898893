"""Convert reference PyTorch checkpoints into this framework's param trees.

The reference releases ``.pth`` checkpoints of ``ICLTransformerHVQVAE``
(policy = TransformerActorNetwork with ResNet18(FiLM)+SpatialSoftmax
encoders + GPT backbone; vqvae = MSTCN HierarchicalVQVAE). This module maps
those state dicts onto our Flax trees:

  * Linear:   weight [out, in]      -> kernel [in, out] (transpose)
  * Conv2d:   weight [out, in, h, w]-> kernel [h, w, in, out]
  * Conv1d:   weight [out, in, k]   -> kernel [k, in, out]
  * BatchNorm weight/bias/running_* -> scale/bias + batch_stats mean/var

Converters are key-table driven; anything unmapped is reported so partial
loads are explicit. Requires torch only to read the .pth (use
``file_utils.load_reference_torch_checkpoint``).
"""

import numpy as np


def _lin(sd, prefix):
    return {
        "kernel": sd[prefix + ".weight"].T,
        "bias": sd[prefix + ".bias"],
    }


def _conv2d(sd, prefix, bias=False):
    out = {"kernel": np.transpose(sd[prefix + ".weight"], (2, 3, 1, 0))}
    if bias:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _conv1d(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[prefix + ".weight"], (2, 1, 0))}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _bn(sd, prefix, with_stats=True):
    """``with_stats=False`` reads only the trainable scale/bias — the mode
    optimizer-moment dicts need (running_mean/var are buffers and have no
    Adam state)."""
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    if not with_stats:
        return params, {}
    stats = {
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }
    return params, stats


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


# ---------------------------------------------------------------------------
# tokenizers
# ---------------------------------------------------------------------------

def convert_lipvq(sd, prefix=""):
    """Reference ``LLFQVAE_V4`` state dict -> LipVQVAE params."""
    p = prefix
    return {
        "enc1": _lin(sd, p + "encoder.0"),
        "enc2": _lin(sd, p + "encoder.2"),
        "to_latent": {
            "W": sd[p + "to_latent.W"],
            "b": sd[p + "to_latent.b"],
            "ci": sd[p + "to_latent.ci"],
        },
        "quantizer": {"codebook": sd[p + "quantizer.codebook"]},
        "dec1": _lin(sd, p + "decoder.0"),
        "dec2": _lin(sd, p + "decoder.2"),
        "to_output": _lin(sd, p + "to_output"),
    }


def convert_hvqvae(sd, prefix="", num_stages=2, num_layers_per_stage=10):
    """Reference ``HierarchicalVQVAE`` state dict -> (params, vq state)."""
    p = prefix

    def mstcn(side):
        out = {}
        for s in range(num_stages):
            layers = {}
            for i in range(num_layers_per_stage):
                conv_prefix = f"{p}{side}.stages.{s}.layers.{i}.conv"
                layers[f"layer{i}"] = {"conv": _conv1d(sd, conv_prefix)}
                res_prefix = f"{p}{side}.stages.{s}.layers.{i}.residual"
                if res_prefix + ".weight" in sd:
                    layers[f"layer{i}"]["residual"] = _conv1d(sd, res_prefix)
            out[f"stage{s}"] = layers
        return out

    enc = {
        "input_projection": _lin(sd, p + "encoder.input_projection"),
        "ln": _ln(sd, p + "encoder.ln"),
    }
    enc.update(mstcn("encoder"))
    dec = {"output_projection": _lin(sd, p + "decoder.output_projection")}
    dec.update(mstcn("decoder"))
    params = {"encoder": enc, "decoder": dec}
    vq = {
        "codebook_z": sd[p + "codebook_z"],
        "codebook_q": sd[p + "codebook_q"],
        "cluster_size_z": sd[p + "cluster_size_z"],
        "embed_avg_z": sd[p + "embed_avg_z"],
        "cluster_size_q": sd[p + "cluster_size_q"],
        "embed_avg_q": sd[p + "embed_avg_q"],
        "initialized": np.asarray(bool(sd[p + "codebooks_initialized"])),
    }
    return params, vq


# ---------------------------------------------------------------------------
# vision backbones
# ---------------------------------------------------------------------------

_TV_RESNET18_BLOCKS = [
    ("layer1.0", 0), ("layer1.1", 1), ("layer2.0", 2), ("layer2.1", 3),
    ("layer3.0", 4), ("layer3.1", 5), ("layer4.0", 6), ("layer4.1", 7),
]


def convert_resnet18(sd, prefix="", with_stats=True):
    """torchvision resnet18 trunk -> (params, batch_stats) for our
    ResNet18Conv / the trunk part of ResNet18ConvFiLM."""
    p = prefix
    params, stats = {}, {}
    bn_p, bn_s = _bn(sd, p + "bn1", with_stats)
    params["stem"] = {"conv1": _conv2d(sd, p + "conv1"), "bn1": bn_p}
    stats["stem"] = {"bn1": bn_s}
    for tv_name, i in _TV_RESNET18_BLOCKS:
        bp, bs = {}, {}
        for c in ("conv1", "conv2"):
            bp[c] = _conv2d(sd, f"{p}{tv_name}.{c}")
        for b in ("bn1", "bn2"):
            q, s = _bn(sd, f"{p}{tv_name}.{b}", with_stats)
            bp[b], bs[b] = q, s
        if f"{p}{tv_name}.downsample.0.weight" in sd:
            bp["down_conv"] = _conv2d(sd, f"{p}{tv_name}.downsample.0")
            q, s = _bn(sd, f"{p}{tv_name}.downsample.1", with_stats)
            bp["down_bn"], bs["down_bn"] = q, s
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    return params, stats


def convert_resnet18_film(sd, prefix="", with_stats=True):
    """Reference ResNet18ConvFiLM (_base_block/_conv_blocks/_film_layers
    naming, base_nets.py:652-746) -> (params, batch_stats)."""
    p = prefix
    params, stats = {}, {}
    bn_p, bn_s = _bn(sd, p + "_base_block.1", with_stats)
    params["stem"] = {"conv1": _conv2d(sd, p + "_base_block.0"), "bn1": bn_p}
    stats["stem"] = {"bn1": bn_s}
    for i in range(8):
        bp, bs = {}, {}
        base = f"{p}_conv_blocks.{i}"
        for c in ("conv1", "conv2"):
            bp[c] = _conv2d(sd, f"{base}.{c}")
        for b in ("bn1", "bn2"):
            q, s = _bn(sd, f"{base}.{b}", with_stats)
            bp[b], bs[b] = q, s
        if f"{base}.downsample.0.weight" in sd:
            bp["down_conv"] = _conv2d(sd, f"{base}.downsample.0")
            q, s = _bn(sd, f"{base}.downsample.1", with_stats)
            bp["down_bn"], bs["down_bn"] = q, s
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
        params[f"film{i}"] = {
            "lang_proj": _lin(sd, f"{p}_film_layers.{i}.lang_proj")
        }
    return params, stats


def convert_r3m_trunk(sd, model_class="resnet18"):
    """R3M checkpoint (``module.convnet.*`` DDP naming, or a plain
    torchvision state dict) -> variables for :class:`R3MConv`:
    ``{"params": {"trunk": ...}, "batch_stats": {"trunk": ...}}``.

    Reference ``R3MConv`` (base_nets.py:1091-1152) wraps
    ``load_r3m(model_class).module.convnet``; only the resnet18/34-shape
    BasicBlock trunk is convertible with the resnet18 table today.
    """
    if model_class != "resnet18":
        raise NotImplementedError(
            "only the r3m resnet18 trunk converter is implemented"
        )
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # strip any wrapper prefix up to and including "convnet."
    stripped = {}
    for k, v in sd.items():
        idx = k.find("convnet.")
        stripped[k[idx + len("convnet."):] if idx >= 0 else k] = v
    params, stats = convert_resnet18(stripped)
    return {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}


def convert_mvp_vit(sd, depth=12):
    """MAE/timm-layout ViT state dict (``patch_embed.proj``, ``cls_token``,
    ``pos_embed``, ``blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,
    mlp.fc2}``, ``norm``) -> variables for :class:`MVPConv`:
    ``{"params": {"trunk": ...}}`` (reference ``MVPConv`` wraps
    ``mvp.load(...)``, base_nets.py:1187-1236)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # strip an mvp/DDP wrapper prefix if present
    stripped = {}
    for k, v in sd.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        stripped[k] = v
    sd = stripped
    params = {
        "patch_embed": _conv2d(sd, "patch_embed.proj", bias=True),
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _ln(sd, "norm"),
    }
    for i in range(depth):
        b = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": _ln(sd, b + "norm1"),
            "qkv": _lin(sd, b + "attn.qkv"),
            "proj": _lin(sd, b + "attn.proj"),
            "norm2": _ln(sd, b + "norm2"),
            "fc1": _lin(sd, b + "mlp.fc1"),
            "fc2": _lin(sd, b + "mlp.fc2"),
        }
    return {"params": {"trunk": params}}


def flatten_variables(variables, sep="/"):
    """Nested variables tree -> flat {path: ndarray} (npz-writable)."""
    out = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            out[sep.join(path)] = np.asarray(node)

    walk(variables, ())
    return out


def unflatten_npz(flat, sep="/"):
    """Inverse of :func:`flatten_variables`."""
    out = {}
    for key, value in flat.items():
        node = out
        parts = key.split(sep)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return out


def convert_gpt_backbone(sd, prefix="", num_layers=6):
    """Reference GPT_Backbone -> our GPT_Backbone params."""
    p = prefix
    params = {}
    for i in range(num_layers):
        b = f"{p}nets.transformer.{i}.nets."
        blk = {
            "ln1": _ln(sd, b + "ln1"),
            "ln2": _ln(sd, b + "ln2"),
            "attention": {
                "qkv": {"kernel": sd[b + "attention.nets.qkv.weight"].T},
                "output": _lin(sd, b + "attention.nets.output"),
            },
            "mlp_fc": _lin(sd, b + "mlp.0"),
            "mlp_proj": _lin(sd, b + "mlp.2"),
        }
        params[f"block{i}"] = blk
    params["output_ln"] = _ln(sd, p + "nets.output_ln")
    return params


def convert_transformer_actor(sd, config, prefix="policy.", with_stats=True):
    """Reference ``TransformerActorNetwork`` (MIMO_Transformer) state dict ->
    our policy tree: ``(params, batch_stats)`` for
    ``policy_nets.TransformerActorNetwork``.

    Key layout (verified against a reference instance built from
    ``robomimic/algo/icl.py:915-976``):
      policy.nets.encoder.nets.obs.obs_nets.<rgb_key>.{backbone,pool,nets.2}
      policy.nets.{embed_encoder,embed_ln}; policy.params.embed_timestep
      policy.nets.transformer.nets.transformer.{i}; policy.nets.decoder
    """
    p = prefix
    tf_cfg = config["algo"]["transformer"]
    rgb_keys = config["observation"]["modalities"]["obs"].get("rgb", [])

    enc_params, enc_stats = {}, {}
    for key in rgb_keys:
        base = f"{p}nets.encoder.nets.obs.obs_nets.{key}."
        trunk_params, trunk_stats = convert_resnet18_film(
            sd, prefix=base + "backbone.", with_stats=with_stats
        )
        kp_w = sd[base + "pool.nets.weight"]  # [K, C, 1, 1]
        enc_params[f"core_{key}"] = {
            "backbone": trunk_params,
            "pool": {
                "kp_conv": {
                    "kernel": np.transpose(kp_w, (2, 3, 1, 0)),
                    "bias": sd[base + "pool.nets.bias"],
                }
            },
            "proj": _lin(sd, base + "nets.2"),
        }
        enc_stats[f"core_{key}"] = {"backbone": trunk_stats}

    net = {
        "embedding": {
            "embed_encoder": _lin(sd, p + "nets.embed_encoder"),
            "embed_ln": _ln(sd, p + "nets.embed_ln"),
            "embed_timestep": sd[p + "params.embed_timestep"],
        },
        "transformer": convert_gpt_backbone(
            sd, prefix=p + "nets.transformer.",
            num_layers=tf_cfg["num_layers"],
        ),
        "decoder": {"head_action": _lin(sd, p + "nets.decoder.nets.action")},
    }
    stats = {}
    if enc_params:
        net["encoder"] = {"enc_obs": enc_params}
        stats = {"net": {"encoder": {"enc_obs": enc_stats}}}
    return {"net": net}, stats


# stray non-tensor keys the reference's serialize() adds and fix_ckpt strips
# (reference fix_ckpt.py:6-55, icl.py:1374-1391)
FLAGSHIP_STRAY_KEYS = ("vq_vae_enabled", "vqvae_config")


def detect_gaussian_inversion(config, stats):
    """Action keys whose normalization stats carry the reference's gaussian
    scale/offset inversion (reference dataset.py:1246-1250 stores the mean
    under "scale" and the std under "offset")."""
    if stats is None:
        return []
    action_config = config.get("train", {}).get("action_config", {})
    return [
        k for k in stats
        if action_config.get(k, {}).get("normalization") == "gaussian"
    ]


def remap_gaussian_stats(stats, keys):
    """Swap scale<->offset for @keys, converting reference-inverted gaussian
    stats to the conventional mapping (scale=std, offset=mean).

    NOTE: a policy trained by the reference saw actions normalized with the
    INVERTED semantics ((a - std) / mean); keeping the stats verbatim is the
    behavior-preserving choice for deployment. Remap only when re-deriving
    normalization locally (e.g. to resume training on our data pipeline).
    """
    out = dict(stats)
    for k in keys:
        out[k] = {
            **stats[k],
            "scale": stats[k]["offset"],
            "offset": stats[k]["scale"],
        }
    return out


def convert_flagship_checkpoint(ckpt, fix_gaussian=False):
    """Full reference ``ICLTransformerHVQVAE`` ``.pth`` dict (as loaded by
    ``file_utils.load_reference_torch_checkpoint``) -> our self-describing
    checkpoint dict, ready for ``policy_from_checkpoint(ckpt_dict=...)``.

    Handles the stray non-tensor keys fix_ckpt strips, the vqvae EMA/codebook
    buffers (-> the "vq" aux collection), ResNet BN running stats
    (-> "batch_stats"), and gaussian normalization-stat inversion detection
    (remapped only when @fix_gaussian; see :func:`remap_gaussian_stats`).
    """
    import json

    config = ckpt["config"]
    if isinstance(config, str):
        config = json.loads(config)
    model = ckpt["model"]
    sd = {
        k: np.asarray(v)
        for k, v in model.items()
        if k not in FLAGSHIP_STRAY_KEYS
    }

    pol_params, pol_stats = convert_transformer_actor(sd, config)
    vq_cfg = config["algo"]["transformer"]["vqvae"]
    vq_params, vq_state = convert_hvqvae(
        sd, prefix="vqvae.",
        num_stages=vq_cfg["num_stages"],
        num_layers_per_stage=vq_cfg["num_layers_per_stage"],
    )

    aux_policy = {"batch_stats": pol_stats} if pol_stats else {}
    # reference shape metadata stores images CHW; ours are HWC
    shape_meta = dict(ckpt.get("shape_metadata", {}))
    if "all_shapes" in shape_meta:
        rgb_keys = set(
            config["observation"]["modalities"]["obs"].get("rgb", [])
        )
        shape_meta["all_shapes"] = {
            k: (list(s[1:]) + [s[0]] if k in rgb_keys and len(s) == 3
                else list(s))
            for k, s in shape_meta["all_shapes"].items()
        }

    out = {
        "model": {
            "params": {"policy": pol_params, "vqvae": vq_params},
            "aux": {"policy": aux_policy, "vqvae": {"vq": vq_state}},
        },
        "config": json.dumps(config),
        "algo_name": ckpt.get("algo_name", config.get("algo_name", "icl")),
        "env_metadata": ckpt.get("env_metadata", {}),
        "shape_metadata": shape_meta,
    }
    for stats_key in ("obs_normalization_stats", "action_normalization_stats"):
        if ckpt.get(stats_key) is not None:
            out[stats_key] = ckpt[stats_key]
    inverted = detect_gaussian_inversion(
        config, out.get("action_normalization_stats")
    )
    if inverted:
        print(
            "[convert_flagship_checkpoint] reference gaussian scale/offset "
            f"inversion detected for action keys {inverted} "
            + ("- remapped to conventional semantics" if fix_gaussian
               else "- kept verbatim (behavior-preserving)")
        )
        if fix_gaussian:
            out["action_normalization_stats"] = remap_gaussian_stats(
                out["action_normalization_stats"], inverted
            )
    return out


def report_unmapped(sd, consumed_prefixes):
    """List state-dict keys not covered by any converter prefix."""
    return [
        k for k in sd
        if not any(k.startswith(pref) for pref in consumed_prefixes)
    ]


# ---------------------------------------------------------------------------
# optimizer-state migration: continue a half-trained torch run in optax
# ---------------------------------------------------------------------------

def convert_torch_adam_moments(opt_sd, param_names, convert_fn):
    """torch.optim.Adam/AdamW ``state_dict()`` -> ``(count, mu, nu)`` in
    this framework's parameter layout, for exact mid-training migration.

    ``param_names`` is ``[n for n, _ in net.named_parameters()]`` in
    construction order — torch keys its optimizer state by the parameter's
    INDEX in that order. ``convert_fn`` is the module's weight converter (a
    function of a name->array mapping). Every converter in this file is
    built from transposes / slices / concatenations / permutations —
    linear, degree-1-homogeneous index operations — so Adam's ``exp_avg``
    and ``exp_avg_sq`` transform into the new layout exactly like the
    weights themselves, and the migrated optimizer continues the torch
    trajectory (verified end-to-end by
    ``tests/test_icl_parity.py::test_icl_hvqvae_midtraining_migration``).
    """
    state = opt_sd["state"]
    groups = opt_sd["param_groups"]
    assert len(groups) == 1, (
        "convert_torch_adam_moments assumes a single param_group (the "
        "reference's optimizers); with multiple groups (e.g. decay/no-decay "
        "splits) the flattened group order no longer matches "
        "named_parameters order — pass per-group name lists instead"
    )
    order = [pid for g in groups for pid in g["params"]]
    assert len(order) == len(param_names), (
        f"{len(order)} optimizer slots vs {len(param_names)} named params"
    )
    sd_mu, sd_nu, count = {}, {}, None
    for idx, name in zip(order, param_names):
        assert idx in state, (
            f"no optimizer state for param '{name}' (index {idx}) — it "
            "never received a gradient; migrate after at least one step"
        )
        s = state[idx]
        sd_mu[name] = np.asarray(s["exp_avg"]).copy()
        sd_nu[name] = np.asarray(s["exp_avg_sq"]).copy()
        step = int(s["step"])
        assert count in (None, step), "per-param step counts diverge"
        count = step
    return count, convert_fn(sd_mu), convert_fn(sd_nu)


def graft_adam_moments(opt_state, count, mu, nu):
    """Replace every ``optax.ScaleByAdamState`` inside an opt-state pytree
    (whatever chain wraps it — weight decay, clipping, lr scale) with the
    migrated ``(count, mu, nu)``, and advance every
    ``ScaleByScheduleState`` to the same step count so lr schedules
    (e.g. constant_with_warmup) resume where the torch run left off
    instead of re-warming from zero."""
    import jax
    import jax.numpy as jnp
    import optax

    sched_state = getattr(optax, "ScaleByScheduleState", None)

    def is_leaf(node):
        return isinstance(node, optax.ScaleByAdamState) or (
            sched_state is not None and isinstance(node, sched_state)
        )

    def visit(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jnp.asarray(count, jnp.int32),
                mu=jax.tree_util.tree_map(jnp.asarray, mu),
                nu=jax.tree_util.tree_map(jnp.asarray, nu),
            )
        if sched_state is not None and isinstance(node, sched_state):
            return sched_state(count=jnp.asarray(count, jnp.int32))
        return node

    return jax.tree_util.tree_map(visit, opt_state, is_leaf=is_leaf)

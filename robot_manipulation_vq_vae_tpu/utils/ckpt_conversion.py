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


def _bn(sd, prefix):
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
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


def convert_resnet18(sd, prefix=""):
    """torchvision resnet18 trunk -> (params, batch_stats) for our
    ResNet18Conv / the trunk part of ResNet18ConvFiLM."""
    p = prefix
    params, stats = {}, {}
    bn_p, bn_s = _bn(sd, p + "bn1")
    params["stem"] = {"conv1": _conv2d(sd, p + "conv1"), "bn1": bn_p}
    stats["stem"] = {"bn1": bn_s}
    for tv_name, i in _TV_RESNET18_BLOCKS:
        bp, bs = {}, {}
        for c in ("conv1", "conv2"):
            bp[c] = _conv2d(sd, f"{p}{tv_name}.{c}")
        for b in ("bn1", "bn2"):
            q, s = _bn(sd, f"{p}{tv_name}.{b}")
            bp[b], bs[b] = q, s
        if f"{p}{tv_name}.downsample.0.weight" in sd:
            bp["down_conv"] = _conv2d(sd, f"{p}{tv_name}.downsample.0")
            q, s = _bn(sd, f"{p}{tv_name}.downsample.1")
            bp["down_bn"], bs["down_bn"] = q, s
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
    return params, stats


def convert_resnet18_film(sd, prefix=""):
    """Reference ResNet18ConvFiLM (_base_block/_conv_blocks/_film_layers
    naming, base_nets.py:652-746) -> (params, batch_stats)."""
    p = prefix
    params, stats = {}, {}
    bn_p, bn_s = _bn(sd, p + "_base_block.1")
    params["stem"] = {"conv1": _conv2d(sd, p + "_base_block.0"), "bn1": bn_p}
    stats["stem"] = {"bn1": bn_s}
    for i in range(8):
        bp, bs = {}, {}
        base = f"{p}_conv_blocks.{i}"
        for c in ("conv1", "conv2"):
            bp[c] = _conv2d(sd, f"{base}.{c}")
        for b in ("bn1", "bn2"):
            q, s = _bn(sd, f"{base}.{b}")
            bp[b], bs[b] = q, s
        if f"{base}.downsample.0.weight" in sd:
            bp["down_conv"] = _conv2d(sd, f"{base}.downsample.0")
            q, s = _bn(sd, f"{base}.downsample.1")
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


def report_unmapped(sd, consumed_prefixes):
    """List state-dict keys not covered by any converter prefix."""
    return [
        k for k in sd
        if not any(k.startswith(pref) for pref in consumed_prefixes)
    ]

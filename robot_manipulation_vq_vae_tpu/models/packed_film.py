"""Grouped-conv packing of per-camera FiLM-ResNet18 encoders.

The flagship runs THREE FiLM-ResNet18 encoders (one per camera, separate
weights — reference per-key encoders ``robomimic/models/obs_nets.py:
240-463``). Each conv is launched 3x at modest sizes; the stem measures
8% of MXU peak and stage1 34% (docs/mfu_campaign_r3.json). Packing the
three trunks into ONE call with ``feature_group_count=3`` keeps the math
IDENTICAL (each group has its own filters — grouped convolution computes
G independent convolutions) while tripling the work per launched op:

* conv kernels concatenate along the OUTPUT-feature axis
  (flax grouped-conv kernel layout: [kh, kw, Cin/G, Cout_total], group g
  consumes input-channel block g and produces output-channel block g);
* BatchNorm is per-channel over batch+spatial dims, so concatenated
  channels keep independent per-camera statistics — bit-identical math;
* FiLM projections concatenate per-group inside each of the beta/gamma
  halves; ReLU/residual-add/maxpool are elementwise or spatial-only.

``pack_film_resnet18_params`` converts G per-camera
:class:`~.base_nets.ResNet18ConvFiLM` variable trees into the packed
layout, so checkpoints keep the reference per-camera layout and packing
is a load-time transform. Numerical equivalence (outputs, BN batch_stats
updates, and gradients mapped back per camera) is asserted in
``tests/test_packed_film.py``.
"""

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.models.base_nets import (
    _RESNET18_PLAN,
    _bn_train,
    torch_linear_kernel_init,
)
from robot_manipulation_vq_vae_tpu.models import base_nets as _bn_mod


def _gconv(features, kernel, stride, groups, name, padding=None):
    return nn.Conv(
        features, kernel, strides=(stride, stride),
        padding=padding if padding is not None
        else tuple((k // 2, k // 2) for k in kernel),
        feature_group_count=groups, use_bias=False, name=name,
    )


def _packed_norm(h, norm, train, name):
    """Mirror of base_nets._trunk_norm for packed channels (per-channel
    ops are packing-invariant)."""
    if norm == "batch":
        # flax defaults (momentum 0.99, eps 1e-5) — MUST match _trunk_norm
        return nn.BatchNorm(
            use_running_average=not _bn_train(train), name=name,
        )(h)
    if norm == "group":
        raise NotImplementedError(
            "packed trunks support batch norm only (group-norm groups would "
            "span cameras)"
        )
    raise ValueError(f"unknown norm {norm!r}")


class PackedFiLMLayer(nn.Module):
    """G per-camera FiLM layers as one Dense (beta/gamma halves each hold
    the G per-camera channel blocks, matching ``pack`` below)."""

    channels: int  # per camera
    groups: int

    @nn.compact
    def __call__(self, x, lang_emb):
        proj = nn.Dense(
            2 * self.groups * self.channels,
            kernel_init=torch_linear_kernel_init, name="lang_proj",
        )(lang_emb)
        beta, gamma = jnp.split(proj, 2, axis=-1)  # each [B, G*C]
        beta = beta[:, None, None, :]
        gamma = gamma[:, None, None, :]
        return nn.relu((1.0 + gamma) * x + beta)


class PackedBasicBlock(nn.Module):
    """G torchvision BasicBlocks as grouped convs (see BasicBlock)."""

    features: int  # per camera
    groups: int
    stride: int = 1
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train=False):
        feats = self.features * self.groups
        identity = x
        h = _gconv(feats, (3, 3), self.stride, self.groups, "conv1")(x)
        h = _packed_norm(h, self.norm, train, "bn1")
        h = nn.relu(h)
        h = _gconv(feats, (3, 3), 1, self.groups, "conv2")(h)
        h = _packed_norm(h, self.norm, train, "bn2")
        if self.stride != 1 or x.shape[-1] != feats:
            identity = _gconv(
                feats, (1, 1), self.stride, self.groups, "down_conv",
                padding=((0, 0), (0, 0)),
            )(x)
            identity = _packed_norm(identity, self.norm, train, "down_bn")
        return nn.relu(h + identity)


class PackedResNet18ConvFiLM(nn.Module):
    """G FiLM-ResNet18 trunks in one grouped-conv pass.

    Input  [B, H, W, G*3]  (per-camera images channel-concatenated)
    Output [B, H/32, W/32, G*512] (per-camera features channel-blocked).
    Honors the same pool-free-stem global as the unpacked trunk.
    """

    groups: int = 3
    lang_emb_dim: int = 768
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, lang_emb, train=False):
        g = self.groups
        stride = 4 if _bn_mod._POOL_FREE_STEM else 2
        x = _gconv(64 * g, (7, 7), stride, g, "stem_conv1")(x)
        x = _packed_norm(x, self.norm, train, "stem_bn1")
        x = nn.relu(x)
        if not _bn_mod._POOL_FREE_STEM:
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        for i, (feat, stride) in enumerate(_RESNET18_PLAN):
            x = PackedBasicBlock(
                features=feat, groups=g, stride=stride, norm=self.norm,
                name=f"block{i}",
            )(x, train=train)
            x = PackedFiLMLayer(
                channels=feat, groups=g, name=f"film{i}"
            )(x, lang_emb)
        return x

    @staticmethod
    def output_shape(input_shape, groups=3):
        h, w, _ = input_shape
        return [int(math.ceil(h / 32.0)), int(math.ceil(w / 32.0)),
                512 * groups]


# ---------------------------------------------------------------------------
# per-camera -> packed parameter transform
# ---------------------------------------------------------------------------

def _cat(trees, path, axis):
    leaf = [t for t in trees]
    for p in path:
        leaf = [t[p] for t in leaf]
    return jnp.concatenate([jnp.asarray(v) for v in leaf], axis=axis)


def _pack_film(trees, path, channels):
    """FiLM Dense params: per-camera [.., 2C] -> packed [.., 2*G*C] with
    the G beta blocks first, then the G gamma blocks (matching
    PackedFiLMLayer's split)."""
    ks = [t for t in trees]
    for p in path:
        ks = [t[p] for t in ks]
    ks = [jnp.asarray(k) for k in ks]
    betas = [k[..., :channels] for k in ks]
    gammas = [k[..., channels:] for k in ks]
    return jnp.concatenate(betas + gammas, axis=-1)


def pack_film_resnet18_params(variable_trees):
    """[G x ResNet18ConvFiLM variables] -> PackedResNet18ConvFiLM variables.

    Accepts full variable dicts ({'params': ..., 'batch_stats': ...});
    conv kernels / BN vectors concat along the channel axis, FiLM Dense
    params pack beta/gamma halves per camera.
    """
    params = [v["params"] for v in variable_trees]
    stats = [v.get("batch_stats", {}) for v in variable_trees]
    # params-only trees (e.g. a frozen/exported checkpoint) pack without a
    # batch_stats output; mixing stats-ful and stats-less trees is a caller
    # bug that would otherwise surface as an opaque KeyError inside _cat.
    has_stats = any(bool(s) for s in stats)
    if has_stats and not all(bool(s) for s in stats):
        raise ValueError(
            "pack_film_resnet18_params: some variable trees carry "
            "batch_stats and some do not — pack all-stats or no-stats trees"
        )

    p_out = {
        "stem_conv1": {"kernel": _cat(params, ["stem", "conv1", "kernel"],
                                      axis=-1)},
        "stem_bn1": {
            "scale": _cat(params, ["stem", "bn1", "scale"], -1),
            "bias": _cat(params, ["stem", "bn1", "bias"], -1),
        },
    }
    s_out = {
        "stem_bn1": {
            "mean": _cat(stats, ["stem", "bn1", "mean"], -1),
            "var": _cat(stats, ["stem", "bn1", "var"], -1),
        },
    } if has_stats else {}
    for i, (feat, stride) in enumerate(_RESNET18_PLAN):
        blk = f"block{i}"
        b_p, b_s = {}, {}
        for conv in ("conv1", "conv2", "down_conv"):
            if conv in params[0][blk]:
                b_p[conv] = {"kernel": _cat(params, [blk, conv, "kernel"],
                                            -1)}
        for bn_name in ("bn1", "bn2", "down_bn"):
            if bn_name in params[0][blk]:
                b_p[bn_name] = {
                    "scale": _cat(params, [blk, bn_name, "scale"], -1),
                    "bias": _cat(params, [blk, bn_name, "bias"], -1),
                }
                if has_stats:
                    b_s[bn_name] = {
                        "mean": _cat(stats, [blk, bn_name, "mean"], -1),
                        "var": _cat(stats, [blk, bn_name, "var"], -1),
                    }
        p_out[blk] = b_p
        if has_stats:
            s_out[blk] = b_s
        p_out[f"film{i}"] = {"lang_proj": {
            "kernel": _pack_film(params, [f"film{i}", "lang_proj", "kernel"],
                                 feat),
            "bias": _pack_film(params, [f"film{i}", "lang_proj", "bias"],
                               feat),
        }}
    out = {"params": p_out}
    if has_stats:
        out["batch_stats"] = s_out
    return out


def unpack_grads_per_camera(packed_kernel_grad, groups, axis=-1):
    """Split a packed conv-kernel gradient back into per-camera grads
    (inverse of the output-axis concat) — used by the equivalence test."""
    return np.split(np.asarray(packed_kernel_grad), groups, axis=axis)


def unpack_film_resnet18_params(packed_variables, groups):
    """Inverse of :func:`pack_film_resnet18_params`: packed variables ->
    list of G per-camera ResNet18ConvFiLM variable trees."""
    p = packed_variables["params"]
    s = packed_variables.get("batch_stats")  # None -> params-only unpack

    def split(a):
        return jnp.split(jnp.asarray(a), groups, axis=-1)

    def split_film(a, channels):
        a = jnp.asarray(a)
        betas = jnp.split(a[..., :groups * channels], groups, axis=-1)
        gammas = jnp.split(a[..., groups * channels:], groups, axis=-1)
        return [jnp.concatenate([b, g], axis=-1)
                for b, g in zip(betas, gammas)]

    # params-only packed trees (s is None) must unpack to params-only
    # per-camera trees: emitting empty batch_stats stubs would make
    # `ResNet18ConvFiLM.apply` raise ScopeVariableNotFoundError on first
    # use and would graft garbage stats through the layout converters.
    outs = [
        {"params": {"stem": {"conv1": {}, "bn1": {}}}}
        for _ in range(groups)
    ]
    if s is not None:
        for o in outs:
            o["batch_stats"] = {"stem": {"bn1": {}}}
    for g, k in enumerate(split(p["stem_conv1"]["kernel"])):
        outs[g]["params"]["stem"]["conv1"]["kernel"] = k
    for name in ("scale", "bias"):
        for g, v in enumerate(split(p["stem_bn1"][name])):
            outs[g]["params"]["stem"]["bn1"][name] = v
    if s is not None:
        for name in ("mean", "var"):
            for g, v in enumerate(split(s["stem_bn1"][name])):
                outs[g]["batch_stats"]["stem"]["bn1"][name] = v
    for i, (feat, _) in enumerate(_RESNET18_PLAN):
        blk = f"block{i}"
        for g in range(groups):
            outs[g]["params"][blk] = {}
            if s is not None:
                outs[g]["batch_stats"][blk] = {}
        for conv in ("conv1", "conv2", "down_conv"):
            if conv in p[blk]:
                for g, k in enumerate(split(p[blk][conv]["kernel"])):
                    outs[g]["params"][blk][conv] = {"kernel": k}
        for bn_name in ("bn1", "bn2", "down_bn"):
            if bn_name in p[blk]:
                for g in range(groups):
                    outs[g]["params"][blk][bn_name] = {}
                    if s is not None:
                        outs[g]["batch_stats"][blk][bn_name] = {}
                for name in ("scale", "bias"):
                    for g, v in enumerate(split(p[blk][bn_name][name])):
                        outs[g]["params"][blk][bn_name][name] = v
                if s is not None:
                    for name in ("mean", "var"):
                        for g, v in enumerate(split(s[blk][bn_name][name])):
                            outs[g]["batch_stats"][blk][bn_name][name] = v
        film = f"film{i}"
        for g in range(groups):
            outs[g]["params"][film] = {"lang_proj": {}}
        for name in ("kernel", "bias"):
            for g, v in enumerate(
                split_film(p[film]["lang_proj"][name], feat)
            ):
                outs[g]["params"][film]["lang_proj"][name] = v
    return outs


def _copy_dicts(node):
    if isinstance(node, dict):
        return {k: _copy_dicts(v) for k, v in node.items()}
    return node


def _find_pack_sites(node, names, path=()):
    """Paths of dict nodes holding ALL per-camera ``core_{key}`` children
    with 'backbone' subtrees (an ObservationEncoder can sit anywhere in a
    policy's tree, and goal/obs groups may each hold one)."""
    sites = []
    if isinstance(node, dict):
        if all(
            isinstance(node.get(n), dict) and "backbone" in node[n]
            for n in names
        ):
            sites.append(path)
        for k, v in node.items():
            if k in names:
                continue
            sites.extend(_find_pack_sites(v, names, path + (k,)))
    return sites


def _get_path(node, path):
    for p in path:
        node = node[p]
    return node


def _check_site_order(parent, names, packed_keys):
    """Group i of the packed trunk is bound to camera ``packed_keys[i]`` by
    POSITION — nothing in the tree can catch a reordered key list after the
    fact. The traced packed path orders groups by obs-spec order, which is
    also the ``core_{k}`` insertion order in a freshly traced/trained tree,
    so a caller-supplied order that disagrees with the tree's own relative
    order is almost certainly the spec-order bug. Raise loudly; a restored
    tree whose dict order was canonicalized by a checkpointer can disable
    the check with strict_order=False."""
    tree_rel = [k for k in parent if k in set(names)]
    if tree_rel != names:
        raise ValueError(
            "packed_keys order disagrees with the variable tree's own "
            f"core_* order: got {names}, tree has {tree_rel}. Pass the rgb "
            "keys in ObservationEncoder spec order (the order "
            "_packed_rgb_keys traces), or strict_order=False if this tree "
            "was key-sorted by a checkpointer and the caller order IS the "
            "spec order."
        )


def convert_variables_default_to_packed(variables, packed_keys,
                                        strict_order=True):
    """Rewrite a DEFAULT-layout variable tree (per-key ``core_{k}`` each
    holding backbone/pool/proj) into the PACKED layout the
    ``packed_rgb_encoders`` mode traces (shared ``packed_backbone`` +
    per-key pool/proj) — checkpoints move between modes losslessly.

    ``packed_keys`` MUST be in encoder spec order (see _check_site_order)."""
    names = [f"core_{k}" for k in packed_keys]
    out = {c: _copy_dicts(v) for c, v in variables.items()}
    sites = _find_pack_sites(out["params"], names)
    assert sites, f"no per-camera cores {names} found to pack"
    if strict_order:
        for site in sites:
            _check_site_order(_get_path(out["params"], site), names,
                              packed_keys)
    for site in sites:
        p_parent = _get_path(out["params"], site)
        try:
            s_parent = _get_path(out.get("batch_stats", {}), site)
        except (KeyError, TypeError):
            s_parent = None
        cam_vars = [{
            "params": p_parent[n].pop("backbone"),
            "batch_stats": (
                s_parent[n].pop("backbone")
                if s_parent is not None and "backbone" in s_parent.get(n, {})
                else {}
            ),
        } for n in names]
        packed = pack_film_resnet18_params(cam_vars)
        p_parent["packed_backbone"] = packed["params"]
        if s_parent is not None:
            if "batch_stats" in packed:
                s_parent["packed_backbone"] = packed["batch_stats"]
            for n in names:  # pool/proj carry no stats: drop empty stubs
                if n in s_parent and not s_parent[n]:
                    del s_parent[n]
    return out


def convert_variables_packed_to_default(variables, packed_keys,
                                        strict_order=True):
    """Inverse of :func:`convert_variables_default_to_packed`.

    ``packed_keys`` MUST be in encoder spec order (group i of the packed
    trunk unpacks to camera ``packed_keys[i]`` by position)."""
    names = [f"core_{k}" for k in packed_keys]
    out = {c: _copy_dicts(v) for c, v in variables.items()}

    def find_packed_sites(node, path=()):
        sites = []
        if isinstance(node, dict):
            if "packed_backbone" in node and all(
                isinstance(node.get(n), dict) for n in names
            ):
                sites.append(path)
            for k, v in node.items():
                if k == "packed_backbone" or k in names:
                    continue
                sites.extend(find_packed_sites(v, path + (k,)))
        return sites

    sites = find_packed_sites(out["params"])
    assert sites, "no packed_backbone found to unpack"
    if strict_order:
        for site in sites:
            _check_site_order(_get_path(out["params"], site), names,
                              packed_keys)
    for site in sites:
        p_parent = _get_path(out["params"], site)
        try:
            s_parent = _get_path(out.get("batch_stats", {}), site)
        except (KeyError, TypeError):
            s_parent = None
        packed = {"params": p_parent.pop("packed_backbone")}
        if s_parent is not None and "packed_backbone" in s_parent:
            packed["batch_stats"] = s_parent.pop("packed_backbone")
        cams = unpack_film_resnet18_params(packed, len(names))
        for n, cam in zip(names, cams):
            p_parent[n]["backbone"] = cam["params"]
            # params-only packed trees unpack without batch_stats; writing
            # empty stubs here would crash the first apply() of the
            # restored per-camera cores (no 'mean'/'var' leaves).
            if s_parent is not None and "batch_stats" in cam:
                s_parent.setdefault(n, {})["backbone"] = cam["batch_stats"]
    return out

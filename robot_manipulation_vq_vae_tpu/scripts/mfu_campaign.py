"""Conv-trunk MFU experiment campaign (run on the real TPU chip).

The flagship ICLTransformerHVQVAE step at the shipped scale is ~39% MFU and
the FiLM-ResNet18 trunk IS the step (~112 of 122 ms — docs/design.md §4).
This script runs controlled experiments against that trunk and appends each
result to a JSON file, so docs/design.md's optimization table is backed by
measurements rather than claims. One process runs several experiments to
amortize the tunnel's per-process compile penalty.

Experiments (``--exps``, comma-separated):

  baseline     stock flagship bf16 step (bench_train.measure)
  bn_frozen    BatchNorm forced to frozen running stats — NOT adoptable
               (training semantics require batch stats) but bounds what any
               BN optimization could recover
  stem_pad8    stem input zero-padded 3->8 channels before conv1 (kernel
               7x7x8x64): tests whether Mosaic tiles an 8-channel input
               conv better than the native 3-channel one
  trunk_stages cumulative-prefix timing of the FiLM trunk fwd+bwd at
               flagship shapes -> per-stage achieved-vs-peak table (the
               roofline evidence for design.md §4)

XLA-flag experiments need a fresh backend, so run this script once per
flag set, e.g.::

  LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python -m robot_manipulation_vq_vae_tpu.scripts.mfu_campaign \
      --exps baseline --tag vmem64m --out /tmp/mfu.json

Results accumulate in --out as {tag_or_name: result}.
"""

import argparse
import functools
import json
import os
import time

import numpy as np

V5E_BF16_PEAK_TFLOPS = 197.0


def _append_result(path, name, result):
    from robot_manipulation_vq_vae_tpu.utils.file_utils import (
        atomic_write_json,
    )

    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[name] = result
    atomic_write_json(path, data, indent=2)
    print(f"[{name}] {json.dumps(result)}")


def run_flagship(n_long=6):
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=n_long
    )


def exp_baseline(args):
    return run_flagship(args.n_long)


def exp_bn_frozen(args):
    """Frozen-stats BatchNorm for the whole step — now the shipping opt-in
    ``config.train.frozen_batch_norm`` (+17% measured); this experiment
    doubles as its hardware regression check."""
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=args.n_long,
        frozen_batch_norm=True,
    )


def exp_pool_free(args):
    """Stride-4 stem, no maxpool — the shipping opt-in
    ``config.train.pool_free_stem``; also its hardware regression check."""
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=args.n_long,
        pool_free_stem=True,
    )


def exp_pool_free_bn_frozen(args):
    """Both opt-in speed modes together (the shipped fast path)."""
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=args.n_long,
        frozen_batch_norm=True, pool_free_stem=True,
    )


def exp_stem_pad8(args):
    """Zero-pad the stem input 3->8 channels; flax shape inference gives
    conv1 a 7x7x8x64 kernel (same math: pad channels multiply zero
    weights)."""
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models import base_nets

    orig_call = base_nets._ResNet18Stem.__call__

    def padded_call(self, x, train=False):
        x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, 8 - x.shape[-1]),))
        return orig_call(self, x, train=train)

    base_nets._ResNet18Stem.__call__ = padded_call
    try:
        return run_flagship(args.n_long)
    finally:
        base_nets._ResNet18Stem.__call__ = orig_call


def exp_trunk_stages(args):
    """Cumulative-prefix fwd+bwd timing of the FiLM-ResNet18 trunk at
    flagship shapes (3072 frames of 116x116, bf16), differenced into a
    per-stage table with XLA-counted FLOPs vs the v5e bf16 peak.

    Prefixes: stem only, then +stage1..+stage4 (2 BasicBlocks + FiLM
    each). Timing uses the on-device fori_loop chain from design.md §7;
    the carry feeds the input-gradient back so iterations serialize, and
    parameter gradients are reduced into the carry scalar so XLA cannot
    dead-code-eliminate the filter-gradient convolutions."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models.base_nets import (
        _RESNET18_PLAN,
        BasicBlock,
        FiLMLayer,
        _ResNet18Stem,
    )

    N, H, W = args.stage_frames, 116, 116
    LANG = 768

    class Prefix(nn.Module):
        n_blocks: int  # 0 = stem only

        @nn.compact
        def __call__(self, x, lang_emb, train=True):
            x = _ResNet18Stem(name="stem")(x, train=train)
            for i, (feat, stride) in enumerate(
                _RESNET18_PLAN[: self.n_blocks]
            ):
                x = BasicBlock(features=feat, stride=stride,
                               name=f"block{i}")(x, train=train)
                x = FiLMLayer(channels=feat, name=f"film{i}")(x, lang_emb)
            return x

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(N, H, W, 3).astype(np.float32), jnp.bfloat16)
    lang = jnp.asarray(rng.randn(N, LANG).astype(np.float32), jnp.bfloat16)

    rows = []
    prev_ms, prev_tf = 0.0, 0.0
    # stage boundaries in the 8-block plan: stem, +2, +4, +6, +8
    for label, n_blocks in [("stem", 0), ("stage1", 2), ("stage2", 4),
                            ("stage3", 6), ("stage4", 8)]:
        model = Prefix(n_blocks=n_blocks)
        variables = model.init(jax.random.PRNGKey(0), x0, lang, train=False)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]
        )
        batch_stats = variables.get("batch_stats", {})

        def loss_fn(p, x):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, lang,
                train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out.astype(jnp.float32))

        grad_fn = jax.grad(loss_fn, argnums=(0, 1))

        @functools.partial(jax.jit, static_argnames="n")
        def chain(p, x, n):
            def body(_, carry):
                x, acc = carry
                gp, gx = grad_fn(p, x)
                # consume param grads so the filter-grad convs survive DCE
                acc = acc + sum(
                    jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree_util.tree_leaves(gp)
                )
                return (x + 1e-6 * gx, acc)

            out = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0.0)))
            return out[1] + jnp.sum(out[0].astype(jnp.float32))

        n_short, n_long = 1, args.stage_n_long
        float(chain(params, x0, n_short))
        float(chain(params, x0, n_long))
        t0 = time.perf_counter()
        float(chain(params, x0, n_short))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(params, x0, n_long))
        t_l = time.perf_counter() - t0
        ms = (t_l - t_s) / (n_long - n_short) * 1e3

        tf = None
        try:
            cost = (
                jax.jit(lambda p, x: grad_fn(p, x))
                .lower(params, x0).compile().cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            if cost:
                tf = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            pass

        row = {"prefix": label, "cumulative_ms": round(ms, 2)}
        row["stage_ms"] = round(ms - prev_ms, 2)
        if tf is not None:
            row["cumulative_tflop"] = round(tf, 3)
            row["stage_tflop"] = round(tf - prev_tf, 3)
            if row["stage_ms"] > 0:
                achieved = (tf - prev_tf) / (row["stage_ms"] / 1e3)
                row["stage_tflops_per_sec"] = round(achieved, 1)
                row["stage_pct_of_peak"] = round(
                    100.0 * achieved / V5E_BF16_PEAK_TFLOPS, 1
                )
            prev_tf = tf
        prev_ms = ms
        rows.append(row)
        print(json.dumps(row))
    return {"frames": N, "rows": rows}


def exp_trunk_stages_pchain(args):
    """Like trunk_stages, but the chain carries the *parameters*
    (params - 1e-9 * grad), not the input: no gradient w.r.t. the image is
    forced, matching the real training step where the first conv has no
    input-gradient. The delta vs trunk_stages isolates the cost of the
    stem's (unneeded) data-gradient convolution."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models.base_nets import (
        _RESNET18_PLAN,
        BasicBlock,
        FiLMLayer,
        _ResNet18Stem,
    )

    N, H, W = args.stage_frames, 116, 116
    LANG = 768

    class Prefix(nn.Module):
        n_blocks: int

        @nn.compact
        def __call__(self, x, lang_emb, train=True):
            x = _ResNet18Stem(name="stem")(x, train=train)
            for i, (feat, stride) in enumerate(
                _RESNET18_PLAN[: self.n_blocks]
            ):
                x = BasicBlock(features=feat, stride=stride,
                               name=f"block{i}")(x, train=train)
                x = FiLMLayer(channels=feat, name=f"film{i}")(x, lang_emb)
            return x

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(N, H, W, 3).astype(np.float32), jnp.bfloat16)
    lang = jnp.asarray(rng.randn(N, LANG).astype(np.float32), jnp.bfloat16)

    rows = []
    prev_ms, prev_tf = 0.0, 0.0
    for label, n_blocks in [("stem", 0), ("stage1", 2), ("stage2", 4),
                            ("stage3", 6), ("stage4", 8)]:
        model = Prefix(n_blocks=n_blocks)
        variables = model.init(jax.random.PRNGKey(0), x0, lang, train=False)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]
        )
        batch_stats = variables.get("batch_stats", {})

        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, x0, lang,
                train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out.astype(jnp.float32))

        grad_fn = jax.grad(loss_fn)

        @functools.partial(jax.jit, static_argnames="n")
        def chain(p, n):
            def body(_, p):
                g = grad_fn(p)
                return jax.tree_util.tree_map(
                    lambda w, gw: w - jnp.bfloat16(1e-9) * gw, p, g
                )

            out = jax.lax.fori_loop(0, n, body, p)
            return sum(
                jnp.sum(le.astype(jnp.float32))
                for le in jax.tree_util.tree_leaves(out)
            )

        n_short, n_long = 1, args.stage_n_long
        float(chain(params, n_short))
        float(chain(params, n_long))
        t0 = time.perf_counter()
        float(chain(params, n_short))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(params, n_long))
        t_l = time.perf_counter() - t0
        ms = (t_l - t_s) / (n_long - n_short) * 1e3

        tf = None
        try:
            cost = jax.jit(grad_fn).lower(params).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            if cost:
                tf = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            pass

        row = {"prefix": label, "cumulative_ms": round(ms, 2),
               "stage_ms": round(ms - prev_ms, 2)}
        if tf is not None:
            row["cumulative_tflop"] = round(tf, 3)
            row["stage_tflop"] = round(tf - prev_tf, 3)
            if row["stage_ms"] > 0:
                achieved = (tf - prev_tf) / (row["stage_ms"] / 1e3)
                row["stage_tflops_per_sec"] = round(achieved, 1)
                row["stage_pct_of_peak"] = round(
                    100.0 * achieved / V5E_BF16_PEAK_TFLOPS, 1
                )
            prev_tf = tf
        prev_ms = ms
        rows.append(row)
        print(json.dumps(row))
    return {"frames": N, "rows": rows}


def exp_stem_micro(args):
    """Standalone stem-conv formulations at flagship shapes (bf16,
    forward-only and forward+filter-grad):

      conv        lax 7x7/s2 conv as XLA emits it
      patches     im2col via conv_general_dilated_patches + one
                  [M,147]@[147,64] matmul (MXU-shaped equivalent)

    If 'patches' lands significantly under 'conv', the stem is
    tiling-bound in Mosaic's native 3-channel conv path and a
    re-formulated stem is worth adopting."""
    import jax
    import jax.numpy as jnp

    N, H, W = args.stage_frames, 116, 116
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, 3).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(
        rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05, jnp.bfloat16
    )

    def conv_fwd(w, x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def patches_fwd(w, x):
        p = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [N, 58, 58, 147]
        wm = w.transpose(2, 0, 1, 3).reshape(147, 64)
        return p @ wm

    def time_fn(fn, *xs):
        @functools.partial(jax.jit, static_argnames="n")
        def chain(w, x, n):
            def body(_, acc):
                out = fn(w, x + acc * jnp.bfloat16(1e-30))
                return jnp.sum(out.astype(jnp.float32)).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0.0))

        n_s, n_l = 1, args.stage_n_long
        float(chain(*xs, n_s))
        float(chain(*xs, n_l))
        t0 = time.perf_counter()
        float(chain(*xs, n_s))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(*xs, n_l))
        tl = time.perf_counter() - t0
        return (tl - ts) / (n_l - n_s) * 1e3

    result = {}
    result["conv_fwd_ms"] = round(time_fn(conv_fwd, w, x), 2)
    result["patches_fwd_ms"] = round(time_fn(patches_fwd, w, x), 2)

    # fwd + filter-grad (the real step's stem backward has no data-grad)
    def conv_fg(w, x):
        return jax.grad(
            lambda w: jnp.sum(conv_fwd(w, x).astype(jnp.float32))
        )(w)

    def patches_fg(w, x):
        return jax.grad(
            lambda w: jnp.sum(patches_fwd(w, x).astype(jnp.float32))
        )(w)

    result["conv_fwd_wgrad_ms"] = round(time_fn(conv_fg, w, x), 2)
    result["patches_fwd_wgrad_ms"] = round(time_fn(patches_fg, w, x), 2)
    # theoretical: fwd 0.194 TFLOP; bandwidth floor ~2.2 GB moved
    result["fwd_tflop"] = 0.194
    return result


def exp_stem_epilogue_micro(args):
    """The stem's non-conv part — train-mode BatchNorm + ReLU + 3x3/s2
    maxpool — in isolation at stem-activation shape ([3072, 58, 58, 64]
    bf16, 1.32 GB/pass). trunk_stages_pchain showed the whole stem at
    25.6 ms with the conv accounting for only ~5.4 (stem_micro): this
    measures how far the remaining ~20 ms sits above the bandwidth floor
    (v5e ~819 GB/s), i.e. the ceiling for a fused epilogue kernel."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    N, H, W, C = args.stage_frames, 58, 58, 64
    rng = np.random.RandomState(0)
    y0 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32), jnp.bfloat16)

    class Epilogue(nn.Module):
        @nn.compact
        def __call__(self, y, train=True):
            y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
            y = nn.relu(y)
            return nn.max_pool(
                y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )

    model = Epilogue()
    variables = model.init(jax.random.PRNGKey(0), y0, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    def fwd(p, y):
        return model.apply(
            {"params": p, "batch_stats": batch_stats}, y, train=True,
            mutable=["batch_stats"],
        )[0]

    def fwd_bwd(p, y):
        def loss(p, y):
            return jnp.sum(fwd(p, y).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1))(p, y)

    def time_fn(fn):
        @functools.partial(jax.jit, static_argnames="n")
        def chain(p, y, n):
            def body(_, acc):
                out = fn(p, y + acc * jnp.bfloat16(1e-30))
                return sum(
                    jnp.sum(le.astype(jnp.float32))
                    for le in jax.tree_util.tree_leaves(out)
                ).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0.0))

        n_s, n_l = 1, args.stage_n_long
        float(chain(params, y0, n_s))
        float(chain(params, y0, n_l))
        t0 = time.perf_counter()
        float(chain(params, y0, n_s))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(params, y0, n_l))
        tl = time.perf_counter() - t0
        return (tl - ts) / (n_l - n_s) * 1e3

    gb = N * H * W * C * 2 / 1e9
    result = {
        "fwd_ms": round(time_fn(fwd), 2),
        "fwd_bwd_ms": round(time_fn(fwd_bwd), 2),
        "activation_gb_per_pass": round(gb, 3),
        # fwd floor: stats read + normalize read/write (pool write is 4x
        # smaller); bwd floor: ~3 more passes
        "fwd_bandwidth_floor_ms": round(gb * 2.25 / 819.0 * 1e3, 2),
    }
    return result


def exp_epilogue_decomp(args):
    """Decompose the epilogue backward cost: BN+ReLU alone vs maxpool
    alone vs a SelectAndScatter-free maxpool backward (9-tap
    equality-routing via custom_vjp) at stem-activation shape."""
    import jax
    import jax.numpy as jnp

    N, H, W, C = args.stage_frames, 58, 58, 64
    rng = np.random.RandomState(0)
    y0 = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)

    def bn_relu(g, b, y):
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(yf * yf, axis=(0, 1, 2)) - mean * mean
        xhat = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.maximum((g * xhat + b).astype(jnp.bfloat16), 0)

    def pool(y):
        # init must be the PYTHON -inf scalar (not a traced array) for JAX
        # to lower the differentiable reduce-window-max path
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max,
            (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    from robot_manipulation_vq_vae_tpu.ops.pool import max_pool_3x3_s2

    def time_fn(fn, *consts):
        @functools.partial(jax.jit, static_argnames="n")
        def chain(y, n):
            def body(_, acc):
                out = fn(*consts, y + acc * jnp.bfloat16(1e-30))
                return sum(
                    jnp.sum(le.astype(jnp.float32))
                    for le in jax.tree_util.tree_leaves(out)
                ).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, n, body, jnp.bfloat16(0.0))

        n_s, n_l = 1, args.stage_n_long
        float(chain(y0, n_s))
        float(chain(y0, n_l))
        t0 = time.perf_counter()
        float(chain(y0, n_s))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(y0, n_l))
        tl = time.perf_counter() - t0
        return (tl - ts) / (n_l - n_s) * 1e3

    def bwd_of(fn, argnums):
        def g(*a):
            return jax.grad(
                lambda *aa: jnp.sum(fn(*aa).astype(jnp.float32)),
                argnums=argnums,
            )(*a)

        return g

    result = {}
    measurements = [
        ("bn_relu_fwd_ms", lambda: time_fn(bn_relu, gamma, beta)),
        ("bn_relu_fwd_bwd_ms",
         lambda: time_fn(bwd_of(bn_relu, (0, 1, 2)), gamma, beta)),
        ("maxpool_fwd_ms", lambda: time_fn(pool)),
        ("maxpool_fwd_bwd_ms", lambda: time_fn(bwd_of(pool, 0))),
        ("maxpool9tap_fwd_ms", lambda: time_fn(max_pool_3x3_s2)),
        ("maxpool9tap_fwd_bwd_ms",
         lambda: time_fn(bwd_of(max_pool_3x3_s2, 0))),
    ]
    for key, fn in measurements:
        try:
            result[key] = round(fn(), 2)
        except Exception as e:  # e.g. SelectAndScatter chain OOMs compile
            result[key] = f"failed: {type(e).__name__}"[:80]
        print(key, result[key])
    return result


def exp_pool_argmax(args):
    """Recorded-argmax pool backward (VERDICT r3 #3b): fwd+bwd of the
    stem's ReLU+maxpool at flagship stem-activation shape, comparing XLA's
    SelectAndScatter gradient against ops/pool_argmax.py's index-routed
    backward (argmax recorded in the forward, exactness proven in
    tests/test_pool_argmax.py — torch-compatible FIRST-max tie routing).
    Unlike every round-3 formulation, the backward neither recomputes the
    selection nor reads the forward activation."""
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.ops.pool_argmax import (
        max_pool_3x3_s2_argmax,
        reference_maxpool,
    )

    N, H, C = args.stage_frames, 58, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32), jnp.bfloat16)

    def make_loss(pool):
        def loss(x):
            out = pool(jax.nn.relu(x))
            return jnp.sum(out.astype(jnp.float32))
        return loss

    def time_fwd_bwd(pool):
        grad_fn = jax.grad(make_loss(pool))

        @functools.partial(jax.jit, static_argnames="n")
        def chain(x, n):
            def body(_, x):
                g = grad_fn(x)
                return x + jnp.bfloat16(1e-6) * g

            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.float32))

        n_s, n_l = 1, args.stage_n_long
        float(chain(x, n_s))
        float(chain(x, n_l))
        t0 = time.perf_counter()
        float(chain(x, n_s))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x, n_l))
        tl = time.perf_counter() - t0
        return (tl - ts) / (n_l - n_s) * 1e3

    sas_ms = time_fwd_bwd(reference_maxpool)
    argmax_ms = time_fwd_bwd(max_pool_3x3_s2_argmax)
    result = {
        "frames": N, "activation": [N, H, H, C],
        "select_and_scatter_ms": round(sas_ms, 2),
        "recorded_argmax_ms": round(argmax_ms, 2),
        "speedup": round(sas_ms / argmax_ms, 3) if argmax_ms else None,
    }
    return result


def exp_pallas_pool(args):
    """Round-5 FINAL stem attempt (VERDICT r4 #4): the 3x3/s2 maxpool as a
    Pallas kernel pair (ops/pallas/stem_pool.py) — recorded-argmax forward
    + index-routed backward, lane-packed layout with no strided vector
    ops. Times fwd+bwd of ReLU+pool at the flagship stem-activation shape
    against XLA's SelectAndScatter gradient (same harness as
    exp_pool_argmax, so the three formulations are directly comparable).
    Exactness proven in tests/test_stem_pool_pallas.py."""
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.ops.pallas.stem_pool import (
        max_pool_3x3_s2_pallas,
    )
    from robot_manipulation_vq_vae_tpu.ops.pool_argmax import (
        reference_maxpool,
    )

    N, H, C = args.stage_frames, 58, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, H, C).astype(np.float32), jnp.bfloat16)

    def make_loss(pool):
        def loss(x):
            out = pool(jax.nn.relu(x))
            return jnp.sum(out.astype(jnp.float32))
        return loss

    def time_fwd_bwd(pool):
        grad_fn = jax.grad(make_loss(pool))

        @functools.partial(jax.jit, static_argnames="n")
        def chain(x, n):
            def body(_, x):
                g = grad_fn(x)
                return x + jnp.bfloat16(1e-6) * g

            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.float32))

        n_s, n_l = 1, args.stage_n_long
        float(chain(x, n_s))
        float(chain(x, n_l))
        t0 = time.perf_counter()
        float(chain(x, n_s))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x, n_l))
        tl = time.perf_counter() - t0
        return (tl - ts) / (n_l - n_s) * 1e3

    sas_ms = time_fwd_bwd(reference_maxpool)
    pallas_ms = time_fwd_bwd(lambda y: max_pool_3x3_s2_pallas(y, False))
    return {
        "frames": N, "activation": [N, H, H, C],
        "select_and_scatter_ms": round(sas_ms, 2),
        "pallas_pair_ms": round(pallas_ms, 2),
        "speedup": round(sas_ms / pallas_ms, 3) if pallas_ms else None,
    }


def exp_pallas_pool_step(args):
    """config.train.pallas_pool measured in the FULL flagship step — the
    adoption-decision number (>= 5% on `value` flips the default)."""
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=args.n_long,
        pallas_pool=True,
    )


def exp_packed_step(args):
    """The packed-rgb-encoder mode measured in the FULL flagship step
    (config.train.packed_rgb_encoders — identical math, one grouped-conv
    trunk for the 3 cameras). The trunk-only delta is exp_packed_trunk;
    this is the adoption-decision number."""
    import bench_train

    return bench_train.measure(
        mixed_precision=True, batch_size=64, n_long=args.n_long,
        packed_rgb_encoders=True,
    )


def exp_packed_trunk(args):
    """Grouped-conv packing (VERDICT r3 #3a): the 3 per-camera FiLM
    trunks as ONE feature_group_count=3 trunk — identical math, separate
    weights (equivalence proven in tests/test_packed_film.py). Measures
    fwd+bwd of both variants at flagship shapes and reports the speedup.
    Targets the 8%-of-peak stem and 34%-of-peak stage1: packing triples
    the work per launched op without changing any numbers."""
    import jax
    import jax.numpy as jnp

    from robot_manipulation_vq_vae_tpu.models.base_nets import (
        ResNet18ConvFiLM,
    )
    from robot_manipulation_vq_vae_tpu.models.packed_film import (
        PackedResNet18ConvFiLM,
        pack_film_resnet18_params,
    )

    N, H = args.packed_frames, args.packed_img
    LANG, G = 768, 3
    rng = np.random.RandomState(0)
    x_cams = [
        jnp.asarray(rng.randn(N, H, H, 3), jnp.bfloat16) for _ in range(G)
    ]
    lang = jnp.asarray(rng.randn(N, LANG), jnp.bfloat16)

    models = [ResNet18ConvFiLM() for _ in range(G)]
    variables = [
        m.init(jax.random.PRNGKey(10 + g), x_cams[g].astype(jnp.float32),
               lang.astype(jnp.float32), train=False)
        for g, m in enumerate(models)
    ]
    bf16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16), t
    )
    sep_params = [bf16(v["params"]) for v in variables]
    sep_stats = [v["batch_stats"] for v in variables]

    def sep_loss(params_list):
        total = jnp.float32(0.0)
        for g in range(G):
            out = models[g].apply(
                {"params": params_list[g], "batch_stats": sep_stats[g]},
                x_cams[g], lang, train=True, mutable=["batch_stats"],
            )[0]
            total = total + jnp.sum(out.astype(jnp.float32))
        return total

    packed_vars = pack_film_resnet18_params(variables)
    packed_params = bf16(packed_vars["params"])
    packed_stats = packed_vars["batch_stats"]
    pm = PackedResNet18ConvFiLM(groups=G)
    x_packed = jnp.concatenate(x_cams, axis=-1)

    def packed_loss(params):
        out = pm.apply(
            {"params": params, "batch_stats": packed_stats},
            x_packed, lang, train=True, mutable=["batch_stats"],
        )[0]
        return jnp.sum(out.astype(jnp.float32))

    def measure(loss_fn, params):
        """fwd+bwd chain timing, params carried (training-like: no image
        gradient), differenced across two trip counts (design.md §7)."""
        grad_fn = jax.grad(loss_fn)

        @functools.partial(jax.jit, static_argnames="n")
        def chain(p, n):
            def body(_, p):
                g = grad_fn(p)
                return jax.tree_util.tree_map(
                    lambda a, b: a - jnp.asarray(1e-9, a.dtype) *
                    b.astype(a.dtype), p, g,
                )

            out = jax.lax.fori_loop(0, n, body, p)
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out)
            )

        n_short, n_long = 1, args.stage_n_long
        float(chain(params, n_short))
        float(chain(params, n_long))
        t0 = time.perf_counter()
        float(chain(params, n_short))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(params, n_long))
        t_l = time.perf_counter() - t0
        ms = (t_l - t_s) / (n_long - n_short) * 1e3
        tf = None
        try:
            cost = (
                jax.jit(grad_fn).lower(params).compile().cost_analysis()
            )
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            if cost:
                tf = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            pass
        row = {"ms": round(ms, 2)}
        if tf:
            row["tflop"] = round(tf, 3)
            row["tflops_per_sec"] = round(tf / (ms / 1e3), 1)
            row["pct_of_peak"] = round(
                100.0 * (tf / (ms / 1e3)) / V5E_BF16_PEAK_TFLOPS, 1
            )
        return row

    sep = measure(sep_loss, sep_params)
    packed = measure(packed_loss, packed_params)
    result = {
        "frames_per_camera": N, "img": H,
        "separate_3x": sep, "packed_g3": packed,
    }
    if sep.get("ms") and packed.get("ms"):
        result["speedup"] = round(sep["ms"] / packed["ms"], 3)
    return result


EXPERIMENTS = {
    "baseline": exp_baseline,
    "bn_frozen": exp_bn_frozen,
    "pool_free": exp_pool_free,
    "pool_free_bn_frozen": exp_pool_free_bn_frozen,
    "stem_pad8": exp_stem_pad8,
    "trunk_stages": exp_trunk_stages,
    "trunk_stages_pchain": exp_trunk_stages_pchain,
    "stem_micro": exp_stem_micro,
    "stem_epilogue_micro": exp_stem_epilogue_micro,
    "epilogue_decomp": exp_epilogue_decomp,
    "packed_trunk": exp_packed_trunk,
    "packed_step": exp_packed_step,
    "pool_argmax": exp_pool_argmax,
    "pallas_pool": exp_pallas_pool,
    "pallas_pool_step": exp_pallas_pool_step,
}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--exps", default="baseline",
                   help=f"comma list of {sorted(EXPERIMENTS)}")
    p.add_argument("--out", default="/tmp/mfu_campaign.json")
    p.add_argument("--tag", default="",
                   help="suffix for result names (flag-sweep runs)")
    p.add_argument("--n_long", type=int, default=6)
    p.add_argument("--stage_frames", type=int, default=3072)
    p.add_argument("--stage_n_long", type=int, default=6)
    p.add_argument("--packed_frames", type=int, default=1024,
                   help="frames PER CAMERA for the packed_trunk experiment "
                        "(flagship: batch 64 x ctx 16)")
    p.add_argument("--packed_img", type=int, default=116)
    args = p.parse_args(argv)

    from robot_manipulation_vq_vae_tpu.utils.train_utils import (
        enable_compile_cache,
    )

    enable_compile_cache()
    for name in args.exps.split(","):
        name = name.strip()
        fn = EXPERIMENTS[name]
        t0 = time.perf_counter()
        result = fn(args)
        result["wall_sec"] = round(time.perf_counter() - t0, 1)
        key = f"{name}+{args.tag}" if args.tag else name
        _append_result(args.out, key, result)


if __name__ == "__main__":
    main()

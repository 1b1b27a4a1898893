"""SPMD correctness: the jitted train step under a dp/mp mesh must produce
the same numbers as the unsharded step (GSPMD is layout, not semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_params,
    shard_state,
)


def test_mesh_construction():
    mesh = make_mesh(n_devices=8, mp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "mp")


@pytest.mark.slow
def test_sharded_matches_unsharded_lipvq_step():
    """One LipVQ gradient step: replicated-vs-dp-sharded results match."""
    import optax

    from robot_manipulation_vq_vae_tpu.models.tokenizers import LipVQVAE

    model = LipVQVAE(feature_dim=6, latent_dim=16, num_codes=8,
                     use_pallas=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 6).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            _, loss = model.apply({"params": p}, batch)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    p_ref, _, loss_ref = step(variables["params"], opt_state, x)

    mesh = make_mesh(n_devices=8, mp=1)
    with mesh:
        p_sh = shard_params(mesh, variables["params"])
        batch_sh = shard_batch(mesh, x)
        p_out, _, loss_sh = step(p_sh, opt_state, batch_sh)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_out)
    ):
        # sharded reductions reorder float sums; tolerance covers that
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        )


@pytest.mark.slow
def test_tp_sharding_rules_applied():
    """GPT FFN kernels get mp-sharded; everything else replicated."""
    from robot_manipulation_vq_vae_tpu.models.transformers import GPT_Backbone

    model = GPT_Backbone(embed_dim=32, context_length=4, num_layers=1,
                         num_heads=4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 32)), deterministic=True
    )
    mesh = make_mesh(n_devices=8, mp=2)
    params = shard_params(mesh, variables["params"])
    fc = params["block0"]["mlp_fc"]["kernel"]
    spec = fc.sharding.spec
    assert tuple(spec) == (None, "mp"), spec
    ln = params["block0"]["ln1"]["scale"]
    assert tuple(ln.sharding.spec) in ((), (None,)), ln.sharding.spec

    # sharded forward still equals replicated forward
    out_ref = model.apply(variables, jnp.ones((2, 4, 32)), deterministic=True)
    with mesh:
        out_sh = model.apply(
            {"params": params}, jnp.ones((2, 4, 32)), deterministic=True
        )
    np.testing.assert_allclose(
        np.asarray(out_sh), np.asarray(out_ref), atol=1e-5
    )


@pytest.mark.slow
def test_hvqvae_train_step_sharded_vs_single():
    """Full flagship (ICLTransformerHVQVAE) step: dp-sharded batch produces
    the same losses and parameters as unsharded."""
    import __graft_entry__ as ge

    config = ge._tiny_config()
    batch_np = ge._make_batch(b=8)

    algo1 = ge._make_algo(config)
    b1 = algo1.process_batch_for_training(batch_np)
    info1 = algo1.train_on_batch(b1, epoch=0)

    algo2 = ge._make_algo(config)
    b2 = algo2.process_batch_for_training(batch_np)
    import jax.numpy as jnp

    jbatch = {
        "obs": {k: jnp.asarray(v) for k, v in b2["obs"].items()},
        "actions": jnp.asarray(b2["actions"]),
    }
    algo2.ensure_state(jbatch)
    mesh = make_mesh(n_devices=8, mp=1)
    with mesh:
        algo2.state = shard_state(mesh, algo2.state)
        sharded = shard_batch(mesh, jbatch)
        info2 = algo2.train_on_batch(sharded, epoch=0)

    for k in ("action_loss", "vqvae_loss", "L_rec"):
        np.testing.assert_allclose(
            float(info1["losses"][k]), float(info2["losses"][k]),
            rtol=1e-4, atol=1e-5,
        )


@pytest.mark.slow
def test_hvqvae_multi_step_sharded_trajectory_and_serving():
    """FOUR consecutive dp-sharded flagship steps track the unsharded
    trajectory — per-step losses, final params, and BOTH optimizers' Adam
    moments (EMA/moment dp-aggregation drift only shows up after step 1) —
    and the SERVING path (get_action) matches under the mesh. Reference
    semantics: EMA robomimic/algo/heirarchical_vqvae.py:498-588, serving
    robomimic/algo/algo.py:666-924. The rgb+FiLM variant of this check
    (plus the VQ-collection comparison) runs in dryrun_multichip."""
    import jax.numpy as jnp

    import __graft_entry__ as ge

    config = ge._tiny_config()
    batches_np = [ge._make_batch(b=8, seed=s) for s in range(4)]

    algo_ref = ge._make_algo(config)
    jbatches = []
    for b in batches_np:
        pb = algo_ref.process_batch_for_training(b)
        jbatches.append({
            "obs": {k: jnp.asarray(v) for k, v in pb["obs"].items()},
            "actions": jnp.asarray(pb["actions"]),
        })
    ref_losses = [
        float(algo_ref.train_on_batch(jb, epoch=0)["losses"]["action_loss"])
        for jb in jbatches
    ]

    algo_sh = ge._make_algo(config)
    algo_sh.ensure_state(jbatches[0])
    mesh = make_mesh(n_devices=8, mp=1)
    with mesh:
        algo_sh.state = shard_state(mesh, algo_sh.state)
        for step, jb in enumerate(jbatches):
            info = algo_sh.train_on_batch(shard_batch(mesh, jb), epoch=0)
            np.testing.assert_allclose(
                float(info["losses"]["action_loss"]), ref_losses[step],
                rtol=1e-4, atol=1e-5,
                err_msg=f"sharded step-{step} loss diverges",
            )

    # final-state equivalence: params and every optimizer's moments.
    # fp32 reduction-order noise is amplified by Adam's 1/sqrt(nu) early in
    # training, hence looser-than-loss per-element bounds; aggregation bugs
    # produce O(n_devices)-factor errors.
    assert set(algo_sh.state.opt_states) == set(algo_ref.state.opt_states)
    for tag, sh_tree, ref_tree in (
        [("params", algo_sh.state.params, algo_ref.state.params)]
        + [(f"opt[{n}]", algo_sh.state.opt_states[n],
            algo_ref.state.opt_states[n])
           for n in sorted(algo_sh.state.opt_states)]
    ):
        ge._assert_tree_close(tag, sh_tree, ref_tree, atol=5e-4, rtol=1e-2,
                              context="after 4 sharded steps")

    # serving path under the mesh: both algos consumed identical RNG
    # streams (same seed, same step count), so sample keys match
    rng = np.random.RandomState(7)
    obs = {
        k: rng.randn(8, ge.H, *s).astype(np.float32)
        for k, s in ge.OBS_KEYS.items()
    }
    ctx = {
        "obs": {k: v.copy() for k, v in obs.items()},
        "actions": rng.randn(8, ge.H, ge.A).astype(np.float32),
    }
    act_ref = np.asarray(algo_ref.get_action(obs, context_batch=ctx))
    with mesh:
        act_sh = np.asarray(algo_sh.get_action(obs, context_batch=ctx))
    np.testing.assert_allclose(
        act_sh, act_ref, atol=1e-3, rtol=1e-3,
        err_msg="sharded get_action diverges from unsharded serving",
    )


@pytest.mark.slow
def test_dead_code_replacement_fires_under_dp_sharding():
    """Dead-code replacement (reference heirarchical_vqvae.py:543-588) must
    actually FIRE and still produce sharded==unsharded VQ state. The
    replacement draws random *batch samples* (`ops/quantize.py
    replace_dead_codes`: randint picks into the dp-sharded flat-embedding
    array) — exactly where per-shard RNG or batch-visibility divergence
    would break equality, and a path the trajectory tests only graze.

    Recipe: step 0 on a diverse batch (kmeans init covers all 32 z-codes),
    step 1 on a CLUSTERED batch (4 prototypes): ~28 codes get zero
    assignments, their EMA mass decays 0.8 < threshold 1.0, and replacement
    rewrites them with batch-sampled rows. We assert (a) many codebook rows
    JUMPED (replacement demonstrably fired, not just EMA drift) and (b) the
    full vq collection matches the unsharded run."""
    import jax.numpy as jnp

    import __graft_entry__ as ge

    config = ge._tiny_config()
    batch_init = ge._make_batch(b=8, seed=0)
    batch_clustered = ge._make_batch(b=8, seed=1, clustered=True)

    def to_jax(algo, b):
        pb = algo.process_batch_for_training(b)
        return {
            "obs": {k: jnp.asarray(v) for k, v in pb["obs"].items()},
            "actions": jnp.asarray(pb["actions"]),
        }

    # ---- unsharded reference trajectory ----
    algo_ref = ge._make_algo(config)
    jb0 = to_jax(algo_ref, batch_init)
    jb1 = to_jax(algo_ref, batch_clustered)
    algo_ref.train_on_batch(jb0, epoch=0)
    cb_before = np.asarray(
        jax.device_get(algo_ref.state.aux["vqvae"]["vq"]["codebook_z"])
    )
    algo_ref.train_on_batch(jb1, epoch=0)
    vq_ref = jax.device_get(algo_ref.state.aux["vqvae"]["vq"])
    cb_after = np.asarray(vq_ref["codebook_z"])

    # (a) replacement fired: EMA alone moves a (cosine-normalized) code row
    # by <= (1-decay) toward its assigned samples; a replacement REWRITES
    # the row with a batch sample — an O(1) jump on the unit sphere
    row_jump = np.linalg.norm(cb_after - cb_before, axis=1)
    n_jumped = int(np.sum(row_jump > 0.5))
    assert n_jumped >= 8, (
        f"dead-code replacement did not demonstrably fire: only {n_jumped} "
        f"codebook_z rows jumped (max jump {row_jump.max():.3f}) — the "
        f"clustered batch should starve and replace >= 8 of 32 codes"
    )

    # ---- identical trajectory, dp-sharded ----
    algo_sh = ge._make_algo(config)
    algo_sh.ensure_state(jb0)
    mesh = make_mesh(n_devices=8, mp=1)
    with mesh:
        algo_sh.state = shard_state(mesh, algo_sh.state)
        algo_sh.train_on_batch(shard_batch(mesh, jb0), epoch=0)
        algo_sh.train_on_batch(shard_batch(mesh, jb1), epoch=0)
    vq_sh = jax.device_get(algo_sh.state.aux["vqvae"]["vq"])

    # (b) sharded == unsharded across the whole vq collection. Replacement
    # picks are identical by construction (replicated rng + global batch
    # under GSPMD); near-Voronoi assignment flips from fp32 reduction-order
    # noise may still diverge the odd row, so codebooks compare per-row
    # with a small casualty budget (same discipline as dryrun_multichip).
    assert set(vq_sh) == set(vq_ref)
    for key in sorted(vq_sh):
        a = np.asarray(vq_sh[key], np.float32)
        b = np.asarray(vq_ref[key], np.float32)
        if key == "initialized":
            np.testing.assert_array_equal(a, b)
        elif key.startswith(("codebook", "embed_avg")):
            rows_a = a.reshape(a.shape[0], -1)
            rows_b = b.reshape(b.shape[0], -1)
            row_ok = np.all(
                np.abs(rows_a - rows_b) <= 6e-2 + 3e-2 * np.abs(rows_b),
                axis=1,
            )
            n_div = int(np.sum(~row_ok))
            assert n_div <= 3, (
                f"vq '{key}': {n_div}/{len(row_ok)} rows diverge sharded-vs-"
                f"unsharded through a replacement-heavy step (random-sample "
                f"draw divergence under dp-sharding)"
            )
        else:
            np.testing.assert_allclose(
                a, b, rtol=3e-2, atol=6e-2,
                err_msg=f"vq '{key}' diverges sharded-vs-unsharded through "
                        f"a replacement-heavy step",
            )
            if key.startswith("cluster_size"):
                np.testing.assert_allclose(
                    float(a.sum()), float(b.sum()), rtol=2e-3,
                    err_msg=f"total EMA mass of '{key}' not conserved under "
                            f"dp-sharded dead-code replacement",
                )

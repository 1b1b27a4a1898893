"""Optimizer-trajectory parity: K optimizer steps in optax must track K
steps of the reference's torch Adam on identical data and identical init.

This is the training-dynamics claim that forward/gradient parity alone does
not establish. Mirrors the reference's own usage:
  * LipVQ:  ``backbone_lfqvae_v5.py:87-103`` (Adam lr=1e-3 on the full loss)
  * HVQVAE: ``heirarchical_vqvae.py:590-685`` (grad step on encoder/decoder
    via compute_vqvae_loss + in-forward EMA codebook updates)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from reference_loader import load_lipvq_reference, load_hvqvae_reference
from robot_manipulation_vq_vae_tpu.models.tokenizers import LipVQVAE
from robot_manipulation_vq_vae_tpu.models.tokenizers.hvqvae import (
    HierarchicalVQVAE,
    compute_vqvae_loss,
)
from test_lipvq_parity import (
    FEATURE_DIM, LATENT_DIM, NUM_CODES, HIDDEN, torch_params_to_flax,
)
from test_hvqvae_parity import (
    A_DIM, E_DIM, KZ, KQ, STAGES, LAYERS, torch_to_flax,
)


def assert_mostly_close(actual, desired, atol, frac, max_abs, msg=""):
    """Quantile-based closeness: Adam near t=0 has sqrt(v_hat)~|g|, so a
    single gradient sign flip from fp noise moves one coordinate by ~lr per
    step; a handful of such coordinates is expected and bounded, while bulk
    agreement must be tight."""
    a = np.asarray(actual).ravel()
    d = np.asarray(desired).ravel()
    diff = np.abs(a - d)
    ok_frac = float((diff <= atol).mean())
    assert ok_frac >= frac, (
        f"{msg}: only {ok_frac:.4f} of elements within atol={atol} "
        f"(need {frac}); max|diff|={diff.max():.4g}"
    )
    assert float(diff.max()) <= max_abs, (
        f"{msg}: max|diff|={diff.max():.4g} exceeds bound {max_abs}"
    )


@pytest.mark.slow
def test_lipvq_adam_trajectory_parity():
    """50 Adam steps on fixed data: loss trajectory and final params of the
    optax run must track the reference torch run."""
    ref = load_lipvq_reference()
    torch.manual_seed(0)
    m = ref.LLFQVAE_V4(FEATURE_DIM, LATENT_DIM, NUM_CODES, hidden_dim=HIDDEN)
    m.train()

    variables = jax.tree_util.tree_map(jnp.asarray, torch_params_to_flax(m))
    model = LipVQVAE(
        feature_dim=FEATURE_DIM, latent_dim=LATENT_DIM, num_codes=NUM_CODES,
        hidden_dim=HIDDEN, use_pallas=False,
    )

    data = np.random.RandomState(3).randn(80, FEATURE_DIM).astype(np.float32)
    x_t = torch.from_numpy(data)
    x_j = jnp.asarray(data)

    lr = 1e-3
    opt_t = torch.optim.Adam(m.parameters(), lr=lr)
    # torch.optim.Adam and optax.adam share the same update rule
    # (bias-corrected moments, eps added after the sqrt)
    tx = optax.adam(lr)
    params = variables["params"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            _, loss = model.apply({"params": p}, x_j)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n_steps = 50
    losses_t, losses_j = [], []
    for _ in range(n_steps):
        opt_t.zero_grad()
        _, loss_t = m(x_t)
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

        params, opt_state, loss_j = step(params, opt_state)
        losses_j.append(float(loss_j))

    np.testing.assert_allclose(
        np.asarray(losses_j), np.asarray(losses_t), atol=5e-4, rtol=2e-3,
        err_msg="optax Adam loss trajectory diverged from torch Adam",
    )
    # losses must actually decrease (the trajectory is a real optimization)
    assert losses_t[-1] < losses_t[0]

    final_t = torch_params_to_flax(m)["params"]
    for (kp_j, leaf_j), (kp_t, leaf_t) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(final_t),
               key=lambda kv: str(kv[0])),
    ):
        assert str(kp_j) == str(kp_t)
        assert_mostly_close(
            leaf_j, leaf_t, atol=6e-3, frac=0.98, max_abs=0.05,
            msg=f"param {kp_j} after {n_steps} Adam steps",
        )


def test_hvqvae_adam_trajectory_parity():
    """30 Adam steps co-evolving gradients (encoder/decoder) with EMA
    codebook updates: loss trajectory, final params, and final codebooks
    must track the reference. cluster_size is initialized healthy (10.0)
    so the RNG-dependent dead-code replacement never fires on either side
    (threshold 1.0, decay 0.99: 10*0.99^30 = 7.4 > 1)."""
    ref = load_hvqvae_reference()
    torch.manual_seed(0)
    m = ref.HierarchicalVQVAE(
        action_dim=A_DIM, embed_dim=E_DIM, num_subclusters=KZ,
        num_clusters=KQ, num_stages=STAGES, num_layers_per_stage=LAYERS,
        dropout=0.0, kmeans_init=False,
    )
    with torch.no_grad():
        m.codebook_z.copy_(
            torch.nn.functional.normalize(torch.randn(KZ, E_DIM), dim=-1)
        )
        m.codebook_q.copy_(
            torch.nn.functional.normalize(torch.randn(KQ, E_DIM), dim=-1)
        )
        m.embed_avg_z.copy_(m.codebook_z * 10.0)
        m.embed_avg_q.copy_(m.codebook_q * 10.0)
        m.cluster_size_z.fill_(10.0)
        m.cluster_size_q.fill_(10.0)
        m.codebooks_initialized.fill_(True)
    m.train()

    variables = torch_to_flax(m)
    model = HierarchicalVQVAE(
        action_dim=A_DIM, embed_dim=E_DIM, num_subclusters=KZ,
        num_clusters=KQ, num_stages=STAGES, num_layers_per_stage=LAYERS,
        dropout=0.0, kmeans_init=False,
    )

    data = np.random.RandomState(7).randn(4, 10, A_DIM).astype(np.float32)
    x_t = torch.from_numpy(data)
    x_j = jnp.asarray(data)

    lr = 1e-3
    opt_t = torch.optim.Adam(m.parameters(), lr=lr)
    tx = optax.adam(lr)
    params = variables["params"]
    vq = variables["vq"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, vq, opt_state):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "vq": vq}, x_j, training=True,
                mutable=["vq"],
                rngs={"dropout": jax.random.PRNGKey(0),
                      "vq": jax.random.PRNGKey(1)},
            )
            losses = compute_vqvae_loss(
                out, x_j, commitment_cost=1.0, lambda_rec=1.0
            )
            return losses["vqvae_loss"], mutated["vq"]

        (loss, new_vq), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_vq, opt_state, loss

    n_steps = 30
    losses_t, losses_j = [], []
    for _ in range(n_steps):
        opt_t.zero_grad()
        out_t = m(x_t, training=True)
        loss_dict = m.compute_vqvae_loss(out_t, x_t, lambda_rec=1.0)
        loss_t = loss_dict["vqvae_loss"]
        loss_t.backward()
        opt_t.step()
        losses_t.append(float(loss_t.detach()))

        params, vq, opt_state, loss_j = step(params, vq, opt_state)
        losses_j.append(float(loss_j))

    # dead-code replacement must not have fired (precondition of the test)
    assert float(m.cluster_size_z.min()) > m.replace_threshold_z
    assert float(jnp.min(vq["cluster_size_z"])) > 1.0

    assert_mostly_close(
        losses_j, losses_t, atol=5e-3, frac=0.90, max_abs=0.03,
        msg="HVQVAE co-training loss trajectory",
    )
    assert losses_t[-1] < losses_t[0]

    # final EMA codebooks track each other
    assert_mostly_close(
        vq["codebook_z"], m.codebook_z.detach().numpy(),
        atol=1.5e-2, frac=0.99, max_abs=0.05, msg="codebook_z",
    )
    assert_mostly_close(
        vq["codebook_q"], m.codebook_q.detach().numpy(),
        atol=1.5e-2, frac=0.99, max_abs=0.05, msg="codebook_q",
    )

    # final encoder/decoder params track each other
    final_t = torch_to_flax(m)["params"]
    for (kp_j, leaf_j), (kp_t, leaf_t) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(final_t),
               key=lambda kv: str(kv[0])),
    ):
        assert str(kp_j) == str(kp_t)
        assert_mostly_close(
            leaf_j, leaf_t, atol=1e-2, frac=0.95, max_abs=0.05,
            msg=f"param {kp_j} after {n_steps} Adam steps",
        )


@pytest.mark.slow
def test_gpt_adamw_trajectory_parity():
    """30 AdamW steps on the GPT backbone (the policy's trunk, where the
    action-loss gradients flow): optax.adamw must track torch.optim.AdamW
    on identical data from transplanted-identical init (reference policy
    optimizer: torch_utils.py:90-121 adamw w/ L2 as weight_decay)."""
    from test_transformer_parity import ref_transformers as _rt_fixture  # noqa: F401
    import test_transformer_parity as ttp
    from robot_manipulation_vq_vae_tpu.models.transformers import GPT_Backbone
    from robot_manipulation_vq_vae_tpu.utils.ckpt_conversion import (
        convert_gpt_backbone,
    )

    # materialize the reference module (fixture body, without pytest wiring)
    ref_mod = ttp.ref_transformers.__wrapped__()

    EMBED, HEADS, LAYERS_N, T, B = 32, 4, 2, 6, 8
    LR, WD, N_STEPS = 1e-3, 1e-4, 30

    torch.manual_seed(0)
    tm = ref_mod.GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=False,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=LAYERS_N, num_heads=HEADS,
    )
    tm.eval()  # deterministic forward: dropout off on both sides
    jm = GPT_Backbone(
        embed_dim=EMBED, context_length=T, causal=False,
        attn_dropout=0.0, block_output_dropout=0.0,
        num_layers=LAYERS_N, num_heads=HEADS,
    )
    # .copy(): torch's AdamW mutates tensors in place, and on CPU
    # jnp.asarray may zero-copy the shared numpy views - without the copy
    # the "initial" jax params would silently track the torch training
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    params = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True),
        convert_gpt_backbone(sd, prefix="", num_layers=LAYERS_N),
    )

    rng = np.random.RandomState(3)
    xs = rng.randn(N_STEPS, B, T, EMBED).astype(np.float32)
    ys = rng.randn(N_STEPS, B, T, EMBED).astype(np.float32)

    # ---- torch trajectory ----
    opt_t = torch.optim.AdamW(tm.parameters(), lr=LR, weight_decay=WD)
    losses_t = []
    for i in range(N_STEPS):
        opt_t.zero_grad()
        out = tm(torch.from_numpy(xs[i]))
        loss = ((out - torch.from_numpy(ys[i])) ** 2).mean()
        loss.backward()
        opt_t.step()
        losses_t.append(float(loss))

    # ---- optax trajectory ----
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = jm.apply({"params": p}, x)
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_j = []
    for i in range(N_STEPS):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(xs[i]), jnp.asarray(ys[i])
        )
        losses_j.append(float(loss))

    np.testing.assert_allclose(
        losses_j, losses_t, rtol=2e-3, atol=2e-5,
        err_msg="optax AdamW loss trajectory diverged from torch AdamW",
    )
    # final params: transplant torch back and compare a couple of leaves
    sd_after = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params_t_after = convert_gpt_backbone(
        sd_after, prefix="", num_layers=LAYERS_N
    )
    flat_j = jax.tree_util.tree_leaves_with_path(params)
    flat_t = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(jnp.asarray, params_t_after)
    ))
    checked = 0
    for kp, leaf in flat_j:
        assert_mostly_close(
            leaf, flat_t[kp], atol=5e-4, frac=0.995, max_abs=LR * N_STEPS,
            msg=f"param {kp} after {N_STEPS} AdamW steps",
        )
        checked += 1
    assert checked > 10

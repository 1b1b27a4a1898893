"""MCR representation pretraining (reference vendored subproject
``robomimic/algo/mcr/``: ``train_representation.py:36-243``,
``trainer.py:25-172``, ``models/models_mcr.py:25-159``).

The reference trains a ResNet trunk with a time-contrastive (TCN) InfoNCE
loss over video frame quintuples, plus optional behavior-cloning and
state-alignment losses, then the main path warm-starts the MCR policy's
visual encoder from the resulting trunk (``algo/mcr.py``).

TPU-native redesign (vs the reference's DataParallel + per-loss Python
loops):

* the whole step — encode all ``B*5`` frames in ONE batched trunk pass,
  all three losses, Adam update — is a single jitted function; BatchNorm
  statistics ride the ``batch_stats`` collection through the step;
* the shuffled-negative sampling (reference trainer.py:77-83 draws
  ``num_negatives`` torch ``randperm``s) becomes ``jax.random.permutation``
  with an rng threaded through the step state, so the step stays pure and
  reproducible;
* frames live channels-last (NHWC) and the trunk pass is bf16-friendly.

The produced trunk is exported in exactly the pickle format the policy's
``RMVQ_MCR_CKPT`` warm-start consumes (``algo/mcr.py:51-82``), closing the
pretrain -> policy loop that the reference leaves implicit.

Batch layout (reference MCRBuffer sample order, train_representation.py
:154-174): ``images`` uint8 [B, 5, H, W, 3] where frame 0 = clip start,
1 = clip goal/end, and 2, 3, 4 = the ordered TCN triplet (es0, es1, es2);
``actions`` float [B, 5, action_dim]; ``state_s0``/``state_s2`` float
[B, state_dim] (only consumed when ``align_state_weight > 0``). The
language strings the reference loader also yields are unused by its
trainer and are dropped here.
"""

import pickle

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from robot_manipulation_vq_vae_tpu.models.base_nets import (
    _IMAGENET_MEAN,
    _IMAGENET_STD,
    ResNet18Conv,
    ResNet34Conv,
    ResNet50Conv,
)

EPS = 1e-8  # reference models_mcr.py:18

_TRUNKS = {18: ResNet18Conv, 34: ResNet34Conv, 50: ResNet50Conv}
_OUTDIMS = {18: 512, 34: 512, 50: 2048}


def mcr_preprocess(x):
    """[B, H, W, 3] uint8 [0, 255] -> normalized float (reference
    models_mcr.py:136-151: /255, then Resize(256) + CenterCrop(224) when
    the input is not already 224, then ImageNet-normalize)."""
    x = jnp.asarray(x, jnp.float32) / 255.0
    h, w = x.shape[-3], x.shape[-2]
    if (h, w) != (224, 224):
        if h <= w:
            nh, nw = 256, int(256 * w / h)
        else:
            nh, nw = int(256 * h / w), 256
        x = jax.image.resize(
            x, (*x.shape[:-3], nh, nw, x.shape[-1]), method="bilinear"
        )
        top = int(round((nh - 224) / 2.0))
        left = int(round((nw - 224) / 2.0))
        x = x[..., top:top + 224, left:left + 224, :]
    mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(_IMAGENET_STD, x.dtype)
    return (x - mean) / std


class MCRRepresentation(nn.Module):
    """Trunk + optional state projector + optional BC heads (reference
    ``MCR``, models_mcr.py:25-159)."""

    size: int = 34
    hidden_dim: int = 1024
    l2dist: bool = True
    tcn_weight: float = 1.0
    align_state_weight: float = 0.0
    bc_weight: float = 0.0
    state_window: int = 3
    use_action: bool = False
    action_dim: int = 7
    num_negatives: int = 3
    bc_feature_dim: int = 50
    bc_hidden_dim: int = 512
    # small inputs (tests) skip the 256->224 resize: the trunk is fully
    # convolutional, and the resize path only matters for artifact fidelity
    resize_to_224: bool = True

    @property
    def outdim(self):
        return _OUTDIMS[self.size]

    def setup(self):
        self.trunk = _TRUNKS[self.size](name="trunk")
        if self.align_state_weight > 0.0:
            state_in = 14 * self.state_window
            if self.use_action:
                state_in += 7 * (self.state_window - 1)
            del state_in  # input dim is shape-inferred by flax Dense
            self.state_encoder = nn.Sequential([
                nn.Dense(self.hidden_dim), nn.relu, nn.Dense(self.outdim),
            ])
        if self.bc_weight > 0.0:
            self.bc_trunk_dense = nn.Dense(self.bc_feature_dim)
            self.bc_trunk_norm = nn.LayerNorm()
            self.bc_policy = nn.Sequential([
                nn.Dense(self.bc_hidden_dim), nn.relu,
                nn.Dense(self.bc_hidden_dim), nn.relu,
                nn.Dense(self.action_dim),
            ])

    def encode(self, images, train=False):
        """uint8 [N, H, W, 3] -> [N, outdim] pooled features."""
        if self.resize_to_224:
            x = mcr_preprocess(images)
        else:
            x = jnp.asarray(images, jnp.float32) / 255.0
            mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(_IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        feats = self.trunk(x, train=train)
        return jnp.mean(feats, axis=(-3, -2))  # global average pool (== fc=Identity)

    def encode_state(self, s):
        return self.state_encoder(s)

    def bc_predict(self, features):
        h = jnp.tanh(self.bc_trunk_norm(self.bc_trunk_dense(features)))
        return self.bc_policy(h)

    def sim(self, a, b):
        """-L2 or cosine similarity (reference models_mcr.py:154-159).

        The L2 branch needs a zero-safe norm: the shuffled-negative
        permutations have fixed points (~1 per random permutation), where
        ``sim(x, x)`` differentiates ``||0||`` — torch defines the 2-norm
        subgradient at 0 as 0, while a naive sqrt yields NaN.
        """
        if self.l2dist:
            d2 = jnp.sum((a - b) ** 2, axis=-1)
            is_zero = d2 == 0.0
            return -jnp.where(
                is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, d2))
            )
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), EPS)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), EPS)
        return jnp.sum(an * bn, axis=-1)

    def __call__(self, batch, neg_perms, train=False):
        """Full loss surface (reference Trainer.update, trainer.py:29-163).

        ``neg_perms``: int array [num_negatives, B] of permutation indices
        for the cross-video negatives (explicit so tests can pin them).
        Returns (full_loss, metrics dict).
        """
        images = batch["images"]
        b, s = images.shape[0], images.shape[1]
        alles = self.encode(
            images.reshape((b * s,) + images.shape[2:]), train=train
        )
        alle = alles.reshape(b, s, -1)
        es0, es1, es2 = alle[:, 2], alle[:, 3], alle[:, 4]

        metrics = {}
        full_loss = 0.0

        if self.tcn_weight > 0.0:
            sim_0_2 = self.sim(es2, es0)
            sim_1_2 = self.sim(es2, es1)
            sim_0_1 = self.sim(es1, es0)
            neg0 = jnp.stack(
                [self.sim(es0, es0[perm]) for perm in neg_perms], axis=-1
            )
            neg2 = jnp.stack(
                [self.sim(es2, es2[perm]) for perm in neg_perms], axis=-1
            )
            smooth1 = -jnp.log(EPS + (
                jnp.exp(sim_1_2)
                / (EPS + jnp.exp(sim_0_2) + jnp.exp(sim_1_2)
                   + jnp.sum(jnp.exp(neg2), -1))
            ))
            smooth2 = -jnp.log(EPS + (
                jnp.exp(sim_0_1)
                / (EPS + jnp.exp(sim_0_1) + jnp.exp(sim_0_2)
                   + jnp.sum(jnp.exp(neg0), -1))
            ))
            tcn_loss = jnp.mean((smooth1 + smooth2) / 2.0)
            aligned = jnp.mean(
                (sim_0_2 < sim_1_2).astype(jnp.float32)
                * (sim_0_1 > sim_0_2).astype(jnp.float32)
            )
            metrics["tcnloss"] = tcn_loss
            metrics["aligned"] = aligned
            full_loss = full_loss + self.tcn_weight * tcn_loss

        if self.bc_weight > 0.0:
            actions = batch["actions"].reshape(b * s, -1)
            pred = self.bc_predict(alles)
            bc_loss = jnp.mean(
                (pred - jax.lax.stop_gradient(actions)) ** 2
            )
            metrics["bc_loss"] = bc_loss
            full_loss = full_loss + self.bc_weight * bc_loss

        if self.align_state_weight > 0.0:
            s0_proj = self.encode_state(batch["state_s0"])
            s2_proj = self.encode_state(batch["state_s2"])
            sim_0_0s = self.sim(es0, s0_proj)
            sim_2_2s = self.sim(es2, s2_proj)
            sim_0_2s = self.sim(es0, s2_proj)
            sim_2_0s = self.sim(es2, s0_proj)
            s0loss = -jnp.log(EPS + (
                jnp.exp(sim_0_0s)
                / (EPS + jnp.exp(sim_0_0s) + jnp.exp(sim_0_2s))
            ))
            s2loss = -jnp.log(EPS + (
                jnp.exp(sim_2_2s)
                / (EPS + jnp.exp(sim_2_2s) + jnp.exp(sim_2_0s))
            ))
            align_loss = jnp.mean((s0loss + s2loss) / 2.0)
            metrics["state_align_loss"] = align_loss
            metrics["stateimg_aligned"] = jnp.mean(
                (sim_0_2s < sim_0_0s).astype(jnp.float32)
                * (sim_2_0s < sim_2_2s).astype(jnp.float32)
            )
            full_loss = full_loss + self.align_state_weight * align_loss

        metrics["full_loss"] = full_loss
        return full_loss, metrics


class MCRPretrainer:
    """Jitted pretraining loop (reference ``Workspace``,
    train_representation.py:36-208, minus the DataParallel/hydra
    scaffolding — multi-chip runs shard the batch via ``parallel.make_mesh``
    exactly like the main training path)."""

    def __init__(self, model: MCRRepresentation, lr=1e-4, seed=1,
                 example_batch=None):
        self.model = model
        self.tx = optax.adam(lr)
        self.step = 0
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(rng)
        if example_batch is None:
            raise ValueError("example_batch is required for initialization")
        b = example_batch["images"].shape[0]
        neg_perms = np.tile(np.arange(b), (model.num_negatives, 1))
        variables = self.model.init(
            init_rng, example_batch, jnp.asarray(neg_perms), train=False
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)
        self._train_step = jax.jit(self._step_impl, static_argnames="train")

    def _step_impl(self, params, batch_stats, opt_state, rng, batch,
                   train=True):
        rng, perm_rng = jax.random.split(rng)
        b = batch["images"].shape[0]
        neg_perms = jax.vmap(
            lambda k: jax.random.permutation(k, b)
        )(jax.random.split(perm_rng, self.model.num_negatives))

        def loss_fn(p):
            out, mutated = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch, neg_perms, train=train,
                mutable=["batch_stats"] if train else [],
            )
            loss, metrics = out
            return loss, (metrics, mutated)

        if train:
            grads, (metrics, mutated) = jax.grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            batch_stats = mutated.get("batch_stats", batch_stats)
        else:
            _, (metrics, _) = loss_fn(params)
        return params, batch_stats, opt_state, rng, metrics

    def update(self, batch, eval=False):
        """One train (or eval) step; returns the metrics dict (reference
        Trainer.update)."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        (self.params, self.batch_stats, self.opt_state, self.rng,
         metrics) = self._train_step(
            self.params, self.batch_stats, self.opt_state, self.rng, batch,
            train=not eval,
        )
        if not eval:
            self.step += 1
        return {k: float(v) for k, v in metrics.items()}

    # -- snapshots (reference save_snapshot/load_snapshot :210-225) --

    def save_snapshot(self, path):
        tree = {
            "global_step": self.step,
            "params": jax.device_get(self.params),
            "batch_stats": jax.device_get(self.batch_stats),
            "opt_state": jax.device_get(self.opt_state),
        }
        with open(path, "wb") as f:
            pickle.dump(tree, f)

    def load_snapshot(self, path):
        with open(path, "rb") as f:
            tree = pickle.load(f)
        self.params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
        self.batch_stats = jax.tree_util.tree_map(
            jnp.asarray, tree["batch_stats"]
        )
        self.opt_state = jax.tree_util.tree_map(
            jnp.asarray, tree["opt_state"],
            is_leaf=lambda x: isinstance(x, (np.ndarray, jnp.ndarray)),
        )
        self.step = int(tree.get("global_step", 0))

    def export_trunk(self, path):
        """Write the visual trunk params in the pickle format the MCR
        policy's ``RMVQ_MCR_CKPT`` warm-start grafts onto its encoder
        backbones (``algo/mcr.py:51-82``)."""
        with open(path, "wb") as f:
            pickle.dump(jax.device_get(self.params["trunk"]), f)


def synthetic_batches(batch_size=4, image_size=64, action_dim=7,
                      state_dim=42, num_batches=None, seed=0):
    """Synthetic MCR-format batch iterator for tests / dry-runs (stands in
    for the reference's ego4d/droid MCRBuffer loaders, which consume
    external video datasets)."""
    rng = np.random.RandomState(seed)
    n = 0
    while num_batches is None or n < num_batches:
        yield {
            "images": rng.randint(
                0, 255, (batch_size, 5, image_size, image_size, 3)
            ).astype(np.uint8),
            "actions": rng.uniform(
                -1, 1, (batch_size, 5, action_dim)
            ).astype(np.float32),
            "state_s0": rng.randn(batch_size, state_dim).astype(np.float32),
            "state_s2": rng.randn(batch_size, state_dim).astype(np.float32),
        }
        n += 1

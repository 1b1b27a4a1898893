"""Hierarchical VQ-VAE action-sequence tokenizer (MSTCN encoder/decoder).

TPU-native re-design of the reference ``HierarchicalVQVAE``
(``robomimic/algo/heirarchical_vqvae.py:224-707``):

  actions [B,T,A] --MSTCN dilated-conv encoder--> embeddings [B,T,D]
    --cosine nearest against codebook Z (STE)--> quantized_z
    --cosine nearest against codebook Q (STE)--> quantized_q
    --MSTCN decoder--> reconstructed actions

Stateful pieces and how they become functional:
  * EMA codebook statistics (counts + embedding sums, reference
    ``_ema_update`` :498-541) live in a Flax ``vq`` variable collection and
    are updated inside the jitted train step via ``mutable=["vq"]``;
  * dead-code replacement (:543-588) is branch-free: a ``jnp.where`` over
    the whole codebook with random batch samples - no Python conditionals;
  * the first-batch KMeans init (sklearn on host, :321-419) becomes an
    in-graph fixed-iteration Lloyd's k-means behind ``lax.cond`` on an
    ``initialized`` flag, so initialization never leaves the device
    (documented divergence: sklearn kmeans++ n_init=10 vs jitted random
    init - both are batch-coverage inits, cluster identities differ).

Faithful behavioral details (parity-tested in eval mode):
  * codes are gathered from the *raw* codebook while similarities use
    normalized copies (:441-451);
  * STE straight-throughs the *normalized* embeddings (:453-459);
  * quantize_q consumes the STE'd quantized_z (:606);
  * EMA for Z uses raw encoder embeddings; EMA for Q uses quantized_z
    values (:613-632); prototypes are re-normalized after EMA;
  * losses: MSE recon + commitment on normalized pairs (:649-685).
"""


import flax.linen as nn
import jax
import jax.numpy as jnp

from robot_manipulation_vq_vae_tpu.ops import quantize as Q
from robot_manipulation_vq_vae_tpu.utils import initializers as init


def _dense(features, name=None):
    return nn.Dense(
        features,
        name=name,
        kernel_init=init.torch_linear_kernel_init,
        bias_init=nn.initializers.zeros,
    )


class DilatedTemporalConvLayer(nn.Module):
    """Dilated 1-D conv + ReLU + dropout + residual.

    Input/output layout is [B, T, C] (TPU-friendly channels-last); matches
    reference ``DilatedTemporalConvLayer`` (:8-57) which runs [B, C, T].
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        in_features = x.shape[-1]
        # symmetric padding (k-1)*d//2 == 'SAME' for stride-1 odd kernels
        h = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            kernel_init=init.torch_linear_kernel_init,
            bias_init=nn.initializers.zeros,
            name="conv",
        )(x)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        if in_features != self.features:
            x = nn.Conv(
                self.features,
                kernel_size=(1,),
                kernel_init=init.torch_linear_kernel_init,
                name="residual",
            )(x)
        return h + x


class MSTCNStage(nn.Module):
    """Stack of dilated conv layers, dilation 1, 2, 4, ... 2^(L-1) (:60-104)."""

    num_layers: int
    features: int
    kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        for i in range(self.num_layers):
            x = DilatedTemporalConvLayer(
                features=self.features,
                kernel_size=self.kernel_size,
                dilation=1 if i == 0 else 2**i,
                dropout=self.dropout,
                name=f"layer{i}",
            )(x, deterministic=deterministic)
        return x


class ActionEncoder(nn.Module):
    """Linear proj -> MSTCN stages -> LayerNorm (:107-162)."""

    embed_dim: int
    num_stages: int = 2
    num_layers_per_stage: int = 10
    dropout: float = 0.1

    @nn.compact
    def __call__(self, actions, deterministic=True):
        x = _dense(self.embed_dim, name="input_projection")(actions)
        for s in range(self.num_stages):
            x = MSTCNStage(
                num_layers=self.num_layers_per_stage,
                features=self.embed_dim,
                dropout=self.dropout,
                name=f"stage{s}",
            )(x, deterministic=deterministic)
        return nn.LayerNorm(name="ln")(x)


class ActionDecoder(nn.Module):
    """MSTCN stages -> linear output projection (:165-214)."""

    action_dim: int
    embed_dim: int
    num_stages: int = 2
    num_layers_per_stage: int = 10
    dropout: float = 0.1

    @nn.compact
    def __call__(self, embeddings, deterministic=True):
        x = embeddings
        for s in range(self.num_stages):
            x = MSTCNStage(
                num_layers=self.num_layers_per_stage,
                features=self.embed_dim,
                dropout=self.dropout,
                name=f"stage{s}",
            )(x, deterministic=deterministic)
        return _dense(self.action_dim, name="output_projection")(x)


class HierarchicalVQVAE(nn.Module):
    """Two-level EMA-codebook VQ-VAE over action sequences.

    Mutable state lives in the ``vq`` collection:
      codebook_z/q, cluster_size_z/q, embed_avg_z/q, initialized.
    Training forwards must be applied with ``mutable=["vq"]`` and rngs
    ``{"dropout": ..., "vq": ...}``.
    """

    action_dim: int
    embed_dim: int = 512
    num_subclusters: int = 128
    num_clusters: int = 64
    commitment_cost: float = 1.0
    ema_decay: float = 0.99
    num_stages: int = 2
    beta: float = 0.8
    num_layers_per_stage: int = 10
    dropout: float = 0.1
    eps: float = 1e-5
    replace_threshold_z: float = 1.0
    replace_threshold_q: float = 1.0
    kmeans_init: bool = True
    use_cosine: bool = True
    normalize_after_ema: bool = True
    kmeans_iters: int = 25

    def setup(self):
        self.encoder = ActionEncoder(
            embed_dim=self.embed_dim,
            num_stages=self.num_stages,
            num_layers_per_stage=self.num_layers_per_stage,
            dropout=self.dropout,
        )
        self.decoder = ActionDecoder(
            action_dim=self.action_dim,
            embed_dim=self.embed_dim,
            num_stages=self.num_stages,
            num_layers_per_stage=self.num_layers_per_stage,
            dropout=self.dropout,
        )

        def cb_init(k, scale):
            def f(rng):
                cb = jax.random.uniform(
                    rng, (k, self.embed_dim), jnp.float32, -1.0 / scale, 1.0 / scale
                )
                return Q.l2_normalize(cb) if self.use_cosine else cb

            return f

        rng_z = self.make_rng("params") if self.is_initializing() else None
        # variables: created with init fns that only run at init time
        self.codebook_z = self.variable(
            "vq", "codebook_z", cb_init(self.num_subclusters, self.num_subclusters),
            rng_z if rng_z is not None else jax.random.PRNGKey(0),
        )
        self.codebook_q = self.variable(
            "vq", "codebook_q", cb_init(self.num_clusters, self.num_clusters),
            jax.random.fold_in(rng_z, 1) if rng_z is not None else jax.random.PRNGKey(1),
        )
        self.cluster_size_z = self.variable(
            "vq", "cluster_size_z", jnp.zeros, (self.num_subclusters,)
        )
        self.embed_avg_z = self.variable(
            "vq", "embed_avg_z", lambda: self.codebook_z.value.copy()
        )
        self.cluster_size_q = self.variable(
            "vq", "cluster_size_q", jnp.zeros, (self.num_clusters,)
        )
        self.embed_avg_q = self.variable(
            "vq", "embed_avg_q", lambda: self.codebook_q.value.copy()
        )
        self.initialized = self.variable(
            "vq", "initialized", lambda: jnp.zeros((), jnp.bool_)
        )

    # ------------------------------------------------------------ quantizers
    def _nearest(self, flat, codebook):
        if self.use_cosine:
            idx, sims = Q.cosine_nearest(flat, codebook)
        else:
            sims = -jnp.sqrt(jnp.maximum(Q.l2_distance_sq(flat, codebook), 0.0))
            idx = jnp.argmax(sims, axis=-1)
        return idx, sims

    def _quantize(self, x, codebook, use_ste=True):
        """Shared Z/Q quantization (reference quantize_z/:434, quantize_q/:467)."""
        b, t, d = x.shape
        flat = x.reshape(-1, d)
        idx_flat, sims = self._nearest(flat, codebook)
        quantized = jnp.take(codebook, idx_flat, axis=0).reshape(b, t, d)
        if use_ste:
            base = Q.l2_normalize(x) if self.use_cosine else x
            quantized = Q.straight_through(base, quantized)
        distances = (1.0 - sims).reshape(b, t, -1)
        return quantized, idx_flat.reshape(b, t), distances

    # ------------------------------------------------------------ k-means init
    def _maybe_kmeans_init(self, embeddings, rng):
        """First-batch codebook init behind lax.cond (reference :321-419)."""
        b, t, d = embeddings.shape
        flat = jax.lax.stop_gradient(embeddings.reshape(-1, d))

        def compute_init(_):
            if self.kmeans_init:
                cz, _ = Q.kmeans(rng, flat, self.num_subclusters, self.kmeans_iters)
                cq, _ = Q.kmeans(
                    jax.random.fold_in(rng, 7), flat, self.num_clusters,
                    self.kmeans_iters,
                )
            else:
                cz = jax.random.normal(rng, (self.num_subclusters, d))
                cq = jax.random.normal(
                    jax.random.fold_in(rng, 7), (self.num_clusters, d)
                )
            if self.use_cosine:
                cz = Q.l2_normalize(cz)
                cq = Q.l2_normalize(cq)
                flat_n = Q.l2_normalize(flat)
                az = jnp.argmax(jnp.dot(flat_n, cz.T), axis=-1)
                aq = jnp.argmax(jnp.dot(flat_n, cq.T), axis=-1)
            else:
                az = jnp.argmin(Q.l2_distance_sq(flat, cz), axis=-1)
                aq = jnp.argmin(Q.l2_distance_sq(flat, cq), axis=-1)
            # EMA stats seeded from current batch assignment counts/sums of
            # the RAW embeddings (reference :371-412)
            nz, sz = Q.assignment_stats(flat, az, self.num_subclusters)
            nq, sq = Q.assignment_stats(flat, aq, self.num_clusters)
            return cz, cq, nz, sz, nq, sq

        def keep(_):
            return (
                self.codebook_z.value,
                self.codebook_q.value,
                self.cluster_size_z.value,
                self.embed_avg_z.value,
                self.cluster_size_q.value,
                self.embed_avg_q.value,
            )

        cz, cq, nz, sz, nq, sq = jax.lax.cond(
            self.initialized.value, keep, compute_init, operand=None
        )
        self.codebook_z.value = cz
        self.codebook_q.value = cq
        self.cluster_size_z.value = nz
        self.embed_avg_z.value = sz
        self.cluster_size_q.value = nq
        self.embed_avg_q.value = sq
        self.initialized.value = jnp.ones((), jnp.bool_)

    # ------------------------------------------------------------ forward
    def __call__(self, actions, training=True):
        """Returns the reference output dict (reference forward :590-646).

        When ``training`` the EMA/codebook state in the ``vq`` collection is
        updated in place - apply with ``mutable=["vq"]`` and a ``vq`` rng.
        """
        deterministic = not training
        embeddings = self.encoder(actions, deterministic=deterministic)

        if training:
            rng = self.make_rng("vq")
            self._maybe_kmeans_init(embeddings, jax.random.fold_in(rng, 0))

        quantized_z, z_idx, z_dists = self._quantize(
            embeddings, self.codebook_z.value, use_ste=True
        )
        quantized_q, q_idx, q_dists = self._quantize(
            quantized_z, self.codebook_q.value, use_ste=True
        )
        reconstructed = self.decoder(quantized_q, deterministic=deterministic)

        if training:
            b, t, d = embeddings.shape
            emb_flat = jax.lax.stop_gradient(embeddings).reshape(-1, d)
            sub_flat = jax.lax.stop_gradient(quantized_z).reshape(-1, d)

            nz, sz, cz = Q.ema_update(
                emb_flat, z_idx.reshape(-1),
                self.cluster_size_z.value, self.embed_avg_z.value,
                self.ema_decay, eps=self.eps,
                normalize=self.normalize_after_ema and self.use_cosine,
            )
            nq, sq, cq = Q.ema_update(
                sub_flat, q_idx.reshape(-1),
                self.cluster_size_q.value, self.embed_avg_q.value,
                self.ema_decay, eps=self.eps,
                normalize=self.normalize_after_ema and self.use_cosine,
            )
            # dead-code replacement from batch samples (reference :543-588)
            rng = self.make_rng("vq")
            cz, sz, nz = Q.replace_dead_codes(
                jax.random.fold_in(rng, 1), cz, sz, nz, emb_flat,
                self.replace_threshold_z, normalize=self.use_cosine,
            )
            cq, sq, nq = Q.replace_dead_codes(
                jax.random.fold_in(rng, 2), cq, sq, nq, sub_flat,
                self.replace_threshold_q, normalize=self.use_cosine,
            )
            self.cluster_size_z.value = nz
            self.embed_avg_z.value = sz
            self.codebook_z.value = cz
            self.cluster_size_q.value = nq
            self.embed_avg_q.value = sq
            self.codebook_q.value = cq

        return {
            "embeddings": embeddings,
            "quantized_z": quantized_z,
            "quantized_q": quantized_q,
            "reconstructed_actions": reconstructed,
            "z_indices": z_idx,
            "q_indices": q_idx,
            "z_distances": z_dists,
            "q_distances": q_dists,
        }

    # ------------------------------------------------------------ tokenizer API
    def encode_indices(self, actions):
        """Tokenize: actions [B,T,A] -> (z_indices, q_indices)."""
        embeddings = self.encoder(actions, deterministic=True)
        _, z_idx, _ = self._quantize(embeddings, self.codebook_z.value, use_ste=False)
        qz = jnp.take(
            self.codebook_z.value, z_idx.reshape(-1), axis=0
        ).reshape(embeddings.shape)
        _, q_idx, _ = self._quantize(qz, self.codebook_q.value, use_ste=False)
        return z_idx, q_idx

    def decode_q_indices(self, q_idx):
        """Detokenize: cluster indices [B,T] -> reconstructed actions."""
        emb = jnp.take(self.codebook_q.value, q_idx.reshape(-1), axis=0)
        emb = emb.reshape(q_idx.shape + (self.embed_dim,))
        return self.decoder(emb, deterministic=True)


def compute_vqvae_loss(outputs, true_actions, commitment_cost=1.0,
                       lambda_rec=1.0, use_cosine=True):
    """Reference ``compute_vqvae_loss`` (:669-685): recon + commitment terms.

    Commitment uses normalized pairs under cosine quantization (:652-667);
    the quantized side is stop-gradiented.
    """
    l_rec = jnp.mean((outputs["reconstructed_actions"] - true_actions) ** 2)

    def commit(a, b_detached):
        if use_cosine:
            return jnp.mean(
                (Q.l2_normalize(a) - Q.l2_normalize(jax.lax.stop_gradient(b_detached))) ** 2
            )
        return jnp.mean((a - jax.lax.stop_gradient(b_detached)) ** 2)

    l_cz = commit(outputs["embeddings"], outputs["quantized_z"])
    l_cq = commit(outputs["quantized_z"], outputs["quantized_q"])
    total = commitment_cost * (l_cz + l_cq) + lambda_rec * l_rec
    return {
        "vqvae_loss": total,
        "L_rec": l_rec,
        "L_commit_z": l_cz,
        "L_commit_q": l_cq,
    }


def get_codebook_usage(vq_state, replace_threshold_z=1.0, replace_threshold_q=1.0):
    """Codebook utilization telemetry (reference :687-706)."""
    nz = vq_state["cluster_size_z"]
    nq = vq_state["cluster_size_q"]
    z_used = int(jnp.sum(nz > 0))
    q_used = int(jnp.sum(nq > 0))
    z_total = int(nz.shape[0])
    q_total = int(nq.shape[0])
    return {
        "z_used": z_used,
        "z_total": z_total,
        "z_usage_pct": 100.0 * z_used / max(1, z_total),
        "z_utilization": z_used / max(1, z_total),
        "q_utilization": q_used / max(1, q_total),
        "q_used": q_used,
        "q_total": q_total,
        "q_usage_pct": 100.0 * q_used / max(1, q_total),
        "z_dead": int(jnp.sum(nz < replace_threshold_z)),
        "q_dead": int(jnp.sum(nq < replace_threshold_q)),
    }

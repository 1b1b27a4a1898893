"""ACT - Action Chunking with Transformers (reference
``robomimic/algo/act.py:29-247``, which wraps the DETR-VAE from the ACT
paper).

CVAE structure:
  * style encoder: transformer over [CLS, obs-proj, action-chunk-proj]
    tokens -> (mu, logvar) -> z  (training only; z = 0 at inference);
  * decoder: DETR-style - memory tokens [obs features, z] attended by
    ``num_queries`` learned query embeddings through a cross-attention
    decoder -> per-query action heads;
  * loss: L1 reconstruction + kl_weight * KL.
"""

import math
from collections import OrderedDict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.algo.algo import (
    AlgoState,
    PolicyAlgo,
    device_process_obs,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.icl import _encoder_kwargs
from robot_manipulation_vq_vae_tpu.models.obs_nets import (
    ObservationGroupEncoder,
    group_shapes_spec,
)
from robot_manipulation_vq_vae_tpu.models.transformers import SelfAttentionBlock
from robot_manipulation_vq_vae_tpu.utils import loss_utils as LossUtils
from robot_manipulation_vq_vae_tpu.utils.initializers import gpt_init


@register_algo_factory_func("act")
def algo_config_to_class(algo_config):
    return ACT, {}


class CrossAttentionBlock(nn.Module):
    """Pre-LN decoder block: self-attn over queries, cross-attn to memory,
    MLP."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int

    def _mha(self, q, kv, name):
        b, tq, d = q.shape
        nh = self.num_heads
        dh = d // nh
        qp = nn.Dense(d, kernel_init=gpt_init, name=f"{name}_q")(q)
        kp = nn.Dense(d, kernel_init=gpt_init, name=f"{name}_k")(kv)
        vp = nn.Dense(d, kernel_init=gpt_init, name=f"{name}_v")(kv)
        qp = qp.reshape(b, tq, nh, dh).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, kv.shape[1], nh, dh).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, kv.shape[1], nh, dh).transpose(0, 2, 1, 3)
        att = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / math.sqrt(dh)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, vp)
        y = y.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return nn.Dense(d, kernel_init=gpt_init, name=f"{name}_out")(y)

    @nn.compact
    def __call__(self, q, memory):
        qn = nn.LayerNorm(name="ln1")(q)
        q = q + self._mha(qn, qn, "self")
        q = q + self._mha(nn.LayerNorm(name="ln2")(q), memory, "cross")
        h = nn.Dense(self.dim_feedforward, kernel_init=gpt_init, name="ff1")(
            nn.LayerNorm(name="ln3")(q)
        )
        h = nn.relu(h)
        h = nn.Dense(self.embed_dim, kernel_init=gpt_init, name="ff2")(h)
        return q + h


class DETRVAE(nn.Module):
    """CVAE transformer policy over action chunks."""

    obs_shapes: tuple
    ac_dim: int
    num_queries: int
    hidden_dim: int = 512
    dim_feedforward: int = 3200
    enc_layers: int = 4
    dec_layers: int = 7
    nheads: int = 8
    latent_dim: int = 32
    goal_shapes: tuple = None
    encoder_kwargs: dict = None

    def setup(self):
        groups = {"obs": dict(self.obs_shapes)}
        if self.goal_shapes:
            groups["goal"] = dict(self.goal_shapes)
        self.obs_encoder = ObservationGroupEncoder(
            observation_group_shapes=group_shapes_spec(groups),
            encoder_kwargs=self.encoder_kwargs,
        )
        self.obs_proj = nn.Dense(self.hidden_dim, kernel_init=gpt_init)
        self.action_proj = nn.Dense(self.hidden_dim, kernel_init=gpt_init)
        self.cls_embed = self.param(
            "cls_embed", gpt_init, (1, 1, self.hidden_dim)
        )
        self.style_blocks = [
            SelfAttentionBlock(
                embed_dim=self.hidden_dim, num_heads=self.nheads,
                context_length=self.num_queries + 2, causal=False,
                attn_dropout=0.0, output_dropout=0.0,
                name=f"style{i}",
            )
            for i in range(self.enc_layers)
        ]
        self.latent_head = nn.Dense(2 * self.latent_dim, kernel_init=gpt_init)
        self.latent_proj = nn.Dense(self.hidden_dim, kernel_init=gpt_init)
        self.query_embed = self.param(
            "query_embed", gpt_init, (1, self.num_queries, self.hidden_dim)
        )
        self.dec_blocks = [
            CrossAttentionBlock(
                embed_dim=self.hidden_dim, num_heads=self.nheads,
                dim_feedforward=self.dim_feedforward, name=f"dec{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.action_head = nn.Dense(self.ac_dim, kernel_init=gpt_init)

    def _obs_feat(self, obs_dict, goal_dict, train):
        kwargs = {"obs": obs_dict}
        if self.goal_shapes:
            kwargs["goal"] = goal_dict
        return self.obs_encoder(train=train, **kwargs)

    def encode_style(self, obs_feat, actions):
        """[CLS, obs, action tokens] -> (mu, logvar)."""
        b = actions.shape[0]
        tokens = jnp.concatenate(
            [
                jnp.tile(self.cls_embed, (b, 1, 1)),
                self.obs_proj(obs_feat)[:, None],
                self.action_proj(actions),
            ],
            axis=1,
        )
        for blk in self.style_blocks:
            tokens = blk(tokens, deterministic=True)
        mu, logvar = jnp.split(self.latent_head(tokens[:, 0]), 2, axis=-1)
        return mu, logvar

    def decode(self, obs_feat, z):
        b = obs_feat.shape[0]
        memory = jnp.stack(
            [self.obs_proj(obs_feat), self.latent_proj(z)], axis=1
        )
        q = jnp.tile(self.query_embed, (b, 1, 1))
        for blk in self.dec_blocks:
            q = blk(q, memory)
        return self.action_head(q)  # [B, num_queries, A]

    def forward_train(self, obs_dict, actions, goal_dict=None, train=False):
        rng = self.make_rng("latent")
        obs_feat = self._obs_feat(obs_dict, goal_dict, train)
        mu, logvar = self.encode_style(obs_feat, actions)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        a_hat = self.decode(obs_feat, z)
        return {"a_hat": a_hat, "mu": mu, "logvar": logvar}

    def __call__(self, obs_dict, goal_dict=None, train=False):
        """Inference: z = 0 (the ACT convention)."""
        obs_feat = self._obs_feat(obs_dict, goal_dict, train)
        z = jnp.zeros((obs_feat.shape[0], self.latent_dim))
        return self.decode(obs_feat, z)


class ACT(PolicyAlgo):
    def _create_networks(self):
        cfg = self.algo_config
        self.chunk_size = self.global_config.train.seq_length
        self.nets["policy"] = DETRVAE(
            obs_shapes=tuple(self.obs_shapes.items()),
            goal_shapes=tuple(self.goal_shapes.items()) or None,
            ac_dim=self.ac_dim,
            num_queries=self.chunk_size,
            hidden_dim=cfg.act.hidden_dim,
            dim_feedforward=cfg.act.dim_feedforward,
            enc_layers=cfg.act.enc_layers,
            dec_layers=cfg.act.dec_layers,
            nheads=cfg.act.nheads,
            latent_dim=cfg.act.latent_dim,
            encoder_kwargs=_encoder_kwargs(self.obs_config),
        )
        self.kl_weight = float(cfg.act.kl_weight)
        self._ac_queue = []

    def process_batch_for_training(self, batch):
        """obs at t=0 — EXCEPT ``pad_mask``, which keeps its time axis for
        the masked L1 (reference act.py:91-94); action chunk of seq_length."""
        actions = np.asarray(batch["actions"])[:, : self.chunk_size]
        obs = {
            k: np.asarray(v)[:, 0]
            for k, v in batch["obs"].items() if k != "pad_mask"
        }
        pm = batch["obs"].get("pad_mask")
        if pm is None:
            pm = np.ones(actions.shape[:2] + (1,), np.float32)
        else:
            pm = np.asarray(pm, np.float32)[:, : self.chunk_size]
        obs["pad_mask"] = pm
        return {
            "obs": obs,
            "goal_obs": batch.get("goal_obs", None),
            "actions": actions,
        }

    def _init_variables(self, rng, batch):
        r1, r2 = jax.random.split(rng)
        obs = device_process_obs(
            {k: jnp.asarray(v) for k, v in batch["obs"].items()}
        )
        return {
            "policy": self.nets["policy"].init(
                {"params": r1, "latent": r2}, obs,
                jnp.asarray(batch["actions"]),
                method=self.nets["policy"].forward_train,
            )
        }

    def _build_train_step(self):
        policy = self.nets["policy"]
        opt = self.optimizers["policy"]
        kl_weight = self.kl_weight
        import optax

        def step(state, batch, validate):
            rng, r1, r2, r3 = jax.random.split(state.rng, 4)

            def loss_fn(params):
                obs = dict(batch["obs"])
                # padded timesteps drop out of the L1, but the mean still
                # divides by the FULL element count — the reference's
                # ``(all_l1 * ~is_pad).mean()`` (act.py:140-143)
                keep = (obs.pop("pad_mask") != 0).astype(jnp.float32)
                obs = device_process_obs(obs)
                variables = {"params": params["policy"], **state.aux["policy"]}
                mutable = list(state.aux["policy"].keys())
                out, muts = policy.apply(
                    variables, obs, batch["actions"], train=not validate,
                    mutable=mutable,
                    rngs={"latent": r1, "dropout": r2, "randomizer": r3},
                    method=policy.forward_train,
                )
                l1 = jnp.mean(jnp.abs(out["a_hat"] - batch["actions"]) * keep)
                kl = LossUtils.kld_0_1_loss(out["mu"], out["logvar"])
                losses = OrderedDict(
                    l1_loss=l1, kl_loss=kl,
                    action_loss=l1 + kl_weight * kl,
                )
                return losses["action_loss"], (losses, muts)

            (_, (losses, muts)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            metrics = dict(losses)
            metrics["policy_grad_norms"] = optax.global_norm(grads["policy"])

            def do_update(_):
                updates, o = opt.update(
                    grads["policy"], state.opt_states["policy"],
                    state.params["policy"],
                )
                return optax.apply_updates(state.params["policy"], updates), o

            def no_update(_):
                return state.params["policy"], state.opt_states["policy"]

            new_p, new_o = jax.lax.cond(validate, no_update, do_update, None)
            new_aux = dict(state.aux)
            new_aux["policy"] = {**state.aux["policy"], **muts}
            return (
                AlgoState(
                    params={**state.params, "policy": new_p},
                    aux=new_aux,
                    opt_states={**state.opt_states, "policy": new_o},
                    step=state.step + 1, rng=rng,
                ),
                metrics,
            )

        return jax.jit(step, static_argnums=2)

    def train_on_batch(self, batch, epoch, validate=False):
        batch = {
            "obs": {k: jnp.asarray(v) for k, v in batch["obs"].items()},
            "actions": jnp.asarray(batch["actions"]),
        }
        self.ensure_state(batch)
        if self._train_step_jit is None:
            self._train_step_jit = self._build_train_step()
        self.state, metrics = self._train_step_jit(self.state, batch, validate)
        return {"losses": metrics}

    def log_info(self, info):
        log = OrderedDict()
        log["Loss"] = float(info["losses"]["action_loss"])
        log["L1_Loss"] = float(info["losses"]["l1_loss"])
        # reference log key (act.py:222): the L1 IS the reconstruction loss
        log["Reconstruction_Loss"] = log["L1_Loss"]
        log["KL_Loss"] = float(info["losses"]["kl_loss"])
        return log

    def reset(self):
        self._ac_queue = []

    def get_action(self, obs_dict, goal_dict=None):
        """Action chunking: predict a chunk, pop actions one at a time
        (reference act.py:170-210)."""
        if not self._ac_queue:
            policy = self.nets["policy"]

            def infer(params, aux, obs):
                return policy.apply(
                    {"params": params, **aux}, device_process_obs(obs),
                    train=False,
                )

            chunk = np.asarray(
                self._cached_jit("get_action", infer)(
                    self.state.params["policy"], self.state.aux["policy"],
                    {k: jnp.asarray(v) for k, v in obs_dict.items()},
                )
            )
            self._ac_queue = [chunk[:, i] for i in range(chunk.shape[1])]
        return self._ac_queue.pop(0)

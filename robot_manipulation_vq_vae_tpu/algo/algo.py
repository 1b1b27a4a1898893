"""Algorithm base classes, registry, and rollout-policy wrappers.

Functional re-design of ``robomimic/algo/algo.py``: an ``Algo`` owns Flax
module *definitions* plus a single immutable :class:`AlgoState` pytree
(params, auxiliary variable collections, optimizer states, step, rng). The
hot path is one jitted ``_train_step(state, batch) -> (state, metrics)``
function per algorithm - no Python-side mutation inside the step, so the
same function pjit-shards across a device mesh unchanged
(see ``parallel/``).

Public surface mirrors the reference: ``register_algo_factory_func`` /
``algo_factory`` (reference algo.py:34-91), ``Algo`` lifecycle
(``_create_shapes -> _create_networks -> _create_optimizers``, :102-134),
``process_batch_for_training`` / ``postprocess_batch_for_training``
(:242-269), ``train_on_batch``, ``serialize``/``deserialize`` (:335-363),
and the ``RolloutPolicy`` / ``ICLRolloutPolicy`` wrappers (:666-924).
"""

from collections import OrderedDict
from copy import deepcopy
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from robot_manipulation_vq_vae_tpu.utils import action_utils as AcUtils
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils
from robot_manipulation_vq_vae_tpu.utils import optim_utils as OptimUtils
from robot_manipulation_vq_vae_tpu.utils import rotation_utils as RotUtils
from robot_manipulation_vq_vae_tpu.utils import tensor_utils as TensorUtils

# global registry: algo_name -> factory func (algo_config -> (cls, kwargs))
REGISTERED_ALGOS = {}

LANG_EMB_KEY = ObsUtils.LANG_EMB_KEY


def register_algo_factory_func(algo_name):
    def decorator(factory_func):
        REGISTERED_ALGOS[algo_name] = factory_func
        return factory_func

    return decorator


def algo_name_to_factory_func(algo_name):
    return REGISTERED_ALGOS[algo_name]


def algo_factory(algo_name, config, obs_key_shapes, ac_dim, device=None):
    """Instantiate the algo class for @algo_name (reference algo.py:59-91)."""
    assert algo_name in REGISTERED_ALGOS, (
        f"algo '{algo_name}' not registered; have {sorted(REGISTERED_ALGOS)}"
    )
    factory_func = REGISTERED_ALGOS[algo_name]
    algo_cls, _ = factory_func(config.algo)
    return algo_cls(
        algo_config=config.algo,
        obs_config=config.observation,
        global_config=config,
        obs_key_shapes=obs_key_shapes,
        ac_dim=ac_dim,
        device=device,
    )


@flax.struct.dataclass
class AlgoState:
    """The complete mutable state of an algorithm as one pytree."""

    params: Any          # {net_name: param tree}
    aux: Any             # {net_name: {collection: tree}} (vq, batch_stats, ...)
    opt_states: Any      # {net_name: optax state}
    step: Any            # scalar int
    rng: Any             # PRNGKey


class Algo:
    """Base algorithm (reference ``Algo`` algo.py:94-660)."""

    def __init__(self, algo_config, obs_config, global_config, obs_key_shapes,
                 ac_dim, device=None):
        self.optim_params = deepcopy(algo_config.optim_params)
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.ac_dim = ac_dim
        self.device = device  # kept for API compat; jax manages placement
        self.obs_key_shapes = obs_key_shapes

        self.nets = {}          # name -> flax module definition
        self.optimizers = {}    # name -> optax transform
        self.state = None       # AlgoState (lazy init on first batch)
        self._pending_load = None
        self._train_step_jit = None
        self._jit_cache = {}
        self._training = True

        # opt-in speed modes (frozen-stats BN +17%, pool-free stem —
        # docs/design.md §4); must be set BEFORE any network is traced.
        # Set unconditionally so each construction pins its own values
        # (process-global — the last constructed algo wins).
        from robot_manipulation_vq_vae_tpu.models.base_nets import (
            set_frozen_batch_norm,
            set_pallas_pool,
            set_pool_free_stem,
        )

        set_frozen_batch_norm(
            bool(global_config.train.get("frozen_batch_norm", False))
        )
        set_pool_free_stem(
            bool(global_config.train.get("pool_free_stem", False))
        )
        set_pallas_pool(
            bool(global_config.train.get("pallas_pool", False))
        )
        from robot_manipulation_vq_vae_tpu.models.obs_nets import (
            set_packed_rgb_encoders,
        )

        set_packed_rgb_encoders(
            bool(global_config.train.get("packed_rgb_encoders", False))
        )

        self._create_shapes(obs_config.modalities, obs_key_shapes)
        self._create_networks()
        self._create_optimizers()

        seed = 0
        try:
            seed = int(global_config.train.seed)
        except Exception:
            pass
        self._init_rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------ shapes
    def _create_shapes(self, obs_keys, obs_key_shapes):
        """Split obs_key_shapes into obs/goal/subgoal dicts by the modality
        config (reference algo.py:136-178)."""
        self.obs_shapes = OrderedDict()
        self.goal_shapes = OrderedDict()
        self.subgoal_shapes = OrderedDict()
        for k in obs_key_shapes:
            for group, target in (
                ("obs", self.obs_shapes),
                ("goal", self.goal_shapes),
                ("subgoal", self.subgoal_shapes),
            ):
                if group in self.obs_config.modalities and k in [
                    obs_key
                    for modality in self.obs_config.modalities[group].values()
                    for obs_key in modality
                ]:
                    target[k] = obs_key_shapes[k]
        if self.algo_config.get("language_conditioned", False):
            self.obs_shapes[LANG_EMB_KEY] = [768]  # CLIP text embedding dim

    # ------------------------------------------------------------ networks
    def _create_networks(self):
        raise NotImplementedError

    def _create_optimizers(self):
        """Build optax transforms from optim_params (reference :184-225)."""
        num_training_steps = None
        try:
            num_training_steps = (
                self.global_config.train.num_epochs
                * self.global_config.experiment.epoch_every_n_steps
            )
        except Exception:
            pass
        max_grad_norm = self.global_config.train.get("max_grad_norm", None)
        for k in self.optim_params:
            if k in self.nets:
                self.optimizers[k] = OptimUtils.optimizer_from_optim_params(
                    self.optim_params[k],
                    max_grad_norm=max_grad_norm,
                    num_training_steps=num_training_steps,
                )

    # ------------------------------------------------------------ state
    def _init_variables(self, rng, batch):
        """Subclasses: run module .init for every net; return
        {net_name: variables}."""
        raise NotImplementedError

    @staticmethod
    def _split_variables(variables):
        params = variables.get("params", {})
        aux = {k: v for k, v in variables.items() if k != "params"}
        return params, aux

    def ensure_state(self, batch):
        if self.state is not None:
            return
        rng, init_rng = jax.random.split(self._init_rng)
        all_vars = self._init_variables(init_rng, batch)
        params, aux, opt_states = {}, {}, {}
        for name, variables in all_vars.items():
            p, a = self._split_variables(variables)
            params[name] = p
            aux[name] = a
            if name in self.optimizers:
                opt_states[name] = self.optimizers[name].init(p)
        self.state = AlgoState(
            params=params, aux=aux, opt_states=opt_states,
            step=jnp.zeros((), jnp.int32), rng=rng,
        )

    # ------------------------------------------------------------ batch prep
    def process_batch_for_training(self, batch):
        return batch

    def postprocess_batch_for_training(self, batch, obs_normalization_stats=None):
        """uint8->float/255 image processing happens device-side inside the
        jitted step (see ``device_process_obs``); host-side we only apply
        obs normalization stats when given (reference :242-269)."""
        if obs_normalization_stats is not None:
            for group in ("obs", "goal_obs", "next_obs"):
                if batch.get(group) is not None:
                    batch[group] = ObsUtils.normalize_dict(
                        batch[group], obs_normalization_stats
                    )
        return batch

    # ------------------------------------------------------------ training
    def train_on_batch(self, batch, epoch, validate=False):
        raise NotImplementedError

    def log_info(self, info):
        """Flatten metrics for loggers (reference :565-585)."""
        log = OrderedDict()
        if "losses" in info:
            for k, v in info["losses"].items():
                log[k] = float(v)
        return log

    def on_epoch_end(self, epoch):
        pass

    def _check_epoch(self, net_name, epoch):
        """Whether @net_name's optimizer is active this epoch, per its
        optim_params epoch window (-1 = unbounded). Reference
        ``td3_bc.py:126-136`` / ``bcq.py:140-150``."""
        p = self.optim_params[net_name]
        start = p.get("start_epoch", -1)
        end = p.get("end_epoch", -1)
        start_ok = (start == -1) or (epoch >= start)
        end_ok = (end == -1) or (epoch < end)
        return start_ok and end_ok

    def _epoch_gates(self, epoch):
        """All per-net epoch-window gates as traced scalars, so a window
        opening/closing mid-run does not retrigger compilation."""
        return {
            name: jnp.asarray(self._check_epoch(name, epoch))
            for name in self.optim_params
        }

    def _extra_step_args(self, epoch):
        """Extra traced args threaded into the jitted train step. TD3-BC and
        BCQ consume per-net epoch-window gates (reference td3_bc.py:126-136,
        bcq.py:140-150); algos without epoch windows (CQL) override to ()."""
        return (self._epoch_gates(epoch),)

    def _cached_jit(self, key, fn):
        """Compile-once cache for inference-path functions (get_action and
        friends): the reference pays per-op dispatch every env step; here
        each path compiles on first use and replays as one device call."""
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # mode toggles are no-ops in the functional design (train/eval behavior
    # is an explicit argument to the jitted functions), kept for API compat
    def set_eval(self):
        self._training = False

    def set_train(self):
        self._training = True

    def reset(self):
        pass

    # ------------------------------------------------------------ serialize
    def serialize(self, include_optimizer=False):
        """State -> nested numpy dict (reference :335-340). With
        @include_optimizer, also carries optimizer states + step counter +
        rng for a true resume (the reference only ever saves weights)."""
        assert self.state is not None, "state not initialized yet"
        out = {
            "params": TensorUtils.to_numpy(self.state.params),
            "aux": TensorUtils.to_numpy(self.state.aux),
        }
        if include_optimizer:
            out["opt_states"] = TensorUtils.to_numpy(self.state.opt_states)
            out["step"] = int(self.state.step)
            out["rng"] = np.asarray(self.state.rng)
        return out

    def deserialize(self, model_dict):
        """Load weights (+ aux collections; + optimizer states when the
        checkpoint carries them). A checkpoint is complete - if the state is
        not yet initialized, build it directly from the checkpoint pytrees
        (reference :341-363)."""
        params = jax.tree_util.tree_map(jnp.asarray, model_dict["params"])
        opt_states = None
        if "opt_states" in model_dict:
            opt_states = jax.tree_util.tree_map(
                jnp.asarray, model_dict["opt_states"]
            )
        step = model_dict.get("step")
        rng = model_dict.get("rng")
        if self.state is not None:
            aux = jax.tree_util.tree_map(
                jnp.asarray, model_dict.get("aux", self.state.aux)
            )
            self.state = self.state.replace(params=params, aux=aux)
            if opt_states is not None:
                self.state = self.state.replace(
                    opt_states=opt_states,
                    step=jnp.asarray(step, jnp.int32),
                    rng=jnp.asarray(rng),
                )
            return
        aux = jax.tree_util.tree_map(jnp.asarray, model_dict.get("aux", {}))
        if opt_states is None:
            opt_states = {
                name: self.optimizers[name].init(params[name])
                for name in params
                if name in self.optimizers
            }
        self.state = AlgoState(
            params=params, aux=aux, opt_states=opt_states,
            step=(
                jnp.zeros((), jnp.int32)
                if step is None else jnp.asarray(step, jnp.int32)
            ),
            rng=self._init_rng if rng is None else jnp.asarray(rng),
        )

    def __repr__(self):
        return "{} (\n  nets: {}\n)".format(
            self.__class__.__name__, list(self.nets.keys())
        )


class PolicyAlgo(Algo):
    """Base for policy algorithms (reference algo.py:382)."""

    def get_action(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    def _predict_actions_for_mse(self, batch):
        """Predicted actions for an MSE-eval batch (subclasses may override
        for sequence predictions). Default: get_action over the batch obs,
        threading a context batch for ICL-style policies."""
        import inspect

        sig = inspect.signature(self.get_action)
        if "context_batch" in sig.parameters:
            ctx = {"actions": batch["actions"], "obs": batch["obs"]}
            return np.asarray(
                self.get_action(batch["obs"], context_batch=ctx)
            )
        return np.asarray(self.get_action(batch["obs"]))

    def compute_mse_visualize(self, trainset, validset, num_samples,
                              savedir=None):
        """Action-prediction MSE + accuracy@{1e-3,1e-4,1e-5}, optionally with
        prediction plots (reference algo.py:454-554)."""
        from robot_manipulation_vq_vae_tpu.data.loader import collate
        from robot_manipulation_vq_vae_tpu.utils import vis_utils as VisUtils

        self.set_eval()
        random_state = np.random.RandomState(0)
        mapping = {"Train": trainset}
        if validset is not None:
            mapping["Valid"] = validset

        mse_log, vis_log = {}, {}
        for key, dataset in mapping.items():
            idx = random_state.choice(
                len(dataset), min(len(dataset), num_samples), replace=False
            )
            samples = [dataset[int(i)] for i in idx]
            raw = collate(samples)
            batch = self.process_batch_for_training(raw)
            actual = np.asarray(batch["actions"])
            pred = self._predict_actions_for_mse(batch)
            if pred.shape != actual.shape:  # single-step prediction vs window
                actual = actual.reshape(pred.shape)
            mse = (pred - actual) ** 2
            mse_log[f"{key}/action_mse_error"] = float(np.mean(mse))
            for thr in np.logspace(-3, -5, num=3).tolist():
                mse_log[f"{key}/action_accuracy@{thr}"] = float(
                    np.mean(mse < thr)
                )
            if savedir is not None:
                flat_actual = actual.reshape(-1, actual.shape[-1])
                flat_pred = pred.reshape(-1, pred.shape[-1])
                save_path = f"{savedir}/{key.lower()}_pred.png"
                VisUtils.make_model_prediction_plot(
                    hdf5_path=getattr(dataset, "hdf5_path", ""),
                    save_path=save_path,
                    action_names=[f"a{i}" for i in range(flat_actual.shape[-1])],
                    actual_actions=flat_actual,
                    predicted_actions=flat_pred,
                )
                vis_log[f"{key.lower()}_pred"] = save_path
        return mse_log, vis_log


class ValueAlgo(Algo):
    def get_state_value(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        raise NotImplementedError


class PlannerAlgo(Algo):
    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    def sample_subgoals(self, obs_dict, goal_dict=None, num_samples=1):
        raise NotImplementedError


class HierarchicalAlgo(Algo):
    def get_action(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        raise NotImplementedError

    @property
    def current_subgoal(self):
        raise NotImplementedError


def device_process_obs(obs_dict, obs_shapes=None):
    """Device-side obs processing for the jitted steps: uint8 images ->
    float32/255 (TPU-friendly: ship uint8 over PCIe/ICI, convert on device).
    Non-image float arrays pass through."""
    out = {}
    for k, v in obs_dict.items():
        if v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
        else:
            out[k] = v.astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# rollout wrappers
# ---------------------------------------------------------------------------

class RolloutPolicy:
    """Wraps an Algo for env stepping (reference algo.py:666-791):
    normalize obs -> batch -> get_action -> unnormalize actions ->
    runtime rot_6d conversion."""

    def __init__(self, policy, obs_normalization_stats=None,
                 action_normalization_stats=None, lang_encoder=None):
        self.policy = policy
        self.obs_normalization_stats = obs_normalization_stats
        self.action_normalization_stats = action_normalization_stats
        self._ep_lang_emb = None
        self.lang_encoder = lang_encoder

    def start_episode(self, lang=None):
        if self.lang_encoder is not None and lang is not None:
            self._ep_lang_emb = np.asarray(self.lang_encoder.get_lang_emb(lang))
        self.policy.set_eval()
        self.policy.reset()

    def _prepare_observation(self, ob, batched=False):
        """@batched: obs is already [N, ...] across a vector env
        (reference algo.py:704-735)."""
        ob = dict(ob)
        if self.obs_normalization_stats is not None:
            ob = ObsUtils.normalize_dict(ob, self.obs_normalization_stats)
        if self._ep_lang_emb is not None:
            ref = np.asarray(ob[next(iter(ob))])
            emb = self._ep_lang_emb
            if batched:
                # [N, ...] or [N, T, ...] obs -> emb tiled over leading dims
                lead = ref.shape[:2] if ref.ndim >= 3 else ref.shape[:1]
                ob[LANG_EMB_KEY] = np.tile(
                    emb, lead + (1,) * emb.ndim
                ).reshape(lead + emb.shape)
            elif ref.ndim == 1:
                ob[LANG_EMB_KEY] = emb
            else:
                ob[LANG_EMB_KEY] = np.repeat(emb[None], len(ref), axis=0)
        if not batched:
            ob = {k: np.asarray(v)[None] for k, v in ob.items()}
        else:
            ob = {k: np.asarray(v) for k, v in ob.items()}
        return ob

    def _unnormalize_action(self, ac):
        if self.action_normalization_stats is None:
            return ac
        action_keys = self.policy.global_config.train.action_keys
        action_shapes = {
            k: np.asarray(self.action_normalization_stats[k]["offset"]).shape[1:]
            for k in self.action_normalization_stats
        }
        ac_dict = AcUtils.vector_to_action_dict(
            ac, action_shapes=action_shapes, action_keys=action_keys
        )
        ac_dict = ObsUtils.unnormalize_dict(
            ac_dict, self.action_normalization_stats
        )
        action_config = self.policy.global_config.train.action_config
        for key, value in ac_dict.items():
            this_format = action_config.get(key, {}).get("format", None)
            if this_format == "rot_6d":
                conv = action_config[key].get("convert_at_runtime", "rot_axis_angle")
                if conv == "rot_axis_angle":
                    ac_dict[key] = RotUtils.rot_6d_to_axis_angle(value).astype(
                        value.dtype
                    )
                elif conv == "rot_euler":
                    ac_dict[key] = RotUtils.rot_6d_to_euler_angles(
                        value, "XYZ"
                    ).astype(value.dtype)
                else:
                    raise ValueError(conv)
        return AcUtils.action_dict_to_vector(ac_dict, action_keys=action_keys)

    def __call__(self, ob, goal=None, batched=False):
        ob = self._prepare_observation(ob, batched=batched)
        if goal is not None:
            goal = self._prepare_observation(goal, batched=batched)
        ac = np.asarray(self.policy.get_action(obs_dict=ob, goal_dict=goal))
        if not batched:
            ac = ac[0]
        return self._unnormalize_action(ac)


class ICLRolloutPolicy(RolloutPolicy):
    """Adds the in-context batch to every action query
    (reference algo.py:795-924)."""

    def __call__(self, ob, context_batch, goal=None, batched=False):
        ob = self._prepare_observation(ob, batched=batched)
        if goal is not None:
            goal = self._prepare_observation(goal, batched=batched)
        if batched and context_batch is not None:
            # one shared context demo serves every env in the vector batch
            n = len(next(iter(ob.values())))

            def tile(v):
                v = np.asarray(v)
                return np.repeat(v, n, axis=0) if v.shape[0] == 1 else v

            context_batch = TensorUtils.map_tensor(context_batch, tile)
        ac = np.asarray(
            self.policy.get_action(
                obs_dict=ob, context_batch=context_batch, goal_dict=goal
            )
        )
        if not batched:
            ac = ac[0]
        return self._unnormalize_action(ac)

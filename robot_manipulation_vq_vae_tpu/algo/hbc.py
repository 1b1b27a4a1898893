"""Hierarchical Behavioral Cloning (reference ``robomimic/algo/hbc.py:38-344``):
a GL(_VAE) subgoal planner + a goal-conditioned BC(-RNN) actor.

Modes (reference hbc.py:83-84):
  "separate" - actor trains against ground-truth subgoals from the batch;
  "cascade"  - actor trains against the planner's predicted subgoals.
At rollout, the planner refreshes the subgoal every
``subgoal_update_interval`` steps and the actor tracks it as its goal.
"""

from collections import OrderedDict

import numpy as np

from robot_manipulation_vq_vae_tpu.algo.algo import (
    HierarchicalAlgo,
    register_algo_factory_func,
)
from robot_manipulation_vq_vae_tpu.algo.bc import BC_RNN
from robot_manipulation_vq_vae_tpu.algo.gl import GL, GL_VAE
from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils


@register_algo_factory_func("hbc")
def algo_config_to_class(algo_config):
    """Reference hbc.py:22-35."""
    planner_cls = GL_VAE if algo_config.planner.vae.enabled else GL
    return HBC, dict(planner_algo_class=planner_cls, policy_algo_class=BC_RNN)


class HBC(HierarchicalAlgo):
    def __init__(self, algo_config, obs_config, global_config, obs_key_shapes,
                 ac_dim, device=None, planner_algo_class=None,
                 policy_algo_class=None):
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.ac_dim = ac_dim
        self.device = device

        if planner_algo_class is None:
            planner_algo_class = (
                GL_VAE if algo_config.planner.vae.enabled else GL
            )
        if policy_algo_class is None:
            policy_algo_class = BC_RNN

        self._algo_mode = algo_config.mode
        assert self._algo_mode in ("separate", "cascade")
        self._subgoal_update_interval = algo_config.subgoal_update_interval
        self._subgoal_step_count = 0
        self._current_subgoal = None

        self.planner = planner_algo_class(
            algo_config=algo_config.planner,
            obs_config=obs_config.planner,
            global_config=global_config,
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )

        # actor is goal-conditioned on the planner's subgoal space
        # (reference hbc.py:99-123)
        self.actor_goal_shapes = self.planner.subgoal_shapes
        actor_obs_key_shapes = dict(obs_key_shapes)
        actor_obs_key_shapes.update(self.actor_goal_shapes)
        actor_obs_config = obs_config.actor.deepcopy()
        with actor_obs_config.unlocked():
            goal_modalities = {"low_dim": [], "rgb": [], "depth": [], "scan": []}
            for k in self.actor_goal_shapes:
                goal_modalities[ObsUtils.OBS_KEYS_TO_MODALITIES[k]].append(k)
            for mod, keys in goal_modalities.items():
                actor_obs_config.modalities.goal[mod] = keys
        self.actor = policy_algo_class(
            algo_config=algo_config.actor,
            obs_config=actor_obs_config,
            global_config=global_config,
            obs_key_shapes=actor_obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )

    def process_batch_for_training(self, batch):
        """Reference hbc.py:129-172."""
        input_batch = {
            "planner": self.planner.process_batch_for_training(batch),
            "actor": self.actor.process_batch_for_training(batch),
        }
        if self._algo_mode == "separate":
            input_batch["actor"]["goal_obs"] = (
                self.planner.get_actor_goal_for_training_from_processed_batch(
                    input_batch["planner"]
                )
            )
        return input_batch

    def train_on_batch(self, batch, epoch, validate=False):
        info = OrderedDict(planner=OrderedDict(), actor=OrderedDict())
        info["planner"].update(
            self.planner.train_on_batch(batch["planner"], epoch,
                                        validate=validate)
        )
        if self._algo_mode == "cascade":
            batch["actor"]["goal_obs"] = {
                k: np.asarray(v)
                for k, v in self.planner.get_subgoal_predictions(
                    batch["planner"]["obs"]
                ).items()
            }
        info["actor"].update(
            self.actor.train_on_batch(batch["actor"], epoch, validate=validate)
        )
        return info

    def log_info(self, info):
        log = OrderedDict()
        for k, v in self.planner.log_info(info["planner"]).items():
            log[f"Planner/{k}"] = v
        for k, v in self.actor.log_info(info["actor"]).items():
            log[f"Actor/{k}"] = v
        log["Loss"] = log.get("Planner/Loss", 0.0) + log.get("Actor/Loss", 0.0)
        return log

    @property
    def current_subgoal(self):
        return self._current_subgoal

    def _planner_obs(self, obs_dict):
        """The planner consumes single-step obs; when the actor's rollout
        obs are time-stacked, hand the planner the latest frame."""
        out = {}
        for k, shape in self.planner.obs_shapes.items():
            v = np.asarray(obs_dict[k])
            if v.ndim == len(shape) + 2:  # [B, T, ...] -> [B, ...]
                v = v[:, -1]
            out[k] = v
        return out

    def get_action(self, obs_dict, goal_dict=None):
        """Refresh the subgoal every interval, act toward it
        (reference hbc.py:275-310)."""
        if (
            self._current_subgoal is None
            or self._subgoal_step_count % self._subgoal_update_interval == 0
        ):
            self._current_subgoal = {
                k: np.asarray(v)
                for k, v in self.get_subgoal_predictions(
                    self._planner_obs(obs_dict), goal_dict
                ).items()
            }
        self._subgoal_step_count += 1
        return self.actor.get_action(obs_dict, goal_dict=self._current_subgoal)

    def get_subgoal_predictions(self, obs_dict, goal_dict=None):
        return self.planner.get_subgoal_predictions(obs_dict, goal_dict)

    def reset(self):
        self._subgoal_step_count = 0
        self._current_subgoal = None
        self.planner.reset()
        self.actor.reset()

    def set_eval(self):
        self.planner.set_eval()
        self.actor.set_eval()

    def set_train(self):
        self.planner.set_train()
        self.actor.set_train()

    def on_epoch_end(self, epoch):
        self.planner.on_epoch_end(epoch)
        self.actor.on_epoch_end(epoch)

    def serialize(self, include_optimizer=False):
        return {
            "planner": self.planner.serialize(include_optimizer),
            "actor": self.actor.serialize(include_optimizer),
        }

    def deserialize(self, model_dict):
        self.planner.deserialize(model_dict["planner"])
        self.actor.deserialize(model_dict["actor"])

    def __repr__(self):
        return (
            f"HBC (mode={self._algo_mode})\n"
            f"planner: {self.planner!r}\nactor: {self.actor!r}"
        )

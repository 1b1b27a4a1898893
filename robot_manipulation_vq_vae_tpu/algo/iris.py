"""IRIS (reference ``robomimic/algo/iris.py:34-183``): HBC whose planner is a
ValuePlanner (GL_VAE subgoal sampler ranked by a BCQ value network)."""

from robot_manipulation_vq_vae_tpu.algo.algo import register_algo_factory_func
from robot_manipulation_vq_vae_tpu.algo.bc import BC_RNN
from robot_manipulation_vq_vae_tpu.algo.bcq import BCQ
from robot_manipulation_vq_vae_tpu.algo.gl import GL, GL_VAE, ValuePlanner
from robot_manipulation_vq_vae_tpu.algo.hbc import HBC


@register_algo_factory_func("iris")
def algo_config_to_class(algo_config):
    """Reference iris.py:17-31."""
    return IRIS, {}


class _IRISValuePlanner(ValuePlanner):
    """ValuePlanner wired to the iris config section names
    (algo.value_planner.{planner, value})."""

    pass


class IRIS(HBC):
    def __init__(self, algo_config, obs_config, global_config, obs_key_shapes,
                 ac_dim, device=None):
        self.algo_config = algo_config
        self.obs_config = obs_config
        self.global_config = global_config
        self.ac_dim = ac_dim
        self.device = device

        self._algo_mode = algo_config.mode
        assert self._algo_mode in ("separate", "cascade")
        self._subgoal_update_interval = algo_config.subgoal_update_interval
        self._subgoal_step_count = 0
        self._current_subgoal = None

        planner_cls = (
            GL_VAE if algo_config.value_planner.planner.vae.enabled else GL
        )
        self.planner = _IRISValuePlanner(
            planner_algo_class=planner_cls,
            value_algo_class=BCQ,
            algo_config=algo_config.value_planner,
            obs_config=obs_config.value_planner,
            global_config=global_config,
            obs_key_shapes=obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )

        from robot_manipulation_vq_vae_tpu.utils import obs_utils as ObsUtils

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
        self.actor = BC_RNN(
            algo_config=algo_config.actor,
            obs_config=actor_obs_config,
            global_config=global_config,
            obs_key_shapes=actor_obs_key_shapes,
            ac_dim=ac_dim,
            device=device,
        )

    def get_state_value(self, obs_dict, goal_dict=None):
        return self.planner.get_state_value(obs_dict, goal_dict)

    def get_state_action_value(self, obs_dict, actions, goal_dict=None):
        return self.planner.get_state_action_value(obs_dict, actions, goal_dict)

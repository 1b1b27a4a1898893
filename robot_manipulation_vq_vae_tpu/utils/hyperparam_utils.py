"""Hyperparameter sweep / config generation
(reference ``robomimic/utils/hyperparam_utils.py:14-357``).

``ConfigGenerator`` loads a base config JSON, registers swept parameters
(grouped: params in the same group vary together; different groups take the
cartesian product), and emits one JSON per combination plus a shell script
of train commands.
"""

import itertools
import json
import os
from collections import OrderedDict


class ConfigGenerator:
    def __init__(self, base_config_file, script_file, wandb_proj_name=None,
                 generated_config_dir=None):
        self.base_config_file = base_config_file
        self.script_file = os.path.expanduser(script_file)
        self.wandb_proj_name = wandb_proj_name
        if generated_config_dir is None:
            generated_config_dir = os.path.join(
                os.path.dirname(os.path.abspath(self.script_file)), "generated"
            )
        self.generated_config_dir = os.path.expanduser(generated_config_dir)
        self.parameters = OrderedDict()

    def add_param(self, key, name, group, values, value_names=None):
        """Register a swept parameter.

        Args:
            key (str): dotted config path, e.g. "train.batch_size"
            name (str): short name used in the experiment name ("" to omit)
            group (int): params sharing a group index vary together
            values (list): values to sweep
            value_names (list or None): printable names per value
        """
        if value_names is not None:
            assert len(value_names) == len(values)
        self.parameters[key] = dict(
            name=name, group=group, values=list(values),
            value_names=value_names,
        )
        return self

    @staticmethod
    def _set_dotted(cfg, dotted, value):
        node = cfg
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def _combinations(self):
        """Group params; zip within a group, product across groups."""
        groups = OrderedDict()
        for key, spec in self.parameters.items():
            groups.setdefault(spec["group"], []).append(key)
        group_settings = []
        for group, keys in groups.items():
            lengths = {len(self.parameters[k]["values"]) for k in keys}
            assert len(lengths) == 1, (
                f"params in group {group} must have equal value counts"
            )
            n = lengths.pop()
            group_settings.append([
                {k: i for k in keys} for i in range(n)
            ])
        for combo in itertools.product(*group_settings):
            merged = {}
            for d in combo:
                merged.update(d)
            yield merged

    def _name_for(self, combo):
        parts = []
        for key, idx in combo.items():
            spec = self.parameters[key]
            if not spec["name"]:
                continue
            if spec["value_names"] is not None:
                val_str = spec["value_names"][idx]
            else:
                v = spec["values"][idx]
                val_str = str(v).replace(" ", "").replace("/", "-")
            parts.append(f"{spec['name']}_{val_str}")
        return "_".join(parts)

    def generate(self, train_script="robot_manipulation_vq_vae_tpu.scripts.train"):
        """Write config JSONs + the launcher shell script. Returns the list
        of generated config paths."""
        with open(self.base_config_file) as f:
            base = json.load(f)
        os.makedirs(self.generated_config_dir, exist_ok=True)

        config_paths = []
        lines = ["#!/bin/bash", ""]
        base_name = base.get("experiment", {}).get("name", "exp")
        for combo in self._combinations():
            cfg = json.loads(json.dumps(base))  # deep copy
            suffix = self._name_for(combo)
            exp_name = f"{base_name}_{suffix}" if suffix else base_name
            self._set_dotted(cfg, "experiment.name", exp_name)
            if self.wandb_proj_name is not None:
                self._set_dotted(
                    cfg, "experiment.logging.wandb_proj_name",
                    self.wandb_proj_name,
                )
            hp_keys, hp_values = [], []
            for key, idx in combo.items():
                spec = self.parameters[key]
                value = spec["values"][idx]
                self._set_dotted(cfg, key, value)
                if spec["name"]:
                    hp_keys.append(spec["name"])
                    hp_values.append(value)
            self._set_dotted(cfg, "meta.hp_base_config_file",
                             self.base_config_file)
            self._set_dotted(cfg, "meta.hp_keys", hp_keys)
            self._set_dotted(cfg, "meta.hp_values", hp_values)

            path = os.path.join(self.generated_config_dir, f"{exp_name}.json")
            with open(path, "w") as f:
                json.dump(cfg, f, indent=4)
            config_paths.append(path)
            lines.append(f"python -m {train_script} --config {path}")

        with open(self.script_file, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.chmod(self.script_file, 0o755)
        return config_paths


def get_value_for_key(dic, key):
    node = dic
    for p in key.split("."):
        node = node[p]
    return node


def set_value_for_key(dic, key, val):
    ConfigGenerator._set_dotted(dic, key, val)

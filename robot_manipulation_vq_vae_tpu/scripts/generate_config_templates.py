"""Write the default JSON template for every registered algo config
(reference ``robomimic/scripts/generate_config_templates.py`` ->
``robomimic/exps/templates/*.json``)."""

import os


def main():
    import robot_manipulation_vq_vae_tpu
    from robot_manipulation_vq_vae_tpu.config import get_all_registered_configs

    target_dir = os.path.join(
        os.path.dirname(robot_manipulation_vq_vae_tpu.__file__),
        "exps", "templates",
    )
    os.makedirs(target_dir, exist_ok=True)
    for algo_name, cls in sorted(get_all_registered_configs().items()):
        config = cls()
        path = os.path.join(target_dir, f"{algo_name}.json")
        with open(path, "w") as f:
            f.write(config.dump())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

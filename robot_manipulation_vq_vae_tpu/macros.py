"""Machine-local settings (reference ``robomimic/macros.py:1-33``).

Create a ``macros_private.py`` next to this file (see
``scripts/setup_macros.py``) to override values per machine without touching
version control.
"""

# observation key holding the language embedding (reference macros.py:18)
LANG_EMB_KEY = "lang_emb"

# default base path for RoboCasa datasets (None -> ~/robocasa/datasets)
DATASET_BASE_PATH = None

# experiment logging defaults
WANDB_ENTITY = None
WANDB_API_KEY = None

try:  # pragma: no cover - machine-local override
    from robot_manipulation_vq_vae_tpu.macros_private import *  # noqa: F401,F403
except ImportError:
    pass

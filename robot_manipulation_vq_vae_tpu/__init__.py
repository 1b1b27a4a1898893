"""robot_manipulation_vq_vae_tpu: a TPU-native (JAX / Flax / pjit / Pallas) framework
with the capabilities of the LipVQ-VAE in-context imitation-learning stack
("Action Tokenizer Matters in In-Context Imitation Learning", IROS 2025).

This is NOT a port of the PyTorch reference; it is a re-design around XLA's
compilation model:

  * pure, jitted train/eval steps over explicit state pytrees,
  * mutable codebook/EMA state carried in Flax variable collections,
  * Pallas TPU kernels for the hot codebook-quantization ops,
  * scale-out via ``jax.sharding.Mesh`` + batch-sharded data parallelism.

Layer map (mirrors reference SURVEY.md numbering):
  config/    -- locking Config dict + registry + JSON template override   (L7)
  data/      -- HDF5 SequenceDataset / MetaDataset / normalization        (L3)
  models/    -- obs encoders, GPT backbone, actor nets, tokenizers        (L4)
  ops/       -- quantization math: XLA reference impls + Pallas kernels
  algo/      -- Algo registry, ICL family, BC family, rollout policies    (L5)
  parallel/  -- device mesh, sharding rules, pjit train steps
  envs/      -- EnvBase protocol + wrappers (host-side MuJoCo stays CPU)  (L2)
  utils/     -- tensor/obs/train/log/file utilities                      (L6)
  scripts/   -- train / eval CLIs, config generation                      (L8)
"""

__version__ = "0.1.0"

# Opt-in CPU pin for subprocesses (examples, notebooks, data tooling).
# The env var JAX_PLATFORMS is NOT sufficient on backends whose platform
# plugin re-registers itself during jax import (it overrides the env var);
# only the config API sticks, so honor an explicit request here, before
# any device is touched.
import os as _os

if _os.environ.get("RMVQ_FORCE_CPU") == "1":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# robomimic paper dataset registry (reference robomimic/__init__.py:17-105):
# task -> dataset_type (ph/mh/mg/paired) -> hdf5_type -> {url, horizon}.
# URLs are canonical upstream links, never fetched from this zero-egress
# build - scripts/generate_paper_configs.py and download_datasets use them
# for naming/instructions only.
# ---------------------------------------------------------------------------
DATASET_REGISTRY = {}

_RT_BENCH = "http://downloads.cs.stanford.edu/downloads/rt_benchmark"


def register_dataset_link(task, dataset_type, hdf5_type, link, horizon):
    """Record a dataset link + its eval rollout horizon (reference
    robomimic/__init__.py:32-50)."""
    DATASET_REGISTRY.setdefault(task, {}).setdefault(dataset_type, {})[
        hdf5_type
    ] = dict(url=link, horizon=horizon)


def register_all_links():
    """All robomimic CoRL-2021 benchmark datasets (reference
    robomimic/__init__.py:53-105)."""
    ph_tasks = [
        "lift", "can", "square", "transport", "tool_hang",
        "lift_real", "can_real", "tool_hang_real",
    ]
    ph_horizons = [400, 400, 400, 700, 700, 1000, 1000, 1000]
    for task, horizon in zip(ph_tasks, ph_horizons):
        suffix = "" if "real" in task else "_v141"
        register_dataset_link(
            task=task, dataset_type="ph", hdf5_type="raw", horizon=horizon,
            link=f"{_RT_BENCH}/{task}/ph/demo{suffix}.hdf5",
        )
        if "real" not in task:
            register_dataset_link(
                task=task, dataset_type="ph", hdf5_type="low_dim",
                horizon=horizon,
                link=f"{_RT_BENCH}/{task}/ph/low_dim_v141.hdf5",
            )
            register_dataset_link(
                task=task, dataset_type="ph", hdf5_type="image",
                horizon=horizon, link=None,
            )

    mh_tasks = ["lift", "can", "square", "transport"]
    mh_horizons = [500, 500, 500, 1100]
    for task, horizon in zip(mh_tasks, mh_horizons):
        register_dataset_link(
            task=task, dataset_type="mh", hdf5_type="raw", horizon=horizon,
            link=f"{_RT_BENCH}/{task}/mh/demo_v141.hdf5",
        )
        register_dataset_link(
            task=task, dataset_type="mh", hdf5_type="low_dim", horizon=horizon,
            link=f"{_RT_BENCH}/{task}/mh/low_dim_v141.hdf5",
        )
        register_dataset_link(
            task=task, dataset_type="mh", hdf5_type="image", horizon=horizon,
            link=None,
        )

    for task, horizon in zip(["lift", "can"], [400, 400]):
        register_dataset_link(
            task=task, dataset_type="mg", hdf5_type="raw", horizon=horizon,
            link=f"{_RT_BENCH}/{task}/mg/demo_v141.hdf5",
        )
        for kind in ("low_dim_sparse", "image_sparse", "low_dim_dense",
                     "image_dense"):
            register_dataset_link(
                task=task, dataset_type="mg", hdf5_type=kind, horizon=horizon,
                link=f"{_RT_BENCH}/{task}/mg/{kind}_v141.hdf5",
            )

    register_dataset_link(
        task="can", dataset_type="paired", hdf5_type="raw", horizon=400,
        link=f"{_RT_BENCH}/can/paired/demo_v141.hdf5",
    )
    register_dataset_link(
        task="can", dataset_type="paired", hdf5_type="low_dim", horizon=400,
        link=f"{_RT_BENCH}/can/paired/low_dim_v141.hdf5",
    )
    register_dataset_link(
        task="can", dataset_type="paired", hdf5_type="image", horizon=400,
        link=None,
    )


register_all_links()


# ---------------------------------------------------------------------------
# MoMaRT dataset registry (reference robomimic/__init__.py:108-156):
# task -> dataset_type -> {url, size (GB)}. Never fetched from inside this
# zero-egress build - scripts/download_momart_datasets.py checks local
# availability and prints these canonical URLs for a connected machine.
# ---------------------------------------------------------------------------
MOMART_DATASET_REGISTRY = {}


def register_momart_dataset_link(task, dataset_type, link, dataset_size):
    """Record a dataset link (reference robomimic/__init__.py:108-124)."""
    MOMART_DATASET_REGISTRY.setdefault(task, {})[dataset_type] = dict(
        url=link, size=dataset_size
    )


def register_all_momart_links():
    """All MoMaRT tasks mapped to [expert, suboptimal, generalize, sample]
    dataset sizes in GB (reference robomimic/__init__.py:127-156)."""
    momart_tasks = {
        "table_setup_from_dishwasher": [14, 14, 3.3, 0.6],
        "table_setup_from_dresser": [16, 17, 3.1, 0.7],
        "table_cleanup_to_dishwasher": [23, 36, 5.3, 1.1],
        "table_cleanup_to_sink": [17, 28, 2.9, 0.8],
        "unload_dishwasher": [21, 27, 5.4, 1.0],
    }
    momart_dataset_types = ["expert", "suboptimal", "generalize", "sample"]
    for task, dataset_sizes in momart_tasks.items():
        for dataset_type, dataset_size in zip(momart_dataset_types, dataset_sizes):
            register_momart_dataset_link(
                task=task,
                dataset_type=dataset_type,
                link=(
                    "http://downloads.cs.stanford.edu/downloads/rt_mm/"
                    f"{dataset_type}/{task}_{dataset_type}.hdf5"
                ),
                dataset_size=dataset_size,
            )


register_all_momart_links()

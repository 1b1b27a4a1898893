"""Reference-API compatibility shim: the reference keeps the dataset classes
under ``utils/dataset.py``; they live in ``data/dataset.py`` here."""

from robot_manipulation_vq_vae_tpu.data.dataset import (  # noqa: F401
    MetaDataset,
    R2D2Dataset,
    SequenceDataset,
    action_stats_to_normalization_stats,
    _aggregate_traj_stats,
    _compute_traj_stats,
)

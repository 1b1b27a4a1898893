from robot_manipulation_vq_vae_tpu.data.dataset import (
    SequenceDataset,
    R2D2Dataset,
    MetaDataset,
    action_stats_to_normalization_stats,
)
from robot_manipulation_vq_vae_tpu.data.loader import DataLoader, InfiniteLoader, collate
from robot_manipulation_vq_vae_tpu.data.prefetch import (
    DevicePrefetcher,
    device_prefetch,
)

from robot_manipulation_vq_vae_tpu.ops import quantize
from robot_manipulation_vq_vae_tpu.ops.quantize import (
    l2_distance_sq,
    l2_nearest,
    l2_normalize,
    cosine_similarity,
    cosine_nearest,
    straight_through,
    assignment_stats,
    ema_update,
    replace_dead_codes,
    kmeans,
)

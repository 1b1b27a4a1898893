#!/bin/bash
# Batch-convert raw robosuite demo hdf5s into processed low-dim and image
# datasets (reference ``robomimic/scripts/extract_obs_from_raw_datasets.sh``).
# done-mode 0 (dones on task success) for MimicGen data, done-mode 1 for
# human demos, as the reference uses.

BASE_DATASET_DIR="${BASE_DATASET_DIR:-../../datasets}"
PY="python -m robot_manipulation_vq_vae_tpu.scripts.dataset_states_to_obs"
echo "Using base dataset directory: $BASE_DATASET_DIR"

for task in lift can square; do
  # low-dim
  $PY --done_mode 1 \
    --dataset "$BASE_DATASET_DIR/$task/ph/demo_v141.hdf5" \
    --output "$BASE_DATASET_DIR/$task/ph/low_dim_v141.hdf5"
  # image
  $PY --done_mode 1 \
    --dataset "$BASE_DATASET_DIR/$task/ph/demo_v141.hdf5" \
    --output "$BASE_DATASET_DIR/$task/ph/image_v141.hdf5" \
    --camera_names agentview robot0_eye_in_hand \
    --camera_height 84 --camera_width 84
done

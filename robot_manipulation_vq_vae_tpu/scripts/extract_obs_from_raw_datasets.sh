#!/bin/bash
# Batch-convert raw robosuite demo hdf5s into the processed low-dim and
# image datasets of the robomimic benchmark (reference
# ``robomimic/scripts/extract_obs_from_raw_datasets.sh``, full command
# matrix). Done modes follow the reference: 0 for machine-generated data
# (dones on task success; --shaped adds dense rewards), 2 for PH/MH/paired
# human data (dones on success and end of trajectory).

set -u

BASE_DATASET_DIR="${BASE_DATASET_DIR:-../../datasets}"
PY="python -m robot_manipulation_vq_vae_tpu.scripts.dataset_states_to_obs"
echo "Using base dataset directory: $BASE_DATASET_DIR"

CAMS_DEFAULT="agentview robot0_eye_in_hand"
CAMS_TRANSPORT="shouldercamera0 shouldercamera1 robot0_eye_in_hand robot1_eye_in_hand"
CAMS_TOOL_HANG="sideview robot0_eye_in_hand"

extract() {  # <dataset> <output_name> <done_mode> <extra...>
  local dataset="$1" output_name="$2" done_mode="$3"
  shift 3
  $PY --done_mode "$done_mode" \
    --dataset "$dataset" \
    --output_name "$output_name" "$@"
}

### mg (done-mode 0; sparse + dense-reward variants) ###
for task in lift can; do
  ds="$BASE_DATASET_DIR/$task/mg/demo_v141.hdf5"
  extract "$ds" low_dim_sparse_v141.hdf5 0
  extract "$ds" image_sparse_v141.hdf5 0 \
    --camera_names $CAMS_DEFAULT --camera_height 84 --camera_width 84
  extract "$ds" low_dim_dense_v141.hdf5 0 --shaped
  extract "$ds" image_dense_v141.hdf5 0 --shaped \
    --camera_names $CAMS_DEFAULT --camera_height 84 --camera_width 84
done

### ph (done-mode 2) ###
for task in lift can square; do
  ds="$BASE_DATASET_DIR/$task/ph/demo_v141.hdf5"
  extract "$ds" low_dim_v141.hdf5 2
  extract "$ds" image_v141.hdf5 2 \
    --camera_names $CAMS_DEFAULT --camera_height 84 --camera_width 84
done
ds="$BASE_DATASET_DIR/transport/ph/demo_v141.hdf5"
extract "$ds" low_dim_v141.hdf5 2
extract "$ds" image_v141.hdf5 2 \
  --camera_names $CAMS_TRANSPORT --camera_height 84 --camera_width 84
ds="$BASE_DATASET_DIR/tool_hang/ph/demo_v141.hdf5"
extract "$ds" low_dim_v141.hdf5 2
extract "$ds" image_v141.hdf5 2 \
  --camera_names $CAMS_TOOL_HANG --camera_height 240 --camera_width 240

### mh (done-mode 2) ###
for task in lift can square; do
  ds="$BASE_DATASET_DIR/$task/mh/demo_v141.hdf5"
  extract "$ds" low_dim_v141.hdf5 2
  extract "$ds" image_v141.hdf5 2 \
    --camera_names $CAMS_DEFAULT --camera_height 84 --camera_width 84
done
ds="$BASE_DATASET_DIR/transport/mh/demo_v141.hdf5"
extract "$ds" low_dim_v141.hdf5 2
extract "$ds" image_v141.hdf5 2 \
  --camera_names $CAMS_TRANSPORT --camera_height 84 --camera_width 84

### can-paired (done-mode 2) ###
ds="$BASE_DATASET_DIR/can/paired/demo_v141.hdf5"
extract "$ds" low_dim_v141.hdf5 2
extract "$ds" image_v141.hdf5 2 \
  --camera_names $CAMS_DEFAULT --camera_height 84 --camera_width 84

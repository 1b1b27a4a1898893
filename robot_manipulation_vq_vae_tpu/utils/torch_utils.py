"""Reference-API compatibility shim: the reference exposes optimizers,
schedulers, and rotation conversions under ``utils/torch_utils.py``; users
migrating from it find the same names here (backed by optax / numpy - no
torch in the compute path)."""

from robot_manipulation_vq_vae_tpu.utils.optim_utils import (  # noqa: F401
    lr_schedule_from_optim_params,
    optimizer_from_optim_params,
)
from robot_manipulation_vq_vae_tpu.utils.rotation_utils import (  # noqa: F401
    axis_angle_to_matrix,
    axis_angle_to_rot_6d,
    matrix_to_axis_angle,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    matrix_to_rot_6d,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    rot_6d_to_axis_angle,
    rot_6d_to_euler_angles,
    rot_6d_to_matrix,
)


def lr_scheduler_from_optim_params(net_optim_params, net=None, optimizer=None,
                                   num_training_steps=None):
    """Reference-named wrapper (schedules are baked into the optax
    transform here; this returns the schedule callable)."""
    return lr_schedule_from_optim_params(
        net_optim_params, num_training_steps=num_training_steps
    )

"""Host-side utilities: cameras, poses, trajectories."""

from sanerf_tpu.utils.camera import (
    OrbitCamera,
    auto_scale_poses,
    center_poses,
    circle_poses,
    fov_to_focal,
    interp_poses,
    nerf_matrix_to_ngp,
)

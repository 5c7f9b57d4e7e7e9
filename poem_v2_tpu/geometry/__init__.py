from .rotations import (
    aa_to_quat,
    aa_to_rot6d,
    aa_to_rotmat,
    quat_to_aa,
    quat_to_rot6d,
    quat_to_rotmat,
    rot6d_to_aa,
    rot6d_to_quat,
    rot6d_to_rotmat,
    rotmat_to_aa,
    rotmat_to_quat,
    rotmat_to_rot6d,
)
from .camera import (
    cam_extr_transf,
    cam_intr_projection,
    inverse_sigmoid,
    invert_rigid,
    mano_to_openpose,
    persp_project,
    project_world_to_pixel,
    ref_bone_len,
    uvd_to_xyz,
    xyz_to_uvd,
)
from .triangulation import triangulate_dlt
from .procrustes import align_w_scale
from .heatmap import (
    gaussian_heatmap2d,
    integral_heatmap2d,
    integral_heatmap3d,
    normalize_heatmap,
)

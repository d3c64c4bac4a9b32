"""Core math ops: schedules, Gaussian diffusion, SO(3)/IGSO3, assignment, kNN."""

from .schedules import DiffusionSchedule, extract  # noqa: F401
from .gaussian import (  # noqa: F401
    q_sample,
    ddim_step,
    ddpm_step,
    sample_loop,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
)
from .so3 import (  # noqa: F401
    quaternion_to_matrix,
    matrix_to_quaternion,
    standardize_quaternion,
    vec2skew,
    skew2vec,
    aa_to_rmat,
    rotvec_to_rmat,
    quaternion_to_rotvec,
    rmat_to_rotvec,
    log_rmat,
    so3_scale,
    so3_lerp,
    geodesic_distance_rmat,
    quaternion_to_euler,
    sixdof_to_matrix,
    matrix_to_sixdof,
    orthogonalise,
    random_quaternion,
)
from .igso3 import build_igso3_inverse_cdf, igso3_sample, igso3_sample_angle  # noqa: F401
from .assignment import greedy_assignment, greedy_assignment_batch  # noqa: F401
from .knn import pairwise_sqdist, knn_indices, nearest_neighbor, chamfer_distance  # noqa: F401
from .rotation3d import Rotation3D  # noqa: F401
from .distributions import AffineT, bingham_sample, igso3xr3_sample, mmd_rbf, mmd_rotation  # noqa: F401

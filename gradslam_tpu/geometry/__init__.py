from .projutils import (
    homogenize_points,
    inverse_intrinsics,
    project_points,
    unhomogenize_points,
    unproject_points,
)
from .geometryutils import (
    compose_transformations,
    create_meshgrid,
    inverse_transformation,
    normalize_quaternion,
    quaternion_to_rotation_matrix,
    relative_transformation,
    transform_normals,
    transform_pointcloud,
)
from .se3utils import se3_exp, se3_hat, so3_exp, so3_hat

__all__ = [
    "homogenize_points",
    "unhomogenize_points",
    "project_points",
    "unproject_points",
    "inverse_intrinsics",
    "create_meshgrid",
    "compose_transformations",
    "inverse_transformation",
    "relative_transformation",
    "transform_pointcloud",
    "transform_normals",
    "normalize_quaternion",
    "quaternion_to_rotation_matrix",
    "so3_hat",
    "se3_hat",
    "so3_exp",
    "se3_exp",
]

from gradus_tpu.utils.linalg import (
    sym4x4,
    sym4x4_inverse_components,
    spherical_to_cartesian,
    cartesian_to_spherical,
    cartesian_distance,
    cartesian_squared_distance,
    equatorial_project,
    spinaxis_project,
    smooth_step_interpolate,
    oblate_spheroid_to_spherical,
)
from gradus_tpu.utils.interp import (
    nan_tolerant_interp,
    linear_interp,
    make_interpolator,
    masked_sorted_interp,
)
from gradus_tpu.utils.quadrature import gauss_legendre

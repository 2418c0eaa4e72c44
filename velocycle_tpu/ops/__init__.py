from .fourier import fourier_basis, basis  # noqa: F401
from .circular import (  # noqa: F401
    pack_direction,
    unpack_direction,
    wrap_angle,
    circular_corrcoef,
    circular_mean,
    circular_distance,
    circular_std_from_concentration,
)
from .likelihoods import nb_logpmf, poisson_logpmf  # noqa: F401
from .splines import (  # noqa: F401
    spline_basis,
    spline_basis_2d,
    spline_basis_2d_der,
    spline_basis_auto,
    spline_knots,
)

from .elbo import Trace_ELBO  # noqa: F401
from .svi import SVI, init_params  # noqa: F401
from .optim import clipped_adam, adam  # noqa: F401

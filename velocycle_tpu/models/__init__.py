from .metapars import PhaseData, VelocityData, Metapars  # noqa: F401
from .basis import (  # noqa: F401
    expression_basis,
    guide_phi,
    omega_basis,
    sample_phi,
)
from .phase import (  # noqa: F401
    phase_model,
    phase_guide,
    phase_model_lba,
    phase_guide_lba,
)
from .velocity import (  # noqa: F401
    velocity_model,
    velocity_guide,
    velocity_guide_lrmn,
)

from .metapars import PhaseData, VelocityData, Metapars  # noqa: F401
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

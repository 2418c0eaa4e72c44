from . import distributed  # noqa: F401
from .mesh import make_mesh, local_mesh  # noqa: F401
from .scaling import phase_weak_scaling, format_report  # noqa: F401
from .sharding import (  # noqa: F401
    shard_phase_data,
    shard_velocity_data,
    shard_params,
    replicate,
    data_sharding_spec,
    param_sharding_spec,
)

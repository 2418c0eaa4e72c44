"""velocycle_tpu: a TPU-native probabilistic-inference framework for
manifold-constrained RNA velocity of the cell cycle.

Built from scratch on JAX/XLA/Pallas — same capabilities as the reference
VeloCycle (lamanno-epfl/velocycle), re-designed TPU-first: models are pure
functions interpreted by trace-time effect handlers, SVI/MCMC/SMC steps are
single fused XLA programs, the cell axis shards over a device mesh.
"""

__version__ = "0.1.0"

from . import core, infer, models, ops, parallel, twodim  # noqa: F401
from . import containers, genes, preprocessing, simulate  # noqa: F401
from . import alignment, checkpoint, plots, profiling  # noqa: F401
from .alignment import invert_direction, shift_zero  # noqa: F401
from .anndata_lite import AnnDataLite, read_h5ad, write_h5ad  # noqa: F401
from .containers import AngularSpeed, Cycle, Phases  # noqa: F401
from .fit import PhaseFitModel, VelocityFitModel  # noqa: F401
from .fit_mcmc import MCMCFitModel, SMCFitModel  # noqa: F401
from .warmup import enable_compile_cache, warmup  # noqa: F401
from .preprocessing import (  # noqa: F401
    filter_shared_genes,
    make_design_matrix,
    normalize_total,
    preprocess_for_phase_estimation,
    preprocess_for_velocity_estimation,
)

"""Joint (Cycle, Phases) alignment helpers.

The circle has two gauge freedoms — rotation of the zero point and
direction — and a fitted (Cycle, Phases) pair is only consistent if both
objects are transformed *together*.  These module-level helpers mirror the
reference's `invert_direction` / `shift_zero`
(`/root/reference/velocycle/phase_inference_model.py:29-78`, also reachable
there via `preprocessing.*` through a star import): per-container methods
exist too (`Cycle.shift_zero`, `Phases.rotate`, ...), but a user aligning
orientation should call these so the pair stays in the same gauge.
"""
from __future__ import annotations

import numpy as np

__all__ = ["invert_direction", "shift_zero"]


def invert_direction(cycle, phases):
    """Mirror the cycle direction of a (Cycle, Phases) pair, in place.

    Negates every sin harmonic row of ``cycle`` and reflects every cell
    phase across the x axis, so ElogS(phi_c) is unchanged for every cell
    (`phase_inference_model.py:29-44`).
    """
    cycle.invert_direction()
    phases.invert_direction()


def shift_zero(cycle, phases, gene=None, phase=None):
    """Rotate the manifold zero point of a (Cycle, Phases) pair, in place.

    With ``gene=``: the Cycle is rotated so that gene's first-harmonic peak
    lands at phase zero, and the Phases are rotated by the phase of the
    cell where the gene's expected expression is maximal — the reference's
    semantics (`phase_inference_model.py:46-78`).  With ``phase=``: both
    objects are rotated by the same fixed angle.
    """
    if gene is not None:
        if gene not in cycle.genes:
            raise KeyError(f"gene {gene!r} not found in Cycle")
        from .ops.fourier import fourier_basis

        phis = np.asarray(phases.phis, np.float32)
        zeta = np.asarray(fourier_basis(phis, cycle.harmonics))  # (Nc, Nh)
        means = cycle.means_array                                # (Ng, Nh)
        row = list(cycle.genes).index(gene)
        elog_gene = means[row] @ zeta.T                          # (Nc,)
        phase_shift = float(phis[int(np.argmax(elog_gene))])
        cycle.shift_zero(gene=gene)
        phases.shift_zero(phase=phase_shift)
    elif phase is not None:
        cycle.shift_zero(phase=phase)
        phases.shift_zero(phase=phase)
    else:
        raise ValueError("must specify gene= or phase= for the shift")

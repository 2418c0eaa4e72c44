"""Joint (Cycle, Phases) gauge transforms + the LDA phase-prior builder."""
import numpy as np

from velocycle_tpu import Cycle, Phases, invert_direction, shift_zero
from velocycle_tpu import preprocessing
from velocycle_tpu.ops.fourier import fourier_basis
from velocycle_tpu.ops.circular import circular_corrcoef


def _pair(Ng=12, Nc=50, H=2, seed=0):
    rng = np.random.default_rng(seed)
    genes = [f"g{i}" for i in range(Ng)]
    means = rng.normal(0, 0.7, (2 * H + 1, Ng))
    stds = np.full((2 * H + 1, Ng), 0.3)
    cycle = Cycle.from_array(means, stds, genes)
    phis = rng.uniform(0, 2 * np.pi, Nc)
    phases = Phases.from_angles(phis, cell_names=[f"c{i}" for i in range(Nc)])
    return cycle, phases


def _elogs(cycle, phases):
    zeta = np.asarray(fourier_basis(
        np.asarray(phases.phis, np.float32), cycle.harmonics
    ))
    return cycle.means_array @ zeta.T


def test_joint_shift_zero_phase_keeps_elogs():
    cycle, phases = _pair()
    before = _elogs(cycle, phases)
    shift_zero(cycle, phases, phase=1.234)
    after = _elogs(cycle, phases)
    np.testing.assert_allclose(after, before, atol=1e-4)


def test_joint_invert_direction_keeps_elogs():
    cycle, phases = _pair(seed=1)
    before = _elogs(cycle, phases)
    invert_direction(cycle, phases)
    after = _elogs(cycle, phases)
    np.testing.assert_allclose(after, before, atol=1e-4)
    # round trip restores the original gauge
    invert_direction(cycle, phases)
    np.testing.assert_allclose(_elogs(cycle, phases), before, atol=1e-4)


def test_joint_shift_zero_gene_semantics():
    cycle, phases = _pair(seed=2)
    gene = "g3"
    row = list(cycle.genes).index(gene)
    argmax_cell = int(np.argmax(_elogs(cycle, phases)[row]))
    shift_zero(cycle, phases, gene=gene)
    # the gene's first-harmonic peak is now at phase zero ...
    c1, s1 = cycle.means[gene].iloc[1:3].values
    assert abs(np.arctan2(s1, c1)) < 1e-5
    # ... and the pre-shift max-expression cell lands at phase zero
    # (`phase_inference_model.py:68-73`: phases are rotated by that cell's
    # old phase)
    new_phi = float(np.asarray(phases.phis)[argmax_cell]) % (2 * np.pi)
    wrapped = min(new_phi, 2 * np.pi - new_phi)
    assert wrapped < 1e-4


def test_preprocessing_reexports_joint_helpers():
    assert preprocessing.invert_direction is invert_direction
    assert preprocessing.shift_zero is shift_zero


def test_lda_phase_prior_recovers_angle():
    """3-class labels carved from a true circle; the LDA angle must
    correlate circularly with the truth (Stereo-seq cells 68-73)."""
    from velocycle_tpu.simulate import simulate_data

    adata = simulate_data(Nc=300, Ng=60, omegas_to_test=(0.4,), seed=11)
    true_phi = np.asarray(adata.obs["simulated_phis"].values)
    labels = np.select(
        [true_phi < 2.0, true_phi < 4.0], ["G1", "S"], "G2M"
    )
    adata.obs["phase"] = labels
    adata.layers["S_sz"] = np.asarray(adata.layers["spliced"], np.float32)

    prior = Phases.from_lda_heuristic(adata, labels="phase", layer="S_sz")
    est = np.asarray(prior.phis)
    # direction is a gauge freedom: the workflow fixes it afterwards with
    # invert_direction (Stereo_seq_BrainRG.ipynb cell 75), so accept either
    rho = max(
        float(np.abs(circular_corrcoef(est, true_phi))),
        float(np.abs(circular_corrcoef(-est, true_phi))),
    )
    assert rho > 0.5, rho
    assert prior.phi_xy.shape == (2, 300)
    # each label class concentrates in angle space
    for lab in ("G1", "S", "G2M"):
        m = np.asarray(adata.obs["phase"]) == lab
        resultant = np.abs(np.mean(np.exp(1j * est[m])))
        assert resultant > 0.4, (lab, resultant)

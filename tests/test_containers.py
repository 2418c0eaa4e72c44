"""Container layer: Cycle / Phases / AngularSpeed structure, CSV round
trips (reference on-disk format), symmetry ops, prior builders."""
import numpy as np
import pytest

from velocycle_tpu.containers import AngularSpeed, Cycle, Phases, reorder


def _cycle(ng=5, h=2, seed=0):
    rng = np.random.default_rng(seed)
    k = 2 * h + 1
    genes = [f"G{i}" for i in range(ng)]
    return Cycle.from_array(
        rng.normal(size=(k, ng)), np.abs(rng.normal(size=(k, ng))), genes
    )


def test_cycle_structure():
    c = _cycle()
    assert c.harmonics == 2
    assert c.shape == (5, 5)
    assert len(c) == 5
    assert c.genes == [f"G{i}" for i in range(5)]
    assert list(c.means.index) == [
        "nu0", "nu1_cos", "nu1_sin", "nu2_cos", "nu2_sin"
    ]
    assert c.means_array.shape == (5, 5)  # (genes, coeffs)
    assert c.means_tensor.shape == (5, 5)  # (coeffs, genes)
    np.testing.assert_allclose(c.means_array, c.means_tensor.T)


def test_cycle_csv_roundtrip(tmp_path):
    c = _cycle()
    path = tmp_path / "cycle.csv"
    c.save(path)
    c2 = Cycle.load(path)
    np.testing.assert_allclose(c2.means.values, c.means.values)
    np.testing.assert_allclose(c2.stds.values, c.stds.values)
    assert c2.genes == c.genes


def test_cycle_trivial_prior_std_ladder():
    c = Cycle.trivial_prior(["A", "B"], harmonics=2)
    np.testing.assert_allclose(
        c.stds["A"].values, [0.1, 0.2, 0.2, 0.1, 0.1]
    )
    assert (c.means.values == 0).all()
    c3 = Cycle.trivial_prior(["A"], harmonics=3, stds=7.0)
    assert (c3.stds.values == 7.0).all()
    assert c3.harmonics == 3


def test_cycle_extend_add_remove_harmonics():
    c = _cycle(ng=3, h=1)
    c.extend(["H1", "H2"], means=1.0, stds=2.0)
    assert c.shape == (3, 5)
    assert c.means["H1"].iloc[0] == 1.0
    c.add_harmonics(1)
    assert c.harmonics == 2
    assert c.stds.loc["nu2_cos"].iloc[0] == 10.0
    c.remove_harmonics(2)
    assert c.harmonics == 1


def test_cycle_shift_zero_moves_gene_peak_to_zero():
    c = _cycle()
    g = "G2"
    c.shift_zero(gene=g)
    c1, s1 = c.means[g].iloc[1:3]
    # peak phase of the first harmonic is now 0
    assert abs(np.arctan2(s1, c1)) < 1e-6
    # shift is a rotation: amplitudes preserved for every gene and harmonic
    c0 = _cycle()
    for gg in c.genes:
        for h in (1, 2):
            a_old = np.hypot(*c0.means[gg].iloc[2 * h - 1:2 * h + 1])
            a_new = np.hypot(*c.means[gg].iloc[2 * h - 1:2 * h + 1])
            np.testing.assert_allclose(a_new, a_old, rtol=1e-6)


def test_cycle_shift_evaluates_identically_at_shifted_phase():
    """shift_zero(phase=d) must satisfy E'(phi - d) == E(phi): the correct
    per-harmonic rotation (diverges from the reference's same-angle
    rotation for H>=2, see cycle.py docstring)."""
    from velocycle_tpu.ops.fourier import fourier_basis
    import jax.numpy as jnp

    c = _cycle()
    d = 0.7
    phi = np.linspace(0, 2 * np.pi, 9)
    before = np.asarray(
        jnp.asarray(c.means_array) @ fourier_basis(jnp.asarray(phi), 2).T
    )
    c.shift_zero(phase=d)
    after = np.asarray(
        jnp.asarray(c.means_array) @ fourier_basis(jnp.asarray(phi - d), 2).T
    )
    np.testing.assert_allclose(after, before, atol=1e-5)


def test_cycle_invert_direction():
    c = _cycle()
    before = c.means.values.copy()
    c.invert_direction()
    np.testing.assert_allclose(c.means.values[2], -before[2])
    np.testing.assert_allclose(c.means.values[4], -before[4])
    np.testing.assert_allclose(c.means.values[1], before[1])


def test_cycle_check_orientation():
    genes = ["TOP2A", "E2F1"]
    means = np.zeros((3, 2))
    means[1:, 0] = [np.cos(0.5), np.sin(0.5)]  # TOP2A peaks at 0.5
    means[1:, 1] = [np.cos(2.0), np.sin(2.0)]  # E2F1 peaks at 2.0
    c = Cycle.from_array(means, np.ones_like(means), genes)
    assert c.check_orientation(("TOP2A", "E2F1"))
    c.invert_direction()
    assert not c.check_orientation(("TOP2A", "E2F1"))


def test_reorder():
    c = _cycle()
    r = reorder(c, ["G3", "G0"])
    assert r.genes == ["G3", "G0"]
    np.testing.assert_allclose(r.means.values[:, 0], c.means["G3"].values)


def test_phases_basic_and_roundtrip(tmp_path):
    angles = np.array([0.3, 1.2, 4.0])
    p = Phases.from_angles(angles, concentration=2.0,
                           cell_names=["c1", "c2", "c3"])
    np.testing.assert_allclose(p.phis, angles, atol=1e-6)
    np.testing.assert_allclose(p.concentrations, 2.0, rtol=1e-6)
    assert p.phi_xy_array.shape == (3, 2)
    path = tmp_path / "phases.csv"
    p.save(path)
    p2 = Phases.load(path)
    np.testing.assert_allclose(p2.phis, p.phis, atol=1e-6)


def test_phases_rotate_and_invert():
    angles = np.array([0.5, 1.0])
    p = Phases.from_angles(angles)
    p.rotate(0.25)
    np.testing.assert_allclose(p.phis, angles + 0.25, atol=1e-6)
    p.invert_direction()
    np.testing.assert_allclose(
        p.phis, np.mod(-(angles + 0.25), 2 * np.pi), atol=1e-6
    )


def test_phases_stds_monotone_in_concentration():
    p_lo = Phases.from_angles([0.0], concentration=0.5)
    p_hi = Phases.from_angles([0.0], concentration=10.0)
    assert p_hi.stds[0] < p_lo.stds[0]


def test_phases_max_corr_recovers_shift():
    rng = np.random.default_rng(0)
    true = rng.uniform(0, 2 * np.pi, 300)
    p = Phases.from_angles(np.mod(true + 1.0, 2 * np.pi))
    shift, corr, _ = p.max_corr(true, npoints=200)
    # rotating back by ~1.0 maximizes the linear correlation
    assert abs(shift - 1.0) < 0.1
    assert corr > 0.9


def test_angularspeed_trivial_prior_and_roundtrip(tmp_path):
    a = AngularSpeed.trivial_prior(["d0", "d3"], harmonics=1,
                                   means=0.5, stds=0.2)
    assert a.conditions == ["d0", "d3"]
    np.testing.assert_allclose(a.means["d0"].values, [0.5, 0.0, 0.0])
    np.testing.assert_allclose(a.stds["d0"].values, [0.2, 0.05, 0.05])
    path = tmp_path / "speed.csv"
    a.save(path)
    a2 = AngularSpeed.load(path)
    np.testing.assert_allclose(a2.means.values, a.means.values)
    # copy() works (reference's is broken: angularspeed.py:227-235)
    a3 = a.copy()
    a3.means.iloc[0, 0] = 99.0
    assert a.means.iloc[0, 0] == 0.5


def test_angularspeed_from_array_layouts():
    m = np.zeros((3, 2))
    s = np.ones((3, 2))
    a = AngularSpeed.from_array(m, s, ["x", "y"], num_coeffs=3)
    assert a.shape == (3, 2)
    # transposed input
    at = AngularSpeed.from_array(m.T, s.T, ["x", "y"], num_coeffs=3)
    assert at.shape == (3, 2)
    # scalar constant-speed posterior, one condition
    a1 = AngularSpeed.from_array(np.float32(0.4), np.float32(0.1), ["c"],
                                 num_coeffs=1)
    assert a1.shape == (1, 1)


def test_phases_from_cycle_mle_recovers_phases():
    """Grid-MLE phase estimation against a strong synthetic Cycle."""
    import pandas as pd
    from velocycle_tpu.anndata_lite import AnnDataLite

    rng = np.random.default_rng(1)
    Ng, Nc = 40, 60
    nu = np.stack([
        rng.normal(2.0, 0.3, Ng),          # nu0
        rng.normal(0, 1.5, Ng),            # strong first harmonics
        rng.normal(0, 1.5, Ng),
    ])
    cycle = Cycle.from_array(nu, np.ones_like(nu),
                             [f"G{i}" for i in range(Ng)])
    true_phis = rng.uniform(0, 2 * np.pi, Nc)
    zeta = np.stack([np.ones(Nc), np.cos(true_phis), np.sin(true_phis)])
    ElogS = nu.T @ zeta                     # (Ng, Nc)
    S = rng.poisson(np.exp(ElogS)).T        # (Nc, Ng)
    adata = AnnDataLite(
        X=S,
        obs=pd.DataFrame({"n_scounts": np.ones(Nc)},
                         index=[f"c{i}" for i in range(Nc)]),
        var=pd.DataFrame(index=[f"G{i}" for i in range(Ng)]),
        layers={"spliced": S},
    )
    p = Phases.flat_prior(adata)
    p.from_cycle_mle(cycle, adata, a=0.0, bins=200)
    from velocycle_tpu.ops.circular import circular_corrcoef
    import jax.numpy as jnp

    cc = float(circular_corrcoef(jnp.asarray(p.phis),
                                 jnp.asarray(true_phis)))
    assert cc > 0.95

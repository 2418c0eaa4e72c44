"""Generate executed walkthroughs for the flagship workflows.

The reference's de-facto documentation is four executed notebooks with
recorded outputs and runtimes (`/root/reference/README.md:7`,
`docs/tutorial_one_sample.ipynb`).  This tool provides the equivalent
contract for the example scripts: it runs examples 01 and 02 at FULL
(non-smoke) size, captures their stdout, wall time, and figures
(`examples/_figs.py`, `VCT_FIGDIR`), and writes
`docs/walkthrough_one_sample.md` / `docs/walkthrough_two_sample.md` so a
new user can diff their own run against a committed expected output.

Usage: python tools/gen_walkthroughs.py [--cpu]
       (--cpu forces the CPU backend; default uses whatever jax picks,
        i.e. the TPU on this rig.  The captured header records which.)
"""
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMGDIR = os.path.join(REPO, "docs", "img")

WALKTHROUGHS = [
    {
        "example": "01_phase_and_velocity_one_sample.py",
        "out": "walkthrough_one_sample.md",
        "title": "Walkthrough: one-sample phase + velocity fit",
        "mirrors": "Tutorial_Capolupo_HumanFibroblasts_OneSample.ipynb",
        "figs": ["one_sample_elbo.png", "one_sample_phase_scatter.png",
                 "one_sample_polar.png"],
        "blurb": (
            "The canonical workflow: simulate counts (the tutorial "
            "datasets are external downloads), run manifold-learning "
            "(the phase fit), check orientation, then velocity-learning "
            "with a constant and a periodic angular speed, ending in the "
            "cell-cycle period estimate."
        ),
    },
    {
        "example": "02_two_sample_condition_contrast.py",
        "out": "walkthrough_two_sample.md",
        "title": "Walkthrough: two-sample fit with condition contrast",
        "mirrors": "Tutorial_Aissa_PC9_TwoSample.ipynb",
        "figs": ["two_sample_elbo.png", "two_sample_phase_scatter.png"],
        "blurb": (
            "Two batches with different true angular speeds: a joint "
            "phase fit with per-batch delta-nu offsets (asymmetric "
            "priors), then a velocity fit with a per-condition speed and "
            "the condition-level speed contrast."
        ),
    },
    {
        "example": "03_mcmc_and_smc_posteriors.py",
        "out": "walkthrough_mcmc_smc.md",
        "title": "Walkthrough: full-posterior sampling (NUTS + SMC)",
        "mirrors": "(no reference equivalent — the reference is SVI-only)",
        "figs": [],
        "blurb": (
            "The sampling backends on the phase model: an SVI-warm-"
            "started, Fisher-preconditioned NUTS fit with convergence "
            "diagnostics (split-R-hat, bulk ESS), and an adaptive-"
            "tempering SMC fit with a log-evidence estimate.  Expect "
            "max split-R-hat < 1.05 — a frozen sampler fails the test "
            "suite."
        ),
    },
    {
        "example": "04_pancreas_1d_spline.py",
        "out": "walkthrough_pancreas_spline.md",
        "title": "Walkthrough: 1-D pseudotime manifold with a spline basis",
        "mirrors": "1D_Pancreas_Analysis.ipynb",
        "figs": ["pancreas_elbo.png", "pancreas_field.png"],
        "blurb": (
            "Generalizing beyond the cell-cycle circle: a B-spline "
            "expression field over a fixed differentiation pseudotime "
            "(``basis_kind=\"spline\"``, phi conditioned), then kinetics "
            "+ a scalar speed and the transit time over the manifold.  "
            "The reference only demonstrates this by redefining its "
            "models inline in a notebook; here it is a first-class "
            "basis dispatch."
        ),
    },
    {
        "example": "06_stereoseq_spatial.py",
        "out": "walkthrough_stereoseq.md",
        "title": "Walkthrough: Stereo-seq-style all-genes fit",
        "mirrors": "Stereo_seq_BrainRG.ipynb",
        "figs": ["stereoseq_elbo.png", "stereoseq_phase_scatter.png"],
        "blurb": (
            "The large/noisy-data path: ALL genes (no curated set) with "
            "data-driven nu priors, a supervised LDA phase prior from "
            "categorical labels, joint orientation/zero-point fixes, and "
            "the phase fit conditioned on delta_nu = 0 — carried by the "
            "fused Pallas NB kernel."
        ),
    },
    {
        "example": "08_velo2d_branching.py",
        "out": "walkthrough_velo2d.md",
        "title": "Walkthrough: 2-D branching manifold with a velocity field",
        "mirrors": "VeloCycle_2D/Velocity_Simulation_2D.ipynb",
        "figs": ["velo2d_quiver.png"],
        "blurb": (
            "The 2-D research extension: simulate a Y-shaped trajectory "
            "with a spline velocity field, two-stage fit (S field, then "
            "U kinetics + 2-component velocity), correlations vs ground "
            "truth — the reference's only quantitative accuracy harness "
            "(run_simulations.py), reproduced end to end."
        ),
    },
]


def run_one(spec, force_cpu):
    env = dict(os.environ, VCT_FIGDIR=IMGDIR)
    env.pop("VCT_SMOKE", None)
    if force_cpu:
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", spec["example"])],
        capture_output=True, text=True, cwd=os.path.join(REPO, "examples"),
        env=env, timeout=1800,
    )
    wall = time.perf_counter() - t0
    out = proc.stdout
    # figure-save lines are tooling noise, not workflow output
    out = "\n".join(ln for ln in out.splitlines()
                    if not ln.startswith("[fig] "))
    if proc.returncode != 0:
        raise SystemExit(
            f"{spec['example']} failed (rc {proc.returncode}):\n"
            + proc.stderr[-2000:]
        )
    return out.strip(), wall, proc.stderr


def detect_backend(stderr):
    if re.search(r"axon|tpu", stderr, re.I):
        return "TPU v5e (one chip, remote relay)"
    return "CPU"


def write_md(spec, stdout, wall, backend):
    lines = [
        f"# {spec['title']}",
        "",
        f"_Mirrors the reference notebook `{spec['mirrors']}`.  Generated "
        f"by `tools/gen_walkthroughs.py` from an actual run of "
        f"`examples/{spec['example']}` at full size — re-run the tool to "
        "refresh; diff your own run against the output below._",
        "",
        spec["blurb"],
        "",
        "```bash",
        f"python examples/{spec['example']}",
        "```",
        "",
        f"**Recorded run**: {wall:.1f} s wall on {backend}.",
        "",
        "## Expected output",
        "",
        "```text",
        stdout,
        "```",
        "",
    ]
    if spec["figs"]:
        lines += ["## Figures", ""]
        for fig in spec["figs"]:
            lines.append(f"![{fig}](img/{fig})")
            lines.append("")
    path = os.path.join(REPO, "docs", spec["out"])
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path} ({wall:.1f} s run)")


def main():
    force_cpu = "--cpu" in sys.argv
    os.makedirs(IMGDIR, exist_ok=True)
    for spec in WALKTHROUGHS:
        stdout, wall, stderr = run_one(spec, force_cpu)
        backend = "CPU" if force_cpu else detect_backend(stderr)
        write_md(spec, stdout, wall, backend)


if __name__ == "__main__":
    main()

"""Optional figure capture for the example scripts.

``VCT_FIGDIR=dir python examples/01_... .py`` saves the workflow's key
figures (ELBO curve, fitted-vs-true phase scatter, polar coefficient
plot) as PNGs into ``dir``; without the env var every helper is a no-op,
so the examples stay dependency-light and fast by default.
`tools/gen_walkthroughs.py` uses this to build the executed walkthroughs
in `docs/` (the reference's de-facto docs are executed notebooks with
recorded outputs — `/root/reference/README.md:7`)."""
import os

FIGDIR = os.environ.get("VCT_FIGDIR")


def _save(fig, name):
    import matplotlib

    matplotlib.use("Agg")
    os.makedirs(FIGDIR, exist_ok=True)
    path = os.path.join(FIGDIR, name)
    fig.savefig(path, dpi=110, bbox_inches="tight")
    print(f"[fig] {path}")


def fig_elbo(losses, name, title="SVI ELBO"):
    if not FIGDIR:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(np.asarray(losses))
    ax.set_xlabel("step")
    ax.set_ylabel("-ELBO")
    ax.set_title(title)
    ax.set_yscale("log")
    _save(fig, name)
    plt.close(fig)


def fig_phase_scatter(fit_phis, true_phis, name,
                      title="fitted vs simulated phase"):
    if not FIGDIR:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(4, 4))
    ax.scatter(np.mod(np.asarray(true_phis), 2 * np.pi),
               np.mod(np.asarray(fit_phis), 2 * np.pi), s=6, alpha=0.5)
    ax.set_xlabel("simulated phase")
    ax.set_ylabel("fitted phase")
    ax.set_title(title)
    _save(fig, name)
    plt.close(fig)


def fig_polar(fit, name, title="harmonic coefficients (polar)"):
    if not FIGDIR:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    cyc = fit.cycle_fit
    m = np.asarray(cyc.means.values)                # (Nh, Ng)
    amp = np.hypot(m[1], m[2])
    ang = np.arctan2(m[2], m[1])
    fig = plt.figure(figsize=(4.5, 4.5))
    ax = fig.add_subplot(projection="polar")
    ax.scatter(ang, amp, s=10)
    ax.set_title(title)
    _save(fig, name)
    plt.close(fig)

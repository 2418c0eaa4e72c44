"""Generate `docs/api.md` — a markdown API reference from live docstrings.

Counterpart of the reference's Sphinx shell (`docs/conf.py:1-36`,
autodoc over the 10 modules); here the reference is generated as plain
markdown so it renders anywhere and never needs a docs build.

Usage: python tools/gen_api_md.py
"""
import importlib
import inspect
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

MODULES = [
    ("velocycle_tpu.containers.cycle", "Cycle container"),
    ("velocycle_tpu.containers.phases", "Phases container"),
    ("velocycle_tpu.containers.angularspeed", "AngularSpeed container"),
    ("velocycle_tpu.preprocessing", "Preprocessing & metapar assembly"),
    ("velocycle_tpu.fit", "SVI fit drivers"),
    ("velocycle_tpu.fit_mcmc", "MCMC / SMC fit drivers"),
    ("velocycle_tpu.models.phase", "Phase model family"),
    ("velocycle_tpu.models.velocity", "Velocity model family"),
    ("velocycle_tpu.models.basis", "Expression bases (fourier / spline)"),
    ("velocycle_tpu.core.handlers", "Effect handlers"),
    ("velocycle_tpu.core.distributions", "Distributions"),
    ("velocycle_tpu.core.constraints", "Constraints / bijectors"),
    ("velocycle_tpu.infer.svi", "SVI engine"),
    ("velocycle_tpu.infer.elbo", "ELBO objectives"),
    ("velocycle_tpu.infer.optim", "Optimizers"),
    ("velocycle_tpu.infer.autoguide", "Autoguides"),
    ("velocycle_tpu.infer.predictive", "Posterior predictive"),
    ("velocycle_tpu.infer.mcmc", "HMC / NUTS"),
    ("velocycle_tpu.infer.smc", "Sequential Monte Carlo"),
    ("velocycle_tpu.infer.minibatch", "Minibatch / streaming SVI"),
    ("velocycle_tpu.ops.fourier", "Fourier basis ops"),
    ("velocycle_tpu.ops.splines", "B-spline basis ops"),
    ("velocycle_tpu.ops.circular", "Circular statistics"),
    ("velocycle_tpu.ops.nb_kernels", "Fused Pallas NB kernels"),
    ("velocycle_tpu.parallel.mesh", "Device meshes"),
    ("velocycle_tpu.parallel.sharding", "Sharding rules"),
    ("velocycle_tpu.parallel.distributed", "Multi-host wiring"),
    ("velocycle_tpu.parallel.scaling", "Scaling harness"),
    ("velocycle_tpu.twodim.models", "2D manifold models"),
    ("velocycle_tpu.twodim.simulate", "2D branching simulator"),
    ("velocycle_tpu.twodim.driver", "2D benchmark driver"),
    ("velocycle_tpu.genes", "Curated gene sets"),
    ("velocycle_tpu.simulate", "Ground-truth simulator"),
    ("velocycle_tpu.alignment", "Joint (Cycle, Phases) alignment"),
    ("velocycle_tpu.checkpoint", "Checkpoint / resume"),
    ("velocycle_tpu.profiling", "Profiling / step timing"),
    ("velocycle_tpu.plots", "Plots / diagnostics"),
    ("velocycle_tpu.native", "Native C++ ingest"),
    ("velocycle_tpu.anndata_lite", "AnnData-compatible container + h5ad IO"),
    ("velocycle_tpu.warmup", "Compile-cache warmup"),
    ("velocycle_tpu.ops.special", "Special functions (Mosaic-lowerable)"),
]


def first_paragraph(doc):
    if not doc:
        return ""
    doc = inspect.cleandoc(doc)
    return doc.split("\n\n")[0].replace("\n", " ")


def sig_of(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue  # re-exports documented at their home module
        if inspect.isclass(obj) or inspect.isfunction(obj):
            out.append((n, obj))
    return out


def render_class(name, cls, w):
    w(f"### `{name}{sig_of(cls)}`")
    w("")
    p = first_paragraph(cls.__doc__)
    if p:
        w(p)
        w("")
    methods = [
        (mn, m) for mn, m in vars(cls).items()
        if not mn.startswith("_") and callable(m)
        or isinstance(m, (classmethod, staticmethod, property))
    ]
    rows = []
    for mn, m in methods:
        if mn.startswith("_"):
            continue
        fn = m
        kind = ""
        if isinstance(m, classmethod):
            fn, kind = m.__func__, " *(classmethod)*"
        elif isinstance(m, staticmethod):
            fn, kind = m.__func__, " *(staticmethod)*"
        elif isinstance(m, property):
            fn, kind = m.fget, " *(property)*"
        if not callable(fn):
            continue
        doc = first_paragraph(getattr(fn, "__doc__", ""))
        sig = "" if isinstance(m, property) else sig_of(fn)
        rows.append((mn, sig, kind, doc))
    if rows:
        for mn, sig, kind, doc in sorted(rows):
            w(f"- **`.{mn}{sig}`**{kind} — {doc or '(no docstring)'}")
        w("")


def main():
    out = []
    w = out.append
    w("# API reference")
    w("")
    w("Generated from live docstrings by `tools/gen_api_md.py`; regenerate "
      "after changing public APIs.  Reference-parity citations "
      "(`path:line` into the upstream repo) live in the module and "
      "function docstrings themselves.")
    w("")
    w("## Module index")
    w("")
    for modname, title in MODULES:
        anchor = modname.replace(".", "").replace("_", "")
        w(f"- [`{modname}`](#{anchor}) — {title}")
    w("")
    for modname, title in MODULES:
        mod = importlib.import_module(modname)
        w(f"## `{modname}`")
        w("")
        p = first_paragraph(mod.__doc__)
        if p:
            w(p)
            w("")
        for name, obj in public_members(mod):
            if inspect.isclass(obj):
                render_class(name, obj, w)
            else:
                w(f"### `{name}{sig_of(obj)}`")
                w("")
                d = first_paragraph(obj.__doc__)
                if d:
                    w(d)
                w("")
    path = os.path.join(REPO, "docs", "api.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    n_lines = len(out)
    print(f"wrote {path} ({n_lines} lines)")


if __name__ == "__main__":
    main()

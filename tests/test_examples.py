"""Subprocess smoke runs of every `examples/*.py` at tiny sizes.

The examples are the de-facto tutorials (reference parity: the four
executed notebooks under `tutorials/`, `README.md:7`); these tests keep
them from drifting when an API changes.  Each example honours
``VCT_SMOKE=1`` (see `examples/_smoke.py`) which shrinks data sizes and
step counts so a full workflow finishes in seconds on CPU.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES_DIR = os.path.join(REPO, "examples")
EXAMPLES = sorted(
    f for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_")
)


def test_all_examples_are_listed():
    # if a new example lands, it is smoke-tested automatically
    assert len(EXAMPLES) == 8, EXAMPLES


@pytest.mark.examples
@pytest.mark.slow
@pytest.mark.parametrize("script", EXAMPLES)
def test_example_smoke(script):
    env = dict(os.environ)
    env.update({
        "VCT_SMOKE": "1",
        "JAX_PLATFORMS": "cpu",
        # `python examples/foo.py` puts examples/ (not cwd) on sys.path;
        # make the in-tree package importable without installation
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        # example 05 wants a multi-device mesh; give all examples the same
        # 8-device virtual CPU platform the rest of the suite uses
        "XLA_FLAGS": (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8").strip(),
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, script)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"{script} failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}"
    )

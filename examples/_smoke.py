"""Smoke-mode switch for the example scripts.

``VCT_SMOKE=1 python examples/01_... .py`` shrinks data sizes and step
counts so every workflow finishes in seconds; `tests/test_examples.py`
subprocess-runs all examples this way so API drift breaks CI instead of
silently breaking the flagship workflows.
"""
import os

SMOKE = os.environ.get("VCT_SMOKE") == "1"


def sz(full, tiny):
    """Pick the full-size value, or the tiny one under VCT_SMOKE=1."""
    return tiny if SMOKE else full

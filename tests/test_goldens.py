"""Conformance goldens: the five BASELINE.md staged configs.

Each golden .npz (tests/goldens/, written by ``tools/ref_conformance.py
--write``) pins light curves, per-batch histograms, raw Philox streams,
per-lane RNG dim counters and medium-parameter gradients. This test
re-runs each config and allcloses against the vendored artifact —
regression goldens in the same shape as the reference's own
captured-GPU-run validation (reference tests/test_trace_energy.py:21-26).

The reference-side comparison procedure (Vulkan machine) lives in
tools/ref_twin.py + PARITY.md "Conformance procedure".
"""

from pathlib import Path

import numpy as np
import pytest

import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from ref_conformance import CONFIGS, compare, run_config  # noqa: E402

GOLDENS = Path(__file__).parent / "goldens"


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    path = GOLDENS / f"{name}.npz"
    assert path.exists(), (
        f"missing golden {path}; regenerate with "
        "python tools/ref_conformance.py --write tests/goldens"
    )
    fresh = run_config(name)
    with np.load(path, allow_pickle=False) as golden:
        errors = compare(dict(golden), fresh, name)
    assert not errors, "\n".join(errors)

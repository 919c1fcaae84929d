"""Examples must keep running end-to-end (rot guard).

Each example script is executed as a user would run it; stdout must
contain its expected result line."""

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parents[1] / "examples"

CASES = [
    ("01_volume_tracing.py", "d(total)/d(mu_a)"),
    ("02_scene_tracing.py", "detector light curve"),
    ("03_multiple_lightsources.py", "combined light curve"),
    ("04_polarization.py", "p-polarized reflected"),
    ("05_inverse_problem.py", "recovered absorption scale"),
    ("06_timing_calibration.py", "recovered group-velocity scale"),
    ("07_scene_render.py", "pixels hit geometry"),
    ("08_detector_array.py", "per-module light curves recorded"),
    ("09_source_reconstruction.py", "flash position recovered"),
    ("10_geometry_calibration.py", "module position calibrated"),
    ("11_quasirandom_sampling.py", "sobol variance win confirmed"),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,expect", CASES, ids=[c[0] for c in CASES])
def test_example_runs(script, expect):
    out = subprocess.run(
        [sys.executable, str(EXAMPLES / script)],
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert expect in out.stdout, out.stdout[-2000:]

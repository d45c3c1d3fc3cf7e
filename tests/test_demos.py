"""Demo entry points run headless end-to-end (the reference positions its
demos as the de-facto integration tests, README.md:26)."""

import subprocess
import sys

import pytest

DEMOS = [
    ["demos/demo_standalone.py", "--model", "twod", "--t-end", "1.0"],
    ["demos/demo_standalone.py", "--model", "balancingrider",
     "--t-end", "0.5"],
    ["demos/demo_parcours.py", "--t-end", "1.0"],
    ["demos/demo_curve.py", "--t-end", "1.0"],
    ["demos/demo_sumo.py", "--bikes", "2", "--steps", "800"],
    ["demos/demo_mixed_traffic.py", "--riders", "256", "--cars", "3",
     "--steps", "60"],
    ["demos/demo_polemodel.py", "--model", "PP0",
     "--out", "/tmp/demo_poles_smoke.png"],
    ["demos/demo_scale.py", "--agents", "2048", "--steps", "20",
     "--backend", "xla"],
    ["demos/demo_sharded.py", "--agents", "2048", "--steps", "12",
     "--comm", "allgather", "--skip-check"],
]


@pytest.mark.parametrize("cmd", DEMOS, ids=lambda c: " ".join(c[:3]))
def test_demo_runs(cmd):
    out = subprocess.run(
        [sys.executable] + cmd, capture_output=True, text=True,
        timeout=420,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root",
             "PYTHONPATH": "."},
    )
    assert out.returncode == 0, out.stderr[-2000:]


@pytest.mark.slow
def test_demo_calibration():
    out = subprocess.run(
        [sys.executable, "demos/demo_calibration.py"],
        capture_output=True, text=True, timeout=420,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": "."})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "recovered 10.0" in out.stdout

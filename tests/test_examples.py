"""The shipped examples must stay runnable (subprocess, CPU platform)."""
import pathlib
import subprocess
import sys
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _run(script: str, timeout: float = 600.0) -> str:
    # Fresh interpreter: the examples bootstrap their own platform/config
    # (the multichip one forces the 8-virtual-device CPU mesh itself).
    proc = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script)],
        capture_output=True, text=True, timeout=timeout,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/tmp"},
        cwd="/tmp",  # anywhere: the scripts sys.path-bootstrap the repo root
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_multichip_example():
    out = _run("multichip.py")
    assert "'patch': 2" in out and "'rows': 4" in out
    assert "PartitionSpec('patch', None, None, 'rows')" in out


@pytest.mark.slow
def test_quickstart_example():
    out = _run("quickstart.py")
    assert "displacement planes: (3, 3, 256, 256)" in out
    assert "restored; times:" in out

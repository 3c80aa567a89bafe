"""Real 2-process jax.distributed smoke test (round-1 VERDICT item 7).

``parallel/multihost.py`` was previously validated only on the virtual
single-process mesh; this spawns TWO actual processes on localhost CPU,
joins them through ``init_distributed``, and verifies a jitted global
reduction over a process-spanning mesh — the exact collective path
multi-host DP training takes over DCN (SURVEY.md §2.4 backend row).
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_group_psum():
    port = str(_free_port())
    env = dict(os.environ)
    # One plain CPU device per process; scrub any pod-like or test-mesh vars.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(pid), port],
        cwd=_REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid} psum-over-DCN ok: 18.0" in out, out
        assert f"worker {pid} dp-step-over-DCN exact" in out, out

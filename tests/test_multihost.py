"""Multi-host lockstep execution: two OS processes, each owning 2 virtual CPU
devices, join one jax.distributed runtime and serve the same request stream
through the full engine (TP=2 spans each host's devices, DP=2 spans hosts).

This is the proof obligation for the deterministic-lockstep design that
replaces the reference's shm/Event pickle RPC + NCCL control plane
(nanovllm/engine/model_runner.py:42-100): no messages flow between the two
engine loops, yet both must produce identical outputs — and those outputs
must equal a single-process run of the same mesh shape."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"
_REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_lockstep_generation():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = str(_REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out (lockstep deadlock?)")
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        lines = [ln for ln in stdout.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{stdout[-2000:]}\n{stderr[-2000:]}"
        outs.append(json.loads(lines[-1][len("RESULT "):]))

    # both hosts produced the identical streams without exchanging messages
    assert outs[0] == outs[1]

    # and they match a single-process run of the same (data=2, model=2) mesh
    import tests.multihost_worker as worker

    single = worker.build_and_generate()
    assert outs[0] == single

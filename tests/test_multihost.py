"""Multi-host runtime: 2 CPU processes, 2 virtual devices each, Gloo
collectives — `init_distributed` + global mesh + cross-process DP
training + bucket-sharded search (tests/multihost_worker.py)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost():
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = str(worker.parent.parent)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("PYTEST_CURRENT_TEST", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(worker.parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    oks = [line for out in outs for line in out.splitlines()
           if line.startswith("MHOK")]
    assert len(oks) == 2, f"expected 2 MHOK lines, got: {oks}"
    # DP training kept params in lockstep across processes: identical
    # loss and parameter fingerprint on both
    fields = [dict(kv.split("=") for kv in line.split()[1:]) for line in oks]
    assert fields[0]["loss"] == fields[1]["loss"]
    assert fields[0]["fp"] == fields[1]["fp"]

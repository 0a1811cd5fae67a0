"""Multi-host (jax.distributed) batch verification — 2-process CPU
simulation.

Launches two OS processes that join one jax.distributed runtime (4 virtual
CPU devices each → an 8-device global ("dp", "tp") mesh with dp spanning
processes), run the production batch_verify DP x TP path on real proofs,
and must both accept the valid batch and reject a tampered one
(SURVEY.md §5 comm-backend row; BASELINE config 5 "across N>=2 hosts").
"""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device counts
    env["BPP_FUSE_PROVER"] = "0"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--coord", f"localhost:{port}",
             "--nproc", "2", "--pid", str(pid), "--cpu-sim"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=ROOT,
        ))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    return procs, outs


def test_two_process_batch_verify():
    # no pytest-timeout plugin here; the communicate(timeout=) below bounds
    # the run and kills stragglers. One retry: under full-suite xdist load a
    # starved peer can miss the 30 s Gloo collective handshake window
    # (DEADLINE_EXCEEDED on GetKeyValue) — a scheduling flake, not a bug.
    for attempt in range(2):
        procs, outs = _run_workers()
        if all(p.returncode == 0 for p in procs):
            break
        flaky = any("DEADLINE_EXCEEDED" in o or "Gloo" in o for o in outs)
        if attempt == 1 or not flaky:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST OK proc={pid}" in out, out[-4000:]
        assert "reject: ok" in out

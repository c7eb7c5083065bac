"""2-process jax.distributed execution on CPU (round-1 verdict item 4).

Spawns two worker processes, each with 4 virtual CPU devices, forming one
8-device global mesh over localhost coordination.  Both must print
identical replicated results that match a single-process 8-device run of
the same deterministic database.  This is the capability the reference
does not have (single-node CUDA peer access only, SURVEY.md §2.7); it
must be proven executable, not just importable.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # Replace (not prepend to) the inherited PYTHONPATH: the login profile
    # exports the axon TPU plugin's sitecustomize dir, whose import dials
    # the device tunnel and hangs the workers when the tunnel is down.
    env["PYTHONPATH"] = repo
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), "4",
             str(tmp_path / "shared.tpupack.npz")],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    def results(out, pid):
        lines = [
            line.split(None, 2)[2]
            for line in out.splitlines()
            if line.startswith(
                ("RESULT", "BATCH", "STREAM", "HOSTSTORE", "LONGCOL")
            )
        ]
        assert len(lines) == 8, out
        assert f"DONE {pid}" in out
        return lines

    r0 = results(outs[0], 0)
    r1 = results(outs[1], 1)
    # Replicated outputs: every process sees the identical merged top-k.
    assert r0 == r1

    # And they match a single-process 8-device run of the same DB.
    single = subprocess.run(
        [sys.executable, worker, "", "1", "0", "8",
         str(tmp_path / "single.tpupack.npz")],
        capture_output=True,
        text=True,
        env=env,
        timeout=540,
    )
    assert single.returncode == 0, single.stderr
    assert results(single.stdout, 0) == r0

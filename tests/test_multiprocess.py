"""True multi-process distributed simulation: 2 jax.distributed processes x
4 virtual CPU devices, per-host input sharding, one global mesh, sharded
train steps, and cross-host CER-count aggregation.

This is the test the reference cannot run at all (its multi-node story is
torchrun env vars + monitored_barrier, train_utils.py:252-270); here the
whole SPMD path — make_array_from_process_local_data, compiler collectives,
process_allgather — executes for real across OS processes.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_and_cer_aggregation():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"P{pid} failed:\n{out}"
        assert f"P{pid} DONE" in out, out

    def losses(out, pid):
        vals = []
        for line in out.splitlines():
            if line.startswith(f"P{pid} step"):
                vals.append(float(line.split("loss=")[1]))
        return vals

    l0, l1 = losses(outs[0], 0), losses(outs[1], 1)
    assert len(l0) == len(l1) == 2
    # SPMD lockstep: both processes compute the same global loss each step
    for a, b in zip(l0, l1):
        assert abs(a - b) < 1e-6, (l0, l1)

    # CER counts: S = 1+2, D = 2+4, N = 10+20, summed identically on both
    for pid, out in enumerate(outs):
        assert f"P{pid} cer S=3 D=6 I=0 N=30" in out, out

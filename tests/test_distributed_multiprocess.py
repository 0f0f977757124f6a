"""Multi-process jax.distributed: 2 coordinator-connected CPU processes run
one dp-sharded bootstrap across a 4-device global mesh (SURVEY §4
"multi-process-on-one-host"; round-2/3 verdicts: the path had only ever
executed single-process)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_bootstrap():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # the workers set their own XLA_FLAGS / platform; scrub the test
    # runner's 8-device forcing so each worker owns exactly 2
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DISTRIBUTED_OK pid={pid} procs=2 devices=4" in out, out

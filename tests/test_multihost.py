"""Multi-process distributed sweep: 2 processes x 2 CPU devices with a
global mesh and gloo collectives, validating the jax.distributed layer
the reference never had (its cross-machine story is LSF job arrays +
shared Mongo state, SURVEY.md 2d P3/P5)."""

import os
import socket
import subprocess
import sys
import pathlib


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_sweep():
    port = _free_port()
    worker = pathlib.Path(__file__).parent / "mh_worker.py"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for r in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-3000:]}"
        assert "MULTIHOST SWEEP OK" in out


def test_process_block_env(monkeypatch):
    from colormipsearch_tpu.parallel.multihost import process_block
    monkeypatch.setenv("CMS_NUM_PROCESSES", "3")
    monkeypatch.setenv("CMS_PROCESS_ID", "2")
    assert process_block(10) == (8, 10)
    monkeypatch.setenv("CMS_PROCESS_ID", "0")
    assert process_block(10) == (0, 4)

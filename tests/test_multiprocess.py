"""True multi-process distributed test: 2 jax.distributed processes x 4
virtual CPU devices (8 global) via a local gRPC coordinator — the DCN
story the single-process 8-device suite cannot cover.  The reference
demonstrably ran 8-proc DDP (scripts/train/exps/cluster/*.sh +
accelerate eval, llava_eval_trainer.py:270-292); this proves
maybe_init_distributed, cross-process meshes, dp-sharded train steps,
shard_docs/allgather_rows and the sharded orbax round-trip work beyond
one process.  Skips if the coordinator port can't be claimed."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def test_two_process_distributed(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed coordinator timed out (port/env issue)")
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK pid={pid}" in out, out[-2000:]
    # both processes observed the same loss trajectory (the dp all-reduce
    # crossed the process boundary consistently)
    l0 = outs[0].split("losses=")[1].strip()
    l1 = outs[1].split("losses=")[1].strip()
    assert l0 == l1, (l0, l1)

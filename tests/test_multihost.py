"""True multi-process (simulated multi-host) solve: two jax.distributed
processes, 4 virtual CPU devices each, one global dp=8 mesh, shard_map'd
batched IK -- both hosts' local shards must reach their targets.

This is the N>=2-hosts axis of the north star, runnable without a pod
(SURVEY.md section 4: multi-process tests on CPU are the standard way to
test multi-host semantics)."""

import os
import socket
import subprocess
import sys



def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_solve(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{i}.txt") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), outs[i]],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))

    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}\n{logs[i][-2000:]}"
        with open(outs[i]) as f:
            content = f.read()
        assert content == "OK", f"proc {i}: {content}\n{logs[i][-1000:]}"

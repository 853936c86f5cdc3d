"""Multi-host (multi-process) smoke test over a local gloo cluster.

The BASELINE's scaling config demands >= 2 hosts; real multi-host hardware
is unavailable here, so this launches two OS processes, each with 2
virtual CPU devices, joins them with ``jax.distributed`` (gloo CPU
collectives), and runs the tol_tpu global-mesh code path end-to-end:
host-local batch -> global "dp"-sharded array -> jitted batched evaluation
-> cross-process psum -> allgather.  The same code drives TPU pods over
ICI/DCN (tol_tpu/parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh():
    port = _free_port()
    nproc = 2
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)))
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        # On timeout/failure kill BOTH workers: a surviving peer blocks
        # forever inside gloo collectives holding the coordinator port.
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                _, pid, total, ndev = line.split()
                results[int(pid)] = (float(total), int(ndev))
    assert set(results) == {0, 1}, outs
    # Both processes saw the full 4-device cluster and agree on the
    # cross-host reduction bit-for-bit.
    assert results[0][1] == results[1][1] == 4
    assert results[0][0] == results[1][0]
    assert results[0][0] > 0.0

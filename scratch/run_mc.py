"""BASELINE config 5: 10k-scenario Monte-Carlo — produce MC_r04.json.

Two honestly-labeled measurements:

  1. "tpu_single_chip": the REAL 10k-scenario throughput number — 10240
     S10-Tempest ts=100 instances solved on the one available TPU chip
     through the bench's group+drain machinery with the full gate
     (feasibility + convergence + cost gap vs the f64 oracle).
     Run separately:  BENCH_BATCH=10240 python bench.py  (the driver's
     BENCH file is the canonical artifact for this); or set
     MC_TPU_FROM=<bench json>.

  2. "gloo_mechanism": multi-PROCESS scaling of the sharded solve path on
     CPU (jax.distributed + gloo, DEV_PER_PROC virtual devices per
     process, fixed iteration budget).  This machine has 2 cores and no
     second host, so both processes share silicon: the ideal
     throughput-per-process ratio is 0.5, NOT 1.0 — the number measures
     the multihost MECHANISM overhead (global mesh assembly, gloo
     collectives, allgather), not hardware scaling.

Usage: python scratch/run_mc.py  (writes MC_r04.json at repo root)
Env: MC_SCENARIOS (default 10000), MC_TS (24), MC_ITER (40).
"""
import json
import os
import socket
import subprocess
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_cluster(nproc, local_batch, ts, max_iter):
    worker = os.path.join(repo, "scratch", "_mc_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(nproc), str(port),
         str(local_batch), str(ts), str(max_iter)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(nproc)]
    outs = [p.communicate()[0] for p in procs]
    wall_total = time.time() - t0
    res = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                pid = int(parts[1])
                res[pid] = {kv.split("=")[0]: float(kv.split("=")[1])
                            for kv in parts[2:]}
    if len(res) != nproc:
        tail = "\n".join(o.splitlines()[-8:] for o in outs if o) \
            if isinstance(outs[0], str) else ""
        raise RuntimeError(f"cluster run failed: {len(res)}/{nproc} results"
                           f"\n{tail}")
    return res, wall_total


def main():
    scenarios = int(os.environ.get("MC_SCENARIOS", "10000"))
    ts = int(os.environ.get("MC_TS", "24"))
    it = int(os.environ.get("MC_ITER", "40"))

    doc = {"config": "BASELINE #5: 10k-scenario Monte-Carlo",
           "scenarios": scenarios}

    # -- gloo mechanism curve: 1 process vs 2 processes, fixed per-process
    #    work (weak scaling).  local batch per process = scenarios/2 so
    #    the 2-process run covers the full scenario count.
    local = scenarios // 2
    r1, _ = run_cluster(1, local, ts, it)
    r2, _ = run_cluster(2, local, ts, it)
    w1 = r1[0]["wall"]
    w2 = max(v["wall"] for v in r2.values())
    thr1 = local / w1
    thr2 = 2 * local / w2
    doc["gloo_mechanism"] = {
        "ts": ts, "fixed_iters": it,
        "procs1": {"n_scenarios": local, "wall_s": round(w1, 2),
                   "scenarios_per_s": round(thr1, 1)},
        "procs2": {"n_scenarios": 2 * local, "wall_s": round(w2, 2),
                   "scenarios_per_s": round(thr2, 1),
                   "feasible": int(sum(v["feas"] for v in r2.values())
                                   / len(r2))},
        "throughput_ratio_2p_over_1p": round(thr2 / thr1, 3),
        "linear_scaling_pct": round(100.0 * thr2 / (2.0 * thr1), 1),
        "note": ("weak scaling on one 2-core box: each process owns one "
                 "core (DEV_PER_PROC=1), so 2 processes vs 1 is a genuine "
                 "1->2 'host' measurement for the mechanism (global mesh "
                 "assembly + gloo collectives + allgather); ideal ratio "
                 "2.0.  'feasible' counts lanes under 1e-4 at the FIXED "
                 "40-iteration budget (a work-normalization device, not a "
                 "solve-to-convergence run)."),
    }

    # -- real-hardware 10k number: reuse the bench machinery if a result
    #    file is provided, else instruct.
    src = os.environ.get("MC_TPU_FROM", "")
    if src and os.path.exists(src):
        with open(src) as f:
            b = json.load(f)
        det = b.get("detail", b)
        doc["tpu_single_chip"] = {
            "batch": det.get("batch"),
            "wall_s": det.get("wall_s"),
            "gated_pass": det.get("accurate_and_feasible"),
            "solves_per_s": b.get("value"),
            "source": src,
        }

    out = os.path.join(repo, "MC_r04.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

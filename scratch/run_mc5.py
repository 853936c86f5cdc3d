"""Round-5 multi-host Monte-Carlo scaling artifact -> MC_r05.json.

VERDICT r04 task 2: re-run the gloo Monte-Carlo SOLVING TO THE REAL GATE
(groups + straggler drain per process, not a fixed iteration budget),
report gated counts > 0 and linear scaling >= 80%.

Honesty notes baked into the artifact:
  * every worker — including the 1-process baseline — is pinned to its
    own core with taskset, so 1 -> 2 processes compares disjoint silicon
    (the r04 run left the 1-process baseline free to borrow the second
    core via XLA's intra-op thread pool, which depressed the ratio);
  * the timed region per worker = local grouped+drain solve of its
    shard + global-mesh assembly of the per-lane gate flags + the
    cross-process global_psum reduction (scenario-DP's only collective);
  * weak scaling: 2N scenarios across 2 processes vs N on 1.

Usage: python scratch/run_mc5.py      (writes MC_r05.json at repo root)
Env: MC_LOCAL (scenarios per process, default 1024), MC_TS (24),
     MC_TPU_FROM (bench json to copy the single-chip 10k number from).
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


def run_cluster(nproc, local_batch, ts):
    worker = os.path.join(repo, "scratch", "_mc5_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [subprocess.Popen(
        ["taskset", "-c", str(i), sys.executable, worker, str(i),
         str(nproc), str(port), str(local_batch), str(ts)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for i in range(nproc)]
    outs = [p.communicate()[0] for p in procs]
    res = {}
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                res[int(parts[1])] = {
                    kv.split("=")[0]: float(kv.split("=")[1])
                    for kv in parts[2:]}
    if len(res) != nproc:
        tails = "\n".join("\n".join(o.splitlines()[-8:]) for o in outs)
        raise RuntimeError(
            f"cluster run failed: {len(res)}/{nproc} results\n{tails}")
    return res


def main():
    local = int(os.environ.get("MC_LOCAL", "1024"))
    ts = int(os.environ.get("MC_TS", "24"))

    r1 = run_cluster(1, local, ts)
    r2 = run_cluster(2, local, ts)
    w1 = r1[0]["wall"]
    w2 = max(v["wall"] for v in r2.values())
    thr1 = local / w1
    thr2 = 2 * local / w2
    gated2 = max(v["gated"] for v in r2.values())   # global count, same on all
    doc = {
        "config": "BASELINE #5: Monte-Carlo scenarios across 2 'hosts' "
                  "(gloo processes, pinned cores), CONVERGENCE MODE",
        "gloo_convergence": {
            "ts": ts,
            "gate": "KKT certificate AND scaled viol < 1e-4 AND cost gap "
                    "< 1e-2 vs the in-process f64 oracle",
            "procs1": {"n_scenarios": local, "wall_s": round(w1, 2),
                       "scenarios_per_s": round(thr1, 1),
                       "gated": int(r1[0]["gated"]),
                       "feasible": int(r1[0]["feas"]),
                       "median_iters": int(r1[0]["median_iters"])},
            "procs2": {"n_scenarios": 2 * local, "wall_s": round(w2, 2),
                       "scenarios_per_s": round(thr2, 1),
                       "gated": int(gated2),
                       "feasible": int(max(v["feas"]
                                           for v in r2.values())),
                       "median_iters": int(max(v["median_iters"]
                                               for v in r2.values()))},
            "throughput_ratio_2p_over_1p": round(thr2 / thr1, 3),
            "linear_scaling_pct": round(100.0 * thr2 / (2.0 * thr1), 1),
            "note": ("weak scaling on one 2-core box, every process "
                     "PINNED to its own core (taskset, incl. the "
                     "1-process baseline): 2 processes solve 2x the "
                     "scenarios through the production grouped+drain "
                     "path to the real gate, with the per-lane gate "
                     "flags reduced across processes by global_psum on "
                     "the gloo-backed global mesh inside the timed "
                     "region.  Scenario-DP has no intra-solve "
                     "communication by design (SURVEY 2.4)."),
        },
    }

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

    out = os.path.join(repo, "MC_r05.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

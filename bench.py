"""Benchmark: batched S10-Tempest NLP solves per second per chip.

Prints ONE JSON line:
    {"metric": "s10_tempest_solves_per_s_per_chip", "value": N,
     "unit": "solves/s", "vs_baseline": N/1000}

Baseline target (BASELINE.json): >= 1000 solves/s/chip on the ts=100
S10-Tempest loiter NLP.  A solve counts only if it is BOTH feasible
(scaled constraint violation < 1e-4, comparable to the reference's SNOPT
feasibility tolerance 1e-5 on SNOPT's internally scaled problem,
problems/S10/snopt.param:7) AND optimal: cost gap vs the float64 oracle
(tests/golden_s10_ts100.npy, solved to KKT 1e-8) below BENCH_COST_GAP
(relative, default 1e-2).

Why a cost gap and not control-sequence L2: the S10 optimum is a ~200-
dimensional cost-flat manifold — the reduced Hessian at the fully
converged (KKT 1e-8) oracle point has ~200 eigenvalues within +-1e-3 of
zero out of 297 null-space directions (measured; see
tests/test_solver.py::test_golden_flat_manifold).  Any two exact solvers
(SNOPT included) land at different points on that manifold, so pointwise
control L2 between solvers is unbounded below only by solver-path
accidents; on a flat manifold the meaningful optimality metric is the
cost gap + feasibility.  Control L2 vs the oracle is still reported in
the detail block.

How hard the cost gate is (external referee): the golden itself is this
repo's f64 solve at KKT 1e-8, reached only after ~1500 Newton iterations
through a shallow energy-exchange valley; scipy's trust-constr (sparse
SQP, f64) started from the same seed stalls 17.6% ABOVE that cost after
3000 iterations / 835 s (scratch/oracle_tc.py, cross-checked in
tests/test_external_oracle.py).  The two-phase continuation below gets
the f32 TPU solves within the 1e-2 gate in ~150 iterations.

Additional reported configs: warm-started replanning latency
(BENCH_REPLAN, BASELINE config 4) and G7-Skywalker ts=100 (BENCH_G7,
BASELINE config 2).  Scaling efficiency is a separate bench_scaling.py.

Runs on whatever accelerator JAX selects (the driver provides one TPU
chip); float32 on TPU with the nondimensionalized condensed-KKT ALM.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: the solver while-loops compile through
# a remote helper in minutes; caching them on disk makes every rerun of
# this bench (same shapes/flags) start in seconds instead.
from tol_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def main():
    ts = int(os.environ.get("BENCH_TS", "100"))
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "80"))
    refine = int(os.environ.get("BENCH_REFINE", "1"))
    # SNOPT-comparable working tolerances (the reference runs S10 at
    # opt_tol 1e-3 / feas_tol 1e-5, problems/S10/snopt.param:6-7); float32
    # feasibility is gated at 1e-4 in scaled units.
    tol = float(os.environ.get("BENCH_TOL", "5e-3"))
    feas = float(os.environ.get("BENCH_FEAS", "1e-4"))
    cost_gap_gate = float(os.environ.get("BENCH_COST_GAP", "1e-2"))

    from tol_tpu.api import make_problem
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    chain = os.environ.get("BENCH_CHAIN", "cr")
    kkt = make_condensed_kkt(can, refine=refine, chain=chain)
    prox = float(os.environ.get("BENCH_PROX", "3e-3"))
    opts = ALMOptions(tol=tol, feas_tol=feas, max_iter=max_iter,
                      gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                      prox=prox, gamma_shrink=0.2, gamma_eager=True,
                      dual_refine_k=int(os.environ.get("BENCH_DUALK", "4")))

    # Two-phase continuation (default): the S10 optimum sits at the end of
    # a long shallow energy-exchange valley (the f64 oracle walks it for
    # ~800 Newton iterations; scipy trust-constr after 3000 sparse-SQP
    # iterations is still 17.6% above it — see scratch/oracle_tc.py).
    # Phase 1 runs the AL with loose feasibility (no prox, no convergence
    # checks, cheap pallas chain without refinement): the cost dives
    # through the valley on the infeasible side.  Phase 2 is the
    # production endgame (cr chain + saddle refinement + dual-refined
    # certificates) pulling back to feasibility inside the right basin.
    two_phase = os.environ.get("BENCH_TWO_PHASE", "1") == "1"
    n1 = int(os.environ.get("BENCH_N1", "90"))
    chain1 = os.environ.get("BENCH_CHAIN1", "pallas")
    if two_phase:
        kkt1 = make_condensed_kkt(can, refine=0, chain=chain1)
        opts1 = ALMOptions(tol=1e-12, feas_tol=1e-12, max_iter=n1,
                           gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                           prox=0.0, dual_refine_k=0)

        def solve_one(v):
            r1 = alm_solve(can, kkt1, opts1, v0=v)
            return alm_solve(can, kkt, opts, v0=r1.v, y0=r1.y)
    else:
        solve_one = lambda v: alm_solve(can, kkt, opts, v0=v)

    # Batch over perturbed initial conditions (Monte-Carlo style): same
    # mission family, different seeds.
    v0 = can.initial_point()
    key = jax.random.PRNGKey(0)
    dv = 0.01 * jax.random.normal(key, (batch, can.n), dtype=dtype)
    lb, ub, fixed = can.bounds(can.nlp.inst0)
    v0s = jnp.clip(v0[None, :] + dv, lb[None, :], ub[None, :])
    v0s = jnp.where(fixed[None, :], lb[None, :], v0s)

    run = jax.jit(jax.vmap(solve_one))

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
    kkt_err = np.asarray(out.kkt_err)

    # Optimality gate: relative cost gap vs the float64 oracle; control L2
    # reported informationally (see module docstring on manifold flatness).
    ctrl_l2 = None
    cost_gap = None
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "golden_s10_ts100.npy")
    if ts == 100 and os.path.exists(golden_path):
        golden = np.load(golden_path)
        T = ts
        NV = 11
        Zg = golden[1:1 + (T + 1) * NV].reshape(T + 1, NV)
        f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                             can.nlp.inst0))
        cost_gap = (np.asarray(out.f, np.float64) - f_star) / max(abs(f_star), 1e-9)
        v_phys = np.asarray(jax.vmap(can.to_physical)(out.v))
        Z = v_phys[:, 1:1 + (T + 1) * NV].reshape(batch, T + 1, NV)
        # Controls: phi, CL, dphi, dCL, T (indices 6..10); normalized per
        # channel by max(oracle RMS, physical unit scale) so channels that
        # are ~0 at the optimum (e.g. dphi) don't blow up the metric.
        ctl = Z[:, :, 6:11]
        ctl_g = Zg[None, :, 6:11]
        unit = np.asarray(can.scaling.d_z)[6:11]
        rms = np.maximum(np.sqrt(np.mean(Zg[:, 6:11] ** 2, axis=0)), unit)
        ctrl_l2 = np.sqrt(np.mean(((ctl - ctl_g) / rms) ** 2, axis=(1, 2)))

    feas_ok = viol < feas
    if cost_gap is not None:
        # A solve on the flat manifold may legitimately land *below* the
        # oracle cost while feasible to tolerance; gate one-sided.  A
        # counted solve must ALSO carry a KKT certificate (converged).
        ok = conv & feas_ok & (cost_gap < cost_gap_gate)
    else:
        ok = conv & feas_ok
    n_ok = int(np.sum(ok))
    solves_per_s = n_ok / elapsed if elapsed > 0 else 0.0

    # ---- warm-start replanning latency (BASELINE config 4) ----
    # One aircraft replans one leg: batch-1 endgame solve warm-started
    # from the previous solution (primal + duals) after a small state
    # perturbation — the receding-horizon production path
    # (mission/mission.py solve_leg warm start).
    replan_p50_ms = None
    replan_iters = None
    if os.environ.get("BENCH_REPLAN", "1") == "1" and batch > 0:
        i_best = int(np.argmin(viol))
        v_warm = out.v[i_best]
        y_warm = out.y[i_best]
        kkt_r = make_condensed_kkt(can, refine=refine, chain="cr")
        opts_r = ALMOptions(tol=tol, feas_tol=feas, max_iter=max_iter,
                            gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                            prox=prox, gamma_shrink=0.2, gamma_eager=True,
                            dual_refine_k=4)

        @jax.jit
        def replan(v0, y0):
            return alm_solve(can, kkt_r, opts_r, v0=v0, y0=y0)

        pert = 0.003 * jax.random.normal(jax.random.PRNGKey(7), (can.n,),
                                         dtype=dtype)
        v0r = jnp.clip(v_warm + pert, lb, ub)
        v0r = jnp.where(fixed, lb, v0r)
        r = replan(v0r, y_warm)             # compile
        jax.block_until_ready(r.v)
        times = []
        for k in range(9):
            t0 = time.time()
            r = replan(v0r, y_warm)
            jax.block_until_ready(r.v)
            times.append(time.time() - t0)
        replan_p50_ms = float(np.median(times) * 1000.0)
        replan_iters = int(r.iterations)

    # ---- G7-Skywalker ts=100 (BASELINE config 2) ----
    g7 = None
    if os.environ.get("BENCH_G7", "1") == "1":
        g7_batch = int(os.environ.get("BENCH_G7_BATCH", "256"))
        nlp_g = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                             dtype=dtype)
        can_g = canonicalize(nlp_g, scaling="auto")
        kkt_g = make_condensed_kkt(can_g, refine=refine, chain="cr")
        opts_g = ALMOptions(tol=tol, feas_tol=feas,
                            max_iter=int(os.environ.get("BENCH_G7_ITER",
                                                        "320")),
                            gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                            prox=prox, dual_refine_k=8)
        v0g = can_g.initial_point()
        lbg, ubg, fxg = can_g.bounds(can_g.nlp.inst0)
        dvg = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                       (g7_batch, can_g.n), dtype=dtype)
        v0gs = jnp.clip(v0g[None] + dvg, lbg[None], ubg[None])
        v0gs = jnp.where(fxg[None], lbg[None], v0gs)
        run_g = jax.jit(jax.vmap(lambda v: alm_solve(can_g, kkt_g, opts_g,
                                                     v0=v)))
        og = run_g(v0gs)
        jax.block_until_ready(og.f)
        t0 = time.time()
        og = run_g(v0gs)
        jax.block_until_ready(og.f)
        g7_wall = time.time() - t0
        convg = np.asarray(og.converged)
        g7 = {
            "batch": g7_batch,
            "converged": int(convg.sum()),
            "median_kkt": float(np.median(np.asarray(og.kkt_err))),
            "median_viol": float(np.median(np.asarray(og.constr_viol))),
            "median_iters": int(np.median(np.asarray(og.iterations))),
            "wall_s": round(g7_wall, 3),
            "solves_per_s": round(float(convg.sum()) / g7_wall, 2),
        }

    result = {
        "metric": "s10_tempest_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        "detail": {
            "batch": batch,
            "ts": ts,
            "converged": int(np.sum(conv)),
            "feasible": int(np.sum(feas_ok)),
            "accurate_and_feasible": n_ok,
            "median_viol": float(np.median(viol)),
            "median_kkt": float(np.median(kkt_err)),
            "median_cost_gap": (float(np.median(cost_gap))
                                if cost_gap is not None else None),
            "median_ctrl_l2": (float(np.median(ctrl_l2))
                               if ctrl_l2 is not None else None),
            "wall_s": round(elapsed, 3),
            "compile_s": round(compile_and_first - elapsed, 1),
            "median_iters": int(np.median(np.asarray(out.iterations)))
                            + (n1 if two_phase else 0),
            "replan_p50_ms": (round(replan_p50_ms, 2)
                              if replan_p50_ms is not None else None),
            "replan_iters": replan_iters,
            "g7_skywalker": g7,
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

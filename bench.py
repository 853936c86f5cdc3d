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
control L2 between solvers reflects solver-path accidents; on a flat
manifold the meaningful optimality metric is cost gap + feasibility.
This is also how the BASELINE's "control-sequence error" metric is
interpreted throughout (see BASELINE.md); control L2 vs the oracle is
still reported in the detail block.

Solver: a TWO-BODY compiled program pair per mission (runtime ALMParams;
the exploration dive runs as its own specialized program and hands its
device-resident ALMStates to the endgame program — see
tol_tpu/solver/batch.py), cyclic-reduction-ordered Pallas chain ("crp")
— the low-depth elimination order is what preserves the Newton
direction's flat-valley components in float32 (sequential orderings
plateau ~40% above the optimality gate; see tol_tpu/ops/crkern.py).

Execution geometry (r05): the batch runs through
tol_tpu.solver.batch.make_grouped_solver — independent 128-lane groups,
each solved by the TWO-BODY program pair (a dive program specialized to
exploration: 4 line-search trials, no saddle-refine pass, no dual CG —
chained on-device into the full endgame program via phase_switch_state),
then the unconverged stragglers gather into 128-lane drain chunks that
resume exactly (ALMState handoff) and finish the full budget — the
batch stops paying max-lane cost.  Identical seeds, solves and gate
constants; the detail block reports flops/iteration and MFU.
Measured r05 (this box): 446 -> 476 gated solves/s from the two-body
split; N1=110 dives, chord endgames (factor_reuse=2) and pallas-seq
dive chains all measured and rejected on the optimality gate.

Configs (BASELINE.json):
  1. S10-Tempest ts=100, batch 1024      -> the headline gate
  2. G7-Skywalker ts=100, batch 256      -> KKT-certificate + feasibility
     gate; cost gap vs tests/g7_bestknown_ts100.npy is informational
     only — the G7 cost rides an 84x-range quasi-flat soaring valley
     (see BASELINE.md and tests/test_external_oracle.py)
  3. Multi-airframe sweep (tempest, tempest_eric, tempest_wences,
     tempest_will x 256) — reuses config 1's compiled program (instances
     are runtime data)
  4. Warm-started replanning through the mission layer
     (Mission/default_leg_solver: goal-shifted G7 legs with stitch
     bounds, warm primal/dual; the reference's receding-horizon loop,
     msl/mission.py:122-138)
  5. Storm-grid S10 (wind model 3, trilinear TOLWGRID field), batch 256

Runs on whatever accelerator JAX selects (the driver provides one TPU
chip); float32 on TPU.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: the solver while-loops compile through
# a remote helper in minutes; caching them on disk makes reruns of this
# bench (same program structure) start in seconds instead.
from tol_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()


def _params(dtype, **kw):
    from tol_tpu.solver.alm import ALMParams

    base = dict(tol=5e-3, feas_tol=1e-4, mu_init=1e-5, mu_min=1e-5,
                mu_shrink=0.1, theta_mu=1.2, gamma_init=0.01, gamma_min=1e-6,
                gamma_shrink=0.2, prox=3e-3, eta=1e-4, tau_min=0.99,
                kappa_inner=1.0, delta_decay=0.2, gamma_eager=1.0,
                max_iter=400)
    base.update(kw)
    if base["mu_min"] == 0.0:
        base["mu_min"] = min(base["tol"] / 10.0, base["mu_init"])
    mi = base.pop("max_iter")
    return ALMParams(**{k: jnp.asarray(v, dtype) for k, v in base.items()},
                     max_iter=jnp.asarray(mi, jnp.int32))


def _stack_instances(insts):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *insts)


def _cache_entries():
    """Entries in the persistent compile cache (seed-vs-cold visibility:
    if a bench run adds 0 entries, every program was a cache HIT and the
    recorded compile_s is pure load/upload cost, not compilation)."""
    root = os.path.dirname(os.path.abspath(__file__))
    d = os.path.join(root, ".jax_cache")
    try:
        return len(os.listdir(d))
    except OSError:
        return 0


def main():
    cache_start = _cache_entries()
    ts = int(os.environ.get("BENCH_TS", "100"))
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    chain = os.environ.get("BENCH_CHAIN", "crp")
    refine = int(os.environ.get("BENCH_REFINE", "1"))
    dual_k = int(os.environ.get("BENCH_DUALK", "4"))
    # Runtime iteration budget: the gate pass-rate/wall trade-off.  250
    # keeps ~94% of lanes under the gate (measured); the continuation's
    # phase-1 budget is 90 of those.
    max_iter = int(os.environ.get("BENCH_MAX_ITER", "250"))
    n1 = int(os.environ.get("BENCH_N1", "90"))
    tol = float(os.environ.get("BENCH_TOL", "5e-3"))
    feas = float(os.environ.get("BENCH_FEAS", "1e-4"))
    cost_gap_gate = float(os.environ.get("BENCH_COST_GAP", "1e-2"))

    from tol_tpu.api import make_config, make_problem
    from tol_tpu.models.wind import WindConfig
    from tol_tpu.problems.base import make_instance
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # max_ls=8: line-search trials 12 -> 8 is quality-neutral on the gate
    # (scratch/tune_sched.py: identical ok counts) and ~10% faster.
    # factor_reuse (Shamanskii chord steps) measured and kept OFF for the
    # flagship gate: reuse=2 converges (1022/1024 feasible, median 160
    # iters) but the chord-stepped dive selects worse basins — median
    # cost gap 8.9e-3 -> 1.65e-2, failing the optimality gate — and the
    # wall does not improve.  Another confirmation that the dive is
    # quality-critical (r04: shorter/cheaper dives all failed the same
    # way).  The option remains for warm-started local solves.
    reuse = int(os.environ.get("BENCH_REUSE", "1"))
    opts = ALMOptions(max_iter=2000, dual_refine_k=dual_k, max_ls=8,
                      factor_reuse=reuse)
    compile_s = {}

    # ================= config 1: S10-Tempest flagship =================
    # Execution geometry (measured, scratch/time_iter.py): per-LANE
    # iteration cost improves sharply at smaller batch (20.8 us/lane-iter
    # at B=1024 vs 14.6 at B=256), so the batch runs as independent
    # GB-lane groups; after the group cap the unconverged stragglers are
    # gathered (state0 resume) into DB-lane drain chunks that finish the
    # full budget at a fraction of full-batch cost — wall drops from
    # max-lane to ~group-cap cost.  Same seeds, same solves, same gate.
    GB = int(os.environ.get("BENCH_GROUP", "128"))
    DB = int(os.environ.get("BENCH_DRAIN", "128"))
    cap1 = int(os.environ.get("BENCH_CAP1", "145"))
    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=refine, chain=chain)

    # Endgame numerics (tuned r04, scratch/tune_sched.py): warmer barrier
    # start mu_init=6e-5 + kappa_inner=2 + a slightly stronger prox
    # 2.5e-3 converge in fewer iterations AND pass more lanes
    # (1003 vs 966 / 1024 at the same gate, p90 iters 224 -> 142).  The
    # dive (p1) numerics are untouched — dive length/params select the
    # BASIN and are quality-critical (75-iter dives, adaptive exits, and
    # coarse-horizon dives all land above the cost gate; measured).
    p2 = _params(dtype, tol=tol, feas_tol=feas, mu_init=6e-5,
                 kappa_inner=2.0, prox=2.5e-3, max_iter=cap1)
    p2d = _params(dtype, tol=tol, feas_tol=feas, mu_init=6e-5,
                  kappa_inner=2.0, prox=2.5e-3, max_iter=max_iter)
    p1 = _params(dtype, tol=1e-12, feas_tol=1e-12, prox=0.0,
                 gamma_eager=0.0, max_iter=max_iter)
    ph_n = jnp.asarray(n1, jnp.int32)
    ph_df = jnp.asarray(-1.0, dtype)   # fixed-length dive (measured best)

    # Grouped execution + straggler drain now live in the package
    # (tol_tpu/solver/batch.py) — the bench consumes the production path.
    from tol_tpu.solver.batch import make_grouped_solver

    # Two-body group program (r05): the dive phase runs a cheap body
    # (fewer line-search trials, refine=0 KKT, no dual refinement) under
    # a scalar lax.cond — the dive is ~62% of all iterations and pays
    # nothing for endgame-only machinery.
    two = os.environ.get("BENCH_TWOBODY", "1") == "1"
    if two:
        dive_opts = ALMOptions(
            max_iter=2000, dual_refine_k=0,
            max_ls=int(os.environ.get("BENCH_DIVE_LS", "4")),
            factor_reuse=1)
        # Dive chain stays crp: the fused sequential pallas kernel would
        # halve the dive iteration cost (0.62 vs 1.25 ms at B=128) but
        # fails the optimality gate end-to-end (median cost gap 8.8e-3 ->
        # 1.29e-2, 0/1024 pass) — CR's low-depth elimination order
        # preserves the flat-valley direction components DURING the dive
        # too, not just in the endgame (ops/crkern.py).  Measured r05;
        # same failure signature as every other cheapened dive.
        dive_chain = os.environ.get("BENCH_DIVE_CHAIN", chain)
        kkt_dive = make_condensed_kkt(
            can, refine=int(os.environ.get("BENCH_DIVE_REFINE", "0")),
            chain=dive_chain)
        gsolve = make_grouped_solver(can, kkt, opts, group_size=GB,
                                     drain_size=DB, dive_opts=dive_opts,
                                     dive_kkt=kkt_dive)
    else:
        gsolve = make_grouped_solver(can, kkt, opts, group_size=GB,
                                     drain_size=DB)

    def seeds_for(insts, key, n):
        v0 = jax.vmap(can.initial_point)(insts)
        lb, ub, fixed = jax.vmap(can.bounds)(insts)
        dv = 0.01 * jax.random.normal(key, (n, can.n), dtype=dtype)
        v0s = jnp.clip(v0 + dv, lb, ub)
        return jnp.where(fixed, lb, v0s)

    inst1 = _stack_instances([can.nlp.inst0] * batch)
    g_insts1 = [can.nlp.inst0] * (batch // GB)
    v0s = seeds_for(inst1, jax.random.PRNGKey(0), batch)

    t0 = time.time()
    gsolve(g_insts1, inst1, v0s, p1, p2, p2d, n1, -1.0)   # compile + warm
    compile_s["s10"] = round(time.time() - t0, 1)
    t0 = time.time()
    res1 = gsolve(g_insts1, inst1, v0s, p1, p2, p2d, n1, -1.0)
    elapsed = time.time() - t0
    compile_s["s10"] = round(compile_s["s10"] - elapsed, 1)
    conv, viol, out_f, iters, out_kkt, out_v = (
        res1.converged, res1.constr_viol, res1.f, res1.iterations,
        res1.kkt_err, res1.v)
    group_iters, drain_iters = res1.group_iters, res1.drain_iters

    # FLOP/MFU accounting (VERDICT r04 ask #2): XLA cost analysis counts
    # the while-loop body once, so program_flops(group program) ~ flops of
    # ONE batched solver iteration; achieved = flops/iter * iters paid.
    from tol_tpu.utils.flops import peak_flops, program_flops

    if hasattr(gsolve.run_group, "run_dive"):
        # Two-body mode: run_group is a host-side chain of two jitted
        # programs; lower the dive program (its while body is one batched
        # dive iteration — slightly below the endgame iteration's cost).
        flops_per_iter = program_flops(gsolve.run_group.run_dive,
                                       can.nlp.inst0, v0s[:GB], p1, p2, ph_n)
    else:
        flops_per_iter = program_flops(gsolve.run_group, can.nlp.inst0,
                                       v0s[:GB], p1, p2, ph_n, ph_df)
    achieved = (flops_per_iter * (group_iters + (DB / GB) * drain_iters)
                / elapsed)
    peak = peak_flops()
    mfu_pct = (100.0 * achieved / peak) if (peak and achieved == achieved) \
        else None

    cost_gap = None
    ctrl_l2 = None
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "golden_s10_ts100.npy")
    if ts == 100 and os.path.exists(golden_path):
        golden = np.load(golden_path)
        NV = 11
        Zg = golden[1:1 + (ts + 1) * NV].reshape(ts + 1, NV)
        f_star = float(can.f(can.from_physical(jnp.asarray(golden, dtype)),
                             can.nlp.inst0))
        cost_gap = (out_f - f_star) / max(abs(f_star), 1e-9)
        v_phys = np.asarray(jax.vmap(can.to_physical)(jnp.asarray(out_v)))
        Z = v_phys[:, 1:1 + (ts + 1) * NV].reshape(batch, ts + 1, NV)
        ctl = Z[:, :, 6:11]
        unit = np.asarray(can.scaling.d_z)[6:11]
        rms = np.maximum(np.sqrt(np.mean(Zg[:, 6:11] ** 2, axis=0)), unit)
        ctrl_l2 = np.sqrt(np.mean(
            ((ctl - Zg[None, :, 6:11]) / rms) ** 2, axis=(1, 2)))

    feas_ok = viol < feas
    if cost_gap is not None:
        # One-sided gate: a flat-manifold solve may legitimately land
        # below the oracle cost.  A counted solve must ALSO carry a KKT
        # certificate (converged).
        ok = conv & feas_ok & (cost_gap < cost_gap_gate)
    else:
        ok = conv & feas_ok
    n_ok = int(np.sum(ok))
    solves_per_s = n_ok / elapsed if elapsed > 0 else 0.0

    # ================= config 3: multi-airframe sweep =================
    sweep = None
    if (os.environ.get("BENCH_SWEEP", "1") == "1" and batch % 4 == 0
            and (batch // 4) % GB == 0):
        names = ["tempest", "tempest_eric", "tempest_wences", "tempest_will"]
        per = batch // 4
        insts = []
        singles = []
        from tol_tpu.api import default_goal
        for name in names:
            cfg_a = make_config("S10", name, ts=ts, wind_model=1)
            inst_a = make_instance(cfg_a, default_goal("S10"),
                                   WindConfig(model=1), dtype=dtype)
            insts.extend([inst_a] * per)
            singles.append(inst_a)
        inst3 = _stack_instances(insts)
        # airframe blocks align with solve groups (per % GB == 0 for the
        # default batch 1024 / GB 256)
        g_insts3 = [singles[(g * GB) // per] for g in range(batch // GB)]
        v3 = seeds_for(inst3, jax.random.PRNGKey(2), batch)
        gsolve(g_insts3, inst3, v3, p1, p2, p2d, n1, -1.0)  # warm
        t0 = time.time()
        res3 = gsolve(g_insts3, inst3, v3, p1, p2, p2d, n1, -1.0)
        w3 = time.time() - t0
        c3, v3viol = res3.converged, res3.constr_viol
        f3 = v3viol < feas
        sweep = {
            "airframes": names, "batch": batch,
            # Canonicalization (auto scaling evaluated at tempest inst0) is
            # shared across the sweep so instances stay runtime data for
            # config 1's compiled program; the airframe variants' seeds are
            # within ~10% of tempest's scales (same family), but reported
            # feasibility is in tempest-scaled units.
            "scaling": "shared (tempest inst0)",
            "converged": int(c3.sum()),
            "feasible": int(f3.sum()),
            "wall_s": round(w3, 3),
            "solves_per_s": round(float((c3 & f3).sum()) / w3, 1),
            "per_airframe_conv": {
                n: int(c3[i * per:(i + 1) * per].sum())
                for i, n in enumerate(names)},
        }

    # ================= config 2: G7-Skywalker =================
    g7 = None
    if os.environ.get("BENCH_G7", "1") == "1":
        g7_batch = int(os.environ.get("BENCH_G7_BATCH", "256"))
        nlp_g = make_problem("G7", aircraft="skywalker", ts=ts, wind_model=1,
                             dtype=dtype)
        can_g = canonicalize(nlp_g, scaling="auto")
        kkt_g = make_condensed_kkt(can_g, refine=refine, chain=chain)
        # Measured G7 configuration (r05 retune, scratch/tune_g7b.py):
        # warm-barrier endgame (mu_init 6e-5, kappa_inner 2, prox 2.5e-3)
        # + FASTER penalty contraction gamma_shrink=0.12 + a SHORT
        # 40-iteration exploration dive — 256/256 at median 283
        # iterations (r04: 303, r03: 438), ~199 solves/s on one chip
        # with the chunk-128 kernels.  Deeper dual refinement (k=8/12)
        # and neighbor schedules measured and rejected.
        g7_iter = int(os.environ.get("BENCH_G7_ITER", "600"))
        g7_cap = int(os.environ.get("BENCH_G7_CAP", "360"))
        g7_n1 = int(os.environ.get("BENCH_G7_N1", "40"))
        p_g = _params(dtype, tol=tol, feas_tol=feas, gamma_min=5e-6,
                      prox=2.5e-3, mu_init=6e-5, kappa_inner=2.0,
                      gamma_shrink=0.12, max_iter=g7_cap)
        p_gd = _params(dtype, tol=tol, feas_tol=feas, gamma_min=5e-6,
                       prox=2.5e-3, mu_init=6e-5, kappa_inner=2.0,
                       gamma_shrink=0.12, max_iter=g7_iter)
        p1_g = _params(dtype, tol=1e-12, feas_tol=1e-12, prox=0.0,
                       gamma_eager=0.0, max_iter=600)
        # G7 runs the same grouped + straggler-drain (+ two-body)
        # geometry as the flagship (r05): 128-lane groups to a runtime
        # cap, drain chunks resume the long tail — G7's iteration spread
        # is wide (median ~283 against a 600 budget), so the monolithic
        # batch paid max-lane cost.
        if two:
            gsolve_g = make_grouped_solver(
                can_g, kkt_g, opts, group_size=GB, drain_size=DB,
                dive_opts=dive_opts,
                dive_kkt=make_condensed_kkt(
                    can_g,
                    refine=int(os.environ.get("BENCH_DIVE_REFINE", "0")),
                    chain=dive_chain))
        else:
            gsolve_g = make_grouped_solver(can_g, kkt_g, opts,
                                           group_size=GB, drain_size=DB)

        v0g = can_g.initial_point()
        lbg, ubg, fxg = can_g.bounds(can_g.nlp.inst0)
        dvg = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                       (g7_batch, can_g.n), dtype=dtype)
        v0gs = jnp.clip(v0g[None] + dvg, lbg[None], ubg[None])
        v0gs = jnp.where(fxg[None], lbg[None], v0gs)
        g_insts_g = [can_g.nlp.inst0] * (g7_batch // GB)
        inst_g = _stack_instances([can_g.nlp.inst0] * g7_batch)
        t0 = time.time()
        og = gsolve_g(g_insts_g, inst_g, v0gs, p1_g, p_g, p_gd, g7_n1, -1.0)
        compile_s["g7"] = round(time.time() - t0, 1)
        t0 = time.time()
        og = gsolve_g(g_insts_g, inst_g, v0gs, p1_g, p_g, p_gd, g7_n1, -1.0)
        g7_wall = time.time() - t0
        compile_s["g7"] = round(compile_s["g7"] - g7_wall, 1)
        convg = np.asarray(og.converged)
        # G7 optimality gate = KKT certificate + feasibility, NOT a cost
        # gap: the G7 cost (pure thrust energy, gains kT=100 / others 0)
        # descends a connected feasible valley spanning an 84x cost range
        # at ~1e-5 stationarity (dynamic soaring against the unbounded
        # linear-shear wind aloft), so no unique optimal value exists at
        # working tolerance.  Evidence: tests/g7_bestknown_ts100.npy +
        # tests/test_external_oracle.py::
        # test_g7_bestknown_point_documents_the_thrust_valley.  The gap
        # vs that best-known point is reported informationally.
        g7_gap = None
        bk_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "tests", "g7_bestknown_ts100.npy")
        if ts == 100 and os.path.exists(bk_path):
            bk = np.load(bk_path)
            f_bk = float(can_g.f(can_g.from_physical(
                jnp.asarray(bk, dtype)), can_g.nlp.inst0))
            g7_gap = (np.asarray(og.f, np.float64) - f_bk) / max(
                abs(f_bk), 1e-9)
        g7 = {
            "batch": g7_batch,
            "converged": int(convg.sum()),
            "median_kkt": float(np.nanmedian(np.asarray(og.kkt_err))),
            "median_viol": float(np.median(np.asarray(og.constr_viol))),
            "median_iters": int(np.median(np.asarray(og.iterations))),
            "median_f_scaled": float(np.median(np.asarray(og.f))),
            "iqr_f_scaled": [
                float(np.percentile(np.asarray(og.f), 25)),
                float(np.percentile(np.asarray(og.f), 75))],
            "median_cost_gap_vs_bestknown_informational":
                (float(np.median(g7_gap)) if g7_gap is not None else None),
            "wall_s": round(g7_wall, 3),
            "solves_per_s": round(float(convg.sum()) / g7_wall, 2),
        }

    # ====== config 4: warm replanning through the mission layer ======
    replan = None
    if os.environ.get("BENCH_REPLAN", "1") == "1":
        import math

        from tol_tpu.config import Goal, StitchState
        from tol_tpu.mission.mission import MissionConfig, default_leg_solver

        # Ensemble legs (leg_ensemble lanes of warm + perturbed + cold
        # seeds, 48-iteration slices, first-converged-best-f winner): a
        # single-lane solve pays ~36 ms/iteration on TPU (B=1 falls off
        # the batched Pallas chain path), the 128-lane ensemble ~2 ms —
        # and the serial cold-retry fallback disappears into the batch.
        ens = int(os.environ.get("BENCH_LEG_ENS", "128"))
        mcfg = MissionConfig(aircraft="skywalker", ts=ts, wind_model=1,
                             leg_max_iter=600, leg_ensemble=ens,
                             leg_chain=(chain if ens % 128 == 0 and ens
                                        else "cr"),
                             leg_chunk=int(os.environ.get("BENCH_LEG_CHUNK",
                                                          "48")))
        solve_leg = default_leg_solver(mcfg)
        # Leg 1 (cold): 400 m north.  Then replans: goal bearing shifted
        # +-10 deg and range +-10% — the receding-horizon pattern of
        # msl/mission.py:122-138, warm-started with stitch bounds from the
        # previous leg's terminal state.
        t0 = time.time()
        doc = solve_leg("G7", Goal(xg=0.0, yg=400.0, zg=0.0, rg=0.0))
        cold_s = time.time() - t0
        cold_iters = doc["iterations"]
        times, warm_iters, conv_ok, leg_log = [], [], 0, []
        rng = np.random.default_rng(7)
        for k in range(9):
            ang = math.pi / 2 + math.radians(rng.uniform(-10, 10))
            rng_d = 400.0 * (1.0 + rng.uniform(-0.1, 0.1))
            tr = doc["trajectory"]
            st = StitchState(Va=tr["Va"][-1], gam=tr["gam"][-1],
                             chi=tr["chi"][-1], phi=tr["phi"][-1],
                             CL=tr["CL"][-1], dphi=tr["dphi"][-1],
                             dCL=tr["dCL"][-1], T=tr["T"][-1])
            g = Goal(xg=rng_d * math.cos(ang), yg=rng_d * math.sin(ang),
                     zg=0.0, rg=0.0)
            t0 = time.time()
            doc = solve_leg("G7", g, stitch=st)
            times.append(time.time() - t0)
            warm_iters.append(doc["iterations"])
            conv_ok += int(bool(doc["converged"]))
            leg_log.append({"ms": round(times[-1] * 1000.0, 1),
                            "iters": doc["iterations"],
                            "warm": doc.get("used_warm"),
                            "cold_retry": doc.get("cold_retry")})
        replan = {
            "p50_ms": round(float(np.median(times)) * 1000.0, 2),
            "p90_ms": round(float(np.percentile(times, 90)) * 1000.0, 2),
            "cold_first_leg_s": round(cold_s, 2),
            "cold_iters": cold_iters,
            "median_warm_iters": int(np.median(warm_iters)),
            "converged": conv_ok, "legs": 9,
            "per_leg": leg_log,
        }

    # ================= config 5: storm-grid S10 =================
    storm = None
    if os.environ.get("BENCH_STORM", "1") == "1":
        from tol_tpu.io.storm import make_demo_storm_grid

        sb = int(os.environ.get("BENCH_STORM_BATCH", "256"))
        # Genuinely NONUNIFORM storm field (VERDICT r04 task 5): vortex +
        # thermal + saturating shear sampled at the reference's 150 m
        # spacing, all three components live, interpolated with the C1
        # quadratic B-spline (order=2 — trilinear's cell-face kinks leave
        # the NLP without pointwise stationarity; see models/wind.py).
        # The correctness oracle is tests/golden_storm_ts100.npy: an f64
        # solve of the SAME grid/interpolant, externally polished by
        # scipy trust-constr (scratch/make_golden_storm.py).
        grid = make_demo_storm_grid()
        wcfg = WindConfig(model=3, east0=17400.0, north0=25800.0, up0=200.0,
                          grid=grid, order=2)
        nlp_s = make_problem("S10", aircraft="tempest", ts=ts, wind_model=3,
                             wind=wcfg, dtype=dtype)
        can_s = canonicalize(nlp_s, scaling="auto")
        kkt_s = make_condensed_kkt(can_s, refine=refine, chain=chain)
        # Storm runs the same grouped + two-body + drain geometry as the
        # flagship (r05; was a monolithic 256-lane vmap paying max-lane
        # cost), with a 4-trial endgame line search: a model-3 constraint
        # evaluation costs more than a model-1 one (27-node spline
        # stencil + AD), so the 8-trial Armijo's extra f/c evals
        # dominated the storm iteration.  Interpolation rides the
        # axis-separated contraction (models/wind.py interp="auto" ->
        # "separable"): one (Q, ny*nz) MXU matmul per query sweep —
        # measured 47 -> 164 storm solves/s over the onehot lowering at
        # identical gate results.  Quality is policed by the f64
        # storm-oracle gate.
        storm_cap = int(os.environ.get("BENCH_STORM_CAP", "175"))
        storm_ls = int(os.environ.get("BENCH_STORM_LS", "4"))
        opts_s = ALMOptions(max_iter=2000, dual_refine_k=dual_k,
                            max_ls=storm_ls, factor_reuse=reuse)
        if two:
            gsolve_s = make_grouped_solver(
                can_s, kkt_s, opts_s, group_size=GB, drain_size=DB,
                dive_opts=dive_opts,
                dive_kkt=make_condensed_kkt(
                    can_s,
                    refine=int(os.environ.get("BENCH_DIVE_REFINE", "0")),
                    chain=dive_chain))
        else:
            gsolve_s = make_grouped_solver(can_s, kkt_s, opts_s,
                                           group_size=GB, drain_size=DB)
        p2s = _params(dtype, tol=tol, feas_tol=feas, mu_init=6e-5,
                      kappa_inner=2.0, prox=2.5e-3, max_iter=storm_cap)

        v0st = can_s.initial_point()
        lbs, ubs, fxs = can_s.bounds(can_s.nlp.inst0)
        dvs = 0.01 * jax.random.normal(jax.random.PRNGKey(3),
                                       (sb, can_s.n), dtype=dtype)
        v0ss = jnp.clip(v0st[None] + dvs, lbs[None], ubs[None])
        v0ss = jnp.where(fxs[None], lbs[None], v0ss)
        g_insts_s = [can_s.nlp.inst0] * (sb // GB)
        inst_s = _stack_instances([can_s.nlp.inst0] * sb)
        t0 = time.time()
        os_ = gsolve_s(g_insts_s, inst_s, v0ss, p1, p2s, p2d, n1, -1.0)
        compile_s["storm"] = round(time.time() - t0, 1)
        t0 = time.time()
        os_ = gsolve_s(g_insts_s, inst_s, v0ss, p1, p2s, p2d, n1, -1.0)
        sw = time.time() - t0
        compile_s["storm"] = round(compile_s["storm"] - sw, 1)
        cs = np.asarray(os_.converged)
        fs = np.asarray(os_.constr_viol) < feas
        gap_s = None
        n_ok_s = int((cs & fs).sum())
        storm_golden = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests",
            "golden_storm_ts100.npy")
        if ts == 100 and os.path.exists(storm_golden):
            gs = np.load(storm_golden)
            f_star_s = float(can_s.f(
                can_s.from_physical(jnp.asarray(gs, dtype)),
                can_s.nlp.inst0))
            gap_s = (np.asarray(os_.f, np.float64) - f_star_s) / max(
                abs(f_star_s), 1e-9)
            n_ok_s = int((cs & fs & (gap_s < cost_gap_gate)).sum())
        storm = {
            "batch": sb, "wind_model": 3, "field": "vortex+thermal+shear",
            "interp_order": 2,
            "converged": int(cs.sum()), "feasible": int(fs.sum()),
            "accurate_and_feasible": n_ok_s,
            "wall_s": round(sw, 3),
            "solves_per_s": round(n_ok_s / sw, 1) if sw > 0 else None,
            "median_cost_gap_vs_f64_storm_oracle":
                (float(np.median(gap_s)) if gap_s is not None else None),
        }

    result = {
        "metric": "s10_tempest_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 4),
        "detail": {
            "batch": batch,
            "ts": ts,
            "chain": chain,
            "max_iter": max_iter,
            "group": GB, "drain": DB, "cap1": cap1,
            "converged": int(np.sum(conv)),
            "feasible": int(np.sum(feas_ok)),
            "accurate_and_feasible": n_ok,
            "median_viol": float(np.median(viol)),
            "median_kkt": float(np.nanmedian(out_kkt)),
            "median_cost_gap": (float(np.median(cost_gap))
                                if cost_gap is not None else None),
            "median_ctrl_l2": (float(np.median(ctrl_l2))
                               if ctrl_l2 is not None else None),
            "wall_s": round(elapsed, 3),
            "compile_s": round(sum(compile_s.values()), 1),
            "compile_breakdown_s": compile_s,
            "cache_entries_start": cache_start,
            "cache_entries_new": _cache_entries() - cache_start,
            "median_iters": int(np.median(iters)),
            "p90_iters": int(np.percentile(iters, 90)),
            # One batched GB-lane solver iteration (XLA cost analysis of
            # the group program; loop body counted once) and the achieved
            # utilization over the timed wall (denominator: dense bf16
            # peak of the local chip).
            "flops_per_iter": (None if flops_per_iter != flops_per_iter
                               else float(flops_per_iter)),
            "achieved_gflops": (None if achieved != achieved
                                else round(achieved / 1e9, 1)),
            "mfu_pct": (None if mfu_pct is None else round(mfu_pct, 3)),
            "replan": replan,
            "g7_skywalker": g7,
            "multi_airframe": sweep,
            "storm_grid": storm,
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

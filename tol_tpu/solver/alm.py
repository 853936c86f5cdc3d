"""Augmented-Lagrangian interior-point solver (the production path).

Replaces SNOPT's SQP with a LANCELOT/NCL-style method tailored to batched
TPU execution:

    outer loop:  multiplier update  yhat <- yhat + c/gamma,
                 penalty gamma and barrier mu annealing
    inner loop:  damped Newton descent on the smooth merit

        AL_mu(v) = f(v) + yhat^T c(v) + ||c(v)||^2 / (2 gamma)
                   - mu * sum(log-barrier terms for l <= v <= u)

Why AL instead of a classical SQP/IPM merit-line-search scheme: the tol
NLPs are *degenerate* — e.g. the S10 loiter optimum rides a cost-flat
altitude manifold, so the equality Jacobian loses rank (21+ dependent rows)
and constraint multipliers are non-unique/unbounded.  SQP-type merit
functions then reject essentially every Newton step (the tangential step
component dwarfs the feasibility decrease), which is exactly the failure
SNOPT's elastic mode papers over.  The augmented Lagrangian needs no
constraint qualification: its inner problem is smooth and bound-
constrained, every descent step is acceptable by plain Armijo, and the
penalty term regularizes null directions automatically.

The Newton step is computed in *saddle form* so the structured O(T)
factorization applies unchanged (``kkt_structured``):

    [ H(y) + Sigma + delta_w I   J^T       ] [dv]   [ -grad AL_mu ]
    [ J                          -gamma I  ] [dw] = [ 0           ]

with y = yhat + c/gamma (the AL multiplier view; eliminating dw recovers
exactly the AL Newton system (H + J^T J/gamma + Sigma) dv = -grad AL_mu).

Everything is one jittable ``lax.while_loop`` — thousands of instances
batch in lock-step under ``vmap``, each with its own (mu, gamma, yhat).

Two parameter channels keep recompiles rare on TPU (remote XLA compiles
of these while-loops cost minutes):

  * :class:`ALMOptions` — *static* structure: iteration/trial counts,
    refinement depths, trace mode.  Changing any of these recompiles.
  * :class:`ALMParams` — *runtime* numerics: tolerances and annealing
    schedules as traced scalars.  Tuning them reuses the compiled
    program (pass them as jit arguments).

Continuation ("two-phase") solves run INSIDE the single compiled loop:
pass ``phase1=Phase1(params=..., n_max=..., exit_df=...)`` and each batch
lane starts in an exploration phase (typically loose feasibility so the
cost dives through shallow valleys first — see bench.py) and switches
per-lane to the endgame parameters when its cost descent stalls, instead
of burning a fixed iteration budget in a separately-compiled program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tol_tpu.solver.canonical import CanonicalNLP

_BIG = 1e19


class ALMOptions(NamedTuple):
    """Static solver structure + default numeric values.

    The numeric fields double as the source for :meth:`ALMParams.from_options`
    when no runtime params are passed (they are then baked into the program
    as constants, which is fine for tests/CLI one-offs).
    """

    tol: float = 1e-8              # final KKT tolerance
    feas_tol: float = 0.0          # feasibility requirement (0 -> use tol)
    mu_init: float = 0.1
    gamma_init: float = 0.1        # initial AL penalty (1/penalty weight)
    gamma_min: float = 1e-6
    gamma_shrink: float = 0.5
    mu_shrink: float = 0.2
    mu_min: float = 0.0            # barrier floor (0 -> min(tol/10, mu_init));
                                   # a floor ~eps/sqrt(eps) stabilizes the
                                   # float32 endgame via the sigma term
    theta_mu: float = 1.2          # superlinear mu exponent
    kappa_inner: float = 1.0       # inner tolerance = kappa_inner * mu
    tau_min: float = 0.99
    max_iter: int = 400            # static iteration cap (trace length; the
                                   # while-loop also honors params.max_iter)
    max_ls: int = 12    # parallel Armijo trials; the sub-noise full-step
                        # rule covers the tail below a_max * 2^-12
    eta: float = 1e-4              # Armijo factor
    delta_w_min: float = 1e-12
    delta_w_max: float = 1e6
    kappa_sigma: float = 1e10
    bound_push: float = 1e-2
    s_max: float = 100.0
    delta_decay: float = 0.2       # shift decay on success (0.9 = sticky)
    # Trigger outer updates on inner stagnation as well as on inner
    # convergence: when the accepted step is tiny, the (possibly modified-
    # Hessian) inner iteration has extracted what it can at this (mu, gamma)
    # — move the outer problem instead of grinding.
    stagnation_outer: bool = True
    # Record per-iteration (kkt_err, mu, gamma, delta_w, viol, f) via a
    # fixed-length scan; returned as ALMResult.trace.  TPU-safe.
    trace: bool = False
    # Proximal ALM: add rho/2 ||v - v_ref||^2 to the inner merit, with
    # v_ref re-centered at every outer update.  The tol NLPs are
    # *degenerate* (cost-flat manifolds: loiter phase / altitude), so the
    # plain AL inner Hessian is singular along those directions and Newton
    # oscillates there for hundreds of iterations (observed: ~800 of 1200
    # total iterations spent creeping 1e-4/outer along the flat manifold).
    # The prox term makes every inner problem strongly convex — the
    # classical (Rockafellar) proximal method of multipliers, which
    # converges linearly without any constraint qualification.  The prox
    # center moves each outer round, so the stationary points of the
    # original NLP are unchanged.  Off by default (exact-Newton endgame);
    # enable ~1e-3 for ill-posed instances where feasibility matters more
    # than last-digit stationarity.
    prox: float = 0.0
    # Least-squares dual refinement (k CG steps on the Gauss-Newton normal
    # equations of  min_y || W (grad f - z + J^T y) ||, matrix-free via
    # jax.linearize).  The tol NLPs are degenerate: the constraint Jacobian
    # loses rank at the optimum, so the classical first-order multiplier
    # update yhat <- yhat + c/gamma converges at rate ~gamma/(gamma+sigma)
    # -> 1 along the near-null rows and the *reported* dual residual stalls
    # ~1e-2 even when the primal iterate is optimal (measured: the LSQ
    # multiplier at the stalled iterate certifies KKT 5e-4).  A KKT
    # certificate only needs *some* multiplier; this computes a near-best
    # one.  W^2 = 1/(1+sigma) downweights rows dominated by active bounds
    # (their residual is absorbed by the bound duals).
    dual_refine_k: int = 0
    # Eager penalty: shrink gamma at *every* outer update while
    # feasibility misses target (not only on stalls).  Faster feasibility
    # contraction (~gamma_shrink per outer instead of the multiplier
    # update's ~0.5) at the cost of a stiffer condensed system; safe with
    # saddle refinement + float32 down to gamma ~1e-4 in scaled units.
    gamma_eager: bool = False
    # Shamanskii / chord acceleration: one KKT factorization serves
    # ``factor_reuse`` consecutive Newton steps (the first with a fresh
    # factor, the rest re-solving fresh right-hand sides against the
    # stale one).  Rationale (measured r05, scratch/time_surgery.py):
    # the factor+border-column solve is ~60% of a TPU solver iteration,
    # while a re-solve against a stored factorization is nearly free —
    # so reuse=2 cuts the per-iteration cost ~35% at the classical
    # Shamanskii convergence order (m+1 per cycle).  Stale-direction
    # safety is unchanged: every sub-step keeps the descent check, the
    # Armijo line search and the delta_w escalation.  Requires a KKT
    # backend exposing ``.prepare`` (the condensed backend does);
    # silently ignored otherwise.  Per-lane iteration counters advance
    # per sub-step; a while-loop exit can overshoot ``params.max_iter``
    # by at most reuse-1 iterations.
    factor_reuse: int = 1
    verbose: bool = False


class ALMParams(NamedTuple):
    """Runtime solver numerics — every field a traced scalar.

    Pass through jit boundaries as an argument so tolerance/schedule tuning
    never recompiles the while-loop program.  ``gamma_eager`` rides along
    as a 0/1 float; ``max_iter`` as an int32 (must stay <= the static
    ``ALMOptions.max_iter`` in trace mode, where the scan length is fixed).
    """

    tol: jax.Array
    feas_tol: jax.Array            # resolved: 0 -> tol
    mu_init: jax.Array
    mu_min: jax.Array              # resolved: 0 -> min(tol/10, mu_init)
    mu_shrink: jax.Array
    theta_mu: jax.Array
    gamma_init: jax.Array
    gamma_min: jax.Array
    gamma_shrink: jax.Array
    prox: jax.Array
    eta: jax.Array
    tau_min: jax.Array
    kappa_inner: jax.Array
    delta_decay: jax.Array
    gamma_eager: jax.Array         # 0/1
    max_iter: jax.Array            # int32

    @staticmethod
    def from_options(opts: ALMOptions, dtype=jnp.float32) -> "ALMParams":
        feas = opts.feas_tol if opts.feas_tol > 0 else opts.tol
        mu_min = (opts.mu_min if opts.mu_min > 0
                  else min(opts.tol / 10.0, opts.mu_init))
        f = lambda x: jnp.asarray(x, dtype)
        return ALMParams(
            tol=f(opts.tol), feas_tol=f(feas), mu_init=f(opts.mu_init),
            mu_min=f(mu_min), mu_shrink=f(opts.mu_shrink),
            theta_mu=f(opts.theta_mu), gamma_init=f(opts.gamma_init),
            gamma_min=f(opts.gamma_min), gamma_shrink=f(opts.gamma_shrink),
            prox=f(opts.prox), eta=f(opts.eta), tau_min=f(opts.tau_min),
            kappa_inner=f(opts.kappa_inner), delta_decay=f(opts.delta_decay),
            gamma_eager=f(1.0 if opts.gamma_eager else 0.0),
            max_iter=jnp.asarray(opts.max_iter, jnp.int32),
        )


class Phase1(NamedTuple):
    """In-loop continuation: per-lane exploration phase before the endgame.

    ``params`` drive iterations while a lane is in phase 0 (typically
    loose: tol ~1e-12 so the lane never converges there, no prox).  The
    lane switches to the endgame params when its cost descent stalls —
    ``patience`` consecutive accepted steps with relative cost decrease
    below ``exit_df`` — or at ``n_max`` iterations, whichever is first.
    At the switch the outer multiplier absorbs the AL view (yhat + c/gamma),
    mu/gamma restart at the endgame schedule, and the bound duals re-center
    exactly as a warm-started fresh solve would.
    """

    params: ALMParams
    n_max: jax.Array               # int32: hard cap on phase-0 iterations
    exit_df: jax.Array             # relative cost-decrease stall threshold
    patience: int = 3              # static: consecutive slow iters to exit


class ALMState(NamedTuple):
    v: jax.Array
    v_ref: jax.Array      # proximal center (last outer iterate)
    yhat: jax.Array       # outer multiplier estimate
    y_ls: jax.Array       # least-squares refined multiplier (dual_refine_k)
    zl: jax.Array
    zu: jax.Array
    mu: jax.Array
    gamma: jax.Array
    delta_w: jax.Array
    theta_ref: jax.Array  # feasibility at last outer update
    it: jax.Array
    converged: jax.Array
    kkt_err: jax.Array
    phase: jax.Array      # int32: 0 = exploration, 1 = endgame
    f_prev: jax.Array     # cost at previous iterate (phase-0 exit test)
    slow: jax.Array       # int32: consecutive slow phase-0 iterations
    n0: jax.Array         # int32: iterations spent in phase 0


class ALMResult(NamedTuple):
    v: jax.Array
    y: jax.Array          # final multiplier estimate (yhat + c/gamma)
    zl: jax.Array
    zu: jax.Array
    f: jax.Array
    iterations: jax.Array
    converged: jax.Array
    kkt_err: jax.Array
    constr_viol: jax.Array
    phase1_iters: jax.Array | None = None  # iterations spent in phase 0
    trace: tuple | None = None   # opts.trace: per-iter (kkt, mu, gamma, dw, viol, f)
    state: "ALMState | None" = None  # keep_state=True: full resumable state


def _inf_norm(x):
    return jnp.max(jnp.abs(x)) if x.size else jnp.zeros(())


def phase_switch_state(can: CanonicalNLP, st: "ALMState", p2: ALMParams,
                       inst=None) -> "ALMState":
    """Exploration -> endgame transition on a *saved* state (the split-
    program continuation: run the dive in one compiled program — e.g. with
    a cheaper KKT chain — and resume the endgame in another via
    ``state0``).  Performs exactly what the in-loop ``Phase1`` switch does
    (alm.py step(): ``leave`` branch): absorb the AL multiplier view,
    restart the barrier/penalty schedules at the endgame values, re-center
    the prox reference and bound duals.  vmap over stacked states for
    batches."""
    inst = can.nlp._inst(inst)
    lb, ub, fixed = can.bounds(inst)
    has_lb = (lb > -_BIG) & ~fixed
    has_ub = (ub < _BIG) & ~fixed
    dtype = st.v.dtype
    cv = can.c(st.v, inst)
    y = st.yhat + cv / st.gamma
    mu2 = p2.mu_init.astype(dtype)
    dl = jnp.where(has_lb, st.v - lb, 1.0)
    du = jnp.where(has_ub, ub - st.v, 1.0)
    return st._replace(
        yhat=y, mu=mu2, gamma=p2.gamma_init.astype(dtype),
        v_ref=st.v, theta_ref=_inf_norm(cv),
        zl=jnp.where(has_lb, mu2 / dl, 0.0),
        zu=jnp.where(has_ub, mu2 / du, 0.0),
        delta_w=jnp.zeros((), dtype),
        phase=jnp.ones((), jnp.int32),
        f_prev=can.f(st.v, inst),
        slow=jnp.zeros((), jnp.int32),
    )


def _cg(Aop, b, x0, k):
    """k fixed CG steps on the (consistent, PSD) system A x = b."""
    x = x0
    r = b - Aop(x)
    p = r
    rs = r @ r
    for _ in range(k):
        Ap = Aop(p)
        denom = p @ Ap
        alpha = jnp.where(denom > 0, rs / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = r @ r
        beta = rs_new / jnp.maximum(rs, 1e-30)
        p = r + beta * p
        rs = rs_new
    return jnp.where(jnp.all(jnp.isfinite(x)), x, x0)


class _Kernel(NamedTuple):
    """The per-instance solver kernel — init + one damped-Newton substep —
    extracted from :func:`solve` so batch-level drivers (the two-body
    dive/endgame loop in ``tol_tpu/solver/batch.py``) can reuse the exact
    production step under their own loop structure."""

    init_state: Callable   # (p_start, p2, in_phase1) -> ALMState
    substep: Callable      # (st, ap_stale, p1, p2, phase1) -> (ALMState, ap)
    kkt_errors: Callable   # (v, y, zl, zu, mu) -> (err, viol, e_d, e_c)
    f_fn: Callable
    c_fn: Callable


def make_kernel(can: CanonicalNLP, kkt_solve: Callable, opts: ALMOptions,
                inst, v0: jax.Array, y0: jax.Array | None = None) -> _Kernel:
    """Build the solver kernel closures for one instance (see
    :class:`_Kernel`).  ``substep`` computes its effective runtime params
    from the lane's phase flag when ``phase1`` is passed (the in-loop
    continuation of :func:`solve`), or uses ``p2`` directly when
    ``phase1`` is None — the batch-level two-body driver passes the dive
    params as ``p2`` during the dive (states hold ``phase=0`` so the
    convergence flag stays off) and the endgame params after the switch.
    """

    inst = can.nlp._inst(inst)
    lb, ub, fixed = can.bounds(inst)
    has_lb = (lb > -_BIG) & ~fixed
    has_ub = (ub < _BIG) & ~fixed
    dtype = v0.dtype

    f_fn = lambda v: can.f(v, inst)
    c_fn = lambda v: can.c(v, inst)
    grad_f = jax.grad(f_fn)
    grad_lag = jax.grad(lambda v, y: f_fn(v) + c_fn(v) @ y, argnums=0)

    def interior_push(v):
        pl = jnp.where(has_lb, lb + opts.bound_push * jnp.maximum(1.0, jnp.abs(lb)), -jnp.inf)
        pu = jnp.where(has_ub, ub - opts.bound_push * jnp.maximum(1.0, jnp.abs(ub)), jnp.inf)
        mid = 0.5 * (lb + ub)
        both = has_lb & has_ub & (pl > pu)
        v = jnp.clip(v, pl, pu)
        v = jnp.where(both, mid, v)
        return jnp.where(fixed, lb, v)

    def barrier(v):
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        ok = jnp.all(dl > 0) & jnp.all(du > 0)
        val = (jnp.sum(jnp.where(has_lb, jnp.log(dl), 0.0))
               + jnp.sum(jnp.where(has_ub, jnp.log(du), 0.0)))
        return val, ok

    def al_of(f_v, cv, v, v_ref, rho, yhat, gamma, mu):
        """AL merit from precomputed f(v), c(v)."""
        bar, ok = barrier(v)
        pv = v - v_ref
        val = (f_v + yhat @ cv + (cv @ cv) / (2.0 * gamma)
               + 0.5 * rho * (pv @ pv) - mu * bar)
        return jnp.where(ok, val, jnp.inf)

    def al_value(v, v_ref, rho, yhat, gamma, mu):
        return al_of(f_fn(v), c_fn(v), v, v_ref, rho, yhat, gamma, mu)

    def _kkt_parts(v, y, zl, zu):
        """Shared pieces of the KKT error (one gradient/constraint eval)."""
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        r_d = grad_lag(v, y) - jnp.where(has_lb, zl, 0.0) + jnp.where(has_ub, zu, 0.0)
        r_d = jnp.where(fixed, 0.0, r_d)
        theta = c_fn(v)
        comp_l = jnp.where(has_lb, zl * dl, 0.0)
        comp_u = jnp.where(has_ub, zu * du, 0.0)
        nz = jnp.sum(has_lb) + jnp.sum(has_ub)
        s_d = jnp.maximum(
            opts.s_max,
            (jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu)))
            / jnp.maximum(1, can.m + nz)) / opts.s_max
        s_c = jnp.maximum(
            opts.s_max,
            (jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))) / jnp.maximum(1, nz)) / opts.s_max
        return r_d, theta, comp_l, comp_u, s_d, s_c

    def _errors_at(parts, mu):
        r_d, theta, comp_l, comp_u, s_d, s_c = parts
        comp = jnp.maximum(
            _inf_norm(jnp.where(has_lb, comp_l - mu, 0.0)),
            _inf_norm(jnp.where(has_ub, comp_u - mu, 0.0)))
        e_d = _inf_norm(r_d) / s_d
        e_p = _inf_norm(theta)
        e_c = comp / s_c
        return jnp.maximum(jnp.maximum(e_d, e_p), e_c), e_p, e_d, e_c

    def kkt_errors(v, y, zl, zu, mu):
        """KKT error of the *original* NLP at multiplier estimate y."""
        return _errors_at(_kkt_parts(v, y, zl, zu), mu)

    def init_state(p0: ALMParams, p2: ALMParams, in_phase1: bool):
        v = interior_push(v0)
        mu = p0.mu_init.astype(dtype)
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        zl = jnp.where(has_lb, mu / dl, 0.0)
        zu = jnp.where(has_ub, mu / du, 0.0)
        yhat = jnp.zeros(can.m, dtype) if y0 is None else jnp.asarray(y0, dtype)
        cv = c_fn(v)
        err, *_ = kkt_errors(v, yhat, zl, zu, 0.0)
        return ALMState(
            v=v, v_ref=v, yhat=yhat, y_ls=yhat, zl=zl, zu=zu, mu=mu,
            gamma=p0.gamma_init.astype(dtype),
            delta_w=jnp.zeros((), dtype),
            theta_ref=_inf_norm(cv),
            it=jnp.zeros((), jnp.int32),
            converged=(err <= p2.tol) & jnp.asarray(not in_phase1),
            kkt_err=err,
            phase=jnp.asarray(0 if in_phase1 else 1, jnp.int32),
            f_prev=f_fn(v),
            slow=jnp.zeros((), jnp.int32),
            n0=jnp.zeros((), jnp.int32),
        )

    def substep(st: ALMState, ap_stale, p1: ALMParams, p2: ALMParams,
                phase1: Phase1 | None):
        """One damped-Newton step.  ``ap_stale``: a KKT apply closure
        from a previous sub-step's factorization (chord step), or None
        for a fresh factorization.  Returns (new_state, apply_closure).
        """
        # Per-lane effective runtime params (phase continuation).
        if phase1 is not None:
            ph0 = st.phase == 0
            eff = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ph0, a, b), p1, p2)
        else:
            eff = p2
        rho = eff.prox.astype(dtype)

        v, yhat, zl, zu = st.v, st.yhat, st.zl, st.zu
        mu, gamma = st.mu, st.gamma
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        sigma = jnp.where(has_lb, zl / dl, 0.0) + jnp.where(has_ub, zu / du, 0.0)

        f_v = f_fn(v)
        cv = c_fn(v)
        y_al = yhat + cv / gamma

        # grad of AL_mu (with primal-dual barrier handled via sigma/rhs).
        g_al = (grad_lag(v, y_al)
                + rho * (v - st.v_ref)
                - jnp.where(has_lb, mu / dl, 0.0)
                + jnp.where(has_ub, mu / du, 0.0))
        rhs_v = jnp.where(fixed, 0.0, -g_al)
        rhs_c = jnp.zeros(can.m, dtype)

        delta_w = st.delta_w
        gamma_rows = jnp.broadcast_to(gamma, (can.m,)).astype(dtype)
        # The prox Hessian rho*I rides the same diagonal shift channel.
        if ap_stale is not None:
            ap = ap_stale
            dv, dw = ap(rhs_v, rhs_c)
        elif hasattr(kkt_solve, "prepare"):
            ap = kkt_solve.prepare(v, y_al, sigma, delta_w + rho,
                                   gamma_rows, inst)
            dv, dw = ap(rhs_v, rhs_c)
        else:
            ap = None
            dv, dw = kkt_solve(v, y_al, sigma, delta_w + rho, gamma_rows,
                               rhs_v, rhs_c, inst)
        bad = ~(jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(dw)))
        dv = jnp.where(bad, 0.0, dv)
        dw = jnp.where(bad, 0.0, dw)

        # Descent check: the backend may convexify its Hessian blocks, so
        # test the direction itself rather than true-Hessian curvature.
        curv_ok = (g_al @ dv) < 0.0

        tau = jnp.maximum(eff.tau_min.astype(dtype), 1.0 - mu)

        def ftb(slack, dslack):
            ratio = jnp.where(dslack < 0, -tau * slack / jnp.where(dslack < 0, dslack, -1.0), 1.0)
            return jnp.minimum(1.0, jnp.min(jnp.where(jnp.isfinite(ratio), ratio, 1.0)))

        a_max = jnp.minimum(
            ftb(jnp.where(has_lb, dl, 1.0), jnp.where(has_lb, dv, 0.0)),
            ftb(jnp.where(has_ub, du, 1.0), jnp.where(has_ub, -dv, 0.0)),
        )

        # Plain Armijo on the smooth AL merit, trials in parallel.  Each
        # trial's (f, c) are kept: the accepted point's evaluations are
        # reused below instead of re-evaluating f/c at v_n (one full
        # constraint+cost evaluation saved per iteration).
        al0 = al_of(f_v, cv, v, st.v_ref, rho, yhat, gamma, mu)
        d_al = g_al @ dv
        alphas = a_max * (0.5 ** jnp.arange(opts.max_ls, dtype=dtype))

        def al_trial(a):
            vt = v + a * dv
            ft = f_fn(vt)
            ct = c_fn(vt)
            return al_of(ft, ct, vt, st.v_ref, rho, yhat, gamma, mu), ft, ct

        al_vals, f_tr, c_tr = jax.vmap(al_trial)(alphas)
        ok = al_vals <= al0 + eff.eta.astype(dtype) * alphas * d_al
        any_ok = jnp.any(ok)
        alpha = jnp.where(any_ok, alphas[jnp.argmax(ok)], 0.0)
        # Sub-noise regime: when even the full step's predicted decrease is
        # below merit evaluation noise, Armijo outcomes are coin flips (the
        # float32 endgame); take the full step unconditionally — damped
        # Newton is locally convergent without a line search.
        eps_m = jnp.asarray(jnp.finfo(dtype).eps, dtype)
        noise = 30.0 * eps_m * (1.0 + jnp.abs(al0))
        sub_noise = (jnp.abs(d_al) * a_max <= noise)
        alpha = jnp.where(sub_noise, a_max, alpha)
        any_ok = any_ok | sub_noise
        # In the sub-noise regime the sign of d_al is itself noise, so the
        # descent test is waived there too.
        alpha = jnp.where(bad | (~curv_ok & ~sub_noise), 0.0, alpha)

        reject = bad | (~curv_ok & ~sub_noise) | ~any_ok
        # NaN (failed factorization) escalates the shift aggressively; a
        # merit rejection more gently.
        delta_grown = jnp.where(
            bad,
            jnp.maximum(1e-2, delta_w * 30.0),
            jnp.where(delta_w == 0.0, 1e-6, delta_w * 10.0))
        delta_next = jnp.where(
            reject,
            jnp.minimum(delta_grown, opts.delta_w_max),
            jnp.where(delta_w * eff.delta_decay.astype(dtype) < opts.delta_w_min,
                      0.0, delta_w * eff.delta_decay.astype(dtype)),
        )

        v_n = v + alpha * dv

        # Bound-dual updates along the realized move.
        dzl = jnp.where(has_lb, (mu - zl * dl) / dl - zl / dl * (v_n - v), 0.0)
        dzu = jnp.where(has_ub, (mu - zu * du) / du + zu / du * (v_n - v), 0.0)
        a_dual = jnp.minimum(
            ftb(jnp.where(has_lb, zl, 1.0), jnp.where(has_lb, dzl, 0.0)),
            ftb(jnp.where(has_ub, zu, 1.0), jnp.where(has_ub, dzu, 0.0)),
        )
        zl_n = zl + a_dual * dzl
        zu_n = zu + a_dual * dzu
        dl_n = jnp.where(has_lb, v_n - lb, 1.0)
        du_n = jnp.where(has_ub, ub - v_n, 1.0)
        ks = opts.kappa_sigma
        zl_n = jnp.where(has_lb, jnp.clip(zl_n, mu / (ks * dl_n), ks * mu / dl_n), 0.0)
        zu_n = jnp.where(has_ub, jnp.clip(zu_n, mu / (ks * du_n), ks * mu / du_n), 0.0)

        # ---- inner convergence test at the new point ----
        # (f, c) at v_n come from the accepted line-search trial: alpha is
        # either exactly alphas[sel] (Armijo pick, or alphas[0] = a_max in
        # the sub-noise full-step regime) or 0 (rejection, v_n == v).
        sel = jnp.where(sub_noise, 0, jnp.argmax(ok))
        f_n = jnp.where(alpha > 0.0, f_tr[sel], f_v)
        c_n = jnp.where(alpha > 0.0, c_tr[sel], cv)
        y_n = yhat + c_n / gamma
        parts_n = _kkt_parts(v_n, y_n, zl_n, zu_n)
        err_in, th_in, e_d_in, e_c_in = _errors_at(parts_n, mu)

        # ---- least-squares dual refinement (see ALMOptions) ----
        if opts.dual_refine_k > 0:
            _, jvp_c = jax.linearize(c_fn, v_n)
            _, vjp_c = jax.vjp(c_fn, v_n)
            g0 = (grad_f(v_n) - jnp.where(has_lb, zl_n, 0.0)
                  + jnp.where(has_ub, zu_n, 0.0))
            sig_n = (jnp.where(has_lb, zl_n / dl_n, 0.0)
                     + jnp.where(has_ub, zu_n / du_n, 0.0))
            w2 = jnp.where(fixed, 0.0, 1.0 / (1.0 + sig_n))
            Nop = lambda yy: jvp_c(w2 * vjp_c(yy)[0])
            # Warm start from y_n: the AL multiplier view carries the
            # null(J^T)-component CG cannot build from scratch (CG only
            # moves in range space; starting from zero the ill-conditioned
            # directions take hundreds of steps).
            y_ls = _cg(Nop, -jvp_c(w2 * g0), y_n, opts.dual_refine_k)
            r_ls = jnp.where(fixed, 0.0, g0 + vjp_c(y_ls)[0])
            # Absorb the leftover into the bound duals where a bound is
            # (near-)active, capped so the scaled complementarity stays
            # below tol: any (y, z >= 0) is a valid KKT certificate.
            cap = 0.5 * eff.tol.astype(dtype)
            d_l = jnp.where(
                has_lb,
                jnp.clip(r_ls, -zl_n, jnp.maximum(cap / dl_n - zl_n, 0.0)),
                0.0)
            left = r_ls - d_l
            d_u = jnp.where(
                has_ub,
                jnp.clip(-left, -zu_n, jnp.maximum(cap / du_n - zu_n, 0.0)),
                0.0)
            r_ls = r_ls - d_l + d_u
            zl_ls = zl_n + d_l
            zu_ls = zu_n + d_u
            comp_l_ls = jnp.where(has_lb, zl_ls * dl_n, 0.0)
            comp_u_ls = jnp.where(has_ub, zu_ls * du_n, 0.0)
            _, theta_n_, _, _, _, _ = parts_n
            nz = jnp.sum(has_lb) + jnp.sum(has_ub)
            s_d_ls = jnp.maximum(
                opts.s_max,
                (jnp.sum(jnp.abs(y_ls)) + jnp.sum(jnp.abs(zl_ls))
                 + jnp.sum(jnp.abs(zu_ls)))
                / jnp.maximum(1, can.m + nz)) / opts.s_max
            s_c_ls = jnp.maximum(
                opts.s_max,
                (jnp.sum(jnp.abs(zl_ls)) + jnp.sum(jnp.abs(zu_ls)))
                / jnp.maximum(1, nz)) / opts.s_max
            parts_ls = (r_ls, theta_n_, comp_l_ls, comp_u_ls, s_d_ls, s_c_ls)
        else:
            y_ls = st.y_ls
            parts_ls = None
        inner_err = jnp.maximum(e_d_in, e_c_in)   # feasibility handled by outer
        inner_done = inner_err <= eff.kappa_inner.astype(dtype) * mu
        if opts.stagnation_outer:
            # A tiny Newton direction from the (PD-regularized) system means
            # the inner problem is solved to working precision regardless of
            # what the merit bookkeeping says (near stationarity the
            # directional derivative underflows and Armijo can reject
            # noise-level steps forever).  Liveness: either steps are
            # accepted, or delta_w escalates until dv shrinks, which then
            # triggers the outer update.
            # Must be a *successful* solve: a NaN-rejected step is zeroed
            # by the guard above and must not masquerade as stagnation
            # (that would shrink gamma while the subproblem is unsolved —
            # a stiffness death spiral).
            stagnated = (~bad) & (_inf_norm(dv) <= 1e-5 * (1.0 + _inf_norm(v)))
            inner_done = inner_done | stagnated

        # ---- outer updates, applied only when the inner problem is done ----
        # Multiplier update; shrink gamma unless feasibility improved enough.
        theta_now = th_in
        feas_target = eff.feas_tol.astype(dtype)
        # Penalty policy: multiplier updates are the primary driver of
        # feasibility (theta ~ gamma * ||yhat - y*|| contracts per outer at
        # FIXED gamma); shrink gamma only when an outer update made almost
        # no feasibility progress (a genuine stall), and never once the
        # target is met.  Over-shrinking is poison twice over: the
        # condensed system turns ~1/gamma stiff (in float32 the objective
        # curvature is erased entirely, stalling tangential optimization),
        # and c/gamma amplifies feasibility noise into the duals.
        stalled = (theta_now > 0.9 * st.theta_ref) | (eff.gamma_eager > 0)
        need_feas = theta_now > feas_target
        # Keep tightening while the KKT certificate is open, not only while
        # infeasible: on problems where constraint relaxation subsidizes
        # the objective (G7's defect slop feeds energy into the gait), the
        # iterate reaches the feasibility target long before the multiplier
        # converges, and at fixed gamma the first-order dual update crawls
        # (error contracts ~ gamma per outer round).  Observed on G7
        # ts=100: cost drifting 0.10 -> 0.98 over 400 iterations with the
        # dual residual pinned at ~1.8e-2 under the feasibility-only rule.
        need_more = need_feas | (st.kkt_err > eff.tol.astype(dtype))
        gamma_n = jnp.where(
            inner_done & stalled & need_more,
            jnp.maximum(eff.gamma_min.astype(dtype),
                        gamma * eff.gamma_shrink.astype(dtype)), gamma)
        # Penalty relaxation: once feasibility beats the requirement by a
        # wide margin (and the certificate is closed), a tighter gamma only
        # adds stiffness.
        gamma_n = jnp.where(
            inner_done & (theta_now <= 0.02 * feas_target) & ~need_more,
            jnp.minimum(gamma_n * 2.0, eff.gamma_init.astype(dtype)), gamma_n)
        mu_n = jnp.where(
            inner_done,
            jnp.maximum(eff.mu_min.astype(dtype),
                        jnp.minimum(eff.mu_shrink.astype(dtype) * mu,
                                    mu ** eff.theta_mu.astype(dtype))),
            mu)
        yhat_n = jnp.where(inner_done, y_n, yhat)
        theta_ref_n = jnp.where(inner_done, theta_now, st.theta_ref)
        v_ref_n = jnp.where(inner_done, v_n, st.v_ref)

        err0, viol, *_ = _errors_at(parts_n, 0.0)
        if parts_ls is not None:
            err0_ls, _, _, _ = _errors_at(parts_ls, 0.0)
            err0 = jnp.minimum(err0, err0_ls)
        conv = (err0 <= eff.tol.astype(dtype)) & (viol <= feas_target) \
            & (st.phase == 1)

        # ---- phase-0 exit: cost-descent stall detection ----
        if phase1 is not None:
            rel_df = (st.f_prev - f_n) / jnp.maximum(jnp.abs(f_n), 1e-12)
            is_slow = rel_df < phase1.exit_df.astype(dtype)
            slow_n = jnp.where(
                reject, st.slow,                        # rejected: no signal
                jnp.where(is_slow, st.slow + 1, jnp.zeros((), jnp.int32)))
            leave = (st.phase == 0) & (
                (slow_n >= phase1.patience) | (st.it + 1 >= phase1.n_max))
            # Switch to endgame: absorb the AL multiplier view, restart the
            # barrier/penalty schedules, re-center prox and bound duals —
            # exactly what a warm-started second solve would do.
            mu2 = p2.mu_init.astype(dtype)
            phase_n = jnp.where(leave, 1, st.phase).astype(jnp.int32)
            yhat_n = jnp.where(leave, y_n, yhat_n)
            mu_n = jnp.where(leave, mu2, mu_n)
            gamma_n = jnp.where(leave, p2.gamma_init.astype(dtype), gamma_n)
            v_ref_n = jnp.where(leave, v_n, v_ref_n)
            theta_ref_n = jnp.where(leave, theta_now, theta_ref_n)
            zl_n = jnp.where(leave & has_lb, mu2 / dl_n, zl_n)
            zu_n = jnp.where(leave & has_ub, mu2 / du_n, zu_n)
        else:
            phase_n = st.phase
            slow_n = st.slow

        if opts.verbose:
            jax.debug.print(
                "it={it} ph={ph} mu={mu:.1e} gam={gam:.1e} err0={e:.3e} th={th:.3e} "
                "in={inn:.2e} a={a:.2e} amax={am:.2e} dw={dw:.1e} f={f:.6e} "
                "ok={ok} cv={cvt} outer={od} dal={dal:.2e}",
                it=st.it, ph=st.phase, mu=mu, gam=gamma, e=err0, th=viol,
                inn=inner_err, a=alpha, am=a_max, dw=delta_w, f=f_n, ok=any_ok,
                cvt=curv_ok, od=inner_done, dal=d_al)

        new = ALMState(
            v=v_n, v_ref=v_ref_n, yhat=yhat_n, y_ls=y_ls,
            zl=zl_n, zu=zu_n, mu=mu_n, gamma=gamma_n,
            delta_w=delta_next, theta_ref=theta_ref_n, it=st.it + 1,
            converged=conv, kkt_err=err0,
            phase=phase_n, f_prev=f_n, slow=slow_n,
            n0=st.n0 + (st.phase == 0).astype(jnp.int32),
        )
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(st.converged, a, b),
            st._replace(it=st.it + 1), new), ap

    return _Kernel(init_state=init_state, substep=substep,
                   kkt_errors=kkt_errors, f_fn=f_fn, c_fn=c_fn)


def solve(
    can: CanonicalNLP,
    kkt_solve: Callable,
    opts: ALMOptions = ALMOptions(),
    inst=None,
    v0: jax.Array | None = None,
    y0: jax.Array | None = None,
    params: ALMParams | None = None,
    phase1: Phase1 | None = None,
    state0: "ALMState | None" = None,
    keep_state: bool = False,
) -> ALMResult:
    """Solve one canonical NLP instance.

    Batch by vmapping over stacked ``inst`` pytrees and/or ``v0``.
    ``params``/``phase1`` are runtime pytrees — pass them through jit as
    arguments to retune without recompiling.

    ``state0`` resumes a previous partial solve exactly where it stopped
    (pass ``keep_state=True`` on the first call to get ``result.state``;
    the iteration counter continues, so ``params.max_iter`` stays a
    *total* per-lane budget).  The straggler-drain pattern: run the big
    batch to a runtime cap, host-gather the unconverged lanes' states
    into a small batch, resume them in a second (cheaper) program.
    """

    inst = can.nlp._inst(inst)
    if v0 is None:
        v0 = can.initial_point(inst)
    dtype = v0.dtype

    p2 = params if params is not None else ALMParams.from_options(opts, dtype)
    p1 = phase1.params if phase1 is not None else p2

    kern = make_kernel(can, kkt_solve, opts, inst, v0, y0)
    f_fn, c_fn, kkt_errors = kern.f_fn, kern.c_fn, kern.kkt_errors

    def step(st: ALMState) -> ALMState:
        st_n, ap = kern.substep(st, None, p1, p2, phase1)
        # Chord sub-steps against the stored factorization (see
        # ALMOptions.factor_reuse).  ap is None only for backends
        # without .prepare, where reuse silently degrades to fresh
        # solves per sub-step.
        for _ in range(max(0, opts.factor_reuse - 1)):
            st_n, _ = kern.substep(st_n, ap, p1, p2, phase1)
        return st_n

    def cond(st: ALMState):
        return (~st.converged) & (st.it < p2.max_iter)

    # TPU matmuls default to bfloat16 passes; a Newton-KKT pipeline cannot
    # survive 8-bit mantissas.  "highest" forces true float32 MXU passes
    # (and is a no-op for float64 on CPU).
    with jax.default_matmul_precision("highest"):
        st_init = (kern.init_state(p1 if phase1 is not None else p2, p2,
                                   phase1 is not None)
                   if state0 is None else state0)
        if opts.trace:
            # Diagnostic mode: fixed-length scan recording per-iteration
            # scalars (works on TPU where debug callbacks are unavailable).
            def scan_step(st, _):
                st_n = jax.lax.cond(cond(st), step, lambda s: s, st)
                rec = (st_n.kkt_err, st_n.mu, st_n.gamma, st_n.delta_w,
                       _inf_norm(c_fn(st_n.v)), st_n.f_prev)
                return st_n, rec
            final, trace = jax.lax.scan(scan_step, st_init, None,
                                        length=opts.max_iter)
        else:
            final = jax.lax.while_loop(cond, step, st_init)
            trace = None
        # The final reporting evals MUST stay inside the highest-precision
        # scope: with TPU-default bf16 matmul passes the slack-scatter
        # product in c_fn alone injects ~1e-3 of noise into the reported
        # violation (measured on G7, whose two inequality rows carry
        # slacks), silently failing solves the loop itself certified.
        cv = c_fn(final.v)
        y_fin = (final.y_ls if opts.dual_refine_k > 0
                 else final.yhat + cv / final.gamma)
        _, viol, *_ = kkt_errors(final.v, y_fin, final.zl, final.zu, 0.0)
        f_fin = f_fn(final.v)
    return ALMResult(
        v=final.v, y=y_fin, zl=final.zl, zu=final.zu,
        f=f_fin, iterations=final.it, converged=final.converged,
        kkt_err=final.kkt_err, constr_viol=viol,
        phase1_iters=final.n0, trace=trace,
        state=final if keep_state else None,
    )

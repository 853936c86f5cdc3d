"""Batched primal-dual interior-point NLP solver with l1 elastic mode.

This is the SNOPT replacement: where the reference drives a Fortran SQP
black box through a per-iteration file-dumping callback
(``DEFINEGusrfg_``, src/DefineFG.cpp:9-48; ``problem::runSNOPT``,
src/problem.cpp:1214-1240), this solver is one pure jittable function whose
iterations are a ``lax.while_loop`` — so thousands of problem instances
batch under ``vmap`` in lock-step, each carrying its own barrier parameter,
regularization and convergence flag.

Algorithm: monotone (Fiacco-McCormick) barrier interior point in the style
of IPOPT [Waechter & Biegler 2006], with SNOPT-style l1 elastic equality
constraints:

  * every equality row carries a pair of elastic slacks
    ``c(v) - p + q = 0,  p,q >= 0`` penalized ``rho*sum(p+q)`` — the exact
    l1 penalty SNOPT calls "elastic mode".  Eliminating (dp, dq, dzp, dzq)
    analytically turns them into an *adaptive diagonal dual regularization*
    ``D_y = p/zp + q/zq`` on the KKT system: linearized constraints are
    always satisfiable (perfect LICQ), multipliers are bounded (|y| <= rho),
    Newton steps are never forced through active variable bounds while far
    from feasibility — and D_y vanishes automatically as feasibility is
    reached, so no extrapolation bias survives at the solution.
  * bound constraints  l <= v <= u  via log barriers with primal-dual
    multipliers (zl, zu); one-sided/absent bounds masked; fixed variables
    (l == u) pinned out of the system.
  * fraction-to-boundary + backtracking line search on an l1 exact-penalty
    merit function (all trial points evaluated in parallel), with a
    second-order correction step against the same KKT matrix to defeat the
    Maratos effect near active constraints.
  * lagging adaptive inertia regularization: if no step is accepted the
    Hessian shift grows for the *next* iteration, so each iteration
    factors exactly once (lock-step batching stays cheap).

Iterates never evaluate the dynamics outside the current point — no file
I/O, no Python in the loop.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tol_tpu.solver.canonical import CanonicalNLP

_BIG = 1e19  # bounds beyond this are treated as absent


class IPMOptions(NamedTuple):
    tol: float = 1e-8            # final KKT tolerance (E_0)
    feas_tol: float = 0.0        # extra absolute feasibility requirement
    mu_init: float = 0.1
    elastic: bool = False        # l1 elastic mode (SNOPT-style)
    rho: float = 1e4             # l1 elastic penalty weight (> ||y*||_inf)
    # Optional dual relaxation schedule delta_c_eff ~ kappa_c*mu^2.
    # Default OFF: any relaxation makes the solved system disagree with the
    # l1 merit's theta by delta_c*||dy||_1, which can exceed the predicted
    # decrease and deadlock the line search.  Keep 0 unless experimenting.
    kappa_c: float = 0.0
    kappa_eps: float = 10.0      # barrier-subproblem tolerance factor
    kappa_mu: float = 0.2        # linear mu decrease rate
    theta_mu: float = 1.5        # superlinear mu decrease exponent
    tau_min: float = 0.99        # fraction-to-boundary floor
    max_iter: int = 300
    max_ls: int = 12             # backtracking halvings tried in parallel
    eta: float = 1e-6            # Armijo factor on the merit function
    delta_w_min: float = 1e-10
    delta_w_max: float = 1e4
    delta_c: float = 1e-12       # constraint-row regularization floor
    kappa_sigma: float = 1e10    # primal-dual multiplier safeguard
    bound_push: float = 1e-2     # initial-point interior push (kappa_1)
    elastic_push: float = 1e-2   # initial elastic slack interiority
    nu_init: float = 1.0         # merit penalty floor
    s_max: float = 100.0         # KKT error scaling threshold
    verbose: bool = False        # per-iteration jax.debug.print trace


class IPMState(NamedTuple):
    v: jax.Array
    y: jax.Array
    zl: jax.Array
    zu: jax.Array
    p: jax.Array          # elastic slack, c - p + q = 0
    q: jax.Array
    zp: jax.Array         # elastic bound duals
    zq: jax.Array
    mu: jax.Array
    tau: jax.Array
    delta_w: jax.Array    # lagging Hessian regularization level
    it: jax.Array
    converged: jax.Array
    kkt_err: jax.Array


class IPMResult(NamedTuple):
    v: jax.Array
    y: jax.Array
    zl: jax.Array
    zu: jax.Array
    f: jax.Array
    iterations: jax.Array
    converged: jax.Array
    kkt_err: jax.Array
    constr_viol: jax.Array


def _inf_norm(x):
    return jnp.max(jnp.abs(x)) if x.size else jnp.zeros(())


def solve(
    can: CanonicalNLP,
    kkt_solve: Callable,
    opts: IPMOptions = IPMOptions(),
    v0: jax.Array | None = None,
) -> IPMResult:
    """Solve one canonical NLP instance.  vmap over leading axes to batch.

    ``kkt_solve(v, y, sigma, delta_w, delta_c_rows, rhs_v, rhs_c)`` must
    return ``(dv, dy)`` for the system

        [ H + diag(sigma) + delta_w I   J^T              ] [dv]   [rhs_v]
        [ J                             -diag(delta_c_rows)] [dy] = [rhs_c]

    where ``delta_c_rows`` is a per-row (m,) vector.
    """

    lb, ub, fixed = can.lb, can.ub, can.fixed
    has_lb = (lb > -_BIG) & ~fixed
    has_ub = (ub < _BIG) & ~fixed

    if v0 is None:
        v0 = can.initial_point()
    dtype = v0.dtype
    elastic = bool(opts.elastic)
    rho = jnp.asarray(opts.rho if elastic else 0.0, dtype)

    grad_f = jax.grad(can.f)
    grad_lag = jax.grad(lambda v, y: can.f(v) + can.c(v) @ y, argnums=0)

    def lag_hvp(v, y, dv):
        """Hessian-of-Lagrangian vector product (for the curvature test)."""
        return jax.jvp(lambda v_: grad_lag(v_, y), (v,), (dv,))[1]

    def interior_push(v):
        pl = jnp.where(has_lb, lb + opts.bound_push * jnp.maximum(1.0, jnp.abs(lb)), -jnp.inf)
        pu = jnp.where(has_ub, ub - opts.bound_push * jnp.maximum(1.0, jnp.abs(ub)), jnp.inf)
        mid = 0.5 * (lb + ub)
        both = has_lb & has_ub & (pl > pu)
        v = jnp.clip(v, pl, pu)
        v = jnp.where(both, mid, v)
        return jnp.where(fixed, lb, v)

    def barrier_phi(v, p, q, mu):
        """Elastic barrier objective: f + rho*sum(p+q) - mu*sum(logs)."""
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        ok = jnp.all(dl > 0) & jnp.all(du > 0)
        phi = (can.f(v)
               - mu * (jnp.sum(jnp.where(has_lb, jnp.log(dl), 0.0))
                       + jnp.sum(jnp.where(has_ub, jnp.log(du), 0.0))))
        if elastic:
            ok = ok & jnp.all(p > 0) & jnp.all(q > 0)
            phi = phi + rho * jnp.sum(p + q) - mu * (jnp.sum(jnp.log(p))
                                                     + jnp.sum(jnp.log(q)))
        return jnp.where(ok, phi, jnp.inf)

    def kkt_errors(v, y, zl, zu, p, q, zp, zq, mu):
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        r_d = grad_lag(v, y) - jnp.where(has_lb, zl, 0.0) + jnp.where(has_ub, zu, 0.0)
        r_d = jnp.where(fixed, 0.0, r_d)
        zero_m = jnp.zeros(can.m, dtype)
        r_dp = rho - y - zp if elastic else zero_m
        r_dq = rho + y - zq if elastic else zero_m
        theta_true = can.c(v)
        comp = jnp.concatenate([
            jnp.where(has_lb, zl * dl - mu, 0.0),
            jnp.where(has_ub, zu * du - mu, 0.0),
            p * zp - mu if elastic else zero_m,
            q * zq - mu if elastic else zero_m,
        ])
        nz = jnp.sum(has_lb) + jnp.sum(has_ub) + 2 * can.m
        s_d = jnp.maximum(
            opts.s_max,
            (jnp.sum(jnp.abs(y)) + jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu))
             + jnp.sum(jnp.abs(zp)) + jnp.sum(jnp.abs(zq)))
            / jnp.maximum(1, can.m + nz),
        ) / opts.s_max
        s_c = jnp.maximum(
            opts.s_max,
            (jnp.sum(jnp.abs(zl)) + jnp.sum(jnp.abs(zu)) + jnp.sum(jnp.abs(zp))
             + jnp.sum(jnp.abs(zq))) / jnp.maximum(1, nz),
        ) / opts.s_max
        e_d = jnp.maximum(_inf_norm(r_d),
                          jnp.maximum(_inf_norm(r_dp), _inf_norm(r_dq))) / s_d
        e_p = _inf_norm(theta_true)
        e_c = _inf_norm(comp) / s_c
        return jnp.maximum(jnp.maximum(e_d, e_p), e_c), e_p

    def init_state():
        v = interior_push(v0)
        mu = jnp.asarray(opts.mu_init, dtype)
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        zl = jnp.where(has_lb, mu / dl, 0.0)
        zu = jnp.where(has_ub, mu / du, 0.0)
        y = jnp.zeros(can.m, dtype)
        cv = can.c(v)
        if elastic:
            # Scale-consistent interior start: duals at rho/2 (between their
            # stationarity targets rho -+ y for y=0) and slacks on the
            # central path p = mu/zp.  Starting p at |c| instead makes the
            # first Newton step collapse p by orders of magnitude and the
            # fraction-to-boundary rule strangles every step.
            zp = jnp.full((can.m,), 0.5, dtype) * rho
            zq = jnp.full((can.m,), 0.5, dtype) * rho
            p = mu / zp
            q = mu / zq
        else:
            p = q = zp = zq = jnp.ones(can.m, dtype)
        err, _ = kkt_errors(v, y, zl, zu, p, q, zp, zq, 0.0)
        return IPMState(
            v=v, y=y, zl=zl, zu=zu, p=p, q=q, zp=zp, zq=zq, mu=mu,
            tau=jnp.asarray(opts.tau_min, dtype),
            delta_w=jnp.zeros((), dtype),
            it=jnp.zeros((), jnp.int32),
            converged=err <= opts.tol,
            kkt_err=err,
        )

    def step(st: IPMState) -> IPMState:
        v, y, zl, zu = st.v, st.y, st.zl, st.zu
        p, q, zp, zq = st.p, st.q, st.zp, st.zq
        mu = st.mu
        dl = jnp.where(has_lb, v - lb, 1.0)
        du = jnp.where(has_ub, ub - v, 1.0)
        sigma = jnp.where(has_lb, zl / dl, 0.0) + jnp.where(has_ub, zu / du, 0.0)

        g = grad_f(v)
        cv = can.c(v)
        c_el = cv - p + q

        # Condensed primal-dual rhs.
        rhs_v = -(grad_lag(v, y)
                  - jnp.where(has_lb, mu / dl, 0.0)
                  + jnp.where(has_ub, mu / du, 0.0))
        rhs_v = jnp.where(fixed, 0.0, rhs_v)
        # Elastic condensation: dp = (p/zp)(dy + gp), dq = (q/zq)(-dy + gq).
        if elastic:
            wp = p / zp
            wq = q / zq
            gp = mu / p + y - rho
            gq = mu / q - y - rho
        else:
            wp = wq = gp = gq = jnp.zeros(can.m, dtype)
        # Relaxation schedule: helps while infeasible, but must never be able
        # to dominate the merit's theta decrease — cap by the current
        # infeasibility over the multiplier scale.
        theta_inf = _inf_norm(c_el)
        dc_sched = jnp.minimum(opts.kappa_c * mu * mu,
                               0.1 * theta_inf / (1.0 + _inf_norm(y)))
        delta_c_rows = jnp.asarray(opts.delta_c, dtype) + dc_sched + wp + wq
        rhs_c = -c_el + wp * gp - wq * gq

        delta_w = st.delta_w
        dv, dy = kkt_solve(v, y, sigma, delta_w, delta_c_rows, rhs_v, rhs_c)
        bad = ~(jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(dy)))
        dv = jnp.where(bad, 0.0, dv)
        dy = jnp.where(bad, 0.0, dy)
        dp = wp * (dy + gp)
        dq = wq * (-dy + gq)

        # Inertia-free curvature test (Chiang & Zavala style): the step must
        # see positive curvature in the regularized Hessian metric.
        curv = (dv @ lag_hvp(v, y, dv) + jnp.sum(sigma * dv * dv)
                + delta_w * (dv @ dv))
        curv_ok = curv >= 1e-12 * (dv @ dv)

        # Fraction-to-boundary step limits (variables and elastics jointly).
        tau = st.tau

        def ftb(slack, dslack):
            ratio = jnp.where(dslack < 0, -tau * slack / jnp.where(dslack < 0, dslack, -1.0), 1.0)
            return jnp.minimum(1.0, jnp.min(jnp.where(jnp.isfinite(ratio), ratio, 1.0)))

        a_pri = jnp.minimum(
            jnp.minimum(
                ftb(jnp.where(has_lb, dl, 1.0), jnp.where(has_lb, dv, 0.0)),
                ftb(jnp.where(has_ub, du, 1.0), jnp.where(has_ub, -dv, 0.0))),
            jnp.minimum(ftb(p, dp), ftb(q, dq)),
        )
        # Trust-region style cap: along cost-flat / degenerate directions the
        # Newton step can be arbitrarily long (the S10 altitude subsystem is
        # exactly such a manifold); beyond ~10x the iterate scale the local
        # model is meaningless and the merit line search just thrashes.
        # Capping the step length keeps the linearization honest.
        step_cap = jnp.minimum(
            10.0 * (1.0 + _inf_norm(v)) / (_inf_norm(dv) + 1e-30),
            100.0 * (1.0 + _inf_norm(y)) / (_inf_norm(dy) + 1e-30),
        )
        a_pri = jnp.minimum(a_pri, jnp.minimum(1.0, step_cap))

        # l1 merit on the elastic residual; nu tracks the multiplier scale
        # without monotone memory.
        theta0 = jnp.sum(jnp.abs(c_el))
        nu = jnp.maximum(1.2 * _inf_norm(y + dy) + 0.1, opts.nu_init)
        phi0 = barrier_phi(v, p, q, mu)
        dphi = (g - jnp.where(has_lb, mu / dl, 0.0)
                + jnp.where(has_ub, mu / du, 0.0)) @ dv
        if elastic:
            dphi = dphi + (rho - mu / p) @ dp + (rho - mu / q) @ dq
        d_merit = dphi - nu * theta0

        alphas = a_pri * (0.5 ** jnp.arange(opts.max_ls, dtype=dtype))

        def merit_at(vt, pt, qt):
            return (barrier_phi(vt, pt, qt, mu)
                    + nu * jnp.sum(jnp.abs(can.c(vt) - pt + qt)))

        merits = jax.vmap(
            lambda a: merit_at(v + a * dv, p + a * dp, q + a * dq))(alphas)
        merit0 = phi0 + nu * theta0
        ok = merits <= merit0 + opts.eta * alphas * d_merit
        any_ok = jnp.any(ok)
        first = jnp.argmax(ok)
        alpha_bt = jnp.where(any_ok, alphas[first], alphas[-1])

        # Second-order correction (Maratos remedy): correct for constraint
        # curvature with an extra solve against the same KKT matrix.
        v_try = v + a_pri * dv
        p_try = p + a_pri * dp
        q_try = q + a_pri * dq
        c_try = can.c(v_try) - p_try + q_try
        d2, dy2 = kkt_solve(v, y, sigma, delta_w, delta_c_rows,
                            jnp.zeros_like(rhs_v), -c_try)
        soc_finite = jnp.all(jnp.isfinite(d2)) & jnp.all(jnp.isfinite(dy2))
        d2 = jnp.where(soc_finite, d2, 0.0)
        dy2 = jnp.where(soc_finite, dy2, 0.0)
        dp2 = wp * dy2
        dq2 = -wq * dy2
        a2 = jnp.minimum(
            jnp.minimum(
                ftb(jnp.where(has_lb, v_try - lb, 1.0), jnp.where(has_lb, d2, 0.0)),
                ftb(jnp.where(has_ub, ub - v_try, 1.0), jnp.where(has_ub, -d2, 0.0))),
            jnp.minimum(ftb(p_try, dp2), ftb(q_try, dq2)),
        )
        merit_soc = merit_at(v_try + a2 * d2, p_try + a2 * dp2, q_try + a2 * dq2)
        soc_ok = soc_finite & (merit_soc <= merit0 + opts.eta * a_pri * d_merit)

        use_soc = ~ok[0] & soc_ok
        alpha = jnp.where(use_soc, a_pri, alpha_bt)
        soc_scale = jnp.where(use_soc, a2, 0.0)

        accepted = any_ok | use_soc
        # With good curvature a merit failure still creeps by the smallest
        # trial step; with bad curvature (or NaNs) the step is rejected
        # outright and the Hessian shift grows for the next iteration.
        reject = bad | (~curv_ok & ~accepted)
        alpha = jnp.where(reject, 0.0, alpha)
        soc_scale = jnp.where(reject, 0.0, soc_scale)
        grew = bad | ~curv_ok
        delta_next = jnp.where(
            grew,
            jnp.where(delta_w == 0.0, 1e-4,
                      jnp.minimum(delta_w * 10.0, opts.delta_w_max)),
            jnp.where(delta_w * 0.2 < opts.delta_w_min, 0.0, delta_w * 0.2),
        )

        v_n = v + alpha * dv + soc_scale * d2
        y_n = y + alpha * dy + soc_scale * dy2
        p_n = p + alpha * dp + soc_scale * dp2
        q_n = q + alpha * dq + soc_scale * dq2

        # Dual steps along the realized primal move.
        dv_total = v_n - v
        dzl = jnp.where(has_lb, (mu - zl * dl) / dl - zl / dl * dv_total, 0.0)
        dzu = jnp.where(has_ub, (mu - zu * du) / du + zu / du * dv_total, 0.0)
        if elastic:
            dzp = (mu - p * zp) / p - zp / p * (p_n - p)
            dzq = (mu - q * zq) / q - zq / q * (q_n - q)
        else:
            dzp = dzq = jnp.zeros(can.m, dtype)
        a_dual = jnp.minimum(
            jnp.minimum(
                ftb(jnp.where(has_lb, zl, 1.0), jnp.where(has_lb, dzl, 0.0)),
                ftb(jnp.where(has_ub, zu, 1.0), jnp.where(has_ub, dzu, 0.0))),
            jnp.minimum(ftb(zp, dzp), ftb(zq, dzq)),
        )
        zl_n = zl + a_dual * dzl
        zu_n = zu + a_dual * dzu
        zp_n = zp + a_dual * dzp
        zq_n = zq + a_dual * dzq

        # Primal-dual safeguard (IPOPT eq. 16).
        dl_n = jnp.where(has_lb, v_n - lb, 1.0)
        du_n = jnp.where(has_ub, ub - v_n, 1.0)
        ks = opts.kappa_sigma
        zl_n = jnp.where(has_lb, jnp.clip(zl_n, mu / (ks * dl_n), ks * mu / dl_n), 0.0)
        zu_n = jnp.where(has_ub, jnp.clip(zu_n, mu / (ks * du_n), ks * mu / du_n), 0.0)
        if elastic:
            zp_n = jnp.clip(zp_n, mu / (ks * p_n), ks * mu / p_n)
            zq_n = jnp.clip(zq_n, mu / (ks * q_n), ks * mu / q_n)

        # Barrier update when the subproblem is solved to kappa_eps * mu.
        err_mu, _ = kkt_errors(v_n, y_n, zl_n, zu_n, p_n, q_n, zp_n, zq_n, mu)
        mu_min = opts.tol / 10.0
        mu_next = jnp.where(
            err_mu <= opts.kappa_eps * mu,
            jnp.maximum(mu_min, jnp.minimum(opts.kappa_mu * mu, mu ** opts.theta_mu)),
            mu,
        )
        tau_next = jnp.maximum(opts.tau_min, 1.0 - mu_next)

        err0, viol = kkt_errors(v_n, y_n, zl_n, zu_n, p_n, q_n, zp_n, zq_n, 0.0)
        conv = (err0 <= opts.tol) & (viol <= jnp.maximum(opts.feas_tol, opts.tol))

        if opts.verbose:
            jax.debug.print(
                "it={it} mu={mu:.2e} err0={e:.3e} theta={th:.3e} alpha={a:.2e} "
                "a_max={am:.2e} dw={dw:.1e} nu={nu:.1e} f={f:.6e} soc={soc} ok={ok} cv={cv} "
                "dphi={dphi:.3e} dm={dm:.3e} dpsi_min={dpsi:.3e} th0={th0:.3e} thmin={thmin:.3e}",
                it=st.it, mu=mu, e=err0, th=viol, a=alpha, am=a_pri,
                dw=delta_w, nu=nu, f=can.f(v_n), soc=use_soc, ok=accepted, cv=curv_ok,
                dphi=dphi, dm=d_merit, dpsi=merits[-1] - merit0, th0=theta0,
                thmin=jnp.sum(jnp.abs(can.c(v + alphas[-1] * dv) - (p + alphas[-1]*dp) + (q + alphas[-1]*dq))))

        new = IPMState(
            v=v_n, y=y_n, zl=zl_n, zu=zu_n, p=p_n, q=q_n, zp=zp_n, zq=zq_n,
            mu=mu_next, tau=tau_next, delta_w=delta_next, it=st.it + 1,
            converged=conv, kkt_err=err0,
        )
        # Frozen once converged (keeps batched lock-step semantics simple).
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(st.converged, a, b),
            st._replace(it=st.it + 1), new)

    def cond(st: IPMState):
        return (~st.converged) & (st.it < opts.max_iter)

    final = jax.lax.while_loop(cond, step, init_state())
    _, viol = kkt_errors(final.v, final.y, final.zl, final.zu,
                         final.p, final.q, final.zp, final.zq, 0.0)
    return IPMResult(
        v=final.v, y=final.y, zl=final.zl, zu=final.zu,
        f=can.f(final.v), iterations=final.it, converged=final.converged,
        kkt_err=final.kkt_err, constr_viol=viol,
    )

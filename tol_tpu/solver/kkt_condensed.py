"""Condensed-primal structured KKT backend (the production ALM path).

Solves the regularized saddle system

    [ H + Sigma + delta_w I   J^T          ] [dv]   [rhs_v]
    [ J                       -diag(Gamma) ] [dy] = [rhs_c]

by *eliminating the duals first* (Gamma > 0 strictly, e.g. the ALM penalty
gamma), leaving the condensed primal system

    ( H~ + J^T Gamma^-1 J ) dv = rhs_v + J^T Gamma^-1 rhs_c,
      dy = Gamma^-1 (J dv - rhs_c)

For the collocation NLPs the condensed matrix is block-TRIDIAGONAL in the
node variables (defect rows couple only neighbours) plus a small border
(z_0, dt, slacks): one forward ``lax.scan`` of 11x11 Cholesky steps + a
~13-wide dense border solve + a backward sweep.  The condensed matrix is
the augmented-Lagrangian Hessian — positive definite near minimizers with
the *exact* Hessian even though the Lagrangian's node blocks stay
indefinite there (the tol problems sit on cost-flat manifolds), so no
eigenvalue clamping is needed and fast local convergence survives.  Far
from the solution, indefiniteness surfaces as a Cholesky NaN which the
solver's delta_w escalation handles.

Numerical key point — saddle-level iterative refinement: the condensed
system has condition ~ ||J||^2/gamma, and the dual recovery divides by
Gamma, amplifying primal solve error by another 1/gamma.  A naive solve
therefore *increases* the outer dual residual once gamma is small (the
"crawl" failure mode observed at ts=100).  The factorization is computed
once and reused for refinement passes on the full saddle residual,
recovering both primal and dual accuracy at fixed cost (``refine``
passes, default 2).

Cost per instance: O(T * 11^3) — every operation a tiny batched matmul,
thousands of instances in lock-step under ``vmap`` on the MXU/VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS
from tol_tpu.ops.blocktri import cr_factor, cr_solve
from tol_tpu.ops.smallalg import (bmm, bmm_tn, bmv, bmv_t, chol_unrolled,
                                  spd_inverse, tri_solve_unrolled)
from tol_tpu.solver.canonical import CanonicalNLP

NS, NV = NUM_STATES, NUM_VARS


def make_condensed_kkt(can: CanonicalNLP, refine: int = 2,
                       chain: str = "scan"):
    """``chain="cr"`` solves the block-tridiagonal chain by cyclic
    reduction (O(log T) depth, tol_tpu/ops/blocktri.py) instead of the
    sequential scan — measured 2x faster end-to-end solver iterations on
    TPU at T=100/batch 1024 (the scan pays ~100 sequential steps of small
    fused kernels; CR's level ops batch over blocks).  Identical math,
    ~2x the arithmetic; rhs-independent border columns are solved once so
    ``refine`` passes are nearly free."""
    nlp = can.nlp
    T, nb, n_s = nlp.T, nlp.nb, can.n_slack
    nB = NV + 1 + n_s  # border: z0, dt, s

    sl_z0 = slice(0, NV)
    sl_dt = NV
    sl_s = slice(NV + 1, nB)

    import numpy as np
    ineq_idx = np.flatnonzero(nlp.boundary_is_ineq)
    Gs_np = np.zeros((nb, n_s))
    for j, r in enumerate(ineq_idx):
        Gs_np[r, j] = 1.0

    def node_lagrangian(u, y_i, inst):
        z, dt = u[:NV], u[NV]
        zero_next = jnp.zeros(NV, dtype=u.dtype)
        return nlp.node_cost(z, dt, inst) + y_i @ nlp.defect(z, zero_next, dt, inst)

    node_hess = jax.vmap(jax.hessian(node_lagrangian), in_axes=(0, 0, None))

    def border_lagrangian(u, w, inst):
        z0, zT, dt = u[:NV], u[NV:2 * NV], u[2 * NV]
        return nlp.global_cost(z0, zT, dt, inst) + w @ nlp.boundary(z0, zT, dt, inst)

    border_hess = jax.hessian(border_lagrangian)

    defect_jac_z = jax.vmap(jax.jacfwd(nlp.defect, argnums=0), in_axes=(0, 0, None, None))
    defect_jac_dt = jax.vmap(jax.jacfwd(nlp.defect, argnums=2), in_axes=(0, 0, None, None))
    bnd_jac = jax.jacfwd(nlp.boundary, argnums=(0, 1, 2))

    def kkt_prepare(v, y_all, sigma, delta_w, delta_c, inst=None):
        """Assemble + factorize at the current iterate; returns an
        ``apply(rhs_v, rhs_c) -> (dv, dy)`` CLOSURE that solves against
        the stored factorization (with ``refine`` saddle-refinement
        passes).  The closure is meant for same-trace reuse — the
        Shamanskii/chord pattern of ``ALMOptions.factor_reuse``: one
        factorization serving several Newton steps with fresh
        right-hand sides (the factor+border solve is ~60% of a solver
        iteration on TPU; a re-solve against it is nearly free —
        measured r05, scratch/time_surgery.py)."""
        inst = can.nlp._inst(inst)
        lb_all, _, fixed_all = can.bounds(inst)
        m0 = (~fixed_all[1:1 + NV]).astype(lb_all.dtype)  # free mask, node 0
        dtype = v.dtype

        gam = jnp.broadcast_to(delta_c, (NS * T + nb,)).astype(dtype)
        Gd = gam[:NS * T].reshape(T, NS)
        Gb = gam[NS * T:]
        Dd = 1.0 / Gd
        Db = 1.0 / Gb

        Z, dt, s = can.split(v)
        y = y_all[:NS * T].reshape(T, NS)
        w = y_all[NS * T:]

        sig_dt = sigma[0]
        sig_z = sigma[1:1 + (T + 1) * NV].reshape(T + 1, NV)
        sig_s = sigma[1 + (T + 1) * NV:]

        # ---- Lagrangian/Jacobian blocks (saddle-system operator data) ----
        u_nodes = jnp.concatenate([Z, jnp.full((T + 1, 1), dt, dtype=dtype)], axis=1)
        y_pad = jnp.concatenate([y, jnp.zeros((1, NS), dtype=dtype)])
        Hn = node_hess(u_nodes, y_pad, inst)
        Q = Hn[:, :NV, :NV] + jax.vmap(jnp.diag)(sig_z) \
            + delta_w * jnp.eye(NV, dtype=dtype)
        qdt = Hn[:, :NV, NV]
        sig_nodes = Hn[:, NV, NV]

        A = defect_jac_z(Z[:-1], Z[1:], dt, inst)
        d = defect_jac_dt(Z[:-1], Z[1:], dt, inst)

        ub_pt = jnp.concatenate([Z[0], Z[-1], jnp.reshape(dt, (1,))])
        Hb = border_hess(ub_pt, w, inst)
        G0, GT, Gdt = bnd_jac(Z[0], Z[-1], dt, inst)
        G0 = G0 * m0[None, :]
        Gs = jnp.asarray(Gs_np, dtype=dtype)
        A = A.at[0].set(A[0] * m0[None, :])  # defect-0 cols of fixed z0 -> 0

        # Border-coupled Hessian pieces (masked on fixed z0 rows/cols).
        Hb00 = Hb[:NV, :NV] * jnp.outer(m0, m0)
        HbTT = Hb[NV:2 * NV, NV:2 * NV]
        HbT0 = Hb[NV:2 * NV, :NV] * m0[None, :]
        Hb0dt = Hb[:NV, 2 * NV] * m0
        HbTdt = Hb[NV:2 * NV, 2 * NV]
        sig_dt_tot = jnp.sum(sig_nodes) + Hb[2 * NV, 2 * NV] + sig_dt + delta_w

        # ---------------- saddle operator application ----------------

        def apply_saddle(dv, dy):
            dZ = dv[1:1 + (T + 1) * NV].reshape(T + 1, NV)
            dZ = dZ.at[0].multiply(m0)
            ddt = dv[0]
            ds = dv[1 + (T + 1) * NV:]
            dyd = dy[:NS * T].reshape(T, NS)
            dyb = dy[NS * T:]

            r1_z = bmv(Q, dZ) + qdt * ddt
            r1_z = r1_z.at[:-1].add(bmv_t(A, dyd))
            r1_z = r1_z.at[1:, :NS].add(dyd)
            r1_z = r1_z.at[0].add(bmv(Hb00, dZ[0]) + bmv_t(HbT0, dZ[T])
                                  + Hb0dt * ddt + bmv_t(G0, dyb))
            r1_z = r1_z.at[T].add(bmv(HbTT, dZ[T]) + bmv(HbT0, dZ[0])
                                  + HbTdt * ddt + bmv_t(GT, dyb))
            r1_z = r1_z.at[0].multiply(m0)
            r1_dt = (jnp.sum(qdt * dZ) + sig_dt_tot * ddt
                     + Hb0dt @ dZ[0] + HbTdt @ dZ[T]
                     + jnp.sum(d * dyd) + Gdt @ dyb)
            r1_s = (sig_s + delta_w) * ds + bmv_t(Gs, dyb)
            r2_d = (bmv(A, dZ[:-1]) + dZ[1:, :NS]
                    + d * ddt - Gd * dyd)
            r2_b = bmv(G0, dZ[0]) + bmv(GT, dZ[T]) + Gdt * ddt - Gb * dyb
            if n_s:
                r2_b = r2_b + bmv(Gs, ds)
            r1 = jnp.concatenate([jnp.reshape(r1_dt, (1,)), r1_z.reshape(-1), r1_s])
            r2 = jnp.concatenate([r2_d.reshape(-1), r2_b])
            return r1, r2

        # -------- condensed factorization (rhs-independent, done once) ----

        ADd = A * Dd[:, :, None]
        AtDdA = bmm_tn(A, ADd)
        AtDd_d = bmv_t(A, Dd * d)
        EtDd_d = jnp.concatenate([Dd * d, jnp.zeros((T, NV - NS), dtype=dtype)], axis=1)
        dtd = jnp.sum(Dd * d * d)

        G0Db = G0 * Db[:, None]
        GTDb = GT * Db[:, None]
        GsDb = Gs * Db[:, None]
        GdtDb = Gdt * Db

        diagD = jnp.zeros((T + 1, NV, NV), dtype=dtype)
        diagD = diagD.at[:-1].add(AtDdA)
        pad_dd = jax.vmap(lambda r: jnp.diag(jnp.concatenate(
            [r, jnp.zeros(NV - NS, dtype=dtype)])))(Dd)
        diagD = diagD.at[1:].add(pad_dd)
        M = Q + diagD
        M = M.at[T].add(HbTT + bmm_tn(GT, GTDb))

        qcol = qdt.at[:-1].add(AtDd_d).at[1:].add(EtDd_d)
        qcol = qcol.at[T].add(HbTdt + bmv_t(GT, GdtDb))

        O = jnp.concatenate(
            [jnp.swapaxes(ADd, 1, 2),
             jnp.zeros((T, NV, NV - NS), dtype=dtype)], axis=2)

        B0 = jnp.zeros((nB, nB), dtype=dtype)
        Q0_eff = (M[0] + Hb00 + bmm_tn(G0, G0Db)) * jnp.outer(m0, m0) + jnp.diag(1.0 - m0)
        q0_eff = (qcol[0] + Hb0dt + bmv_t(G0, GdtDb)) * m0
        B0 = B0.at[sl_z0, sl_z0].set(Q0_eff)
        B0 = B0.at[sl_z0, sl_dt].set(q0_eff)
        B0 = B0.at[sl_dt, sl_z0].set(q0_eff)
        B0 = B0.at[sl_dt, sl_dt].set(sig_dt_tot + dtd + GdtDb @ Gdt)
        if n_s:
            B0 = B0.at[sl_s, sl_s].set(jnp.diag(sig_s + delta_w) + bmm_tn(Gs, GsDb))
            z0s = bmm_tn(G0, GsDb) * m0[:, None]
            B0 = B0.at[sl_z0, sl_s].set(z0s)
            B0 = B0.at[sl_s, sl_z0].set(z0s.T)
            sdt_s = bmv_t(Gs, GdtDb)
            B0 = B0.at[sl_s, sl_dt].set(sdt_s)
            B0 = B0.at[sl_dt, sl_s].set(sdt_s)

        Wc = jnp.zeros((T, NV, nB), dtype=dtype)
        Wc = Wc.at[:, :, sl_dt].set(qcol[1:])
        Wc = Wc.at[0, :, sl_z0].set(jnp.swapaxes(O[0] * m0[:, None], 0, 1))
        cornerT = (HbT0 + bmm_tn(GT, G0Db)) * m0[None, :]
        Wc = Wc.at[T - 1, :, sl_z0].add(cornerT)
        if n_s:
            Wc = Wc.at[T - 1, :, sl_s].add(bmm_tn(GT, GsDb))

        M_chain = M[1:]
        O_chain = jnp.concatenate([O[1:], jnp.zeros((1, NV, NV), dtype=dtype)])

        # Shared rhs condensation (used by solve_once and, for crp, by
        # the fused factor pre-pass — identical subgraphs CSE under jit).
        def condense_rhs(rhs_v_, rhs_c_):
            r_dt = rhs_v_[0]
            r_z = rhs_v_[1:1 + (T + 1) * NV].reshape(T + 1, NV)
            r_s = rhs_v_[1 + (T + 1) * NV:]
            rc_d = rhs_c_[:NS * T].reshape(T, NS)
            rc_b = rhs_c_[NS * T:]
            rz = r_z
            rz = rz.at[:-1].add(bmv_t(A, Dd * rc_d))
            rz = rz.at[1:].add(jnp.concatenate(
                [Dd * rc_d, jnp.zeros((T, NV - NS), dtype=dtype)], axis=1))
            rz = rz.at[T].add(bmv_t(GT, Db * rc_b))
            rz = rz.at[0].add(bmv_t(G0, Db * rc_b))
            rz = rz.at[0].multiply(m0)
            r_dt_c = r_dt + jnp.sum(Dd * d * rc_d) + GdtDb @ rc_b
            r_s_c = r_s + bmv_t(Gs, Db * rc_b)
            rB = jnp.concatenate([rz[0], jnp.reshape(r_dt_c, (1,)), r_s_c])
            return rz, rB, rc_d, rc_b

        if chain in ("cr", "crp", "spike"):
            if chain == "cr":
                fac = cr_factor(M_chain, O_chain)
                tri_solve_chain = cr_solve
                YW = tri_solve_chain(fac, Wc)             # (T, NV, nB)
            elif chain == "crp":
                from tol_tpu.ops.crkern import (crp_factor_solve,
                                                crp_pad_rhs, crp_solve)
                n_pad = 1
                while n_pad < T:
                    n_pad *= 2
                # FUSED factor + border-column forward elimination: the
                # separate forward pass would re-read every level's
                # pivot/coupling data from HBM; the border columns are
                # known before the factor, so they eliminate in the same
                # pass (tol_tpu/ops/crkern.py::_factor_fwd_kernel).
                fac_levels, fac_root, Yall = crp_factor_solve(
                    M_chain, O_chain, Wc)
                YW = Yall[:T]
                fac = None

                def tri_solve_chain(_, F):
                    return crp_solve(fac_levels, fac_root,
                                     crp_pad_rhs(F, n_pad))[:T]
            else:
                from tol_tpu.ops.spike import spike_factor, spike_solve
                fac = spike_factor(M_chain, O_chain)
                tri_solve_chain = spike_solve
                YW = tri_solve_chain(fac, Wc)             # (T, NV, nB)
            # Border columns are rhs-independent: solve them once; the
            # Schur complement is S = B0 - W^T Mtri^{-1} W.
            S_border = B0 - jnp.sum(bmm_tn(Wc, YW), axis=0)
            L_border_cr = chol_unrolled(S_border)

        elif chain == "pallas":
            # Factor ONCE (border columns eliminated together — they are
            # rhs-independent); every solve/refinement pass then runs only
            # the O(n^2)-per-block rhs forward pass + back-substitution.
            from tol_tpu.ops.chainkern import (chain_back_sub,
                                               chain_eliminate,
                                               chain_rhs_forward)
            Dinv_p, t2p, tRw_p, Sw_p = chain_eliminate(M_chain, O_chain, Wc)
            Sb_p = B0 - Sw_p
            Lb_p = chol_unrolled(Sb_p)

        else:
            def factor_step(carry, inp):
                Dcorr, Wcorr, S_acc = carry
                Mi, Wi, Oi = inp
                Dt = Mi - Dcorr
                Wt = Wi - Wcorr
                # Explicit SPD inverse (unrolled Cholesky): every later
                # application is a plain matmul, which batches on the MXU.
                Dinv = spd_inverse(Dt)
                tW = bmm(Dinv, Wt)                 # D~^-1 W~  (11, nB)
                t2 = bmm(Dinv, Oi)                 # D~^-1 O_i (11, 11)
                S_acc = S_acc - bmm_tn(Wt, tW)
                return (bmm_tn(Oi, t2), bmm_tn(Oi, tW), S_acc), (Dinv, t2, tW, Wt)

            S0 = jnp.zeros((nB, nB), dtype=dtype)
            (_, _, S_acc), (Dinvs, t2s, tWs, Wts) = jax.lax.scan(
                factor_step,
                (jnp.zeros((NV, NV), dtype=dtype), jnp.zeros((NV, nB), dtype=dtype), S0),
                (M_chain, Wc, O_chain))
            S_border = B0 + S_acc
            L_border = chol_unrolled(S_border)

        # ---------------- solves reusing the stored factors ---------------

        def solve_once(rhs_v_, rhs_c_):
            rz, rB, rc_d, rc_b = condense_rhs(rhs_v_, rhs_c_)

            if chain == "pallas":
                tr_p, sb_r = chain_rhs_forward(Dinv_p, O_chain, tRw_p,
                                               rz[1:])
                rB_acc = rB - sb_r
                yb_ = tri_solve_unrolled(Lb_p, rB_acc[..., None], lower=True)
                d_beta = tri_solve_unrolled(Lb_p, yb_, lower=True,
                                            trans=True)[..., 0]
                coef = jnp.concatenate([-d_beta, jnp.ones((1,), dtype)])
                dZ_chain = chain_back_sub(
                    jnp.concatenate([tRw_p, tr_p[:, :, None]], axis=2),
                    t2p, coef)
            elif chain in ("cr", "crp", "spike"):
                Yr = tri_solve_chain(fac, rz[1:][..., None])[..., 0]
                rB_acc = rB - jnp.sum(bmv_t(Wc, Yr), axis=0)
                yb_ = tri_solve_unrolled(L_border_cr, rB_acc[..., None],
                                         lower=True)
                d_beta = tri_solve_unrolled(L_border_cr, yb_, lower=True,
                                            trans=True)[..., 0]
                dZ_chain = Yr - bmv(YW, d_beta)
            else:
                def fwd(carry, inp):
                    rcorr, rB_acc = carry
                    Dinv, tW, Wt, Oi, ri = inp
                    rt = ri - rcorr
                    tr = bmv(Dinv, rt)              # D~^-1 r~
                    rB_acc = rB_acc - bmv_t(Wt, tr)
                    return (bmv_t(Oi, tr), rB_acc), tr

                (_, rB_acc), trs = jax.lax.scan(
                    fwd, (jnp.zeros(NV, dtype=dtype), rB),
                    (Dinvs, tWs, Wts, O_chain, rz[1:]))

                yb_ = tri_solve_unrolled(L_border, rB_acc[..., None], lower=True)
                d_beta = tri_solve_unrolled(L_border, yb_, lower=True, trans=True)[..., 0]

                def bwd(dv_next, inp):
                    tr, tW, t2 = inp
                    dv_i = tr - bmv(tW, d_beta) - bmv(t2, dv_next)
                    return dv_i, dv_i

                _, dZ_chain = jax.lax.scan(bwd, jnp.zeros(NV, dtype=dtype),
                                           (trs, tWs, t2s), reverse=True)

            dz0 = d_beta[sl_z0] * m0
            ddt = d_beta[sl_dt]
            ds = d_beta[sl_s]
            dZ = jnp.concatenate([dz0[None, :], dZ_chain])
            dv_out = jnp.concatenate([jnp.reshape(ddt, (1,)), dZ.reshape(-1), ds])
            Jd = (bmv(A, dZ[:-1]) + dZ[1:, :NS] + d * ddt)
            dy_d = Dd * (Jd - rc_d)
            Jb = bmv(G0, dz0) + bmv(GT, dZ[T]) + Gdt * ddt
            if n_s:
                Jb = Jb + bmv(Gs, ds)
            dy_b = Db * (Jb - rc_b)
            dy_out = jnp.concatenate([dy_d.reshape(-1), dy_b])
            return dv_out, dy_out

        def apply_fn(rhs_v, rhs_c):
            rhs_v_eff = jnp.where(fixed_all, 0.0, rhs_v)
            dv, dy = solve_once(rhs_v_eff, rhs_c)
            for _ in range(refine):
                a1, a2 = apply_saddle(dv, dy)
                e1 = jnp.where(fixed_all, 0.0, rhs_v_eff - a1)
                e2 = rhs_c - a2
                cv, cy = solve_once(e1, e2)
                dv = dv + cv
                dy = dy + cy
            return dv, dy

        return apply_fn

    def kkt_solve(v, y_all, sigma, delta_w, delta_c, rhs_v, rhs_c,
                  inst=None):
        """``delta_c`` (Gamma) must be strictly positive; scalar or (m,)."""
        return kkt_prepare(v, y_all, sigma, delta_w, delta_c, inst)(
            rhs_v, rhs_c)

    kkt_solve.prepare = kkt_prepare
    return kkt_solve

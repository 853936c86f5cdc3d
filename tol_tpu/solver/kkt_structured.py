"""Structured KKT backend — O(T) block factorization of the collocation KKT.

The Newton/KKT matrix of these NLPs has fixed sparsity (the same structure
the reference discovers numerically in ``countG``, src/problem.cpp:813-919,
and hands to SNOPT as ~10k sparse triplets):

  * defect rows couple only (z_i, z_{i+1}, dt)  — block-bidiagonal in time,
  * the Hessian is block-diagonal per node (+ dt arrow, + a (z_0,z_T)
    corner from boundary terms),
  * boundary rows couple only (z_0, z_T, s).

Ordering the unknowns as a chain of per-interval blocks
``v_i = (dy_{i-1}, dz_i)`` (19 = 8 duals + 11 primals) bordered by the
coupling set ``beta = (dz_0, d_dt, ds, dw)`` yields a block-tridiagonal +
arrowhead system.  One forward sweep eliminates the chain (per step: one
11x11 Cholesky, one 8x8 Cholesky of the negated dual Schur block, a few
small matmuls), accumulating a dense Schur complement on the ~25-wide
border; a small dense solve and a backward sweep recover the full step.

Cost: O(T * 19^3)-ish versus O((n+m)^3) dense — and every operation is a
tiny batched matmul, so thousands of NLP instances factor in lock-step
under ``vmap`` on the MXU/VPU.  The chain sweeps are ``lax.scan``s.

Why it is stable without pivoting: within each block we eliminate the
primal part first (Q_i = node Hessian + barrier + shift, positive definite
by construction), leaving a dual Schur complement
``S_y = Y_i - (Q_i^{-1})[:8,:8]`` that is negative definite, so both
factorizations are plain Cholesky (of Q_i and -S_y).  This is the
arrowhead-bordered analogue of Riccati-style OCP eliminations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS
from tol_tpu.solver.canonical import CanonicalNLP

NS, NV = NUM_STATES, NUM_VARS
NBLK = NS + NV  # 19


def _cho_solve(L, B):
    """Solve A X = B given L = chol(A) (lower)."""
    Y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, Y, lower=False)


def make_structured_kkt(can: CanonicalNLP, convexify: bool = True):
    """``convexify=True`` (default) clamps each per-node Hessian block to
    be positive definite via a saddle-free eigenvalue flip (|lambda| with a
    floor).  The chain factorization requires PD node blocks; with exact
    indefinite Hessians the Cholesky signals a NaN (an inertia detection the
    dense LU backend lacks), forcing the caller into regularization retries.
    Flipping negative curvature instead keeps every iteration productive and
    lock-step batched — the classic trade of quadratic-convergence purism
    for GPU/TPU-throughput robustness.  Pass False for exact-system
    comparisons against the dense backend."""
    nlp = can.nlp
    T, nb, n_s = nlp.T, nlp.nb, can.n_slack
    nB = NV + 1 + n_s + nb  # border width: z0, dt, s, w

    # Border sub-ranges.
    sl_z0 = slice(0, NV)
    sl_dt = NV
    sl_s = slice(NV + 1, NV + 1 + n_s)
    sl_w = slice(NV + 1 + n_s, nB)

    # Slack scatter into boundary rows (constant).
    import numpy as np
    ineq_idx = np.flatnonzero(nlp.boundary_is_ineq)
    Gs_np = np.zeros((nb, n_s))
    for j, r in enumerate(ineq_idx):
        Gs_np[r, j] = 1.0

    E = jnp.eye(NS, NV)  # d defect / d z_{i+1} (src/problem.cpp:1200-1206)

    def node_lagrangian(u, y_i, inst):
        """Scalar whose (z,dt)-Hessian gives the per-node KKT blocks.

        ``u = [z_i (11), dt]``.  The z_{i+1} defect term is linear and
        drops out of the Hessian, so we evaluate the defect against a zero
        next-node.
        """
        z, dt = u[:NV], u[NV]
        zero_next = jnp.zeros(NV, dtype=u.dtype)
        return nlp.node_cost(z, dt, inst) + y_i @ nlp.defect(z, zero_next, dt, inst)

    node_hess = jax.vmap(jax.hessian(node_lagrangian), in_axes=(0, 0, None))

    def border_lagrangian(u, w, inst):
        """u = [z0 (11), zT (11), dt] -> boundary-coupled scalar terms."""
        z0, zT, dt = u[:NV], u[NV:2 * NV], u[2 * NV]
        return nlp.global_cost(z0, zT, dt, inst) + w @ nlp.boundary(z0, zT, dt, inst)

    border_hess = jax.hessian(border_lagrangian)

    defect_jac_z = jax.vmap(jax.jacfwd(nlp.defect, argnums=0), in_axes=(0, 0, None, None))
    defect_jac_dt = jax.vmap(jax.jacfwd(nlp.defect, argnums=2), in_axes=(0, 0, None, None))
    bnd_jac = jax.jacfwd(nlp.boundary, argnums=(0, 1, 2))

    def kkt_solve(v, y_all, sigma, delta_w, delta_c, rhs_v, rhs_c, inst=None):
        """``delta_c`` may be a scalar or a per-row (m,) vector."""
        inst = can.nlp._inst(inst)
        lb_all, _, fixed_all = can.bounds(inst)
        free0 = (~fixed_all[1:1 + NV]).astype(lb_all.dtype)
        dtype = v.dtype
        delta_c = jnp.broadcast_to(delta_c, (NS * T + nb,))
        dc_def = delta_c[:NS * T].reshape(T, NS)
        dc_bnd = delta_c[NS * T:]
        Z, dt, s = can.split(v)
        y = y_all[:NS * T].reshape(T, NS)
        w = y_all[NS * T:]

        sig_dt = sigma[0]
        sig_z = sigma[1:1 + (T + 1) * NV].reshape(T + 1, NV)
        sig_s = sigma[1 + (T + 1) * NV:]

        r_dt = rhs_v[0]
        r_z = rhs_v[1:1 + (T + 1) * NV].reshape(T + 1, NV)
        r_s = rhs_v[1 + (T + 1) * NV:]
        r_c = rhs_c[:NS * T].reshape(T, NS)
        r_b = rhs_c[NS * T:]

        # ---- derivative blocks ----
        u_nodes = jnp.concatenate([Z, jnp.full((T + 1, 1), dt, dtype=dtype)], axis=1)
        y_pad = jnp.concatenate([y, jnp.zeros((1, NS), dtype=dtype)])
        Hn = node_hess(u_nodes, y_pad, inst)       # (T+1, 12, 12)
        Q = Hn[:, :NV, :NV]
        if convexify:
            Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))
            lam, V = jnp.linalg.eigh(Q)
            floor = 1e-8 * (1.0 + jnp.max(jnp.abs(lam), axis=-1, keepdims=True))
            lam = jnp.maximum(jnp.abs(lam), floor)
            Q = jnp.einsum("nij,nj,nkj->nik", V, lam, V)
        Q = Q + jax.vmap(jnp.diag)(sig_z) + delta_w * jnp.eye(NV, dtype=dtype)
        qdt = Hn[:, :NV, NV]                       # (T+1, 11)
        sig_nodes = Hn[:, NV, NV]                  # (T+1,)

        A = defect_jac_z(Z[:-1], Z[1:], dt, inst)  # (T, 8, 11)
        d = defect_jac_dt(Z[:-1], Z[1:], dt, inst) # (T, 8)

        ub = jnp.concatenate([Z[0], Z[-1], jnp.reshape(dt, (1,))])
        Hb = border_hess(ub, w, inst)              # (23, 23)
        G0, GT, Gdt = bnd_jac(Z[0], Z[-1], dt, inst)  # (nb,11),(nb,11),(nb,)
        Gs = jnp.asarray(Gs_np, dtype=dtype)

        # ---- fixed-variable masking on node 0 ----
        m = free0
        Q0_eff = (Q[0] + Hb[:NV, :NV]) * jnp.outer(m, m) + jnp.diag(1.0 - m)
        q0_eff = (qdt[0] + Hb[:NV, 2 * NV]) * m
        P_T0 = Hb[NV:2 * NV, :NV] * m[None, :]     # (zT rows, z0 cols)
        A0_eff = A[0] * m[None, :]
        G0_eff = G0 * m[None, :]
        rz0_eff = r_z[0] * m

        # ---- border diagonal block ----
        B = jnp.zeros((nB, nB), dtype=dtype)
        B = B.at[sl_z0, sl_z0].set(Q0_eff)
        B = B.at[sl_z0, sl_dt].set(q0_eff)
        B = B.at[sl_dt, sl_z0].set(q0_eff)
        sigma_dt_total = jnp.sum(sig_nodes) + Hb[2 * NV, 2 * NV] + sig_dt + delta_w
        B = B.at[sl_dt, sl_dt].set(sigma_dt_total)
        if n_s:
            B = B.at[sl_s, sl_s].set(jnp.diag(sig_s + delta_w))
            B = B.at[sl_s, sl_w].set(Gs.T)
            B = B.at[sl_w, sl_s].set(Gs)
        B = B.at[sl_z0, sl_w].set(G0_eff.T)
        B = B.at[sl_w, sl_z0].set(G0_eff)
        B = B.at[sl_dt, sl_w].set(Gdt)
        B = B.at[sl_w, sl_dt].set(Gdt)
        B = B.at[sl_w, sl_w].set(-jnp.diag(dc_bnd))

        rB = jnp.concatenate([rz0_eff, jnp.reshape(r_dt, (1,)), r_s, r_b])

        # ---- chain inputs, blocks i = 1..T ----
        # W_i: (19, nB+1) border columns + rhs column stacked last.
        W = jnp.zeros((T, NBLK, nB + 1), dtype=dtype)
        # y-rows (defect i-1): dt column = d[i-1]; i=1 gets A0 in z0 cols.
        W = W.at[:, :NS, sl_dt].set(d)
        W = W.at[0, :NS, sl_z0].set(A0_eff)
        # z-rows: dt column = q[i]; the last block also carries the border
        # Hessian's (zT, dt) coupling.
        W = W.at[:, NS:, sl_dt].set(qdt[1:])
        W = W.at[T - 1, NS:, sl_dt].add(Hb[NV:2 * NV, 2 * NV])
        # last block: z0 corner + boundary Jacobian.
        W = W.at[T - 1, NS:, sl_z0].set(P_T0)
        W = W.at[T - 1, NS:, sl_w].set(GT.T)
        # rhs column.
        W = W.at[:, :NS, nB].set(r_c)
        W = W.at[:, NS:, nB].set(r_z[1:])

        # Border-lagrangian curvature on the final node (zT x zT block).
        Q_chain = Q[1:]                                  # (T, 11, 11)
        Q_chain = Q_chain.at[T - 1].add(Hb[NV:2 * NV, NV:2 * NV])
        A_next = jnp.concatenate([A[1:], jnp.zeros((1, NS, NV), dtype=dtype)])

        eyeNS = jnp.eye(NS, dtype=dtype)

        def fwd(carry, inp):
            Y, dUy, S_acc = carry
            Qi, Wi, Ai, dci = inp
            # Apply pending y-row correction from the previous elimination.
            Wi = Wi.at[:NS].add(-dUy)
            L_Q = jnp.linalg.cholesky(Qi)
            Qinv_b = _cho_solve(L_Q, Wi[NS:])            # (11, nB+1)
            Qinv_E = _cho_solve(L_Q, E.T)                # (11, 8) = Q^{-1} E^T
            S_y = Y - Qinv_E[:NS]                        # Y - (Q^{-1})[:8,:8]
            L_S = jnp.linalg.cholesky(-S_y)
            # t1 = D^{-1} Wi
            dy = -_cho_solve(L_S, Wi[:NS] - Qinv_b[:NS])
            dz = Qinv_b - Qinv_E @ dy
            t1 = jnp.concatenate([dy, dz])               # (19, nB+1)
            # t2 = D^{-1} [0; A_i^T]
            Qinv_A = _cho_solve(L_Q, Ai.T)               # (11, 8)
            dy2 = _cho_solve(L_S, Qinv_A[:NS])
            dz2 = Qinv_A - Qinv_E @ dy2
            t2 = jnp.concatenate([dy2, dz2])             # (19, 8)
            # Schur accumulation (border + rhs jointly).
            S_acc = S_acc - Wi.T @ t1
            # Next block's corrections.
            Y_next = -jnp.diag(dci) - Ai @ dz2
            dUy_next = Ai @ dz
            return (Y_next, dUy_next, S_acc), (t1, t2)

        Y0 = -jnp.diag(dc_def[0])
        # dc row i applies to defect-dual block i+1's *next* coupling: the
        # carry built at chain step i initializes block i+1 whose dual rows
        # are defect i — feed dc shifted by one (last entry unused).
        dc_next = jnp.concatenate([dc_def[1:], dc_def[-1:]])
        S0 = jnp.zeros((nB + 1, nB + 1), dtype=dtype)
        (Yl, dUyl, S_acc), (t1s, t2s) = jax.lax.scan(
            fwd, (Y0, jnp.zeros((NS, nB + 1), dtype=dtype), S0),
            (Q_chain, W, A_next, dc_next))

        S_border = B + S_acc[:nB, :nB]
        rhs_border = rB + S_acc[:nB, nB]
        d_beta = jnp.linalg.solve(S_border, rhs_border)

        # ---- backward sweep ----
        def bwd(dy_next, inp):
            t1, t2 = inp
            dv = t1[:, nB] - t1[:, :nB] @ d_beta - t2 @ dy_next
            return dv[:NS], dv

        _, dvs = jax.lax.scan(bwd, jnp.zeros(NS, dtype=dtype), (t1s, t2s),
                              reverse=True)

        dY = dvs[:, :NS]                 # (T, 8)  defect duals
        dZ_chain = dvs[:, NS:]           # (T, 11)
        dz0 = d_beta[sl_z0] * m
        ddt = d_beta[sl_dt]
        ds = d_beta[sl_s]
        dw = d_beta[sl_w]

        dZ = jnp.concatenate([dz0[None, :], dZ_chain])
        dv_out = jnp.concatenate([jnp.reshape(ddt, (1,)), dZ.reshape(-1), ds])
        dy_out = jnp.concatenate([dY.reshape(-1), dw])
        return dv_out, dy_out

    return kkt_solve

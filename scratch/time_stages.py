"""Round-5 stage decomposition of one batched solver iteration (TPU).

VERDICT r04 weak #1 asks for the missing positive decomposition: one
batched B-lane iteration broken into its stages.  Times, at B (default
256, the production group size), ts=100 S10-Tempest f32:

  eval_fc        f(v) + c(v)                       (1x per iteration)
  grad_lag       reverse-mode Lagrangian gradient  (2x: at v and v_n)
  ls_trials8     8-trial line search: f+c at 8 points per lane
  assemble       node Hessians + defect Jacobians + border Hessian
  crp_factor     CR elimination of the (T,11,11) chain
  crp_solve13    border-column solve (13 rhs columns through the levels)
  crp_solve1     single-rhs solve (the per-refine-pass cost)
  kkt_full       the production condensed solve (assembly+factor+
                 border+2 rhs passes+recovery), refine=1
  dual_cg4       least-squares dual refinement (linearize + 4 CG steps)

Run: B=256 python scratch/time_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from tol_tpu.api import make_problem  # noqa: E402
from tol_tpu.solver import canonicalize  # noqa: E402
from tol_tpu.solver.kkt_condensed import make_condensed_kkt  # noqa: E402
from tol_tpu.models.dynamics import NUM_STATES, NUM_VARS  # noqa: E402

B = int(os.environ.get("B", "256"))
ts = 100
dtype = jnp.float32
NS, NV = NUM_STATES, NUM_VARS

nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                   dtype=dtype)
can = canonicalize(nlp, scaling="auto")
inst = can.nlp.inst0
T = nlp.T
lb, ub, fixed = can.bounds(inst)

v0 = can.initial_point()
v0s = jnp.clip(v0[None] + 0.01 * jax.random.normal(
    jax.random.PRNGKey(0), (B, can.n), dtype=dtype), lb[None], ub[None])
v0s = jnp.where(fixed[None], lb[None], v0s)
y0s = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (B, can.m),
                               dtype=dtype)
sig = jnp.abs(0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, can.n),
                                      dtype=dtype))


def bench_fn(name, fn, *args, n=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:16s} {dt:8.3f} ms", flush=True)
    return dt


res = {}
with jax.default_matmul_precision("highest"):
    # ---- evals ----
    res["eval_fc"] = bench_fn(
        "eval_fc", jax.vmap(lambda v: (can.f(v, inst), can.c(v, inst))), v0s)
    grad_lag = jax.grad(lambda v, y: can.f(v, inst) + can.c(v, inst) @ y)
    res["grad_lag"] = bench_fn("grad_lag", jax.vmap(grad_lag), v0s, y0s)

    def trials8(v, dv):
        alphas = 0.5 ** jnp.arange(8, dtype=dtype)

        def tr(a):
            vt = v + a * dv
            return can.f(vt, inst), can.c(vt, inst)

        return jax.vmap(tr)(alphas)

    dvs = 0.001 * jax.random.normal(jax.random.PRNGKey(3), v0s.shape, dtype)
    res["ls_trials8"] = bench_fn("ls_trials8", jax.vmap(trials8), v0s, dvs)

    # ---- assembly (the Hessian/Jacobian blocks kkt_condensed builds) ----
    def node_lagrangian(u, y_i):
        z, dt_ = u[:NV], u[NV]
        zero_next = jnp.zeros(NV, dtype=u.dtype)
        return (nlp.node_cost(z, dt_, inst)
                + y_i @ nlp.defect(z, zero_next, dt_, inst))

    node_hess = jax.vmap(jax.hessian(node_lagrangian), in_axes=(0, 0))
    defect_jac_z = jax.vmap(jax.jacfwd(nlp.defect, argnums=0),
                            in_axes=(0, 0, None, None))
    defect_jac_dt = jax.vmap(jax.jacfwd(nlp.defect, argnums=2),
                             in_axes=(0, 0, None, None))

    def assemble(v, y_all):
        Z, dt_, s = can.split(v)
        y = y_all[:NS * T].reshape(T, NS)
        u_nodes = jnp.concatenate(
            [Z, jnp.full((T + 1, 1), dt_, dtype=dtype)], axis=1)
        y_pad = jnp.concatenate([y, jnp.zeros((1, NS), dtype=dtype)])
        Hn = node_hess(u_nodes, y_pad)
        A = defect_jac_z(Z[:-1], Z[1:], dt_, inst)
        d = defect_jac_dt(Z[:-1], Z[1:], dt_, inst)
        return Hn, A, d

    res["assemble"] = bench_fn("assemble", jax.vmap(assemble), v0s, y0s)

    # ---- chain kernels in isolation (representative random blocks) ----
    from tol_tpu.ops.crkern import crp_factor, crp_pad_rhs, crp_solve

    key = jax.random.PRNGKey(7)
    Mr = jax.random.normal(key, (B, T, NV, NV), dtype) * 0.1
    Mr = jnp.einsum("btij,btkj->btik", Mr, Mr) \
        + 3.0 * jnp.eye(NV, dtype=dtype)
    Or = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (B, T, NV, NV),
                                 dtype)
    W13 = jax.random.normal(jax.random.PRNGKey(9), (B, T, NV, 13), dtype)
    r1 = jax.random.normal(jax.random.PRNGKey(10), (B, T, NV, 1), dtype)
    n_pad = 1
    while n_pad < T:
        n_pad *= 2

    res["crp_factor"] = bench_fn(
        "crp_factor", jax.vmap(crp_factor), Mr, Or)
    lev, root = jax.jit(jax.vmap(crp_factor))(Mr, Or)
    jax.block_until_ready(root)
    res["crp_solve13"] = bench_fn(
        "crp_solve13",
        jax.vmap(lambda lv, rt, w: crp_solve(lv, rt, crp_pad_rhs(w, n_pad))),
        lev, root, W13)
    res["crp_solve1"] = bench_fn(
        "crp_solve1",
        jax.vmap(lambda lv, rt, w: crp_solve(lv, rt, crp_pad_rhs(w, n_pad))),
        lev, root, r1)

    # ---- the full production KKT call ----
    kkt = make_condensed_kkt(can, refine=1, chain="crp")

    def kkt_full(v, y, s):
        rhs_v = jnp.ones(can.n, dtype)
        rhs_c = jnp.zeros(can.m, dtype)
        dv, dy = kkt(v, y, s, jnp.asarray(1e-4, dtype),
                     jnp.asarray(0.01, dtype), rhs_v, rhs_c, inst)
        return dv

    res["kkt_full"] = bench_fn("kkt_full", jax.vmap(kkt_full), v0s, y0s, sig)

    # ---- dual refinement ----
    def dual_cg4(v, y):
        c_fn = lambda vv: can.c(vv, inst)
        _, jvp_c = jax.linearize(c_fn, v)
        _, vjp_c = jax.vjp(c_fn, v)
        g0 = jax.grad(lambda vv: can.f(vv, inst))(v)
        w2 = jnp.ones(can.n, dtype)
        Nop = lambda yy: jvp_c(w2 * vjp_c(yy)[0])
        b = -jvp_c(w2 * g0)
        x, r = y, b
        p = r
        rs = r @ r
        for _ in range(4):
            Ap = Nop(p)
            al = rs / jnp.maximum(p @ Ap, 1e-30)
            x = x + al * p
            r = r - al * Ap
            rs2 = r @ r
            p = r + (rs2 / jnp.maximum(rs, 1e-30)) * p
            rs = rs2
        return x

    res["dual_cg4"] = bench_fn("dual_cg4", jax.vmap(dual_cg4), v0s, y0s)

print("\nSummary (B=%d):" % B)
acct = (res["eval_fc"] + 2 * res["grad_lag"] + res["ls_trials8"]
        + res["kkt_full"] + res["dual_cg4"])
print("  accounted stage sum ~= %.2f ms  (full iteration measured "
      "separately by scratch/time_iter.py)" % acct)

"""Grouped batch solving with straggler drain — the production
high-throughput path (used by bench.py config 1/3 and sized for the
Monte-Carlo configs).

Why groups: per-LANE iteration cost on TPU improves sharply at smaller
batch (measured r04: 20.8 us/lane-iter at B=1024 vs 14.6 at B=256 —
the program is working-set/latency bound, not FLOP bound), so a large
scenario batch runs fastest as independent ``group_size``-lane solves.

Why drain: a vmapped ``lax.while_loop`` runs until the SLOWEST lane
finishes, so a full batch pays max-lane cost.  Here each group stops at
a runtime cap and the unconverged stragglers are gathered — through ONE
fused jitted dispatch; per-leaf host gathers cost ~30 ms each on a
tunneled TPU — into ``drain_size``-lane chunks that resume exactly
(:class:`ALMState` handoff, ``alm_solve(state0=...)``) and finish the
full iteration budget at a fraction of full-batch cost.

Iteration-budget semantics are unchanged versus a single monolithic
batch: every lane gets at most ``params_drain.max_iter`` iterations
total (the resume continues the per-lane counter).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tol_tpu.solver.alm import (ALMOptions, ALMParams, Phase1,
                                phase_switch_state, solve as alm_solve)
from tol_tpu.solver.canonical import CanonicalNLP


class GroupedResult(NamedTuple):
    """Merged per-lane results (host numpy) + executed-iteration tally."""

    converged: np.ndarray
    constr_viol: np.ndarray
    f: np.ndarray
    iterations: np.ndarray
    kkt_err: np.ndarray
    v: np.ndarray
    group_iters: int       # sum over groups of the max executed iteration
    drain_iters: int       # sum over drain chunks of extra iterations


def make_grouped_solver(can: CanonicalNLP, kkt_solve: Callable,
                        opts: ALMOptions, group_size: int = 256,
                        drain_size: int = 128,
                        dive_opts: ALMOptions | None = None,
                        dive_kkt: Callable | None = None) -> Callable:
    """Build the grouped solver.  Returns

        solve(group_insts, insts, v0s, p1, p2, p2_drain, n1, exit_df)
            -> GroupedResult

    where ``group_insts`` is one Instance per ``group_size`` slice (a
    group shares one instance so the hot loop carries no per-lane
    instance gathers; pass per-group representatives for homogeneous
    groups), ``insts`` the per-lane stacked instances (drain chunks mix
    groups), ``v0s`` the (N, n) seeds, ``p1``/``p2`` the dive/endgame
    runtime params (``p2.max_iter`` = the group cap), ``p2_drain`` the
    drain params (``max_iter`` = the full per-lane budget).

    ``dive_opts`` switches the group program to the TWO-BODY loop: a
    batch-level ``lax.while_loop`` whose body is a scalar ``lax.cond``
    selecting a cheap exploration body (``dive_opts``/``dive_kkt`` —
    e.g. fewer line-search trials, no saddle refinement, no dual
    refinement) while the batch-uniform iteration counter is below
    ``n1``, and the full endgame body (``opts``/``kkt_solve``, incl.
    ``opts.factor_reuse`` chord sub-steps) after.  Only the taken branch
    executes per trip — the dive phase stops paying for endgame-only
    machinery.  Requires the fixed-length dive the bench uses
    (``exit_df`` is ignored; the per-lane stall exit of the in-loop
    :class:`Phase1` continuation is a no-op at ``exit_df=-1`` anyway).
    The drain path is unchanged (resumed lanes are all phase-1).
    """
    GB, DB = group_size, drain_size
    two_body = dive_opts is not None
    kkt_dive = dive_kkt if dive_kkt is not None else kkt_solve

    if two_body:
        # Two chained jitted programs per group, no host sync between
        # them (the endgame consumes the dive's device-resident states).
        # A scalar-lax.cond single-program variant was measured first and
        # rejected: the conditional denies XLA the loop-level schedule it
        # builds for a static while body, and the measured dive cost
        # barely moved (1.58 -> 1.39 ms/iter vs 0.98 for the same body
        # compiled statically).  The dive program never converges a lane
        # (tol 1e-12), runs exactly ``n1`` iterations, and hands the
        # switched states (multiplier absorption, schedule restart —
        # :func:`phase_switch_state`) to the endgame program.
        @jax.jit
        def run_dive(inst, v0s, p1, p2, n_max):
            p1d = p1._replace(max_iter=n_max)
            out = jax.vmap(
                lambda v: alm_solve(can, kkt_dive, dive_opts, inst=inst,
                                    v0=v, params=p1d, keep_state=True))(v0s)
            return jax.vmap(
                lambda s: phase_switch_state(can, s, p2, inst))(out.state)

        # A dedicated shared-instance endgame program.  Reusing the drain
        # program as the endgame (broadcasting the group instance) was
        # measured and rejected: the per-lane instance gathers + Phase1
        # param mixing it adds to the hot loop cost +27% of group wall
        # (2.29 s vs 1.80 s for the 8-group flagship batch).
        @jax.jit
        def run_end(inst, st, p2):
            return jax.vmap(
                lambda s: alm_solve(can, kkt_solve, opts, inst=inst,
                                    params=p2, state0=s,
                                    keep_state=True))(st)

        def run_group(inst, v0s, p1, p2, n_max, exit_df):
            del exit_df  # fixed-length dive only
            return run_end(inst, run_dive(inst, v0s, p1, p2, n_max), p2)

        run_group.run_dive = run_dive
        run_group.run_end = run_end
    else:
        @jax.jit
        def run_group(inst, v0s, p1, p2, n_max, exit_df):
            ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=3)
            return jax.vmap(lambda v: alm_solve(can, kkt_solve, opts,
                                                inst=inst,
                                                v0=v, params=p2, phase1=ph,
                                                keep_state=True))(v0s)

    @jax.jit
    def run_drain(insts, st, p1, p2, n_max, exit_df):
        ph = Phase1(params=p1, n_max=n_max, exit_df=exit_df, patience=3)
        return jax.vmap(lambda i, s: alm_solve(can, kkt_solve, opts, inst=i,
                                               params=p2, phase1=ph,
                                               state0=s))(insts, st)

    @jax.jit
    def _merge_fields(fields):
        return tuple(jnp.concatenate(xs) for xs in zip(*fields))

    @jax.jit
    def gather_chunk(states, insts, pad):
        st = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs)[pad], *states)
        ii = jax.tree_util.tree_map(lambda x: x[pad], insts)
        return st, ii

    def solve(group_insts: Sequence, insts, v0s, p1: ALMParams,
              p2: ALMParams, p2_drain: ALMParams,
              n1, exit_df) -> GroupedResult:
        import os
        import time as _time

        dbg = os.environ.get("TOL_BATCH_DEBUG", "0") == "1"
        t0 = _time.time()
        n = v0s.shape[0]
        assert n == len(group_insts) * GB, (n, len(group_insts), GB)
        n_max = jnp.asarray(n1, jnp.int32)
        xdf = jnp.asarray(exit_df, v0s.dtype)
        outs = [run_group(gi, v0s[g * GB:(g + 1) * GB], p1, p2, n_max, xdf)
                for g, gi in enumerate(group_insts)]
        fields = [(o.converged, o.constr_viol, o.f, o.iterations,
                   o.kkt_err, o.v) for o in outs]
        merged = _merge_fields(fields)
        conv, viol, fs, its, kks, vs = [np.array(x)
                                        for x in jax.device_get(merged)]
        if dbg:
            print(f"[batch] group phase {_time.time() - t0:.3f}s",
                  flush=True)
            t0 = _time.time()
        fs = fs.astype(np.float64)
        group_iters = sum(int(np.max(its[g * GB:(g + 1) * GB]))
                          for g in range(len(outs)))
        cap1 = int(jax.device_get(p2.max_iter))
        drain_iters = 0
        idx = np.flatnonzero(~conv)
        if len(idx):
            states = [o.state for o in outs]
            chunks = []
            for k0 in range(0, len(idx), DB):
                sel = idx[k0:k0 + DB]
                pad = np.concatenate([sel, np.zeros(DB - len(sel), int)])
                sti, ii = gather_chunk(states, insts, jnp.asarray(pad))
                chunks.append(
                    (sel, run_drain(ii, sti, p1, p2_drain, n_max, xdf)))
            dm = _merge_fields([(od.converged, od.constr_viol, od.f,
                                 od.iterations, od.kkt_err, od.v)
                                for _, od in chunks])
            dconv, dviol, dfs, dits, dkks, dvs = [
                np.asarray(x) for x in jax.device_get(dm)]
            for ci, (sel, _) in enumerate(chunks):
                m, o0 = len(sel), ci * DB
                conv[sel] = dconv[o0:o0 + m]
                viol[sel] = dviol[o0:o0 + m]
                fs[sel] = dfs[o0:o0 + m].astype(np.float64)
                its[sel] = dits[o0:o0 + m]
                kks[sel] = dkks[o0:o0 + m]
                vs[sel] = dvs[o0:o0 + m]
                drain_iters += max(0, int(dits[o0:o0 + m].max()) - cap1)
        if dbg:
            print(f"[batch] drain phase {_time.time() - t0:.3f}s "
                  f"({len(idx)} lanes)", flush=True)
        return GroupedResult(conv, viol, fs, its, kks, vs,
                             group_iters, drain_iters)

    solve.run_group = run_group    # exposed for flops accounting
    return solve

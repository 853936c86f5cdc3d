"""Scaling efficiency benchmarks (BASELINE config: >= 80% linear).

Two modes:

* default (CPU, 8 virtual devices): scenario-DP scaling of solves/s at
  1/2/4/8 devices through the real ``Mesh``/``sharded_batch_solve`` code
  path.  Virtual devices share one silicon die, so the meaningful number
  is the *mechanism* overhead — how far below linear the sharding
  machinery drags throughput when each device's work is fixed.  On real
  chips each device adds silicon and the identical code path scales with
  one ICI psum per convergence reduction.

* ``SCALING_PLATFORM=tpu``: single-chip batch-scaling curve on the real
  TPU — solves/s at batch 256/512/1024 with fixed iteration count.  This
  is the per-chip utilization curve that multi-chip scenario-DP
  multiplies (each chip runs an independent shard of the batch; no
  intra-solve communication exists by design).

Prints one JSON line.
"""

import json
import os
import time

import jax

if os.environ.get("SCALING_PLATFORM", "cpu") == "cpu":
    # Env vars are too late here: the axon site pre-imports jax, so
    # platform selection must go through jax.config (see
    # .claude/skills/verify/SKILL.md).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    from tol_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

import jax.numpy as jnp
import numpy as np


def _build(ts, dtype):
    from tol_tpu.api import make_problem
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    chain = os.environ.get("SCALING_CHAIN",
                           "crp" if jax.default_backend() == "tpu" else "cr")
    kkt = make_condensed_kkt(can, refine=1, chain=chain)
    return can, kkt


def _seeds(can, batch, dtype):
    v0 = can.initial_point()
    lb, ub, fixed = can.bounds(can.nlp.inst0)
    dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (batch, can.n),
                                  dtype=dtype)
    v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
    return jnp.where(fixed[None], lb[None], v0s)


def main_cpu_virtual():
    ts = int(os.environ.get("SCALING_TS", "24"))
    per_dev = int(os.environ.get("SCALING_BATCH_PER_DEV", "16"))
    max_iter = int(os.environ.get("SCALING_MAX_ITER", "12"))

    from tol_tpu.parallel import make_mesh, sharded_batch_solve
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    can, kkt = _build(ts, dtype)
    # fixed-iteration scan mode: identical work per instance so wall-clock
    # compares cleanly across device counts
    opts = ALMOptions(tol=0.0, feas_tol=1e-12, max_iter=max_iter,
                      gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                      prox=3e-3, trace=True)

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    rates = {}
    for n in counts:
        mesh = make_mesh(n_dp=n, n_sp=1, devices=jax.devices()[:n])
        batch = per_dev * n
        v0s = _seeds(can, batch, dtype)
        solve = lambda inst, v: alm_solve(can, kkt, opts, v0=v)
        out = sharded_batch_solve(mesh, solve, None, v0s)   # compile+warm
        jax.block_until_ready(out.v)
        t0 = time.time()
        out = sharded_batch_solve(mesh, solve, None, v0s)
        jax.block_until_ready(out.v)
        wall = time.time() - t0
        rates[n] = batch / wall

    n_max = counts[-1]
    eff = rates[n_max] / (rates[1] * n_max) if 1 in rates else 0.0
    return {
        "metric": f"dp_scaling_efficiency_{n_max}dev",
        "value": round(100.0 * eff, 1),
        "unit": "% linear",
        "vs_baseline": round(eff / 0.8, 3),   # target >= 80% linear
        "detail": {
            "platform": jax.devices()[0].platform,
            # virtual = host-platform devices sharing one CPU (the env var
            # is unreliable here: the axon site pre-imports jax, so the
            # platform is whatever jax.config actually selected).
            "virtual_devices": jax.devices()[0].platform == "cpu",
            "ts": ts, "batch_per_device": per_dev,
            "solves_per_s": {str(k): round(v, 2) for k, v in rates.items()},
        },
    }


def main_tpu_batch_curve():
    ts = int(os.environ.get("SCALING_TS", "100"))
    max_iter = int(os.environ.get("SCALING_MAX_ITER", "40"))
    batches = [int(b) for b in
               os.environ.get("SCALING_BATCHES", "256,512,1024").split(",")]

    from tol_tpu.solver.alm import (ALMOptions, ALMParams,
                                    solve as alm_solve)

    dtype = jnp.float32
    can, kkt = _build(ts, dtype)
    opts = ALMOptions(max_iter=max_iter, dual_refine_k=4)
    p = ALMParams.from_options(
        ALMOptions(tol=0.0, feas_tol=1e-12, max_iter=max_iter,
                   gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1, prox=3e-3),
        dtype)

    rates = {}
    for b in batches:
        v0s = _seeds(can, b, dtype)

        @jax.jit
        def run(v0s, p):
            return jax.vmap(lambda v: alm_solve(can, kkt, opts, v0=v,
                                                params=p))(v0s)

        out = run(v0s, p)
        jax.block_until_ready(out.f)
        t0 = time.time()
        out = run(v0s, p)
        jax.block_until_ready(out.f)
        wall = time.time() - t0
        rates[b] = b * max_iter / wall      # instance-iterations per second

    b0, b1 = batches[0], batches[-1]
    eff = rates[b1] / (rates[b0] * (b1 / b0))
    return {
        "metric": f"tpu_batch_scaling_{b0}_to_{b1}",
        "value": round(rates[b1] / rates[b0], 2),
        "unit": f"x throughput at {b1 // b0}x batch",
        "vs_baseline": round(eff / 0.8, 3),
        "detail": {
            "platform": jax.devices()[0].platform,
            "ts": ts, "fixed_iterations": max_iter,
            "instance_iters_per_s": {str(k): round(v, 0)
                                     for k, v in rates.items()},
        },
    }


if __name__ == "__main__":
    if os.environ.get("SCALING_PLATFORM", "cpu") == "cpu":
        print(json.dumps(main_cpu_virtual()))
    else:
        print(json.dumps(main_tpu_batch_curve()))

"""Scenario-DP scaling efficiency: solves/s at 1, 2, 4, 8 devices.

Real multi-chip hardware is not available in this environment (one TPU
chip behind a tunnel), so by default this runs on an 8-virtual-device CPU
platform (``--xla_force_host_platform_device_count``) to validate the
sharded execution path end-to-end and measure the *mechanism* overhead:
fixed per-instance work, batch sharded over "dp", wall-clock per device
count.  Virtual devices share the same silicon, so the interesting number
is how far below linear the sharding machinery itself drags throughput —
on real chips each device adds silicon and the same code path scales with
ICI-local collectives only (one psum per convergence reduction).

Prints one JSON line:
    {"metric": "dp_scaling_efficiency_8dev", "value": pct_linear, ...}
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

import jax.numpy as jnp
import numpy as np


def main():
    ts = int(os.environ.get("SCALING_TS", "100"))
    per_dev = int(os.environ.get("SCALING_BATCH_PER_DEV", "16"))
    max_iter = int(os.environ.get("SCALING_MAX_ITER", "16"))

    from tol_tpu.api import make_problem
    from tol_tpu.parallel import make_mesh, sharded_batch_solve
    from tol_tpu.solver import canonicalize
    from tol_tpu.solver.alm import ALMOptions, solve as alm_solve
    from tol_tpu.solver.kkt_condensed import make_condensed_kkt

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    nlp = make_problem("S10", aircraft="tempest", ts=ts, wind_model=1,
                       dtype=dtype)
    can = canonicalize(nlp, scaling="auto")
    kkt = make_condensed_kkt(can, refine=1, chain="cr")
    # fixed-iteration scan mode: identical work per instance so wall-clock
    # compares cleanly across device counts
    opts = ALMOptions(tol=0.0, feas_tol=1e-12, max_iter=max_iter,
                      gamma_init=0.01, mu_init=1e-5, mu_shrink=0.1,
                      prox=3e-3, trace=True)

    v0 = can.initial_point()
    lb, ub, fixed = can.bounds(can.nlp.inst0)

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]
    rates = {}
    for n in counts:
        mesh = make_mesh(n_dp=n, n_sp=1, devices=jax.devices()[:n])
        batch = per_dev * n
        dv = 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                      (batch, can.n), dtype=dtype)
        v0s = jnp.clip(v0[None] + dv, lb[None], ub[None])
        v0s = jnp.where(fixed[None], lb[None], v0s)
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
    result = {
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
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Timeshard (sp) demonstrate-or-delete experiment (VERDICT r04 task 7).

Question: at a LONG horizon (ts >= 512; the reference's is 100), does
sp-sharding the time axis of defect evaluation across devices beat a
single device?  Honest setup on this box: 2 virtual CPU devices over 2
physical cores; the single-device baseline keeps the whole machine
(XLA's intra-op thread pool may use both cores), so the comparison is
machine-vs-machine, not core-vs-core.

Measures batched defect evaluation (the O(T) work timeshard targets)
at B lanes x T nodes: single device vs Mesh("sp"=2) through
tol_tpu.parallel.timeshard.sharded_all_defects (vmapped over lanes).

Run: python scratch/sp_experiment.py   (CPU only)
Env: T (default 4096), B (default 64), REPS (default 20)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from tol_tpu.api import make_problem  # noqa: E402


def sharded_all_defects(mesh, nlp, Z, dt, inst=None):
    """Inlined copy of the DELETED tol_tpu/parallel/timeshard.py (r05):
    sp-sharded defect evaluation with a one-node ppermute halo.  Kept
    here so the negative-result experiment that led to the deletion
    stays reproducible."""
    inst = nlp._inst(inst)
    T = Z.shape[0] - 1
    nsp = mesh.shape["sp"]
    Zmain = Z[:-1]
    z_tail = Z[-1]
    perm = [((i + 1) % nsp, i) for i in range(nsp)]

    def blk(Zb, z_tail, dt, inst):
        nxt = jax.lax.ppermute(Zb[0:1], "sp", perm)[0]
        idx = jax.lax.axis_index("sp")
        z_after = jnp.where(idx == nsp - 1, z_tail, nxt)
        Znext = jnp.concatenate([Zb[1:], z_after[None]], axis=0)
        return jax.vmap(nlp.defect_fn, in_axes=(0, 0, None, None))(
            Zb, Znext, dt, inst)

    fn = jax.shard_map(
        blk, mesh=mesh,
        in_specs=(P("sp", None), P(), P(), P()),
        out_specs=P("sp", None))
    return fn(Zmain, z_tail, dt, inst)

T = int(os.environ.get("T", "4096"))
B = int(os.environ.get("B", "64"))
REPS = int(os.environ.get("REPS", "20"))

nlp = make_problem("S10", aircraft="tempest", ts=T, wind_model=1)
inst = nlp.inst0
rng = np.random.default_rng(0)
Zb = jnp.asarray(rng.normal(size=(B, T + 1, 11)))
dt = jnp.asarray(0.05)

mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))


@jax.jit
def eval_single(Zb, dt):
    return jax.vmap(lambda Z: nlp.all_defects(Z, dt, inst))(Zb)


@jax.jit
def eval_sp(Zb, dt):
    return jax.vmap(lambda Z: sharded_all_defects(mesh, nlp, Z, dt, inst))(Zb)


def bench(name, fn):
    out = fn(Zb, dt)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(Zb, dt)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:24s} {ms:9.3f} ms  (B={B}, T={T})", flush=True)
    return ms


a = np.asarray(eval_single(Zb, dt))
b = np.asarray(eval_sp(Zb, dt))
print("max |single - sp| =", float(np.max(np.abs(a - b))))

m1 = bench("single-device", eval_single)
m2 = bench("sp=2 (timeshard)", eval_sp)
print(f"speedup sp/single: {m1 / m2:.3f}x")

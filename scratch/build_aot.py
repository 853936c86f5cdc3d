"""Curate assets/aot_cache from the local .jax_cache.

Run AFTER a fresh `python bench.py` + mission/dryrun pass so .jax_cache
holds executables of the CURRENT code, then commit assets/aot_cache.
Copies only the expensive program entries (>= MIN_MB) that were touched
within the last AGE_H hours (stale entries from older code versions are
dead weight — their hash keys never hit).

Usage: python scratch/build_aot.py [--all]
"""
import os
import shutil
import sys
import time

MIN_MB = float(os.environ.get("MIN_MB", "1.0"))
AGE_H = float(os.environ.get("AGE_H", "6"))

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
src = os.path.join(root, ".jax_cache")
dst = os.path.join(root, "assets", "aot_cache")

if os.path.isdir(dst):
    shutil.rmtree(dst)
os.makedirs(dst)

# Unique-program names: the repo has exactly ONE live program per name,
# so only the newest entry is current (older hashes = stale code).
_UNIQUE = {"jit_run_storm", "jit_run_group", "jit_run_drain", "jit_run_g7",
           "jit_run_ens", "jit_resume_ens", "jit_build_seeds",
           "jit_pick_winner", "jit_gather_chunk", "jit__merge_fields",
           "jit_train_step"}
# Renamed/removed programs: never ship.
_DEAD = {"jit_run_s10", "jit_dive", "jit_endgame"}

now = time.time()
candidates = []
for name in sorted(os.listdir(src)):
    p = os.path.join(src, name)
    sz = os.path.getsize(p)
    age_h = (now - os.path.getmtime(p)) / 3600.0
    if "--all" not in sys.argv and (sz < MIN_MB * 2 ** 20 or age_h > AGE_H):
        continue
    if name.split("-")[0] in _DEAD:
        continue
    candidates.append((name, p, sz, age_h))

newest = {}
for name, p, sz, age_h in candidates:
    prog = name.split("-")[0]
    if prog in _UNIQUE:
        if prog in newest and newest[prog][3] < age_h:
            continue
        newest[prog] = (name, p, sz, age_h)
kept_names = {v[0] for v in newest.values()}

total = 0
kept = 0
for name, p, sz, age_h in candidates:
    prog = name.split("-")[0]
    if prog in _UNIQUE and name not in kept_names:
        continue
    shutil.copy2(p, os.path.join(dst, name))
    kept += 1
    total += sz
    print(f"  + {name[:60]:60s} {sz / 2**20:7.1f} MB  ({age_h:.1f} h)")
print(f"kept {kept} entries, {total / 2**20:.0f} MB -> {dst}")

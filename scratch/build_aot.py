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

# Live-entry cap per program name.  r05: the grouped solver names
# (run_dive/run_end/run_drain/gather_chunk/_merge_fields) are compiled
# once per MISSION (s10/g7/storm), so up to 3 entries of a name are
# live; single-mission programs keep 1.  Older hashes = stale code from
# tuning experiments — dead weight whose keys never hit.
_KEEP_N = {"jit_run_dive": 3, "jit_run_end": 3, "jit_run_drain": 3,
           "jit_run_group": 0, "jit_gather_chunk": 3,
           "jit__merge_fields": 3, "jit_run_storm": 0, "jit_run_g7": 0,
           "jit_run_ens": 1, "jit_resume_ens": 1, "jit_build_seeds": 1,
           "jit_pick_winner": 1, "jit_train_step": 1, "jit_run": 2,
           "jit_kkt_solve": 2, "jit_while": 2, "jit__lambda": 3,
           "jit_wrapped": 2}
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

by_prog = {}
for item in candidates:
    by_prog.setdefault(item[0].split("-")[0], []).append(item)

total = 0
kept = 0
for prog, items in sorted(by_prog.items()):
    items.sort(key=lambda it: it[3])           # newest (smallest age) first
    for name, p, sz, age_h in items[: _KEEP_N.get(prog, 3)]:
        shutil.copy2(p, os.path.join(dst, name))
        kept += 1
        total += sz
        print(f"  + {name[:60]:60s} {sz / 2**20:7.1f} MB  ({age_h:.1f} h)")
print(f"kept {kept} entries, {total / 2**20:.0f} MB -> {dst}")

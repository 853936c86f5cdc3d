"""Solution checkpoint / warm-start persistence.

The reference's only "resume" is mission-level stitching through
``snopt_results.json`` + ``trajectory_backup.json`` (SURVEY.md section 5);
every SNOPT call is a cold start.  Here solver state (primal + duals)
round-trips to disk so legs, replans and interrupted sweeps warm-start —
``alm.solve(..., v0=..., y0=...)`` accepts the loaded state directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def save_solution(path: str, v, y=None, meta: Optional[dict] = None) -> None:
    arrays = {"v": np.asarray(v)}
    if y is not None:
        arrays["y"] = np.asarray(y)
    if meta:
        for k, val in meta.items():
            arrays[f"meta_{k}"] = np.asarray(val)
    np.savez(path, **arrays)


def load_solution(path: str) -> Tuple[np.ndarray, Optional[np.ndarray], dict]:
    data = np.load(path, allow_pickle=False)
    v = data["v"]
    y = data["y"] if "y" in data else None
    meta = {k[5:]: data[k] for k in data.files if k.startswith("meta_")}
    return v, y, meta

"""Post-processing plots — the MATLAB ``plotSNOPT`` class equivalent.

The reference analyzes results in MATLAB (matlab/@plotSNOPT: 3-D trajectory
plot, state histories, wind-field overlays).  Here the same views render
with matplotlib from a ``snopt_results.json`` document or a stitched
trajectory JSON; headless-safe (Agg).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


STATE_KEYS = ["Va", "gam", "chi", "phi", "CL", "dphi", "dCL", "T"]


def plot_results(doc: dict, path: str, title: Optional[str] = None) -> None:
    """Trajectory + state history figure (matlab/@plotSNOPT/plot.m analog)."""
    plt = _mpl()
    tr = doc["trajectory"]
    t = np.asarray(tr["time"])
    x, y, z = (np.asarray(tr[k]) for k in ["x", "y", "z"])

    fig = plt.figure(figsize=(14, 9))
    ax = fig.add_subplot(3, 3, (1, 4), projection="3d")
    ax.plot(y, x, -z)  # ENU-ish view: east, north, up
    ax.scatter([y[0]], [x[0]], [-z[0]], marker="o")
    if "args" in doc:
        ax.scatter([doc["args"]["yg"]], [doc["args"]["xg"]],
                   [-doc["args"]["zg"]], marker="*", s=80)
    ax.set_xlabel("east [m]"); ax.set_ylabel("north [m]"); ax.set_zlabel("up [m]")
    ax.set_title(title or f"{doc.get('problem', '?')}  f={doc.get('FinalCost', float('nan')):.4g}")

    slots = [2, 3, 5, 6, 7, 8, 9]
    for k, slot in zip(STATE_KEYS, slots + [None]):
        if slot is None:
            break
        axs = fig.add_subplot(3, 3, slot)
        axs.plot(t, np.asarray(tr[k]))
        axs.set_ylabel(k)
        axs.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_wind_field(wind_cfg, path: str, extent=(-300, 300), n: int = 25,
                    altitude: float = 50.0) -> None:
    """Horizontal wind-field quiver (matlab/@plotSNOPT/plotstorm.m analog)."""
    import jax.numpy as jnp

    from tol_tpu.models.wind import wind_ned

    plt = _mpl()
    xs = np.linspace(extent[0], extent[1], n)
    U = np.zeros((n, n)); V = np.zeros((n, n))
    for i, xn in enumerate(xs):
        for j, ye in enumerate(xs):
            w = np.asarray(wind_ned(wind_cfg, jnp.array([xn, ye, -altitude])))
            V[i, j] = w[0]  # north component
            U[i, j] = w[1]  # east component
    fig, ax = _mpl().subplots(figsize=(7, 7))
    E, N = np.meshgrid(xs, xs)
    ax.quiver(E, N, U, V)
    ax.set_xlabel("east [m]"); ax.set_ylabel("north [m]")
    ax.set_title(f"wind model {wind_cfg.model} @ {altitude:.0f} m AGL")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
